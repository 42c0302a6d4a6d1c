"""Deterministic random-walk generation — graph-embedding training data.

DeepWalk/node2vec-style pipelines (Perozzi 2014, Grover 2016) feed
skip-gram models with uniform random walks over the link graph; at
100 TB the walk corpus IS the training set, so the engine generates it
as a first-class relation. The reference has no counterpart program —
this extends the engine's program set on the iterative-join machinery.

Determinism contract (what makes this oracle-able AND resumable): the
step choice is not an RNG but a hash — from vertex ``v`` at step ``t``
of walk ``(start, w)`` the next vertex is

    neighbors(v)[ H(start, w, t)  mod  out_degree(v) ]

with ``neighbors(v)`` the *distinct* out-neighbors in ascending order and
``H`` the first 8 hex digits of md5 over ``start:w:t`` (the same
cross-engine hash family the SimHash/fingerprint oracles use — Spark
``conv(substring(md5(..),1,8),16,10)`` equals DuckDB
``('0x'||substring(md5(..),1,8))::UINTEGER``). Re-running any walk, on
any cluster size or partitioning, reproduces it bit-for-bit; a DuckDB
chained CTE replays it for the driver gate (``random_walks_l5``).

Physical plan: the adjacency is ranked once — ``(src, idx, dst)`` via a
row_number window plus a ``(src, deg)`` table, one shuffle each, then
checkpointed. Every step is two keyed joins *bounded by the number of
walks* (state never touches E after the prep): walks join degrees on the
current vertex to compute the modulus, then join the ranked adjacency on
``(vertex, idx)``. Walk state is O(walks), appended per step and
localCheckpoint-rotated. Dead ends (no out-edges) terminate the walk
early — shorter walks are kept, matching DeepWalk semantics. At 10^12
edges, pass ``starts=`` to walk from a sampled frontier instead of every
vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duwamish_spark.graph import partition_by, require_columns
from duwamish_spark.pregel import free_local_checkpoint


def _step_hash(start: F.Column, walk: F.Column, step: int) -> F.Column:
    """uint32 from md5(start:walk:step) — DuckDB-replayable hash family."""
    key = F.concat_ws(
        ":", start.cast("string"), walk.cast("string"), F.lit(str(step))
    )
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    *,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    starts: DataFrame | None = None,
    num_partitions: int | None = None,
    partitioner=None,
) -> DataFrame:
    """(start_id, walk, step, vertex) — deterministic uniform walks.

    One row per visited position including step 0 (the start itself);
    ``walk`` ∈ [0, walks_per_vertex). ``starts``: optional (id) frame of
    start vertices (default: every distinct ``src`` — vertices with no
    out-edges produce length-0 walks only when passed explicitly).
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    require_columns(edges, ("src", "dst"), "edges")

    de = edges.select("src", "dst").distinct()
    if num_partitions:
        de = partition_by(de, num_partitions, "src", partitioner)
    adj = de.select(
        "src",
        "dst",
        (
            F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
        ).alias("idx"),
    ).localCheckpoint(eager=True)
    degs = (
        adj.groupBy("src").agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )

    if starts is None:
        start0 = de.select(F.col("src").alias("start_id")).distinct()
    else:
        require_columns(starts, ("id",), "starts")
        start0 = starts.select(F.col("id").alias("start_id"))
    cur = start0.select(
        "start_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
        ).alias("walk"),
        F.col("start_id").alias("vertex"),
    ).localCheckpoint(eager=True)

    frames = [cur]  # per-step checkpoints, freed after the final union
    out = [cur.select("start_id", "walk", F.lit(0).alias("step"), "vertex")]
    for t in range(1, walk_length + 1):
        nxt = (
            cur.join(degs, cur["vertex"] == degs["src"])
            .select(
                "start_id",
                "walk",
                "vertex",
                (
                    _step_hash(F.col("start_id"), F.col("walk"), t)
                    % F.col("deg")
                ).alias("pick"),
            )
            .join(
                adj,
                (F.col("vertex") == adj["src"]) & (F.col("pick") == adj["idx"]),
            )
            .select("start_id", "walk", F.col("dst").alias("vertex"))
            .localCheckpoint(eager=True)
        )
        cur = nxt
        frames.append(cur)
        out.append(
            cur.select("start_id", "walk", F.lit(t).alias("step"), "vertex")
        )
        if cur.rdd.isEmpty():
            break

    result = out[0]
    for part in out[1:]:
        result = result.unionAll(part)
    result = result.localCheckpoint(eager=True)
    for tmp in frames + [adj, degs]:
        free_local_checkpoint(tmp)
    return result
