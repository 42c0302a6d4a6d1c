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
from duwamish_spark.pregel import (
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


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
    ).transform(local_checkpoint_stats_reset)
    degs = (
        adj.groupBy("src").agg(F.count("*").alias("deg"))
        .transform(local_checkpoint_stats_reset)
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
    ).transform(local_checkpoint_stats_reset)

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
            .transform(local_checkpoint_stats_reset)
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
    result = result.transform(local_checkpoint_stats_reset)
    for tmp in frames + [adj, degs]:
        free_local_checkpoint(tmp)
    return result


N2V_SCALE = 10_000  # fixed-point scale for the p/q bias weights


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    *,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    starts: DataFrame | None = None,
    num_partitions: int | None = None,
    partitioner=None,
) -> DataFrame:
    """(start_id, walk, step, vertex) — deterministic second-order biased
    walks (node2vec, Grover & Leskovec 2016).

    From current vertex v with previous vertex u, candidate w ∈ N(v) is
    weighted 1/p if w == u (return), 1 if the directed edge u→w exists
    (stay close), 1/q otherwise (explore). Weights are FIXED-POINT
    integers (round(N2V_SCALE/p) etc., computed once driver-side), the
    candidate list is ordered by dst, and the pick is

        H(start, walk, t)  mod  Σ weights

    resolved against the integer cumulative-weight ladder — all-integer,
    so a DuckDB chained CTE replays every walk bit-for-bit (driver gate
    ``node2vec_l4``). Step 1 has no previous vertex and is uniform (the
    reference node2vec implementation does the same).

    Physical plan: per step, one join state⋈adjacency (fan-out = the
    current vertices' out-degrees — E-bounded when walking from every
    vertex, exactly one message round's cost), one membership left-join
    against the distinct edge set keyed on (prev, candidate), and one
    per-walk window (groups = candidate lists, map-side WindowGroupLimit
    economics). Dead ends terminate walks early, like random_walks.
    """
    if walk_length < 0:
        raise ValueError("walk_length must be >= 0")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    require_columns(edges, ("src", "dst"), "edges")
    w_return = int(round(N2V_SCALE / p))
    w_far = int(round(N2V_SCALE / q))
    if w_return < 1 or w_far < 1:
        raise ValueError("p and q must be <= N2V_SCALE (weights round to 0)")

    de = edges.select("src", "dst").distinct()
    if num_partitions:
        de = partition_by(de, num_partitions, "src", partitioner)
    de = de.transform(local_checkpoint_stats_reset)
    adj = de.select(
        "src",
        "dst",
        (
            F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
        ).alias("idx"),
    ).transform(local_checkpoint_stats_reset)
    degs = (
        adj.groupBy("src").agg(F.count("*").alias("deg"))
        .transform(local_checkpoint_stats_reset)
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
    ).transform(local_checkpoint_stats_reset)

    frames = [cur]
    out = [cur.select("start_id", "walk", F.lit(0).alias("step"), "vertex")]
    prev_col = None  # becomes "prev" after step 1
    for t in range(1, walk_length + 1):
        if prev_col is None:
            # step 1: uniform (no previous vertex yet)
            nxt = (
                cur.join(degs, cur["vertex"] == degs["src"])
                .select(
                    "start_id",
                    "walk",
                    F.col("vertex").alias("prev"),
                    (
                        _step_hash(F.col("start_id"), F.col("walk"), t)
                        % F.col("deg")
                    ).alias("pick"),
                )
                .join(
                    adj,
                    (F.col("prev") == adj["src"]) & (F.col("pick") == adj["idx"]),
                )
                .select("start_id", "walk", "prev", F.col("dst").alias("vertex"))
                .transform(local_checkpoint_stats_reset)
            )
        else:
            cand = (
                cur.join(adj, cur["vertex"] == adj["src"])
                .select(
                    "start_id", "walk", "prev", "vertex",
                    adj["dst"].alias("cw"),
                )
                .join(
                    de.select(
                        F.col("src").alias("prev"),
                        F.col("dst").alias("cw"),
                        F.lit(1).alias("_nb"),
                    ),
                    ["prev", "cw"],
                    "left",
                )
                .withColumn(
                    "wt",
                    F.when(F.col("cw") == F.col("prev"), F.lit(w_return))
                    .when(F.col("_nb") == 1, F.lit(N2V_SCALE))
                    .otherwise(F.lit(w_far))
                    .cast("long"),
                )
            )
            grp = Window.partitionBy("start_id", "walk")
            cum = F.sum("wt").over(grp.orderBy("cw"))
            tot = F.sum("wt").over(grp)
            pick = _step_hash(F.col("start_id"), F.col("walk"), t) % tot
            nxt = (
                cand.withColumn("_cum", cum)
                .withColumn("_pick", pick)
                .where(
                    (F.col("_pick") < F.col("_cum"))
                    & (F.col("_pick") >= F.col("_cum") - F.col("wt"))
                )
                .select(
                    "start_id", "walk",
                    F.col("vertex").alias("prev"),
                    F.col("cw").alias("vertex"),
                )
                .transform(local_checkpoint_stats_reset)
            )
        prev_col = "prev"
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
    result = result.transform(local_checkpoint_stats_reset)
    for tmp in frames + [adj, degs, de]:
        free_local_checkpoint(tmp)
    return result
