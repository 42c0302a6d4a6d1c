"""HITS (hubs & authorities) — link-analysis beyond the reference's program set.

The reference ships PageRank / SSSP / Recommendations as its example
programs (reference: example/PageRank.java, example/ShortestPaths.java,
example/Recommendations.java); HITS is the other classic link-graph
ranking (Kleinberg 1999) and drops straight onto the same machinery:
per-iteration message sends over the edge table with algebraic sum
combine, plus a global L2 normalization — the reference's accumulator
pattern (util/Accumulators.java) expressed as a 1-row Spark agg.

Semantics (standard, deterministic):

- every vertex starts with ``hub = 1.0``;
- iteration ``i``:  ``araw(v) = Σ_{u→v} hub_{i-1}(u)`` then
  ``hraw(u) = Σ_{u→v} araw(v)``;
- because a global scale factor on the input of either half-step only
  rescales its raw output, per-half-step normalization algebraically
  reduces to ``auth = araw / ‖araw‖₂`` and ``hub = hraw / ‖hraw‖₂``
  (the intermediate norm cancels) — one normalization per vector per
  iteration, which is what the chained-CTE oracle replays;
- duplicate edges send duplicate messages and self-loops deliver to
  self, mirroring the engine's PageRank message semantics;
- vertices with no in-edges (resp. out-edges) hold ``auth = 0``
  (``hub = 0``);
- halt when the L1 change ``Σ|auth_i − auth_{i-1}| + Σ|hub_i − hub_{i-1}|``
  drops below ``tol``, or after ``max_iters``.

Physical plan (the one you'd want at 10^12 edges): the edge table is
persisted TWICE, pre-partitioned on ``src`` and on ``dst`` — each
iteration runs exactly two E-bounded message shuffles (auth combine by
``dst``, hub combine by ``src``), with the persisted edge side streamed
un-exchanged through a SHUFFLE_HASH join against the V-sized state
(exactly pagerank.py's shuffle-strategy economics, doubled because HITS
is a two-direction algorithm). Norms and the halt delta are 1-row aggs
over V-sized checkpointed frames — the only driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import (
    decode_state,
    partition_by,
    prepare_encoding,
    require_columns,
)
from duwamish_spark.pregel import (
    PregelResult,
    combine_messages,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def hits(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    tol: float = 1e-6,
    max_iters: int = 50,
    num_partitions: int | None = None,
    salt: int = 0,
    encode: bool = True,
    partitioner=None,
) -> PregelResult:
    """Run HITS to L1 convergence. Result state: (id, auth, hub).

    ``salt`` splits hot aggregation keys across reducer sub-keys in both
    message combines (same knob and economics as pagerank/CC — see
    pregel.combine_messages).
    """
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    mapping = None
    verts, e = vertices, edges
    if encode:
        mapping, verts, e = prepare_encoding(
            spark, vertices, edges, num_partitions
        )

    e = e.select("src", "dst")
    e_src, e_dst = e, e
    if num_partitions:
        e_src = partition_by(e, num_partitions, "src", partitioner)
        e_dst = partition_by(e, num_partitions, "dst", partitioner)
    e_src = e_src.persist(StorageLevel.MEMORY_AND_DISK)
    e_dst = e_dst.persist(StorageLevel.MEMORY_AND_DISK)
    e_src.count()
    e_dst.count()

    state = verts.select(
        "id", F.lit(0.0).alias("auth"), F.lit(1.0).alias("hub")
    ).transform(local_checkpoint_stats_reset)
    metrics_hist: list[dict] = []
    halted = False
    iters = 0
    try:
        for i in range(1, max_iters + 1):
            # auth half-step: sum hubs over in-edges (E-shuffle by dst)
            amsgs = state.hint("shuffle_hash").join(
                e_src, state["id"] == e_src["src"]
            ).select("dst", F.col("hub").alias("m"))
            araw = combine_messages(
                amsgs, [("araw", "m", "sum")], key="dst", salt=salt
            ).withColumnRenamed("dst", "id").transform(local_checkpoint_stats_reset)

            # hub half-step: sum raw auths over out-edges (E-shuffle by src)
            hmsgs = araw.hint("shuffle_hash").join(
                e_dst, araw["id"] == e_dst["dst"]
            ).select("src", F.col("araw").alias("m"))
            hraw = combine_messages(
                hmsgs, [("hraw", "m", "sum")], key="src", salt=salt
            ).withColumnRenamed("src", "id").transform(local_checkpoint_stats_reset)

            # L2 norms as broadcast 1-row aggs INSIDE the state job — no
            # driver round-trip per half-step (the reference's accumulator
            # reduce, kept distributed)
            anorm = araw.agg(
                F.sqrt(F.sum(F.col("araw") * F.col("araw"))).alias("_an")
            )
            hnorm = hraw.agg(
                F.sqrt(F.sum(F.col("hraw") * F.col("hraw"))).alias("_hn")
            )
            auth_e = F.when(
                F.col("_an") > 0.0, F.coalesce("araw", F.lit(0.0)) / F.col("_an")
            ).otherwise(F.lit(0.0))
            hub_e = F.when(
                F.col("_hn") > 0.0, F.coalesce("hraw", F.lit(0.0)) / F.col("_hn")
            ).otherwise(F.lit(0.0))
            prev = state
            obs = Observation()
            new_state = (
                prev.join(araw, "id", "left")
                .join(hraw, "id", "left")
                .crossJoin(F.broadcast(anorm))
                .crossJoin(F.broadcast(hnorm))
                .select(
                    "id",
                    auth_e.alias("auth"),
                    hub_e.alias("hub"),
                    (
                        F.abs(auth_e - prev["auth"])
                        + F.abs(hub_e - prev["hub"])
                    ).alias("_delta"),
                    F.col("_an"),
                    F.col("_hn"),
                )
                # metrics ride the materializing job (pregel.py pattern) —
                # no separate aggregation job per iteration; projecting the
                # transient columns away BEFORE the checkpoint keeps the
                # state a bare (freeable) LogicalRDD with 3 columns
                .observe(
                    obs,
                    F.sum("_delta").alias("d"),
                    F.first("_an").alias("an"),
                    F.first("_hn").alias("hn"),
                )
                .select("id", "auth", "hub")
                .transform(local_checkpoint_stats_reset)
            )
            mrow = dict(obs.get)
            delta = float(mrow["d"] or 0.0)
            an, hn = float(mrow["an"] or 0.0), float(mrow["hn"] or 0.0)
            # keep the BARE checkpointed frame as state (a .drop() wrapper
            # would make next iteration's free_local_checkpoint(prev) a
            # silent no-op and leak every superstep's blocks)
            state = new_state
            for tmp in (prev, araw, hraw):
                free_local_checkpoint(tmp)
            iters = i
            metrics_hist.append(
                {"superstep": i, "delta": delta, "auth_norm": an, "hub_norm": hn}
            )
            if delta < tol:
                halted = True
                break

        if mapping is not None:
            state = decode_state(state, mapping, ("id",))
        return PregelResult(
            state=state,
            supersteps=iters,
            metrics=metrics_hist,
            halted=halted,
            run_id="hits",
        )
    finally:
        e_src.unpersist()
        e_dst.unpersist()
