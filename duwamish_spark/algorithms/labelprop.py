"""Synchronous label propagation with deterministic tie-breaks.

Not in the reference's program set; required by the north rule and built
from the same compute/sendMessage/voteToHalt contract
(reference: model/Vertex.java:23-24, Context.java:50-60). Semantics pinned
for the exact-equality gate (SURVEY.md §2.4):

- state = label, init = own id;
- each round every vertex sends its label to all undirected neighbors;
- combine = **mode** of incoming labels, ties broken by the smallest label
  (by the id ordering, matching the reference's comparator,
  util/Comparators.java:26-33 — preserved under order-preserving id
  encoding);
- a vertex with no neighbors keeps its label;
- synchronous updates, fixed round cap (sync LP can 2-cycle, so the cap is
  part of the definition), early-exit when no label changes.

Mode has no built-in partial aggregate, so it runs as the explicit
two-stage form: ``groupBy(dst, label).count`` (algebraic — map-side partial
combine applies) → per-dst argmax via ``min_by(label, struct(-count,
label))``. Hub skew is absorbed by the first stage: each map task emits at
most one row per (dst, label). With the ``broadcast`` strategy the first
stage is partition-local on dst-partitioned edges — zero message shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import decode_state, prepare_encoding, symmetrize
from duwamish_spark.pregel import Pregel, PregelResult, combine_messages


def _lp_combine_update(
    state: DataFrame, msgs: DataFrame, salt: int = 0, combine: str = "partial"
) -> DataFrame:
    # stage 1 (count per (dst, label)) through the shared combiner so LP has
    # the same salt / raw-exchange knobs as CC and PageRank: salt splits a
    # hot (dst, label) key — a hub whose neighborhood converged to one
    # label — across reducer sub-keys; combine="raw" exchanges raw messages
    # by the composite key before aggregating (V/P-sized combine maps)
    counts = combine_messages(
        msgs, [("cnt", "m", "count")], key=["dst", "m"], salt=salt,
        pre_shuffle=(combine == "raw"),
    )
    mode = counts.groupBy("dst").agg(
        F.min_by("m", F.struct((-F.col("cnt")).alias("nc"), F.col("m"))).alias("mlabel"),
        F.sum("cnt").alias("mcnt"),
    ).withColumnRenamed("dst", "id")
    return state.join(mode.hint("shuffle_hash"), "id", "left").select(
        "id",
        F.coalesce("mlabel", "label").alias("label"),
        F.when(F.coalesce("mlabel", "label") != F.col("label"), 1).otherwise(0).alias("_changed"),
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    )


def _lp_step(
    state: DataFrame, edges_sym: DataFrame, salt: int = 0, combine: str = "partial"
) -> DataFrame:
    msgs = state.hint("shuffle_hash").join(
        edges_sym, state["id"] == edges_sym["src"]
    ).select("dst", F.col("label").alias("m"))
    return _lp_combine_update(state, msgs, salt, combine)


def _lp_step_broadcast(state: DataFrame, edges_sym: DataFrame) -> DataFrame:
    labels = state.select("id", "label")
    msgs = edges_sym.join(
        F.broadcast(labels), labels["id"] == edges_sym["src"]
    ).select("dst", F.col("label").alias("m"))
    return _lp_combine_update(state, msgs)


def label_propagation(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_supersteps: int = 10,
    checkpoint_dir: str | None = None,
    run_id: str = "lp",
    reliable_interval: int = 5,
    num_partitions: int | None = None,
    halt_interval: int = 1,
    strategy: str = "auto",
    encode: bool = True,
    broadcast_max_vertices: int = 5_000_000,
    resume: bool = False,
    salt: int = 0,
    combine: str = "partial",
) -> PregelResult:
    """Result state: (id, label) after ≤ max_supersteps synchronous rounds.

    ``salt``/``combine`` mirror connected_components/pagerank (shuffle
    strategy only): salt > 1 splits hot (dst, label) count keys across
    reducer sub-keys; combine="raw" exchanges raw messages by the
    composite key before aggregating. Results are knob-invariant
    (tested); measured skew economics in BENCH/skew.json.
    """
    mapping = None
    verts, e = vertices, edges
    if encode:
        mapping, verts, e = prepare_encoding(
            spark, vertices, edges, num_partitions, checkpoint_dir, run_id, resume
        )

    n_verts = verts.count()
    use_broadcast = strategy == "broadcast" or (
        strategy == "auto" and n_verts <= broadcast_max_vertices
    )

    edges_sym = symmetrize(e)
    if num_partitions:
        edges_sym = edges_sym.repartition(
            num_partitions, "dst" if use_broadcast else "src"
        )
    edges_sym = edges_sym.persist(StorageLevel.MEMORY_AND_DISK)
    edges_sym.count()

    init = verts.select("id", F.col("id").alias("label"))
    if num_partitions:
        init = init.repartition(num_partitions, "id")

    metrics = {
        "changed": F.sum("_changed"),
        "message_count": F.sum("_msgs"),
        # exact DISTINCT is not allowed in observed metrics; HLL is fine here
        "distinct_labels": F.approx_count_distinct("label"),
    }
    if use_broadcast:
        # same quadratic-chaining hazard as pagerank's broadcast strategy
        halt_interval = min(halt_interval, 4)
        step = lambda st, s: _lp_step_broadcast(st, edges_sym)  # noqa: E731
    else:
        step = lambda st, s: _lp_step(st, edges_sym, salt, combine)  # noqa: E731

    runner = Pregel(
        spark,
        step=step,
        metrics_exprs=metrics,
        halt=lambda m, s: (m["changed"] or 0) == 0,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        reliable_interval=reliable_interval,
        max_supersteps=max_supersteps,
        halt_interval=halt_interval,
    )
    try:
        res = runner.run(init, resume=resume)
        if mapping is not None:
            res.state = decode_state(res.state, mapping, ("id", "label"))
        return res
    finally:
        edges_sym.unpersist()
