"""Synchronous label propagation with deterministic tie-breaks.

Not in the reference's program set; required by the north rule and built
from the same compute/sendMessage/voteToHalt contract
(reference: model/Vertex.java:23-24, Context.java:50-60). Semantics pinned
for the exact-equality gate (SURVEY.md §2.4):

- state = label, init = own id;
- each round every vertex sends its label to all undirected neighbors;
- combine = **mode** of incoming labels, ties broken by the smallest label
  (lexicographic, matching the id comparator
  reference: util/Comparators.java:26-33);
- a vertex with no neighbors keeps its label;
- synchronous updates, fixed round cap (sync LP can 2-cycle, so the cap is
  part of the definition), early-exit when no label changes.

Mode has no built-in partial aggregate, so it runs as the explicit
two-stage form: ``groupBy(dst, label).count`` (algebraic — map-side partial
combine applies) → per-dst argmax via ``min_by(label, struct(-count,
label))``. Hub skew is absorbed by the first stage: each map task emits at
most one row per (dst, label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import symmetrize
from duwamish_spark.pregel import Pregel, PregelResult


def _lp_step(state: DataFrame, edges_sym: DataFrame) -> DataFrame:
    msgs = state.join(edges_sym, state["id"] == edges_sym["src"]).select(
        "dst", F.col("label").alias("m")
    )
    counts = msgs.groupBy("dst", "m").agg(F.count(F.lit(1)).alias("cnt"))
    mode = counts.groupBy("dst").agg(
        F.min_by("m", F.struct((-F.col("cnt")).alias("nc"), F.col("m"))).alias("mlabel"),
        F.sum("cnt").alias("mcnt"),
    ).withColumnRenamed("dst", "id")
    return state.join(mode, "id", "left").select(
        "id",
        F.coalesce("mlabel", "label").alias("label"),
        F.when(F.coalesce("mlabel", "label") != F.col("label"), 1).otherwise(0).alias("_changed"),
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    )


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
    resume: bool = False,
) -> PregelResult:
    """Result state: (id, label) after ≤ max_supersteps synchronous rounds."""
    edges_sym = symmetrize(edges)
    if num_partitions:
        edges_sym = edges_sym.repartition(num_partitions, "src")
    edges_sym = edges_sym.persist(StorageLevel.MEMORY_AND_DISK)
    edges_sym.count()

    init = vertices.select("id", F.col("id").alias("label"))
    if num_partitions:
        init = init.repartition(num_partitions, "id")

    metrics = {
        "changed": F.sum("_changed"),
        "message_count": F.sum("_msgs"),
        "distinct_labels": F.countDistinct("label"),
    }
    runner = Pregel(
        spark,
        step=lambda st, s: _lp_step(st, edges_sym),
        metrics_exprs=metrics,
        halt=lambda m, s: (m["changed"] or 0) == 0,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        reliable_interval=reliable_interval,
        max_supersteps=max_supersteps,
    )
    try:
        return runner.run(init, resume=resume)
    finally:
        edges_sym.unpersist()
