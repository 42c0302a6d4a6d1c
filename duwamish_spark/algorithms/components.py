"""Connected components via hash-min label exchange.

The reference ships the *pattern* as single-source shortest path — a
min-combine relaxation with vote-to-halt
(reference: example/ShortestPath.java:32-122, min at ShortestPath.java:41-46,
halt via util/DefaultHaltDecider.java:25-29). CC is structurally the same
program (SURVEY.md §2.4): state = label (init = own id), message = my label
to all neighbors over the undirected adjacency, combine = min, halt when no
label changed.

Labels are vertex-id strings; "min" is lexicographic string order, matching
the reference's id comparator (reference: util/Comparators.java:26-33) —
deterministic, so the exact-equality gate holds.

Scale note: only vertices whose label changed last round send messages (the
frontier) — the Pregel analog of vote-to-halt putting quiet vertices to
sleep. Message volume decays geometrically after the first few rounds
instead of staying at |E| per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import symmetrize
from duwamish_spark.pregel import Pregel, PregelResult, combine_messages


def _cc_step(state: DataFrame, edges_sym: DataFrame, salt: int = 0) -> DataFrame:
    frontier = state.where(F.col("_changed") == 1)
    msgs = frontier.join(edges_sym, frontier["id"] == edges_sym["src"]).select(
        "dst", F.col("label").alias("m")
    )
    mins = combine_messages(
        msgs, [("mlabel", "m", "min"), ("mcnt", "m", "count")], key="dst", salt=salt
    ).withColumnRenamed("dst", "id")
    return state.join(mins, "id", "left").select(
        "id",
        F.least("label", F.coalesce("mlabel", "label")).alias("label"),
        F.when(
            F.least("label", F.coalesce("mlabel", "label")) != F.col("label"), 1
        )
        .otherwise(0)
        .alias("_changed"),
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    )


def connected_components(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_supersteps: int = 200,
    checkpoint_dir: str | None = None,
    run_id: str = "cc",
    reliable_interval: int = 10,
    num_partitions: int | None = None,
    salt: int = 0,
    resume: bool = False,
) -> PregelResult:
    """Result state: (id, label) where label = min vertex id in the component."""
    edges_sym = symmetrize(edges)
    if num_partitions:
        edges_sym = edges_sym.repartition(num_partitions, "src")
    edges_sym = edges_sym.persist(StorageLevel.MEMORY_AND_DISK)
    edges_sym.count()

    init = vertices.select(
        "id", F.col("id").alias("label"), F.lit(1).alias("_changed"), F.lit(0).alias("_msgs")
    )
    if num_partitions:
        init = init.repartition(num_partitions, "id")

    metrics = {
        "changed": F.sum("_changed"),
        "message_count": F.sum("_msgs"),
        "component_min": F.min("label"),
    }
    runner = Pregel(
        spark,
        step=lambda st, s: _cc_step(st, edges_sym, salt),
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
