"""Connected components via hash-min label exchange.

The reference ships the *pattern* as single-source shortest path — a
min-combine relaxation with vote-to-halt
(reference: example/ShortestPath.java:32-122, min at ShortestPath.java:41-46,
halt via util/DefaultHaltDecider.java:25-29). CC is structurally the same
program (SURVEY.md §2.4): state = label (init = own id), message = my label
to all neighbors over the undirected adjacency, combine = min, halt when no
label changed.

Labels are vertex ids; "min" follows the id ordering, matching the
reference's id comparator (reference: util/Comparators.java:26-33). With
``encode=True`` ids run internally as order-preserving dense longs
(graph.encode_vertices), so min-label results are identical after decode —
the exact-equality gate holds.

Scale notes:
- only vertices whose label changed last round send messages (the
  frontier) — the Pregel analog of vote-to-halt putting quiet vertices to
  sleep; message volume decays geometrically after the first rounds.
- ``broadcast`` strategy (V ≤ broadcast_max_vertices): edges persisted
  dst-partitioned, frontier broadcast per round, min-combine
  partition-local — zero message shuffle. ``shuffle`` is the 10^12-scale
  path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import decode_state, prepare_encoding, symmetrize
from duwamish_spark.pregel import Pregel, PregelResult, combine_messages


def _cc_update(state: DataFrame, mins: DataFrame) -> DataFrame:
    return state.join(mins.hint("shuffle_hash"), "id", "left").select(
        "id",
        F.least("label", F.coalesce("mlabel", "label")).alias("label"),
        F.when(
            F.least("label", F.coalesce("mlabel", "label")) != F.col("label"), 1
        )
        .otherwise(0)
        .alias("_changed"),
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    )


def _cc_step(state: DataFrame, edges_sym: DataFrame, salt: int = 0) -> DataFrame:
    frontier = state.where(F.col("_changed") == 1)
    msgs = frontier.hint("shuffle_hash").join(
        edges_sym, frontier["id"] == edges_sym["src"]
    ).select("dst", F.col("label").alias("m"))
    mins = combine_messages(
        msgs, [("mlabel", "m", "min"), ("mcnt", "m", "count")], key="dst", salt=salt
    ).withColumnRenamed("dst", "id")
    return _cc_update(state, mins)


def _cc_step_broadcast(state: DataFrame, edges_sym: DataFrame) -> DataFrame:
    frontier = state.where(F.col("_changed") == 1).select("id", "label")
    msgs = edges_sym.join(
        F.broadcast(frontier), frontier["id"] == edges_sym["src"]
    ).select("dst", F.col("label").alias("m"))
    mins = msgs.groupBy("dst").agg(
        F.min("m").alias("mlabel"), F.count("m").alias("mcnt")
    ).withColumnRenamed("dst", "id")
    return _cc_update(state, mins)


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
    halt_interval: int = 1,
    strategy: str = "auto",
    encode: bool = True,
    broadcast_max_vertices: int = 5_000_000,
    resume: bool = False,
) -> PregelResult:
    """Result state: (id, label) where label = min vertex id in the component."""
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

    init = verts.select(
        "id", F.col("id").alias("label"), F.lit(1).alias("_changed"), F.lit(0).alias("_msgs")
    )
    if num_partitions:
        init = init.repartition(num_partitions, "id")

    metrics = {
        "changed": F.sum("_changed"),
        "message_count": F.sum("_msgs"),
        "component_min": F.min("label"),
    }
    if use_broadcast:
        step = lambda st, s: _cc_step_broadcast(st, edges_sym)  # noqa: E731
    else:
        step = lambda st, s: _cc_step(st, edges_sym, salt)  # noqa: E731

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
