"""PageRank with reference-exact semantics (reference: example/PageRank.java:37-126).

Semantics pinned to the reference:

- **unnormalized** update ``rank = (1-d) + d * Σ incoming`` with d = 0.85
  (reference: PageRank.java:48-54) — ranks sum ≈ V, not 1;
- every vertex starts at rank **1.0** (reference: PageRank.java:115);
- each out-edge carries ``rank / out_degree``; duplicate edges send
  duplicate messages, self-loops deliver to self
  (reference: PageRank.java:57-63);
- **dangling vertices send nothing — their mass is dropped, not
  redistributed** (the reference's send loop simply never runs,
  PageRank.java:58-63);
- halt on the L1 residual Σ|rank_s − rank_{s−1}| — the exact quantity the
  reference accumulates as ``PageRankChange`` (PageRank.java:65,102); the
  north rule sets the threshold at 1e-6;
- hard cap 200 supersteps (reference: PageRank.java:41,87,124).

Plan shape per superstep (two small V-row shuffles + ONE E-row shuffle,
which *is* the message exchange):

    ranks ⋈ edges_w (src)  →  select(dst, rank·w)      [messages]
    groupBy(dst).sum                                     [combine]
    vertices ⟕ sums (id)   →  (1-d) + d·coalesce(sum,0)  [update]

``edges_w`` (edge + 1/out_degree weight) is computed once and persisted
pre-partitioned on ``src`` so the per-superstep join reuses its exchange;
the reference instead re-counts degree per superstep by materializing the
edge iterator (PageRank.java:58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import out_degrees
from duwamish_spark.pregel import Pregel, PregelResult, combine_messages


def _edges_weighted(vertices: DataFrame, edges: DataFrame, num_partitions: int | None) -> DataFrame:
    deg = out_degrees(vertices, edges)
    ew = edges.join(
        deg.withColumnRenamed("id", "src"), "src"
    ).select("src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("w"))
    if num_partitions:
        ew = ew.repartition(num_partitions, "src")
    return ew


def pagerank_step(
    state: DataFrame, edges_w: DataFrame, damping: float = 0.85, salt: int = 0
) -> DataFrame:
    """One superstep: state(id, rank) → state(id, rank, _delta, _msgs)."""
    msgs = state.join(edges_w, state["id"] == edges_w["src"]).select(
        "dst", (F.col("rank") * F.col("w")).alias("m")
    )
    sums = combine_messages(
        msgs, [("msum", "m", "sum"), ("mcnt", "m", "count")], key="dst", salt=salt
    ).withColumnRenamed("dst", "id")
    return state.join(sums, "id", "left").select(
        "id",
        (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("msum", F.lit(0.0))).alias(
            "rank"
        ),
        F.abs(
            F.lit(1.0 - damping)
            + F.lit(damping) * F.coalesce("msum", F.lit(0.0))
            - F.col("rank")
        ).alias("_delta"),
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    )


def pagerank(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_supersteps: int = 200,
    checkpoint_dir: str | None = None,
    run_id: str = "pagerank",
    reliable_interval: int = 10,
    num_partitions: int | None = None,
    salt: int = 0,
    resume: bool = False,
) -> PregelResult:
    """Run PageRank to L1-residual convergence. Result state: (id, rank)."""
    edges_w = _edges_weighted(vertices, edges, num_partitions).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    edges_w.count()  # materialize once; reused every superstep

    init = vertices.select("id", F.lit(1.0).alias("rank"))
    if num_partitions:
        init = init.repartition(num_partitions, "id")

    metrics = {
        # reference accumulators: PageRankChange / MaxPageRank / MinPageRank
        # (PageRank.java:102-104) + built-in message count
        "residual": F.sum("_delta"),
        "max_rank": F.max("rank"),
        "min_rank": F.min("rank"),
        "message_count": F.sum("_msgs"),
    }

    runner = Pregel(
        spark,
        step=lambda st, s: pagerank_step(st, edges_w, damping, salt),
        metrics_exprs=metrics,
        halt=lambda m, s: m["residual"] < tol,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        reliable_interval=reliable_interval,
        max_supersteps=max_supersteps,
    )
    try:
        return runner.run(init, resume=resume)
    finally:
        edges_w.unpersist()
