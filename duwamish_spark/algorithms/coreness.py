"""Full k-core (coreness) decomposition via distributed h-index
iteration (Montresor, De Pellegrini & Miorandi 2011).

``k_core(k)`` answers one membership question; the decomposition labels
EVERY vertex with its core number (the largest k whose k-core contains
it) — degeneracy ordering, shell structure, and the standard
"importance" signal on web/import graphs. The sequential algorithm
(Batagelj-Zaversnik peel) is inherently serial; the scalable
formulation is the locality-based fixpoint: start each vertex at its
degree and repeatedly set

    c(v)  <-  H({ c(u) : u ∈ N(v) })

where H is the h-index (the largest h such that at least h neighbors
have value >= h). Estimates are monotone non-increasing, always upper
bounds, and converge exactly to the core numbers (typically in a few
dozen rounds even on billion-edge graphs — the paper's headline result).

Engine formulation: one round = join estimates to the symmetrized
simple adjacency (E-bounded), then a per-vertex h-index as a window +
aggregation: rank each neighborhood's values descending and take
``max(min(rank, value))`` — all integers, whole-stage codegen, no UDFs.
The (Σc, changed-count) signature riding the materializing job detects
the fixpoint. A fixed-round prefix is exactly replayable in SQL (driver
gate ``coreness_round3``); convergence is brute-force-tested in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duwamish_spark.graph import canonical_edges, partition_by, require_columns
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def coreness(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_rounds: int = 100,
    num_partitions: int | None = None,
    partitioner=None,
) -> PregelResult:
    """Core number per vertex on the undirected simple graph: state
    ``(id, coreness)``. Vertices with no simple edges have coreness 0.

    ``max_rounds`` caps the h-index iteration (state is then still a
    valid UPPER BOUND on every core number — the fixed-round semantics
    the driver oracle replays); ``halted`` reports whether the exact
    fixpoint was reached.
    """
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    c = canonical_edges(edges)
    adj = c.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        c.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    if num_partitions:
        adj = partition_by(adj, num_partitions, "u", partitioner)
    adj = adj.transform(local_checkpoint_stats_reset)

    est = (
        adj.groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(local_checkpoint_stats_reset)
    )

    metrics_hist: list[dict] = []
    halted = False
    rounds = 0
    sig = None
    w = Window.partitionBy("nid").orderBy(F.col("cv").desc(), F.col("v").asc())
    for t in range(1, max_rounds + 1):
        vals = adj.join(est, adj["v"] == est["id"]).select(
            adj["u"].alias("nid"), "v", F.col("c").alias("cv")
        )
        obs = Observation()
        nxt = (
            vals.withColumn("rn", F.row_number().over(w))
            .groupBy(F.col("nid").alias("id"))
            .agg(F.max(F.least(F.col("rn"), F.col("cv"))).alias("c"))
            .observe(obs, F.sum("c").alias("csum"))
            .transform(local_checkpoint_stats_reset)
        )
        csum = int(obs.get["csum"])
        rounds = t
        metrics_hist.append({"superstep": t, "coreness_sum": csum})
        free_local_checkpoint(est)
        est = nxt
        if sig == csum:
            # monotone non-increasing + unchanged sum == fixpoint
            halted = True
            break
        sig = csum
    out = (
        vertices.join(est, "id", "left")
        .select("id", F.coalesce("c", F.lit(0)).cast("long").alias("coreness"))
        .transform(local_checkpoint_stats_reset)
    )
    free_local_checkpoint(est)
    free_local_checkpoint(adj)
    return PregelResult(
        state=out,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=halted,
        run_id="coreness",
    )
