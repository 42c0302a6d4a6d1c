"""Sampled betweenness centrality (Brandes 2001, source-sampled and
hop-bounded — the standard scalable approximation).

Exact betweenness is all-pairs shortest paths (O(V·E) even unweighted —
impossible at 10^12 edges). The established scale path (Brandes & Pich
2007) samples a source set S and bounds the path length at H:
contributions of shortest paths FROM the sampled sources of length <= H.
Cost is O(|S|·E·H) — two keyed joins per hop, every intermediate bounded
by |S|·V rows — and the estimate converges to (a scaled) exact
betweenness as |S| grows.

Engine formulation: the forward BFS carries ``(s, v, dist, sigma)``
(sigma = number of shortest s→v paths, an exact BIGINT sum), the
backward pass accumulates Brandes' dependency

    delta(s, v) = sigma(s,v) · Σ_{w: v→w, dist(s,w)=dist(s,v)+1}
                  (1 + delta(s,w)) / sigma(s,w)

level by level (descending). Both passes are pure DataFrame joins +
keyed aggregations — no UDFs — and every float op is a group sum or a
single multiply/divide, so a DuckDB chained CTE replays the whole thing
(driver query ``betweenness_h3``). Self-loops and duplicate edges are
dropped (shortest paths never use either).

Forward rounds always run to exactly ``max_depth`` (empty frontiers are
free no-op joins) so the replay needs no halt constant, and the backward
pass walks max_depth-1 .. 0 unconditionally — SF-independent semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import partition_by, require_columns
from duwamish_spark.pregel import (
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def betweenness_sampled(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int,
    *,
    num_partitions: int | None = None,
    partitioner=None,
) -> DataFrame:
    """(id, betweenness, seed_dist_sum, seeds_reaching) over the directed
    simple graph.

    - ``betweenness``: Σ_s delta(s, id) over the sampled sources, paths
      bounded at ``max_depth`` hops (raw sample sum, round 6 — normalize
      by |S| externally if a rate is wanted);
    - ``seed_dist_sum`` / ``seeds_reaching``: exact BIGINT distance sum
      and count of sources reaching the vertex within the bound (the
      sampled-closeness byproduct — integer, free).

    ``sources`` is a 1-column (id) DataFrame; it must be a subset of the
    vertex ids (rows whose id never appears in the graph contribute
    nothing). The caller owns the returned V-row localCheckpoint (free
    with free_local_checkpoint).
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")
    require_columns(sources, ("id",), "sources")

    de = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if num_partitions:
        de = partition_by(de, num_partitions, "src", partitioner)
    de = de.transform(local_checkpoint_stats_reset)

    # forward: discover (s, v) pairs level by level, sigma = exact
    # shortest-path counts (BIGINT sums)
    state = sources.select(
        F.col("id").alias("s"),
        F.col("id").alias("v"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    ).transform(local_checkpoint_stats_reset)
    frontier = state
    for t in range(1, max_depth + 1):
        msgs = (
            frontier.join(de, frontier["v"] == de["src"])
            .groupBy("s", de["dst"].alias("nv"))
            .agg(F.sum("sigma").alias("nsigma"))
        )
        new = (
            msgs.join(
                state,
                (msgs["s"] == state["s"]) & (msgs["nv"] == state["v"]),
                "left_anti",
            )
            .select(
                "s",
                F.col("nv").alias("v"),
                F.lit(t).alias("dist"),
                F.col("nsigma").alias("sigma"),
            )
            .transform(local_checkpoint_stats_reset)
        )
        nxt = state.unionAll(new).transform(local_checkpoint_stats_reset)
        free_local_checkpoint(state)
        if frontier is not state:
            free_local_checkpoint(frontier)
        state, frontier = nxt, new

    if frontier is not state:
        free_local_checkpoint(frontier)

    # backward: Brandes dependency accumulation, levels descending
    cur = state.withColumn("delta", F.lit(0.0)).transform(local_checkpoint_stats_reset)
    free_local_checkpoint(state)
    for t in range(max_depth - 1, -1, -1):
        wrows = cur.where(F.col("dist") == t + 1)
        contrib = (
            wrows.join(de, de["dst"] == wrows["v"])
            .groupBy("s", de["src"].alias("cv"))
            .agg(
                F.sum(
                    (F.lit(1.0) + F.col("delta")) / F.col("sigma")
                ).alias("contrib")
            )
            # fresh attribute ids: contrib derives from cur, so the join
            # below is a self-join without this re-aliasing
            .select(F.col("s").alias("cs"), "cv", "contrib")
        )
        nxt = (
            cur.join(
                contrib,
                (cur["s"] == contrib["cs"]) & (cur["v"] == contrib["cv"]),
                "left",
            )
            .select(
                cur["s"],
                cur["v"],
                cur["dist"],
                cur["sigma"],
                F.when(
                    cur["dist"] == t,
                    F.col("sigma") * F.coalesce("contrib", F.lit(0.0)),
                )
                .otherwise(cur["delta"])
                .alias("delta"),
            )
            .transform(local_checkpoint_stats_reset)
        )
        free_local_checkpoint(cur)
        cur = nxt

    agg = (
        cur.where(F.col("dist") > 0)
        .groupBy(F.col("v").alias("id"))
        .agg(
            F.sum("delta").alias("_b"),
            F.sum("dist").alias("_ds"),
            F.count(F.lit(1)).alias("_nr"),
        )
    )
    out = (
        vertices.join(agg, "id", "left")
        .select(
            "id",
            F.round(F.coalesce("_b", F.lit(0.0)), 6).alias("betweenness"),
            F.coalesce("_ds", F.lit(0)).cast("long").alias("seed_dist_sum"),
            F.coalesce("_nr", F.lit(0)).cast("long").alias("seeds_reaching"),
        )
        .transform(local_checkpoint_stats_reset)
    )
    free_local_checkpoint(cur)
    free_local_checkpoint(de)
    return out
