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


def _brandes_state(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int,
    *,
    num_partitions: int | None = None,
    partitioner=None,
) -> tuple[DataFrame, DataFrame]:
    """Shared Brandes machinery: forward BFS with exact BIGINT sigma,
    then the backward dependency accumulation. Returns ``(cur, de)`` —
    ``cur`` = the finished (s, v, dist, sigma, delta) relation, ``de``
    the distinct simple edge set — both localCheckpointed; the CALLER
    frees both. The vertex and edge betweenness variants differ only in
    the final aggregation over this state."""

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

    return cur, de


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
    cur, de = _brandes_state(
        spark,
        edges,
        sources,
        max_depth,
        num_partitions=num_partitions,
        partitioner=partitioner,
    )
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


def edge_betweenness_sampled(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int,
    *,
    num_partitions: int | None = None,
    partitioner=None,
) -> DataFrame:
    """EDGE betweenness over the directed simple graph: one row
    ``(src, dst, betweenness)`` per distinct non-loop arc —
    Σ_s σ(s,v)·(1 + δ(s,w))/σ(s,w) over sampled sources s and shortest-
    path-DAG arcs (v,w) (dist(s,w) = dist(s,v)+1), paths bounded at
    ``max_depth`` hops (Brandes 2001 §4's edge variant of the
    dependency recursion). Edges on no sampled shortest path score 0.

    Cost: IDENTICAL forward+backward passes as the vertex variant
    (shared ``_brandes_state``), plus ONE post-pass — two keyed joins of
    the finished state into the edge set and an edge-keyed sum. No
    per-level edge accumulation is needed because δ(s,w) is final once
    its level is processed, so every DAG arc's dependency is computable
    from the finished state. The standard use: rank cross-module import
    arcs (bridge edges score high, intra-cluster arcs low) — the edge
    signal behind Girvan-Newman community splitting.

    Reference scope: duwamish has no centrality operator; this extends
    the engine's Brandes machinery (betweenness.py) to the edge
    relation. The caller owns the returned E-row localCheckpoint.
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    require_columns(edges, ("src", "dst"), "edges")
    require_columns(sources, ("id",), "sources")
    cur, de = _brandes_state(
        spark,
        edges,
        sources,
        max_depth,
        num_partitions=num_partitions,
        partitioner=partitioner,
    )
    vrows = cur.select(
        F.col("s").alias("vs"),
        F.col("v").alias("vv"),
        F.col("dist").alias("vdist"),
        F.col("sigma").alias("vsigma"),
    )
    wrows = cur.select(
        F.col("s").alias("ws"),
        F.col("v").alias("wv"),
        F.col("dist").alias("wdist"),
        F.col("sigma").alias("wsigma"),
        F.col("delta").alias("wdelta"),
    )
    dep = (
        vrows.join(de, vrows["vv"] == de["src"])
        .join(
            wrows,
            (F.col("ws") == F.col("vs"))
            & (F.col("wv") == de["dst"])
            & (F.col("wdist") == F.col("vdist") + 1),
        )
        .groupBy("src", "dst")
        .agg(
            F.sum(
                F.col("vsigma") * (F.lit(1.0) + F.col("wdelta")) / F.col("wsigma")
            ).alias("_eb")
        )
    )
    out = (
        de.join(dep, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.round(F.coalesce("_eb", F.lit(0.0)), 6).alias("betweenness"),
        )
        .transform(local_checkpoint_stats_reset)
    )
    free_local_checkpoint(cur)
    free_local_checkpoint(de)
    return out
