"""Bow-tie decomposition — the macroscopic structure of a directed web graph.

Broder et al. 2000 ("Graph structure in the web") showed that a crawl's
link graph decomposes around its largest strongly connected component
into a bow tie: a CORE (the giant SCC), an IN set that can reach the
core, an OUT set the core can reach, TUBES (IN→OUT paths bypassing the
core), TENDRILS hanging off IN or leading into OUT, and DISCONNECTED
debris. The decomposition is the standard first map of any new crawl —
it tells you what fraction of the graph a crawler seeded in IN can ever
see, and where rank mass can drain (OUT has no path back).

The reference ships no such program — this composes the engine's own
primitives: ``strongly_connected_components`` (scc.py) for the core and
multi-source BFS closures (``reachable_set``) for every region boundary.

Region contract (a PARTITION of the vertex set — every vertex gets
exactly one label; precedence is the CASE order below, matching the
DuckDB oracle clause for clause):

- ``core``        — member of the largest SCC (ties between equal-sized
                    SCCs broken by smallest scc_id, so the choice is
                    deterministic).
- ``in``          — reaches the core, not in it.
- ``out``         — reachable from the core, not in it.
- ``tube``        — reachable from IN and reaches OUT, touching neither
                    the core nor IN/OUT (an IN→OUT bypass). Paths from IN
                    to a non-OUT vertex can never pass through the core
                    (everything after the core is core∪OUT), so plain
                    reachability is the correct test.
- ``tendril_in``  — reachable from IN, does not reach OUT.
- ``tendril_out`` — reaches OUT, not reachable from IN.
- ``other_wcc``   — none of the above but weakly connected to the core
                    (satellites attached to tendrils; Broder's paper
                    folds these into TENDRILS, later taxonomies split
                    them out — we keep them distinct and exactly defined).
- ``disconnected``— not in the core's weakly connected component.

Scale shape: one SCC run + six BFS closures, each round an E⋈frontier
hash join (frontier shrinks monotonically; the reached-set rewrite per
round is V-bounded — the same state-rotation cost model as a Pregel
superstep). No step is ever quadratic; the whole decomposition is
O(diameter) rounds of E-bounded work, which is exactly how you'd map a
10^12-edge crawl on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import require_columns, symmetrize
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def reachable_set(
    spark: SparkSession,
    seeds: DataFrame,
    edges: DataFrame,
    *,
    max_rounds: int = 10_000,
) -> tuple[DataFrame, int, bool]:
    """Multi-source BFS closure: every vertex reachable from ``seeds``
    along directed ``edges`` (src → dst), INCLUDING the seeds.

    Returns ``(reached(id), rounds, completed)`` — ``completed=False``
    iff ``max_rounds`` elapsed with the frontier still non-empty (the
    returned set is then a correct lower bound: everything within
    ``max_rounds`` hops).

    Per round: frontier ⋈ edges (E-bounded, shrinking), DISTINCT on the
    next frontier, one anti-join against the reached set, and a V-bounded
    rewrite of the reached set (localCheckpoint'ed so lineage stays flat;
    the previous generation's blocks are freed immediately — peak storage
    is one reached set + one frontier).
    """
    require_columns(seeds, ("id",), "seeds")
    require_columns(edges, ("src", "dst"), "edges")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .transform(local_checkpoint_stats_reset)
    )
    reached = seeds.select("id").distinct().transform(local_checkpoint_stats_reset)
    frontier = reached
    rounds = 0
    completed = False
    try:
        for _ in range(max_rounds):
            nxt = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(reached, "id", "left_anti")
                .transform(local_checkpoint_stats_reset)
            )
            if frontier is not reached:
                free_local_checkpoint(frontier)
            if nxt.isEmpty():
                free_local_checkpoint(nxt)
                completed = True
                break
            rounds += 1
            # nxt is disjoint from reached (anti-join) and each side is
            # distinct, so unionAll preserves set semantics
            new_reached = reached.unionAll(nxt).transform(local_checkpoint_stats_reset)
            free_local_checkpoint(reached)
            reached = new_reached
            frontier = nxt
    finally:
        free_local_checkpoint(e)
    return reached, rounds, completed


def bowtie_decomposition(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_rounds: int = 200,
    num_partitions: int | None = None,
) -> PregelResult:
    """Classify every vertex into its bow-tie region (module docstring).

    Result state: ``(id, region)`` — one row per vertex, ``region`` one of
    core / in / out / tube / tendril_in / tendril_out / other_wcc /
    disconnected. ``supersteps`` counts every E-bounded iteration (SCC
    rounds + all BFS rounds); ``halted=False`` iff any phase hit its
    round budget (the labels are then hop-bounded approximations).

    ``metrics`` carries one final row with per-region counts — the
    bow-tie picture in one dict, computed by the same job that
    materializes the state.
    """
    from duwamish_spark.algorithms.scc import strongly_connected_components

    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    scc_res = strongly_connected_components(
        spark, vertices, edges,
        max_rounds=max_rounds, num_partitions=num_partitions,
    )
    scc = scc_res.state
    top = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("scc_id"))
        .limit(1)
        .collect()
    )
    if not top:
        # no vertices at all: empty state with the right schema
        empty = vertices.select("id", F.lit("disconnected").alias("region"))
        return PregelResult(state=empty, supersteps=scc_res.supersteps,
                            metrics=[], halted=scc_res.halted)
    core_lbl = top[0]["scc_id"]
    core = scc.where(F.col("scc_id") == F.lit(core_lbl)).select("id")
    core = core.transform(local_checkpoint_stats_reset)

    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd, r1, c1 = reachable_set(spark, core, edges, max_rounds=max_rounds)
    bwd, r2, c2 = reachable_set(spark, core, rev, max_rounds=max_rounds)
    ins = bwd.join(core, "id", "left_anti").transform(local_checkpoint_stats_reset)
    outs = fwd.join(core, "id", "left_anti").transform(local_checkpoint_stats_reset)
    from_in, r3, c3 = reachable_set(spark, ins, edges, max_rounds=max_rounds)
    to_out, r4, c4 = reachable_set(spark, outs, rev, max_rounds=max_rounds)
    wcc, r5, c5 = reachable_set(
        spark, core, symmetrize(edges), max_rounds=max_rounds
    )

    def _flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("id", F.lit(True).alias(name))

    flags = (
        vertices.select("id")
        .distinct()
        .join(_flag(core, "_core"), "id", "left")
        .join(_flag(bwd, "_bwd"), "id", "left")
        .join(_flag(fwd, "_fwd"), "id", "left")
        .join(_flag(from_in, "_fi"), "id", "left")
        .join(_flag(to_out, "_to"), "id", "left")
        .join(_flag(wcc, "_w"), "id", "left")
    )
    region = (
        F.when(F.col("_core"), F.lit("core"))
        .when(F.col("_bwd"), F.lit("in"))
        .when(F.col("_fwd"), F.lit("out"))
        .when(F.col("_fi") & F.col("_to"), F.lit("tube"))
        .when(F.col("_fi"), F.lit("tendril_in"))
        .when(F.col("_to"), F.lit("tendril_out"))
        .when(F.col("_w"), F.lit("other_wcc"))
        .otherwise(F.lit("disconnected"))
    )
    state = flags.select("id", region.alias("region")).transform(local_checkpoint_stats_reset)
    counts = {
        r["region"]: r["n"]
        for r in state.groupBy("region").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for tmp in (core, fwd, bwd, ins, outs, from_in, to_out, wcc):
        free_local_checkpoint(tmp)
    total_rounds = scc_res.supersteps + r1 + r2 + r3 + r4 + r5
    halted = scc_res.halted and all((c1, c2, c3, c4, c5))
    return PregelResult(
        state=state,
        supersteps=total_rounds,
        metrics=[{"superstep": total_rounds, **{f"n_{k}": v for k, v in sorted(counts.items())}}],
        halted=halted,
    )
