"""Densest subgraph by greedy degree peeling — the MapReduce
(2+2ε)-approximation (Bahmani, Kumar, Vassilvitskii, VLDB'12;
sequential 2-approx: Charikar 2000).

Density here is the standard ρ(S) = |E(S)| / |S| on the undirected
simple graph. The densest subgraph is the canonical "find the spam
farm / link clique / hot community" primitive on a web-scale link
graph — and the exact solution (flow-based) is hopeless at 10^12
edges, which is exactly why the peeling approximation is the standard.

One round = one E-bounded degree aggregation + one broadcast-able
anti-join (the kcore.py peel shape, same storage discipline:
localCheckpoint per round, previous round freed immediately):

- compute degrees over the alive symmetrized edge set;
- ρ = |E|/|V| on the alive subgraph; drop EVERY vertex with
  deg ≤ (1+ε)·(2|E|/|V|) simultaneously (deterministic — no
  tie-break order);
- remember the round whose alive subgraph had the highest ρ; its
  (id, degree) snapshot is the answer, guaranteed ≥ ρ*/(2(1+ε)).

Each round removes at least an ε/(1+ε) fraction of vertices, so there
are at most O(log n / ε) rounds — the constant-round-count property
that makes this THE scalable formulation (vs one-vertex-at-a-time
Charikar peeling, which is inherently sequential with V rounds).

Float discipline: degrees/|V|/|E| are exact integers; the only float
op per round is one threshold product, computed in the same order in
Spark and the DuckDB oracle, so the fixed-round driver gate
(`densest_round2`) replays bit-for-bit. Full best-round semantics are
pytest-gated against a brute-force replay plus the 2(1+ε) guarantee
against exhaustive-enumeration optima on small graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import partition_by, require_columns, symmetrize
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def densest_subgraph(
    spark: SparkSession,
    edges: DataFrame,
    *,
    epsilon: float = 0.1,
    max_rounds: int = 100,
    return_best: bool = True,
    num_partitions: int | None = None,
    partitioner=None,
) -> PregelResult:
    """Result state: (id, degree) of the best-density alive subgraph
    (``return_best=True``) or of the subgraph alive after the last
    executed round (``return_best=False`` — the fixed-round,
    SQL-replayable variant). Degrees are within the returned subgraph.

    Metrics per round: ``vertices``, ``edges``, ``density``,
    ``dropped``. ``last["best_density"]`` / ``last["best_round"]``
    name the winner. ``halted=True`` iff peeling emptied the graph (or
    dropped nobody — only possible at ε=0) within ``max_rounds``.
    """
    if epsilon < 0:
        raise ValueError(f"epsilon must be >= 0, got {epsilon}")
    require_columns(edges, ("src", "dst"), "edges")

    alive = symmetrize(edges)  # both directions of distinct simple edges
    if num_partitions:
        alive = partition_by(alive, num_partitions, "src", partitioner)
    alive = alive.transform(local_checkpoint_stats_reset)

    metrics_hist: list[dict] = []
    best: DataFrame | None = None
    best_density = -1.0
    best_round = 0
    halted = False
    rounds = 0
    factor = 1.0 + epsilon

    for i in range(1, max_rounds + 1):
        deg = (
            alive.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .transform(local_checkpoint_stats_reset)
        )
        tot = deg.agg(
            F.count(F.lit(1)).alias("v"), F.sum("degree").alias("e2")
        ).collect()[0]
        n_v, e2 = int(tot["v"] or 0), int(tot["e2"] or 0)
        if n_v == 0:
            free_local_checkpoint(deg)
            halted = True
            break
        rounds = i
        density = (e2 / 2.0) / float(n_v)
        if return_best and density > best_density:
            if best is not None:
                free_local_checkpoint(best)
            best, best_density, best_round = deg, density, i
        elif not return_best:
            best_density = max(best_density, density)
            if best_density == density:
                best_round = i
        # avg degree on the symmetrized relation is e2/|V|; drop
        # everything at or below (1+eps) times it, all at once
        thr = factor * (float(e2) / float(n_v))
        dropped = deg.where(F.col("degree") <= thr).select("id")
        metrics_hist.append(
            {
                "superstep": i,
                "vertices": n_v,
                "edges": e2 // 2,
                "density": density,
                "dropped": int(dropped.count()),
                "best_density": best_density,
                "best_round": best_round,
            }
        )
        nxt = (
            alive.join(dropped, alive["src"] == dropped["id"], "left_anti")
            .join(dropped, alive["dst"] == dropped["id"], "left_anti")
            .transform(local_checkpoint_stats_reset)
        )
        free_local_checkpoint(alive)
        alive = nxt
        if best is not deg:
            free_local_checkpoint(deg)

    if not halted and rounds == max_rounds:
        # budget exhausted: fall through with whatever is alive
        pass

    if return_best:
        if best is not None:
            state = best
        else:
            # empty edge set / max_rounds=0: materialize the fallback
            # eagerly BEFORE alive's checkpoint blocks are freed below —
            # a lazy plan over a freed localCheckpoint cannot recompute
            state = (
                alive.groupBy(F.col("src").alias("id"))
                .agg(F.count(F.lit(1)).alias("degree"))
                .transform(local_checkpoint_stats_reset)
            )
    else:
        state = (
            alive.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .transform(local_checkpoint_stats_reset)
        )
        if best is not None:
            free_local_checkpoint(best)
    free_local_checkpoint(alive)
    if metrics_hist:
        metrics_hist[-1]["best_density"] = best_density
        metrics_hist[-1]["best_round"] = best_round
    return PregelResult(
        state=state,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=halted,
        run_id="densest",
    )
