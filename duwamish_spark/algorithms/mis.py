"""Maximal independent set via Luby's algorithm with deterministic hash
priorities — the classic BSP symmetry-breaking primitive (Luby 1986),
the building block for distributed graph coloring / scheduling /
landmark selection on a link graph.

Round structure (over the symmetrized simple graph):

- every UNDECIDED vertex carries a priority ``p(v) = u32(md5(seed:v))``
  — fixed for the whole run, so the result is a pure function of the
  graph + seed (no RNG state, exactly SQL-replayable);
- a vertex enters the MIS iff its (priority, id) is strictly the
  maximum among itself and all undecided neighbors — the (p, id) pair
  is a TOTAL order, so "local max" is deterministic and at least one
  vertex per undecided component wins every round;
- winners' neighbors become losers (excluded); both leave the frontier;
- halt when no undecided vertices remain. Isolated vertices (and those
  isolated by earlier removals) win trivially.

Expected O(log n) rounds with md5's uniform priorities (Luby's
analysis); each round is two E-bounded joins on the shrinking
undecided-edge relation — the kcore/densest peel cost shape, same
localCheckpoint-per-round storage discipline.

Result state: (id, in_mis, round) for EVERY vertex of the ``vertices``
DataFrame — NULL in_mis/round marks vertices left undecided when
``max_rounds`` is exhausted (metrics carry per-round winner/loser
counts); edge endpoints not present in ``vertices`` are ignored on
both sides (never winners, never losers). The driver gate replays
round 1 in DuckDB (``mis_round1``); full convergence (independence +
maximality, exact brute replay) is pytest-gated.
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


def mis_priority(id_col: F.Column, seed: str = "mis") -> F.Column:
    """Deterministic u32 priority — the cross-engine md5 family."""
    s = F.concat(F.lit(seed + ":"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def maximal_independent_set(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    seed: str = "mis",
    max_rounds: int = 60,
    num_partitions: int | None = None,
    partitioner=None,
) -> PregelResult:
    """Luby MIS. Result state: (id, in_mis boolean, round bigint) for
    EVERY vertex of ``vertices`` — ``round`` is the superstep at which
    the vertex was decided; if ``max_rounds`` is exhausted first
    (``halted=False``), still-undecided vertices appear with
    ``in_mis`` and ``round`` NULL rather than being omitted.
    ``halted=True`` iff every vertex was decided within ``max_rounds``.

    Edge endpoints absent from ``vertices`` are ignored entirely (the
    edge relation is semi-joined to the vertex set on both endpoints):
    a vertex that can never win must not be reported as a loser either.
    """
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    vids = vertices.select("id")
    sym = (
        symmetrize(edges)
        .join(vids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(vids.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    if num_partitions:
        sym = partition_by(sym, num_partitions, "src", partitioner)

    # undecided frontier: vertex set with fixed priorities
    und = vertices.select("id", mis_priority(F.col("id"), seed).alias("p"))
    und = und.transform(local_checkpoint_stats_reset)
    ue = sym.transform(local_checkpoint_stats_reset)  # edges among undecided vertices

    decided_parts: list[DataFrame] = []
    metrics_hist: list[dict] = []
    halted = False
    rounds = 0

    for r in range(1, max_rounds + 1):
        n_und = und.count()
        if n_und == 0:
            halted = True
            break
        rounds = r
        # max neighbor (p, id) among undecided neighbors, via the edge
        # relation restricted to undecided endpoints (ue is maintained
        # to exactly that invariant below)
        nbr_max = (
            ue.join(und.select(F.col("id").alias("dst"), "p"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.max(F.struct(F.col("p"), F.col("dst").alias("i"))).alias("nm"))
        )
        j = und.join(nbr_max, "id", "left")
        winners = j.where(
            F.col("nm").isNull()
            | (F.struct(F.col("p"), F.col("id").alias("i")) > F.col("nm"))
        ).select("id")
        winners = winners.transform(local_checkpoint_stats_reset)
        # losers: any undecided neighbor of a winner
        losers = (
            ue.join(winners.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .transform(local_checkpoint_stats_reset)
        )
        n_win = winners.count()
        n_lose = losers.count()
        decided_parts.append(
            winners.select(
                "id", F.lit(True).alias("in_mis"), F.lit(r).cast("long").alias("round")
            ).unionAll(
                losers.select(
                    "id", F.lit(False).alias("in_mis"),
                    F.lit(r).cast("long").alias("round"),
                )
            ).transform(local_checkpoint_stats_reset)
        )
        metrics_hist.append(
            {"superstep": r, "undecided": n_und, "winners": n_win, "losers": n_lose}
        )
        gone = winners.unionAll(losers)
        nxt_und = und.join(gone, "id", "left_anti").transform(local_checkpoint_stats_reset)
        nxt_ue = (
            ue.join(gone.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .transform(local_checkpoint_stats_reset)
        )
        for tmp in (und, ue, winners, losers):
            free_local_checkpoint(tmp)
        und, ue = nxt_und, nxt_ue

    state = None
    for part in decided_parts:
        state = part if state is None else state.unionAll(part)
    if state is None:
        state = vertices.select(
            "id", F.lit(True).alias("in_mis"), F.lit(0).cast("long").alias("round")
        ).where(F.lit(False))
    if not halted:
        # budget exhausted: the remaining frontier is still part of the
        # contract — one row per vertex — marked undecided with NULLs
        state = state.unionAll(
            und.select(
                "id",
                F.lit(None).cast("boolean").alias("in_mis"),
                F.lit(None).cast("long").alias("round"),
            )
        )
    state = state.transform(local_checkpoint_stats_reset)
    for part in decided_parts:
        free_local_checkpoint(part)
    free_local_checkpoint(und)
    free_local_checkpoint(ue)
    return PregelResult(
        state=state,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=halted,
        run_id="mis",
    )
