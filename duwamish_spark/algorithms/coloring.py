"""Greedy distributed graph coloring (Jones–Plassmann) with
deterministic hash priorities — conflict-free scheduling / register
allocation on a link graph, and the canonical consumer of the MIS
symmetry-breaking pattern (Jones & Plassmann 1993).

Round structure (over the symmetrized simple graph):

- every vertex carries a fixed priority ``p(v) = u32(md5(seed:v))``;
  the pair ``(p, id)`` is a TOTAL order (no RNG state — the coloring is
  a pure function of the graph + seed, exactly SQL-replayable);
- each round, every UNCOLORED vertex whose (p, id) is strictly the
  maximum among its uncolored neighbors wins; adjacent vertices can
  never both win, so winners color simultaneously without conflict;
- a winner takes the smallest color ∉ its already-colored neighbors'
  colors. Colors assigned in round r are ≤ r−1 (round 1 assigns 0), so
  the mex is a BOUNDED first-gap scan over per-color presence flags —
  one conditional aggregate per candidate color, no arrays, identical
  in Spark and the DuckDB replay;
- halt when no uncolored vertices remain.

Expected O(log n) rounds on bounded-degree graphs with uniform
priorities; each round is two E-bounded joins on the shrinking
uncolored-edge relation plus one E-bounded join against the colored
state — the MIS peel cost shape, same localCheckpoint-per-round
storage discipline.

Result state: (id, color, round) for EVERY vertex of ``vertices`` —
NULL color/round marks vertices left uncolored when ``max_rounds`` is
exhausted (``halted=False``). The coloring is proper (no edge joins two
equal colors) for all colored vertices at any stopping point. Edge
endpoints absent from ``vertices`` are ignored. The driver gate replays
a fixed round count in DuckDB (``coloring_round3``); full convergence
(properness + exact sequential Jones–Plassmann replay) is pytest-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.algorithms.mis import mis_priority
from duwamish_spark.graph import partition_by, require_columns, symmetrize
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def greedy_coloring(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    seed: str = "coloring",
    max_rounds: int = 60,
    num_partitions: int | None = None,
    partitioner=None,
) -> PregelResult:
    """Jones–Plassmann greedy coloring (see module doc).

    Result state: (id, color, round) for EVERY vertex of ``vertices``;
    ``halted=True`` iff every vertex was colored within ``max_rounds``.
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
    sym = sym.transform(local_checkpoint_stats_reset)  # full adjacency, for mex lookups

    unc = vertices.select(
        "id", mis_priority(F.col("id"), seed).alias("p")
    ).transform(local_checkpoint_stats_reset)
    ue = sym  # edges among uncolored vertices (invariant, maintained below)

    colored_parts: list[DataFrame] = []
    colored = None  # running (id, color) of all colored vertices
    metrics_hist: list[dict] = []
    halted = False
    rounds = 0

    try:
        for r in range(1, max_rounds + 1):
            n_unc = unc.count()
            if n_unc == 0:
                halted = True
                break
            rounds = r
            nbr_max = (
                ue.join(unc.select(F.col("id").alias("dst"), "p"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.max(F.struct(F.col("p"), F.col("dst").alias("i"))).alias("nm"))
            )
            j = unc.join(nbr_max, "id", "left")
            winners = j.where(
                F.col("nm").isNull()
                | (F.struct(F.col("p"), F.col("id").alias("i")) > F.col("nm"))
            ).select("id").transform(local_checkpoint_stats_reset)

            if colored is None:
                # round 1: no colored neighbors anywhere — mex is 0
                newly = winners.select(
                    "id",
                    F.lit(0).cast("long").alias("color"),
                    F.lit(r).cast("long").alias("round"),
                )
            else:
                # colors so far are <= r-2; mex = first gap over the
                # bounded candidate set {0..r-1} via presence flags
                used = (
                    sym.join(winners.withColumnRenamed("id", "src"), "src")
                    .join(
                        colored.select(
                            F.col("id").alias("dst"), F.col("color").alias("nc")
                        ),
                        "dst",
                    )
                    .groupBy(F.col("src").alias("id"))
                    .agg(*[
                        F.max(
                            F.when(F.col("nc") == c, F.lit(1)).otherwise(F.lit(0))
                        ).alias(f"has{c}")
                        for c in range(r - 1)
                    ])
                )
                mex = F.lit(0).cast("long")
                for c in range(r - 1, -1, -1):
                    has_c = (
                        F.coalesce(F.col(f"has{c}"), F.lit(0))
                        if c < r - 1 else F.lit(0)
                    )
                    mex = F.when(has_c == 0, F.lit(c).cast("long")).otherwise(mex)
                # a winner with no colored neighbor has no `used` row —
                # every flag coalesces to 0 and mex lands on 0
                newly = (
                    winners.join(used, "id", "left")
                    .select(
                        "id",
                        mex.alias("color"),
                        F.lit(r).cast("long").alias("round"),
                    )
                )
            newly = newly.transform(local_checkpoint_stats_reset)
            n_win = newly.count()
            metrics_hist.append(
                {"superstep": r, "uncolored": n_unc, "winners": n_win}
            )
            colored_parts.append(newly)
            prev_colored = colored
            colored = (
                newly.select("id", "color")
                if colored is None
                else colored.unionAll(newly.select("id", "color"))
            ).transform(local_checkpoint_stats_reset)
            if prev_colored is not None:
                free_local_checkpoint(prev_colored)

            gone = newly.select("id")
            nxt_unc = unc.join(gone, "id", "left_anti").transform(local_checkpoint_stats_reset)
            nxt_ue = (
                ue.join(gone.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(gone.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .transform(local_checkpoint_stats_reset)
            )
            free_local_checkpoint(unc)
            if ue is not sym:
                free_local_checkpoint(ue)
            free_local_checkpoint(winners)
            unc, ue = nxt_unc, nxt_ue

        state = None
        for part in colored_parts:
            sel = part.select("id", "color", "round")
            state = sel if state is None else state.unionAll(sel)
        if state is None:
            state = vertices.select(
                "id",
                F.lit(0).cast("long").alias("color"),
                F.lit(0).cast("long").alias("round"),
            ).where(F.lit(False))
        if not halted:
            state = state.unionAll(
                unc.select(
                    "id",
                    F.lit(None).cast("long").alias("color"),
                    F.lit(None).cast("long").alias("round"),
                )
            )
        state = state.transform(local_checkpoint_stats_reset)
        for part in colored_parts:
            free_local_checkpoint(part)
        if colored is not None:
            free_local_checkpoint(colored)
        free_local_checkpoint(unc)
        if ue is not sym:
            free_local_checkpoint(ue)
        return PregelResult(
            state=state,
            supersteps=rounds,
            metrics=metrics_hist,
            halted=halted,
            run_id="coloring",
        )
    finally:
        free_local_checkpoint(sym)
