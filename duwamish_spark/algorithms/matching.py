"""Maximal matching via deterministic mutual-pick rounds — the
Israeli–Itai BSP pattern with fixed hash priorities (no RNG state, so
the result is a pure function of the graph + seed and exactly
SQL-replayable). The classic use on a link graph is one-to-one
page/document pairing (e.g. near-dup pair selection where each document
may be consumed by at most one pair).

Round structure (over the symmetrized simple graph, self-loops excluded
— a vertex cannot match itself):

- every undirected edge {u, v} carries a fixed priority
  ``p = u32(md5(seed:min:max))``; the triple ``(p, min, max)`` is a
  TOTAL order over edges;
- each round, every UNMATCHED vertex picks the maximum incident
  undecided edge under that order; an edge is matched iff BOTH
  endpoints picked it (mutual pick);
- matched endpoints leave the frontier, their incident edges are
  removed; halt when no undecided edges remain.

Progress is guaranteed: the globally maximum remaining edge is the
maximum at both its endpoints, so at least one edge matches per round;
with md5's uniform priorities the expected round count is O(log n)
(Israeli & Itai 1986). Each round is two E-bounded joins on the
shrinking edge relation — the MIS/kcore peel cost shape, same
localCheckpoint-per-round storage discipline.

Result state: (id, mate, round) for EVERY vertex of ``vertices`` —
``mate`` NULL marks an unmatched vertex (guaranteed maximal iff
``halted=True``: no remaining edge joins two unmatched vertices);
``round`` is the superstep at which the pair matched (NULL for
unmatched). Edge endpoints absent from ``vertices`` are ignored
entirely. The driver gate replays round 1 in DuckDB
(``matching_round1``); full convergence (matching validity + maximality
+ exact greedy replay) is pytest-gated.
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


def edge_priority(
    u: F.Column, v: F.Column, seed: str = "matching"
) -> F.Column:
    """Deterministic u32 priority of the undirected edge {u, v} — the
    cross-engine md5 family (same construction as mis.mis_priority)."""
    lo, hi = F.least(u, v), F.greatest(u, v)
    s = F.concat(
        F.lit(seed + ":"), lo.cast("string"), F.lit(":"), hi.cast("string")
    )
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def maximal_matching(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    seed: str = "matching",
    max_rounds: int = 60,
    num_partitions: int | None = None,
    partitioner=None,
) -> PregelResult:
    """Deterministic greedy maximal matching (see module doc).

    Result state: (id, mate, round) for EVERY vertex of ``vertices``;
    ``halted=True`` iff the undecided edge relation emptied within
    ``max_rounds`` (the matching is then maximal).
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
    # fixed per-edge priority, carried with the relation so rounds never
    # recompute the hash
    ue = sym.select(
        "src", "dst", edge_priority(F.col("src"), F.col("dst"), seed).alias("p")
    ).transform(local_checkpoint_stats_reset)

    matched_parts: list[DataFrame] = []
    metrics_hist: list[dict] = []
    halted = False
    rounds = 0

    for r in range(1, max_rounds + 1):
        n_edges = ue.count()
        if n_edges == 0:
            halted = True
            break
        rounds = r
        # each vertex's pick: max (p, lo, hi) among incident edges — the
        # symmetrized relation lists every incident edge under src, so
        # one groupBy covers both endpoints
        pick = ue.groupBy(F.col("src").alias("id")).agg(
            F.max(
                F.struct(
                    F.col("p"),
                    F.least("src", "dst").alias("lo"),
                    F.greatest("src", "dst").alias("hi"),
                )
            ).alias("pk")
        )
        # mutual pick: both endpoints of the picked edge picked it; keep
        # one row per matched pair (the src < dst orientation)
        pairs = (
            pick.alias("a")
            .join(
                pick.alias("b"),
                (F.col("a.pk.lo") == F.col("a.id"))
                & (F.col("a.pk.hi") == F.col("b.id"))
                & (F.col("a.pk") == F.col("b.pk")),
            )
            .select(
                F.col("a.id").alias("u"),
                F.col("b.id").alias("v"),
            )
            .transform(local_checkpoint_stats_reset)
        )
        n_pairs = pairs.count()
        metrics_hist.append(
            {"superstep": r, "undecided_edges": n_edges, "matched_pairs": n_pairs}
        )
        if n_pairs == 0:
            # cannot happen with a total order (the global max edge always
            # matches) — guard against an empty-progress livelock anyway
            break
        matched_parts.append(
            pairs.select(
                F.col("u").alias("id"),
                F.col("v").alias("mate"),
                F.lit(r).cast("long").alias("round"),
            )
            .unionAll(
                pairs.select(
                    F.col("v").alias("id"),
                    F.col("u").alias("mate"),
                    F.lit(r).cast("long").alias("round"),
                )
            )
            .transform(local_checkpoint_stats_reset)
        )
        gone = matched_parts[-1].select("id")
        nxt_ue = (
            ue.join(gone.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .transform(local_checkpoint_stats_reset)
        )
        for tmp in (ue, pairs):
            free_local_checkpoint(tmp)
        ue = nxt_ue
    else:
        # max_rounds exhausted without an empty frontier
        halted = ue.count() == 0

    matched = None
    for part in matched_parts:
        matched = part if matched is None else matched.unionAll(part)
    if matched is None:
        matched = vertices.select(
            "id",
            F.col("id").alias("mate"),
            F.lit(0).cast("long").alias("round"),
        ).where(F.lit(False))
    state = (
        vertices.select("id")
        .join(matched, "id", "left")
        .transform(local_checkpoint_stats_reset)
    )
    for part in matched_parts:
        free_local_checkpoint(part)
    free_local_checkpoint(ue)
    return PregelResult(
        state=state,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=halted,
        run_id="matching",
    )
