"""Weisfeiler-Lehman structural role signatures (hashed-WL iteration).

Per-vertex fingerprints of the local neighborhood SHAPE: two vertices
get equal signatures after r rounds whenever the classic 1-WL color
refinement cannot distinguish their r-hop neighborhoods (up to the
negligible md5-collision probability). The standard uses: role
discovery on a link graph (hub vs bridge vs leaf files with identical
wiring), graph-isomorphism features (the WL-subtree kernel's per-vertex
colors), and grouping structurally-equivalent vertices before expensive
per-vertex analytics.

Hashed-WL formulation (the scalable form of 1-WL color refinement —
Shervashidze et al. 2011's compressed labels, replacing the
sorted-multiset relabeling dictionary with a hash):

    sig_0(v)   = u32(md5('wl0:' || degree(v)))
    sig_t(v)   = u32(md5('wl' || t || ':' || sig_{t-1}(v) || ':' || S))
      where S  = Σ_{u ∈ N(v)} u32(md5('wlh:' || sig_{t-1}(u)))

The neighbor multiset enters through an integer SUM of per-neighbor
hashes — commutative and associative, so the shuffle/combine order
cannot perturb it (the aa_micro discipline) and no per-vertex sorted
array ever materializes (a 10^8-degree hub contributes partial sums,
not a collect_list). md5/u32 is the repo's cross-engine hash family, so
a DuckDB chained CTE replays every signature bit-for-bit.

Scale shape: one round = one E-bounded join (state → symmetrized
adjacency) + one map-side-combinable groupBy sum + a V-row update join
— exactly the engine's Pregel cost model; rounds are fixed (WL depth is
a semantic parameter, not a convergence loop), each round's state is
checkpointed with plan-stats reset like every iterative core.

Reference scope: duwamish has no WL operator; this extends the engine's
per-vertex analytics family (coreness/clustering/centralities) with the
structural-equivalence signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import require_columns, symmetrize
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def _u32(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def wl_signatures(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    rounds: int = 3,
) -> PregelResult:
    """1-WL refinement signatures on the undirected simple graph:
    state ``(id, wl_sig)`` after exactly ``rounds`` hashed-WL rounds
    (``rounds=0`` = the degree coloring). Isolated vertices refine from
    degree 0 with an empty (sum 0) neighborhood each round.

    Metrics per round: ``colors`` (approximate distinct signatures —
    the refinement progress curve; exact distinctness is a driver-side
    groupBy away when needed).
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    adj = symmetrize(edges).transform(local_checkpoint_stats_reset)
    deg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    state = (
        vertices.join(deg, "id", "left")
        .select(
            "id",
            _u32(
                F.concat(F.lit("wl0:"), F.coalesce("d", F.lit(0)).cast("string"))
            ).alias("wl_sig"),
        )
        .transform(local_checkpoint_stats_reset)
    )

    metrics_hist: list[dict] = []
    for t in range(1, rounds + 1):
        nbr = state.join(adj, state["id"] == adj["src"]).select(
            adj["dst"].alias("id"),
            _u32(F.concat(F.lit("wlh:"), F.col("wl_sig").cast("string"))).alias("h"),
        )
        sums = nbr.groupBy("id").agg(F.sum("h").alias("s"))
        obs = Observation()
        nxt = (
            state.join(sums, "id", "left")
            .select(
                "id",
                _u32(
                    F.concat(
                        F.lit(f"wl{t}:"),
                        F.col("wl_sig").cast("string"),
                        F.lit(":"),
                        F.coalesce("s", F.lit(0)).cast("string"),
                    )
                ).alias("wl_sig"),
            )
            # the colors metric rides the checkpoint-materializing job
            # (the O10 discipline — no separate aggregation job)
            .observe(obs, F.approx_count_distinct("wl_sig").alias("c"))
            .transform(local_checkpoint_stats_reset)
        )
        metrics_hist.append({"superstep": t, "colors": int(obs.get["c"])})
        free_local_checkpoint(state)
        state = nxt
    free_local_checkpoint(adj)
    return PregelResult(
        state=state,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=True,
        run_id="wl",
    )
