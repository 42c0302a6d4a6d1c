"""Full truss decomposition (per-edge truss number) via distributed
h-index iteration — the edge analogue of `coreness.py`.

``k_truss(k)`` (structure.py) answers one membership question; the
decomposition labels EVERY edge with its truss number t(e) — the
largest k whose k-truss contains it. t(e) is the standard cohesion
signal one level finer than coreness: on an import graph it separates
"edge inside a tightly co-changing module" from "edge between
modules" at every density level at once, and the k-truss for ANY k is
then a filter, not a recomputation.

The sequential algorithm (support peel, Cohen 2008) is inherently
serial; the scalable formulation is the local fixpoint (Sariyüce,
Seshadhri & Pinar 2017's local nucleus decomposition, h-index form):
for each edge e with triangle-partner estimates

    rho_i = min(t̂(e1_i), t̂(e2_i))        (one rho per triangle of e)

set  t̂(e) <- 2 + max{ h : |{i : rho_i >= h + 2}| >= h }, i.e. with
rho ranked descending,  t̂(e) <- max over rank r of min(rho_(r), r+2)
(2 when e has no triangle). Starting from the upper bound
t̂0 = support(e) + 2 the estimates are monotone non-increasing, remain
upper bounds, and converge exactly to the truss numbers.

Engine formulation: the triangle-edge incidence relation (3 rows per
triangle: edge + its two partner edges, all canonical (s,t) pairs) is
materialized ONCE; each round is two keyed joins of the estimate
relation into the incidence (T-bounded, T = triangle count), a window
ranking each edge's rho values, and one groupBy — all integers, no
UDFs. The Σt̂ signature riding the materializing job detects the
fixpoint (monotone non-increasing + unchanged sum == fixed). A
fixed-round prefix is exactly replayable by chained CTEs (driver gate
``trussness_round2``); exact convergence is pytest-gated against the
sequential peel.

Scale: the incidence relation is the one super-linear intermediate
(3·T rows; T can exceed E on dense graphs — inherent to truss, not to
this formulation). Triangle enumeration routes through the
degree-ordered orientation (O(E^1.5) wedge cap), incidence is
checkpointed once and re-joined per round, and per-round shuffle is
T-bounded on the partner-edge keys. Reference scope: duwamish has no
truss operator; this extends the engine's cohesive-subgraph family
(k_truss / k_core / coreness) to the full decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duwamish_spark.graph import canonical_edges, require_columns
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def _incidence(c: DataFrame) -> DataFrame:
    """(s, t, p1s, p1t, p2s, p2t): one row per (edge, triangle) with the
    triangle's other two canonical edges. 3·T rows."""
    from duwamish_spark.algorithms.structure import oriented_triangles

    tri = oriented_triangles(c).select(
        F.least("a", "b").alias("e1s"),
        F.greatest("a", "b").alias("e1t"),
        F.least("a", "c").alias("e2s"),
        F.greatest("a", "c").alias("e2t"),
        F.col("b").alias("e3s"),
        F.col("c").alias("e3t"),
    )

    def rot(me_s, me_t, a_s, a_t, b_s, b_t):
        return tri.select(
            F.col(me_s).alias("s"),
            F.col(me_t).alias("t"),
            F.col(a_s).alias("p1s"),
            F.col(a_t).alias("p1t"),
            F.col(b_s).alias("p2s"),
            F.col(b_t).alias("p2t"),
        )

    return (
        rot("e1s", "e1t", "e2s", "e2t", "e3s", "e3t")
        .unionAll(rot("e2s", "e2t", "e1s", "e1t", "e3s", "e3t"))
        .unionAll(rot("e3s", "e3t", "e1s", "e1t", "e2s", "e2t"))
    )


def trussness(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_rounds: int = 100,
    frontier_fraction: float = 0.25,
    frontier_max_broadcast: int = 4_000_000,
) -> PregelResult:
    """Truss number per canonical simple edge: state
    ``(src, dst, trussness)``. Edges in no triangle have trussness 2.

    ``max_rounds`` caps the h-index iteration (state is then still a
    valid per-edge UPPER BOUND — the fixed-round semantics the driver
    oracle replays); ``halted`` reports whether the exact fixpoint was
    reached.

    Frontier pruning: t̂(e) depends ONLY on e's triangle-partner
    estimates, so once the changed-edge set of a round shrinks below
    ``frontier_fraction`` of the triangle-edge population, each
    subsequent round recomputes only the *dirty* edges — those sharing a
    triangle with a changed edge (two semi-joins of the incidence
    against the broadcast changed set, then the h-index window over the
    dirty slice only); every other edge carries its estimate forward
    through an E-bounded coalesce join. Skipping is EXACT, not an
    approximation — an edge whose partners all held still recomputes to
    the same value by definition. Early rounds (changed ≈ everything)
    keep the full T-bounded re-join, so worst-case cost is unchanged;
    the convergence tail (20+ rounds of a few stragglers at sf0.1)
    collapses from 3·T-row windows to frontier-sized ones.

    ``frontier_max_broadcast`` additionally caps the changed set the
    frontier path will force-broadcast (two copies reach every
    executor): above it the round takes the full path instead of
    risking driver/executor memory on a hinted broadcast — at 10^12
    edges a cluster deployment would raise this together with executor
    memory, or swap the hint for a storage-partitioned join.
    """
    require_columns(edges, ("src", "dst"), "edges")
    c = canonical_edges(edges).transform(local_checkpoint_stats_reset)
    inc = _incidence(c).transform(local_checkpoint_stats_reset)
    est = (
        inc.groupBy("s", "t")
        .agg((F.count(F.lit(1)) + F.lit(2)).cast("long").alias("c"))
        .transform(local_checkpoint_stats_reset)
    )
    n_tri_edges = est.count()

    metrics_hist: list[dict] = []
    halted = False
    rounds = 0
    chg: DataFrame | None = None  # None = first round, everything dirty
    chg_count = n_tri_edges
    w = Window.partitionBy("s", "t").orderBy(
        F.col("rho").desc(), "p1s", "p1t", "p2s", "p2t"
    )
    for t in range(1, max_rounds + 1):
        frontier = (
            chg is not None
            and chg_count <= frontier_fraction * n_tri_edges
            and chg_count <= frontier_max_broadcast
        )
        if frontier:
            d1 = inc.join(
                F.broadcast(
                    chg.select(
                        F.col("s").alias("p1s"), F.col("t").alias("p1t")
                    )
                ),
                ["p1s", "p1t"],
                "leftsemi",
            )
            d2 = inc.join(
                F.broadcast(
                    chg.select(
                        F.col("s").alias("p2s"), F.col("t").alias("p2t")
                    )
                ),
                ["p2s", "p2t"],
                "leftsemi",
            )
            dirty = (
                d1.select("s", "t").unionAll(d2.select("s", "t")).distinct()
            )
            rows = inc.join(dirty, ["s", "t"], "leftsemi")
        else:
            rows = inc
        e1 = est.select(
            F.col("s").alias("p1s"), F.col("t").alias("p1t"), F.col("c").alias("c1")
        )
        e2 = est.select(
            F.col("s").alias("p2s"), F.col("t").alias("p2t"), F.col("c").alias("c2")
        )
        vals = (
            rows.join(e1, ["p1s", "p1t"])
            .join(e2, ["p2s", "p2t"])
            .select("s", "t", "p1s", "p1t", "p2s", "p2t", F.least("c1", "c2").alias("rho"))
        )
        new_d = (
            vals.withColumn("rn", F.row_number().over(w))
            .groupBy("s", "t")
            .agg(F.max(F.least(F.col("rn") + 2, F.col("rho"))).cast("long").alias("cn"))
        )
        obs = Observation()
        nxt = (
            est.join(new_d, ["s", "t"], "left")
            .select(
                "s",
                "t",
                F.coalesce("cn", "c").cast("long").alias("c"),
                (F.col("cn").isNotNull() & (F.col("cn") != F.col("c")))
                .cast("long")
                .alias("_chg"),
            )
            .observe(
                obs, F.sum("c").alias("tsum"), F.sum("_chg").alias("changed")
            )
            .transform(local_checkpoint_stats_reset)
        )
        row = obs.get
        tsum = int(row["tsum"]) if row["tsum"] is not None else 0
        chg_count = int(row["changed"]) if row["changed"] is not None else 0
        rounds = t
        metrics_hist.append(
            {"superstep": t, "truss_sum": tsum, "changed": chg_count}
        )
        free_local_checkpoint(est)
        chg = nxt.where(F.col("_chg") == 1).select("s", "t")
        est = nxt.select("s", "t", "c")
        if chg_count == 0:
            # no estimate moved: monotone non-increasing == fixpoint
            halted = True
            break
    out = (
        c.join(
            est.select(F.col("s").alias("src"), F.col("t").alias("dst"), "c"),
            ["src", "dst"],
            "left",
        )
        .select("src", "dst", F.coalesce("c", F.lit(2)).cast("long").alias("trussness"))
        .transform(local_checkpoint_stats_reset)
    )
    free_local_checkpoint(est)
    free_local_checkpoint(inc)
    free_local_checkpoint(c)
    return PregelResult(
        state=out,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=halted,
        run_id="trussness",
    )
