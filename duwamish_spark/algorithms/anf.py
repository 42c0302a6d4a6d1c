"""Approximate neighborhood function (ANF / HyperANF) — distance metrics
at link-graph scale.

``N(h)`` = number of (source, target) pairs within distance h — the
neighborhood function — yields average distance, effective diameter, and
reachability profiles of the web/import graph. Exact computation is
all-pairs BFS (V·E — impossible at 10^12 edges); the standard scalable
algorithm is ANF (Palmer 2002) / HyperANF (Boldi & Vigna WWW'11): every
vertex carries a probabilistic distinct-counting sketch of its h-ball,
and one superstep merges each vertex's sketch with its out-neighbors' —
sketch union is idempotent/commutative/associative, so the merge is just
an aggregation.

Engine formulation — the sketch lives in *sparse relational form*, not a
binary blob: one row ``(id, reg, val)`` per non-zero HLL register.
Merging sketches = ``groupBy(id, reg).max(val)`` — the combine IS the
engine's existing keyed-aggregation machinery (same cost model as the
hash-min label exchange), no UDF/UDAF, whole-stage-codegen throughout,
and a DuckDB chained CTE replays it bit-for-bit for the driver gate
(``anf_sketch_h3``): integers only, no float drift surface.

Register assignment is the cross-engine md5 family (walks.py /
fingerprint oracles): for vertex v, ``reg = u32(md5(v)[0:8]) mod m``,
``val = rho(u32(md5(v)[8:16]))`` with ``rho(x) = 33 - bitlength(x)``
(leading-zero count of the 32-bit word + 1, ``bitlength = length(bin(x))``
in both Spark and DuckDB; rho(0) = 33). Each vertex seeds exactly one
register; a vertex's sketch after h rounds covers exactly its out-h-ball
(propagation pulls along out-edges: ball(v,h) = {v} ∪ ball(out-nbrs,
h-1)).

Rows per vertex are capped at m (64 default → ≤ 1.04/√64 ≈ 13% per-ball
error; raise m for precision), so state ≤ V·m rows and a superstep
shuffles ≤ E·m rows worst case — HyperANF's cost model, expressed as two
E-bounded relational ops. Sketch growth is monotone (rows and vals only
increase), so the (row-count, Σval) signature riding the materializing
job detects the fixpoint without a comparison join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import partition_by, require_columns
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def _u32(col: F.Column, start: int) -> F.Column:
    """uint32 from md5 hex chars [start, start+8) — DuckDB-replayable."""
    return F.conv(F.substring(F.md5(col), start, 8), 16, 10).cast("long")


def hll_register(id_col: F.Column, m: int) -> tuple[F.Column, F.Column]:
    """(reg, val) register seed for one vertex id."""
    s = id_col.cast("string")
    x = _u32(s, 9)
    rho = F.when(x == 0, F.lit(33)).otherwise(33 - F.length(F.bin(x)))
    return (_u32(s, 1) % m).alias("reg"), rho.alias("val")


def anf_sketches(
    spark: SparkSession,
    edges: DataFrame,
    h: int,
    *,
    m: int = 64,
    num_partitions: int | None = None,
    partitioner=None,
    on_round=None,
) -> PregelResult:
    """Per-vertex HLL registers of the out-h-ball: state ``(id, reg, val)``.

    ``supersteps`` = rounds actually run (halts early at the sketch
    fixpoint — when every h-ball stopped growing, i.e. h ≥ graph
    radius). Metrics per round: ``rows``, ``val_sum``. ``on_round(t,
    state)`` is called after each round's state materializes (used by
    :func:`neighborhood_function` for per-hop estimates).
    """
    if h < 0:
        raise ValueError("h must be >= 0")
    if m < 1 or m > 4096:
        raise ValueError("m must be in [1, 4096]")
    require_columns(edges, ("src", "dst"), "edges")

    # Vertex set comes from the RAW edge relation: a vertex whose only
    # edge is a self-loop must still appear (distance-0 ball = itself).
    # The self-loop filter applies to the message relation only.
    raw = edges.select("src", "dst")
    verts = (
        raw.select(F.col("src").alias("id"))
        .unionAll(raw.select(F.col("dst").alias("id")))
        .distinct()
    )
    de = raw.where(F.col("src") != F.col("dst")).distinct()
    if num_partitions:
        de = partition_by(de, num_partitions, "dst", partitioner)
    de = de.transform(local_checkpoint_stats_reset)
    reg, val = hll_register(F.col("id"), m)
    state = verts.select("id", reg, val).transform(local_checkpoint_stats_reset)

    metrics_hist: list[dict] = []
    sig = None
    halted = h == 0
    rounds = 0
    for t in range(1, h + 1):
        msgs = state.join(de, state["id"] == de["dst"]).select(
            de["src"].alias("id"), "reg", "val"
        )
        obs = Observation()
        nxt = (
            state.unionAll(msgs)
            .groupBy("id", "reg")
            .agg(F.max("val").alias("val"))
            .observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                F.sum("val").alias("vs"),
            )
            .transform(local_checkpoint_stats_reset)
        )
        row = obs.get
        rounds = t
        metrics_hist.append(
            {"superstep": t, "rows": int(row["rows"]), "val_sum": int(row["vs"])}
        )
        free_local_checkpoint(state)
        state = nxt
        new_sig = (int(row["rows"]), int(row["vs"]))
        if new_sig == sig:
            # monotone sketches + unchanged signature == fixpoint
            halted = True
            break
        sig = new_sig
        if on_round is not None:
            on_round(t, state)
    free_local_checkpoint(de)
    return PregelResult(
        state=state,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=halted,
        run_id="anf",
    )


# alpha_m bias correction (Flajolet et al. 2007); exact constants for the
# small register counts, the asymptotic formula above 128
def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimates(sketches: DataFrame, m: int) -> DataFrame:
    """(id, est) per-vertex ball-size estimate from sparse registers.

    Standard HLL estimator with the linear-counting small-range
    correction; absent rows are zero registers. All arithmetic is
    deterministic given the integer registers (Z is a dyadic sum —
    exact in doubles regardless of order).
    """
    a = _alpha(m)
    per = sketches.groupBy("id").agg(
        F.count(F.lit(1)).alias("nreg"),
        F.sum(F.pow(F.lit(2.0), -F.col("val"))).alias("zpresent"),
    )
    z = (F.lit(m) - F.col("nreg")) + F.col("zpresent")
    raw = F.lit(a * m * m) / z
    zeros = F.lit(m) - F.col("nreg")
    small = (raw <= 2.5 * m) & (zeros > 0)
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return per.select("id", F.when(small, lc).otherwise(raw).alias("est"))


def neighborhood_function(
    spark: SparkSession,
    edges: DataFrame,
    h: int,
    *,
    m: int = 64,
    num_partitions: int | None = None,
    partitioner=None,
) -> tuple[list[float], PregelResult]:
    """([N(0), N(1), ..., N(h)], final-sketch result).

    N(t) = Σ_v |out-ball(v, t)| estimated from the round-t sketches —
    one small aggregation per round on top of the superstep. If the
    sketches reach their fixpoint before round h the last value repeats
    (N is then constant by definition, not re-estimated).
    """

    def _total(s: DataFrame) -> float:
        row = hll_estimates(s, m).agg(F.sum("est").alias("n")).collect()[0]
        return float(row["n"] or 0.0)

    counts: list[float] = []

    def _record(t: int, state: DataFrame) -> None:
        counts.append(_total(state))

    res = anf_sketches(
        spark,
        edges,
        h,
        m=m,
        num_partitions=num_partitions,
        partitioner=partitioner,
        on_round=_record,
    )
    # N(0) through the same estimator (each vertex = its own 1-register
    # sketch) so the series is bias-consistent across hops; rounds cut
    # short by the fixpoint repeat the final value
    reg, val = hll_register(F.col("id"), m)
    init = res.state.select("id").distinct().select("id", reg, val)
    counts.insert(0, _total(init))
    if len(counts) < h + 1:
        last = _total(res.state)
        counts.extend([last] * (h + 1 - len(counts)))
    return counts[: h + 1], res


def _hop_ball_profile(
    spark: SparkSession,
    edges: DataFrame,
    h: int,
    *,
    m: int,
    num_partitions: int | None,
    partitioner,
):
    """Wide per-vertex hop profile (id, e0..eh) of HLL ball-size
    estimates, plus a cleanup thunk that frees the per-round sketch
    storage.  Shared scaffolding for the centrality estimators below:
    per-round estimates are materialized as V-row localCheckpoints
    (small — one double per vertex per hop), then joined into ONE wide
    row per vertex so each estimator combines them in a fixed
    left-associative expression (bit-reproducible, SQL-replayable).
    Rounds cut short by the sketch fixpoint reuse the previous column
    (no join) — the ball stopped growing, so the padding is exact.
    """
    ests: list[DataFrame] = []

    def _record(t: int, state: DataFrame) -> None:
        ests.append(hll_estimates(state, m).transform(local_checkpoint_stats_reset))

    res = anf_sketches(
        spark,
        edges,
        h,
        m=m,
        num_partitions=num_partitions,
        partitioner=partitioner,
        on_round=_record,
    )
    # ball(v, 0) = {v} through the same estimator (bias-consistent with
    # the per-hop estimates — the same convention as
    # neighborhood_function's N(0))
    reg, val = hll_register(F.col("id"), m)
    init = res.state.select("id").distinct().select("id", reg, val)
    ests.insert(0, hll_estimates(init, m))
    while len(ests) < h + 1:
        ests.append(ests[-1])
    cur = ests[0].select("id", F.col("est").alias("e0"))
    seen: set[int] = set()
    for t in range(1, h + 1):
        if id(ests[t]) in seen or ests[t] is ests[t - 1]:
            # fixpoint padding: reuse the previous column, no join
            cur = cur.withColumn(f"e{t}", F.col(f"e{t-1}"))
        else:
            seen.add(id(ests[t]))
            cur = cur.join(
                ests[t].select("id", F.col("est").alias(f"e{t}")), "id"
            )

    def _cleanup() -> None:
        freed: set[int] = set()
        for e in ests[1 : h + 1]:
            if id(e) not in freed:
                freed.add(id(e))
                free_local_checkpoint(e)
        free_local_checkpoint(res.state)

    return cur, _cleanup


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    h: int,
    *,
    m: int = 64,
    num_partitions: int | None = None,
    partitioner=None,
) -> DataFrame:
    """Per-vertex harmonic centrality estimate from the HyperANF
    sketches: (id, harmonic) with

        H(v) = Σ_{t=1..h} (|ball(v,t)| - |ball(v,t-1)|) / t

    — the Boldi-Vigna application of ANF (distances measured along
    OUT-edges here; pass reversed edges for the usual in-distance
    convention). |ball| estimates come from :func:`hll_estimates`, so
    the whole computation is deterministic given the integer sketches;
    the term sum is ONE fixed left-associative expression (t ascending),
    which makes the float result bit-reproducible and exactly
    SQL-replayable.
    """
    cur, cleanup = _hop_ball_profile(
        spark, edges, h, m=m, num_partitions=num_partitions,
        partitioner=partitioner,
    )
    expr = None
    for t in range(1, h + 1):
        term = (F.col(f"e{t}") - F.col(f"e{t-1}")) / F.lit(float(t))
        expr = term if expr is None else expr + term
    if expr is None:
        expr = F.lit(0.0)
    # materialize the V-row result BEFORE freeing the per-round sketch
    # storage it derives from; the caller owns `out` (free it with
    # free_local_checkpoint when done — same contract as PregelResult
    # state)
    out = cur.select("id", F.round(expr, 6).alias("harmonic")).localCheckpoint(
        eager=True
    )
    cleanup()
    return out


def closeness_centrality(
    spark: SparkSession,
    edges: DataFrame,
    h: int,
    *,
    m: int = 64,
    num_partitions: int | None = None,
    partitioner=None,
) -> DataFrame:
    """Per-vertex hop-bounded closeness centrality estimate from the
    same HyperANF sketches: (id, closeness) with

        C_h(v) = (|ball(v,h)| - |ball(v,0)|)
                 / Σ_{t=1..h} t · (|ball(v,t)| - |ball(v,t-1)|)

    — reachable-count over total distance within h hops (Wasserman-Faust
    numerator restricted to the h-ball; Boldi-Vigna estimate the same
    quantity from HyperANF counters). Vertices whose ball never grows
    (sinks with no out-neighbors) get closeness 0.0 by the exact-zero
    denominator guard — the subtraction of identical doubles is exactly
    0.0, so the guard is deterministic and replays in SQL. Same float-op
    ordering discipline as :func:`harmonic_centrality` (numerator first,
    denominator terms t ascending, one division, round 6).
    """
    cur, cleanup = _hop_ball_profile(
        spark, edges, h, m=m, num_partitions=num_partitions,
        partitioner=partitioner,
    )
    if h < 1:
        out = cur.select("id", F.lit(0.0).alias("closeness")).localCheckpoint(
            eager=True
        )
        cleanup()
        return out
    num = F.col(f"e{h}") - F.col("e0")
    den = None
    for t in range(1, h + 1):
        term = F.lit(float(t)) * (F.col(f"e{t}") - F.col(f"e{t-1}"))
        den = term if den is None else den + term
    expr = F.when(den == F.lit(0.0), F.lit(0.0)).otherwise(F.round(num / den, 6))
    out = cur.select("id", expr.alias("closeness")).transform(local_checkpoint_stats_reset)
    cleanup()
    return out


def effective_diameter(counts: list[float], q: float = 0.9) -> float:
    """Smallest h with N(h) ≥ q·N(max), linearly interpolated between
    hops (Boldi-Vigna convention)."""
    if not counts:
        return 0.0
    target = q * counts[-1]
    for i, c in enumerate(counts):
        if c >= target:
            if i == 0:
                return 0.0
            prev = counts[i - 1]
            if c == prev:
                return float(i)
            return (i - 1) + (target - prev) / (c - prev)
    return float(len(counts) - 1)


def effective_diameter_estimate(
    spark: SparkSession,
    edges: DataFrame,
    h: int,
    *,
    m: int = 64,
    q: float = 0.9,
    num_partitions: int | None = None,
    partitioner=None,
) -> tuple[float, list[int], PregelResult]:
    """``(eff_diameter, [N(0)..N(h)] in integer micros, sketch result)``.

    The oracle-replayable form of the neighborhood-function summary: the
    per-hop totals are Σ_v round(est(v)·10⁶) summed as BIGINT — each
    per-vertex HLL estimate is deterministic given the integer registers
    (:func:`hll_estimates`), and rounding to micros BEFORE the global
    sum makes the total independent of partition/accumulation order, so
    an external engine replaying the sketch chain reproduces every hop
    total bit-for-bit (the same trick as functions/importance.py's
    per-instance micros). The interpolated diameter is then pure
    arithmetic on those integers (:func:`effective_diameter` on their
    exact float images — micros < 2⁵³ at any realistic V).

    Per-hop cost on top of the superstep: one map-side-combinable
    aggregate over the sketch relation — nothing V²; at 10^12 edges the
    pass costs what ``anf_sketches`` costs.
    """
    micros = F.round(F.col("est") * 1e6, 0).cast("long")

    def _total(s: DataFrame) -> int:
        row = (
            hll_estimates(s, m)
            .agg(F.sum(micros).alias("n"))
            .collect()[0]
        )
        return int(row["n"] or 0)

    totals: list[int] = []

    def _record(t: int, state: DataFrame) -> None:
        totals.append(_total(state))

    res = anf_sketches(
        spark,
        edges,
        h,
        m=m,
        num_partitions=num_partitions,
        partitioner=partitioner,
        on_round=_record,
    )
    reg, val = hll_register(F.col("id"), m)
    init = res.state.select("id").distinct().select("id", reg, val)
    totals.insert(0, _total(init))
    if len(totals) < h + 1:
        last = _total(res.state)
        totals.extend([last] * (h + 1 - len(totals)))
    totals = totals[: h + 1]
    ed = effective_diameter([float(c) for c in totals], q)
    return ed, totals, res
