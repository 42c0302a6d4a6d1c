"""Seeded SimRank via deterministic coupled reverse-walk fingerprints
(Fogaras & Rácz 2005's scalable estimator of Jeh & Widom 2002).

SimRank — "two pages are similar if similar pages point to them" — is
THE link-based similarity score, but its exact recurrence is over ALL
vertex pairs (O(V²) state), which no 10^12-vertex engine can hold. The
scalable formulation is the random-surfer identity: s(a, b) is the
expected value of decay^τ where τ is the first MEETING time of two
backward random walks started at a and b. The fingerprint trick makes
that computable from LINEAR state: use one COUPLED walk per vertex per
repetition — the move out of position p at step t of repetition r is a
pure function H(salt, r, t, p) of the position, NOT of the walk's
origin — so two walks that ever coincide merge and stay merged, and
every pairwise meeting time can be read off V·R walk trajectories
instead of V² pair walks.

Determinism contract (oracle-able, resumable, partitioning-stable):
the step choice is the engine's hash-ladder —

    next(p) = in_neighbors(p)[ u32(md5(salt:r:t:p)) mod in_degree(p) ]

over the ASCENDING distinct in-neighbor list (self-loops dropped), the
same cross-engine md5/u32 family as random_walks; dead ends (no
in-edges) terminate the trajectory. decay^τ is emitted in EXACT
integer micros via a literal per-τ table (floats never accumulate:
per-rep micros are summed as BIGINT, one final division, round 6), so
a DuckDB chained CTE replays every score bit-for-bit.

Estimator semantics (documented approximation): with R repetitions of
length L the score is  s(a,b) ≈ (1/R)·Σ_r decay^{τ_r},  τ_r the first
meeting step ≤ L (unmet repetitions contribute 0). It is unbiased for
the truncated-walk SimRank variant, symmetric, and s(a,a) = 1 exactly
(walks coincide at t=0). Accuracy grows as 1/√R — R is the quality
knob, L bounds the horizon like every truncated SimRank.

Scale shape: trajectory state is V·R rows per step (never E after the
one-time ranked-adjacency prep — the random_walks plan); the seed side
collapses to |S|·R·(L+1) position rows broadcast into one keyed join
on (r, t, position); output is sparse (only pairs that actually met).
Reference scope: duwamish has no similarity program; this extends the
engine's link-analysis family on the walk machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duwamish_spark.graph import require_columns
from duwamish_spark.pregel import (
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def decay_micros_table(decay: float, walk_length: int) -> list[int]:
    """Exact per-τ score literals: round(10^6 · decay^τ) for τ = 0..L.
    Computed ONCE driver-side in Python so engine and oracle embed the
    same integers — cross-engine pow() rounding can never bite."""
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    return [round(1_000_000 * decay**t) for t in range(walk_length + 1)]


def _pos_hash(rep: F.Column, step: int, pos: F.Column, salt: str) -> F.Column:
    key = F.concat_ws(
        ":", F.lit(salt), rep.cast("string"), F.lit(str(step)), pos.cast("string")
    )
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def simrank_seeded(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    n_walks: int = 8,
    walk_length: int = 5,
    decay: float = 0.8,
    salt: str = "sr",
) -> DataFrame:
    """(seed, id, met_reps, simrank) for every vertex that met any of
    ``seeds``'s coupled walks within ``walk_length`` steps — SimRank
    similarity of each seed to the rest of the graph. ``seeds`` is a
    DataFrame (id); pairs that never meet are absent (score 0)."""
    require_columns(edges, ("src", "dst"), "edges")
    require_columns(seeds, ("id",), "seeds")
    if n_walks < 1 or walk_length < 0:
        raise ValueError("n_walks must be >= 1 and walk_length >= 0")
    micros = decay_micros_table(decay, walk_length)

    de = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # ranked in-neighbor list + in-degrees of the REVERSED graph
    w = Window.partitionBy("v").orderBy("nb")
    rin = (
        de.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
        .withColumn("idx", F.row_number().over(w) - 1)
        .transform(local_checkpoint_stats_reset)
    )
    indeg = rin.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))

    verts = (
        de.select(F.col("src").alias("id"))
        .unionAll(de.select(F.col("dst").alias("id")))
        .distinct()
    )
    reps = spark.range(n_walks).select(F.col("id").cast("int").alias("r"))
    state = (
        verts.crossJoin(reps)
        .select("id", "r", F.col("id").alias("pos"), F.lit(0).alias("t"))
        .transform(local_checkpoint_stats_reset)
    )
    rin2 = rin.select(
        F.col("v").alias("pv"), F.col("idx").alias("pidx"), F.col("nb")
    )
    positions = [state]
    cur = state
    for t in range(1, walk_length + 1):
        h = _pos_hash(F.col("r"), t - 1, F.col("pos"), salt)
        nxt = (
            cur.join(indeg, cur["pos"] == indeg["v"])
            .select("id", "r", "pos", (h % F.col("cnt")).alias("idx"))
            .join(
                rin2,
                (F.col("pos") == F.col("pv")) & (F.col("idx") == F.col("pidx")),
            )
            .select("id", "r", F.col("nb").alias("pos"), F.lit(t).alias("t"))
            .transform(local_checkpoint_stats_reset)
        )
        positions.append(nxt)
        cur = nxt

    allpos = positions[0]
    for p in positions[1:]:
        allpos = allpos.unionAll(p)

    sp = allpos.join(seeds.select("id"), "id", "left_semi").select(
        F.col("id").alias("seed"), "r", "t", "pos"
    )
    meet = (
        allpos.join(F.broadcast(sp), ["r", "t", "pos"])
        .groupBy("seed", F.col("id"), "r")
        .agg(F.min("t").alias("mt"))
    )
    mcol = None
    for t, m in enumerate(micros):
        branch = (F.col("mt") == t, F.lit(m))
        mcol = F.when(*branch) if mcol is None else mcol.when(*branch)
    scored = meet.select("seed", "id", mcol.cast("long").alias("mu"))
    out = (
        scored.groupBy("seed", "id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("met_reps"),
            F.sum("mu").alias("musum"),
        )
        .select(
            "seed",
            "id",
            "met_reps",
            F.round(
                F.col("musum").cast("double") / F.lit(float(n_walks * 1_000_000)),
                6,
            ).alias("simrank"),
        )
    )
    # materialize the (sparse) result BEFORE freeing the trajectory
    # checkpoints it reads from — localCheckpoints have no lineage to
    # recompute (the densest.py return_best lesson); callers free the
    # returned frame when done
    out = out.transform(local_checkpoint_stats_reset)
    for p in positions:
        free_local_checkpoint(p)
    free_local_checkpoint(rin)
    return out
