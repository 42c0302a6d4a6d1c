"""Local clustering by PPR sweep cut (Andersen, Chung & Lang 2006).

THE local-community primitive: given personalized-PageRank scores from
a seed (or seed set), order vertices by score and sweep prefixes
S_1 ⊂ S_2 ⊂ … — the prefix with minimum conductance is the seed's
local cluster, with ACL's theoretical guarantee tying its quality to
the PPR mixing. This composes two already-oracled engine pieces:
``pagerank(teleport=...)`` produces the scores, ``conductance``
semantics grade the prefixes — the sweep just evaluates every prefix
at once instead of one label set.

Sweep identity (what makes it one pass, not top_n conductance calls):
with vertices ranked by score and, per candidate v, ``deg(v)`` its
full-graph simple degree and ``e_before(v)`` its candidate neighbors
ranked strictly earlier,

    vol(k) = Σ_{i≤k} deg(v_i)
    cut(k) = vol(k) − 2·Σ_{i≤k} e_before(v_i)

so two running sums over the ranked relation give every prefix's
conductance cut(k)/min(vol(k), 2m − vol(k)).

Scale shape: candidates are the TOP ``top_n`` scores via a total-order
sort-limit (map-side TakeOrdered — no global sort); the ranking window
is a single task over top_n rows ONLY (document your top_n; PPR mass
concentrates, so hundreds-to-thousands covers any local cluster);
``e_before`` is one candidate-restricted adjacency join bounded by the
candidate set's edges. Scores are rounded to 6 places BEFORE ordering
(ties break by id) so the ranking is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duwamish_spark.graph import canonical_edges, require_columns


def ppr_sweep_cut(
    spark: SparkSession,
    edges: DataFrame,
    scores: DataFrame,
    *,
    top_n: int = 1000,
    score_col: str = "rank",
) -> DataFrame:
    """Sweep profile over the ``top_n`` highest-scored vertices: one row
    per prefix, ``(rank, id, score, degree, volume, cut, conductance)``
    — ``volume``/``cut``/``conductance`` are the PREFIX {rank' ≤ rank}
    aggregates; the min-conductance row is the local cluster boundary
    (NULL conductance where min(vol, 2m − vol) = 0)."""
    require_columns(edges, ("src", "dst"), "edges")
    require_columns(scores, ("id", score_col), "scores")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")

    sc = scores.select(
        "id", F.round(F.col(score_col), 6).alias("score")
    )
    cand = sc.orderBy(F.col("score").desc(), F.col("id").asc()).limit(top_n)
    wr = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    ranked = cand.select("id", "score", F.row_number().over(wr).alias("rank"))

    c = canonical_edges(edges)
    sym = c.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        c.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    ru = ranked.select(F.col("id").alias("u"), F.col("rank").alias("rank_u"))
    rv = ranked.select(F.col("id").alias("v"), F.col("rank").alias("rank_v"))
    eb = (
        sym.join(ru, "u")
        .join(rv, "v")
        .where(F.col("rank_v") < F.col("rank_u"))
        .groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("e_before"))
    )
    total = c.agg((2 * F.count(F.lit(1))).alias("vol_total"))

    base = (
        ranked.join(deg, "id", "left")
        .join(eb, "id", "left")
        .select(
            "rank",
            "id",
            "score",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("e_before", F.lit(0)).cast("long").alias("eb"),
        )
    )
    wc = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    prof = base.select(
        "rank",
        "id",
        "score",
        "degree",
        F.sum("degree").over(wc).cast("long").alias("volume"),
        (F.sum("degree").over(wc) - 2 * F.sum("eb").over(wc))
        .cast("long")
        .alias("cut"),
    )
    denom = F.least(F.col("volume"), F.col("vol_total") - F.col("volume"))
    return prof.crossJoin(total).select(
        "rank",
        "id",
        "score",
        "degree",
        "volume",
        "cut",
        F.when(denom > 0, F.round(F.col("cut").cast("double") / denom, 6)).alias(
            "conductance"
        ),
    )
