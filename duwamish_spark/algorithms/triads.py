"""Directed triad census (Holland & Leinhardt 1970): counts of all 16
triad isomorphism classes — the classic micro-structure fingerprint of
a directed graph (transitivity vs cyclicity, hierarchy vs reciprocity;
on an import graph 030T vs 030C is the layering-vs-cycle signal that
``topological_depth`` certifies one instance of).

Output: 16 rows ``(triad, count)`` with the standard MAN-code names
(003, 012, 102, 021D/U/C, 111D/U, 030T/C, 201, 120D/U/C, 210, 300),
counts as DECIMAL(38,0) — at 10^12 vertices C(n,3) ≈ 10^35 ≫ 2^63, the
degree_assortativity overflow discipline.

Algorithm (Batagelj & Mrvar 2001's subtraction scheme, the standard
scalable form): only triads with ≥ 2 connected dyads are ENUMERATED —
their number is the wedge count, i.e. output-bound — and the 0/1-dyad
classes follow in closed form from the dyad census:

    count(012) = A·(n−2) − Σ_enum asym_dyads(T)
    count(102) = M·(n−2) − Σ_enum mutual_dyads(T)
    count(003) = C(n,3) − |enum| − count(012) − count(102)

Enumeration emits each qualifying triple exactly once with no dedup
shuffle: a 2-dyad triple appears as exactly one wedge (its unique
center); a 3-dyad triple appears as three wedges and is kept only at
its minimum-id center (``a < b`` filter on closed wedges).

Classification is pure integer arithmetic: per vertex the within-triple
(in, out) degree pair is encoded as ``in·3 + out`` and the sorted
3-multiset of codes keys the class — verified exhaustively (all 64
flag patterns, canonicalized by vertex permutation) to separate the 16
classes uniquely, so no 64-way CASE is needed. Everything is
SQL-replayable bit-for-bit.

Scale: the wedge relation is Σ_v C(d(v), 2) rows — proportional to the
2-dyad census itself, so the work is output-bound, not wasted; a
10^8-degree hub still quadratically dominates, so ``max_center_degree``
(the link_prediction guard) drops wedges CENTERED at hubs above the
cap — a documented approximation (021/030/111/120/201/210/300 counts
become lower bounds, the subtraction classes upper bounds), exact when
None.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import require_columns
from duwamish_spark.pregel import (
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)

# sorted (in*3+out) code-multiset -> MAN-variant name; exhaustively
# validated (tests/test_triads.py regenerates this table from first
# principles and asserts equality)
TRIAD_KEYS = {
    (1, 1, 6): "021U",
    (1, 3, 4): "021C",
    (1, 4, 7): "111D",
    (2, 3, 3): "021D",
    (2, 4, 6): "030T",
    (2, 7, 7): "120D",
    (3, 4, 5): "111U",
    (4, 4, 4): "030C",
    (4, 4, 8): "201",
    (4, 5, 7): "120C",
    (5, 5, 6): "120U",
    (5, 7, 8): "210",
    (8, 8, 8): "300",
}
TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _dyads(edges: DataFrame) -> DataFrame:
    """(u, v, fuv, fvu) per connected unordered pair, u < v."""
    de = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return (
        de.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("fuv"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("fvu"),
        )
        .groupBy("u", "v")
        .agg(F.max("fuv").alias("fuv"), F.max("fvu").alias("fvu"))
    )


def triad_census(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_center_degree: int | None = None,
) -> DataFrame:
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")
    # the dyad relation feeds FOUR consumers (scalar census, both sym
    # halves, the closing-pair probe) — checkpoint it once instead of
    # re-scanning + re-shuffling the edge table per consumer
    dy = _dyads(edges).transform(local_checkpoint_stats_reset)

    # scalar dyad census (one row): M mutual, A asym, n vertices
    scal = (
        dy.agg(
            F.coalesce(F.sum(F.col("fuv") * F.col("fvu")), F.lit(0)).alias("m_d"),
            F.coalesce(
                F.sum(F.when(F.col("fuv") + F.col("fvu") == 1, 1).otherwise(0)),
                F.lit(0),
            ).alias("a_d"),
        )
        .crossJoin(vertices.agg(F.count(F.lit(1)).alias("n")))
    )

    # symmetric adjacency with per-direction flags: (a, b, fab, fba)
    sym = dy.select(
        F.col("u").alias("a"), F.col("v").alias("b"),
        F.col("fuv").alias("fab"), F.col("fvu").alias("fba"),
    ).unionAll(
        dy.select(
            F.col("v").alias("a"), F.col("u").alias("b"),
            F.col("fvu").alias("fab"), F.col("fuv").alias("fba"),
        )
    )
    if max_center_degree is not None:
        deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("cd"))
        sym = sym.join(
            deg.where(F.col("cd") <= max_center_degree).select("a"), "a"
        )

    # wedges centered a over the pair b < c, with the (b,c) dyad state
    left = sym.select("a", F.col("b"), F.col("fab"), F.col("fba"))
    right = sym.select(
        F.col("a"), F.col("b").alias("c"),
        F.col("fab").alias("fac"), F.col("fba").alias("fca"),
    )
    wed = (
        left.join(right, "a")
        .where(F.col("b") < F.col("c"))
        .join(
            dy.select(
                F.col("u").alias("b"), F.col("v").alias("c"),
                F.col("fuv").alias("fbc"), F.col("fvu").alias("fcb"),
            ),
            ["b", "c"],
            "left",
        )
        .select(
            "a", "b", "c", "fab", "fba", "fac", "fca",
            F.coalesce("fbc", F.lit(0)).alias("fbc"),
            F.coalesce("fcb", F.lit(0)).alias("fcb"),
        )
    )
    # open wedge (2-dyad triple): unique center — keep all;
    # closed wedge (3-dyad triple): keep only the minimum-id center
    closed = F.col("fbc") + F.col("fcb") > 0
    enum = wed.where(~closed | (F.col("a") < F.col("b")))

    ca = (F.col("fba") + F.col("fca")) * 3 + (F.col("fab") + F.col("fac"))
    cb = (F.col("fab") + F.col("fcb")) * 3 + (F.col("fba") + F.col("fbc"))
    cc = (F.col("fac") + F.col("fbc")) * 3 + (F.col("fca") + F.col("fcb"))
    lo = F.least(ca, cb, cc)
    hi = F.greatest(ca, cb, cc)
    mid = ca + cb + cc - lo - hi
    key = lo * 81 + mid * 9 + hi

    pairs = [("fab", "fba"), ("fac", "fca"), ("fbc", "fcb")]
    m_cnt = sum(F.col(x) * F.col(y) for x, y in pairs)
    a_cnt = sum(
        F.when(F.col(x) + F.col(y) == 1, 1).otherwise(0) for x, y in pairs
    )

    name = None
    for k, nm in sorted(TRIAD_KEYS.items()):
        kv = k[0] * 81 + k[1] * 9 + k[2]
        branch = (key == kv, F.lit(nm))
        name = F.when(*branch) if name is None else name.when(*branch)

    per = enum.select(
        name.alias("triad"),
        m_cnt.alias("mc"),
        a_cnt.alias("ac"),
    )
    counted = per.groupBy("triad").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("count")
    )
    totals = per.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("t_enum"),
        F.coalesce(F.sum("ac"), F.lit(0)).alias("sum_a"),
        F.coalesce(F.sum("mc"), F.lit(0)).alias("sum_m"),
    )

    # closed forms in DECIMAL(38,0); C(n,3) by exact factor-wise integer
    # division (the even factor of {n, n-1} halves; the ≡0 (mod 3)
    # factor of {n, n-1, n-2} thirds — no fractional intermediate ever)
    s = scal.crossJoin(totals)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n = F.col("n")
    f1 = F.when(n % 2 == 0, F.expr("n DIV 2")).otherwise(n).cast("long")
    f2 = F.when(n % 2 == 0, n - 1).otherwise(F.expr("(n - 1) DIV 2")).cast("long")
    f3 = (n - 2).cast("long")
    g1 = F.when(n % 3 == 0, F.floor(f1 / 3)).otherwise(f1).cast("long")
    g2 = F.when(n % 3 == 1, F.floor(f2 / 3)).otherwise(f2).cast("long")
    g3 = F.when(n % 3 == 2, F.floor(f3 / 3)).otherwise(f3).cast("long")
    cn3 = F.when(n >= 3, d(g1) * d(g2) * d(g3)).otherwise(F.lit(0)).cast(
        "decimal(38,0)"
    )
    third = (n - 2).cast("decimal(38,0)")
    c012 = (d(F.col("a_d")) * third - d(F.col("sum_a"))).cast("decimal(38,0)")
    c102 = (d(F.col("m_d")) * third - d(F.col("sum_m"))).cast("decimal(38,0)")
    c003 = (cn3 - d(F.col("t_enum")) - c012 - c102).cast("decimal(38,0)")
    rest = s.select(
        F.explode(
            F.array(
                F.struct(F.lit("003").alias("triad"), c003.alias("count")),
                F.struct(F.lit("012").alias("triad"), c012.alias("count")),
                F.struct(F.lit("102").alias("triad"), c102.alias("count")),
            )
        ).alias("r")
    ).select("r.triad", "r.count")

    names = spark.createDataFrame(
        [(t,) for t in TRIAD_NAMES], "triad string"
    )
    out = names.join(counted.unionAll(rest), "triad", "left").select(
        "triad",
        F.coalesce("count", F.lit(0).cast("decimal(38,0)")).alias("count"),
    )
    # the census IS a 16-row scalar summary (triangle_count discipline):
    # materialize it so the dyad checkpoint can be freed before return
    rows = out.collect()
    free_local_checkpoint(dy)
    return spark.createDataFrame(rows, "triad string, count decimal(38,0)")
