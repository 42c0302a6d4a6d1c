"""Exact triangle counting (north-rule algorithm #4, SURVEY.md §2.4).

Not iterative — a pure declarative 3-way self-join that Catalyst plans
end-to-end (sort-merge or shuffled-hash joins with AQE skew splitting):

1. canonicalize to distinct undirected edges with ``src < dst`` (each
   triangle now appears exactly once as a < b < c);
2. wedges: ``e1(a,b) ⋈ e2(b,c)`` on ``e1.dst = e2.src`` — because a < b and
   b < c, every wedge is already ordered;
3. close: wedge ⋈ edges on ``(a, c)``.

This is the DataFrame re-expression of the classic ordered-neighborhood
intersection (each vertex forwards its lower-id adjacency to higher-id
neighbors — the 2-superstep BSP formulation in SURVEY.md §2.4); the join
formulation lets Spark pick physical strategy and prune at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duwamish_spark.graph import canonical_edges


def _wedges(e: DataFrame) -> DataFrame:
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return e1.join(e2, "b")


def degree_oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient each distinct undirected edge from its lower-(degree, id)
    endpoint to its higher one.

    Id-ordering bounds nothing on skewed graphs: a hub of degree d
    generates O(d^2) wedges. Degree-ordering caps every vertex's oriented
    out-degree at O(sqrt(E)) (a vertex keeps an out-edge only toward
    same-or-higher-degree neighbors), so the wedge relation — the one
    intermediate that can explode at 10^12-file scale — stays O(E^1.5)
    worst-case and near-linear on power-law graphs.
    """
    und = canonical_edges(edges)
    deg = (
        und.select(F.col("src").alias("id"))
        .unionAll(und.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("id").alias("src"), F.col("d").alias("_ds"))
    db = deg.select(F.col("id").alias("dst"), F.col("d").alias("_dd"))
    w = und.join(da, "src").join(db, "dst")
    lower_first = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst"))
    )
    return w.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def triangle_count(edges: DataFrame, degree_ordered: bool = True) -> int:
    """Total number of distinct undirected triangles.

    ``degree_ordered=True`` (default) routes wedge generation through
    :func:`degree_oriented_edges`; the closing probe still runs against the
    canonical (id-ordered) edge set, so each triangle is counted exactly
    once — at its minimum-(degree, id) corner.
    """
    e = canonical_edges(edges)
    if degree_ordered:
        o = degree_oriented_edges(edges)
        wedges = o.select(F.col("src").alias("a"), F.col("dst").alias("b")).join(
            o.select(F.col("src").alias("a"), F.col("dst").alias("c")), "a"
        ).where(F.col("b") < F.col("c"))
        closing = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        return wedges.join(closing, ["b", "c"]).count()
    closing = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return _wedges(e).join(closing, ["a", "c"]).count()


def triangle_count_per_vertex(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """(id, triangles) — number of triangles each vertex participates in.

    Every triangle (a,b,c) contributes one count to each corner.
    """
    e = canonical_edges(edges)
    closing = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = _wedges(e).join(closing, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    if vertices is not None:
        counts = vertices.join(counts, "id", "left").select(
            "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
        )
    return counts
