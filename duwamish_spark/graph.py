"""Graph-table derivations shared by all algorithms (FIXTURES.md F2).

Conventions (pinned; they are correctness-relevant):

- ``vertices(id)``: one row per corpus file **and** per referenced id, so
  every message destination exists. This turns the reference's
  orphan-message hazard (a message to an unknown vertex stalls the shared
  cursor — reference: Partition.java:391-393) into defined drop/left-join
  semantics: unknown destinations simply never match a state row.
- ``edges(src, dst)``: directed, duplicates + self-loops preserved.
- ``degrees(id, out_degree)``: every vertex present, dangling vertices with
  0 (the reference keeps dangling vertices alive because the vertex file
  drives iteration; reference: Partition.java:196, PageRank.java:58-63).
- ``symmetrize``: undirected view for CC/LP — union of edges and reversed
  edges, self-loops dropped, deduplicated.
- ``canonical_edges``: undirected distinct ``src < dst`` pairs (triangles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertices_from(corpus_ids: DataFrame | None, edges: DataFrame) -> DataFrame:
    """``vertices(id)`` = corpus file ids ∪ edge endpoints, distinct.

    ``corpus_ids`` is a single-column DF of file ids (may be None when the
    graph comes straight from an edge list).
    """
    ids = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    if corpus_ids is not None:
        ids = ids.unionAll(corpus_ids.toDF("id"))
    return ids.distinct()


def corpus_vertex_ids(corpus: DataFrame) -> DataFrame:
    return corpus.select(F.concat_ws("/", "repo", "path").alias("id"))


def out_degrees(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """``(id, out_degree)`` with dangling vertices present at 0."""
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    return vertices.join(deg, "id", "left").select(
        "id", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected adjacency for CC/LP: both directions, no self-loops, distinct."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected pairs with ``src < dst`` (triangle counting)."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
