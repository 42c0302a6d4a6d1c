from __future__ import annotations

import pytest

from conftest import edges_df, vertices_df
from duwamish_spark.algorithms import triangle_count, triangle_count_per_vertex
from oracle import rand_graph, triangle_oracle


def test_cycle3_is_one_triangle(spark):
    # directed cycle canonicalizes to one undirected triangle (FIXTURES.md F4:
    # the undirected-canonicalization convention is pinned here)
    e = edges_df(spark, [("0", "1"), ("1", "2"), ("2", "0")])
    assert triangle_count(e) == 1


def test_two_triangles(spark):
    e = edges_df(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"), ("f", "d")],
    )
    assert triangle_count(e) == 2


def test_dup_selfloop_ignored(spark):
    e = edges_df(
        spark,
        [("0", "1"), ("1", "0"), ("1", "2"), ("2", "0"), ("0", "0"), ("2", "0")],
    )
    assert triangle_count(e) == 1


@pytest.mark.parametrize("v,maxdeg,seed", [(100, 8, 10), (300, 12, 11)])
def test_random_vs_oracle_exact(spark, v, maxdeg, seed):
    ids, edges = rand_graph(v, maxdeg, seed)
    assert triangle_count(edges_df(spark, edges)) == triangle_oracle(edges)


def test_per_vertex_sums_to_3x_total(spark):
    ids, edges = rand_graph(120, 10, 12)
    df = edges_df(spark, edges)
    per_v = triangle_count_per_vertex(df, vertices_df(spark, ids)).collect()
    assert sum(r["triangles"] for r in per_v) == 3 * triangle_count(df)


def test_degree_ordered_equals_id_ordered(spark):
    from oracle import rand_graph

    from duwamish_spark.algorithms.triangles import triangle_count

    _, edges = rand_graph(120, 8, 17)
    e = edges_df(spark, edges)
    assert triangle_count(e, degree_ordered=True) == triangle_count(
        e, degree_ordered=False
    )
