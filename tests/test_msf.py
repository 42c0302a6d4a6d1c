"""Borůvka minimum spanning forest vs a sequential Kruskal oracle.

The total order (w, u, v) makes the MSF unique, so the tests assert
exact edge-set equality, not just weight-sum equality.
"""

from __future__ import annotations

import random
from collections import defaultdict

from duwamish_spark.algorithms.msf import (
    boruvka_min_edges,
    minimum_spanning_forest,
    weighted_canonical_edges,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _canon(edges):
    """(u, v) -> weight = -multiplicity, mirroring weighted_canonical_edges."""
    mult = defaultdict(int)
    for a, b in edges:
        if a != b:
            mult[(min(a, b), max(a, b))] += 1
    return {(u, v): -c for (u, v), c in mult.items()}


def _kruskal(wmap):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for (u, v), w in sorted(wmap.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.append((u, v, w))
    return sorted(forest)


def _brute_round1(wmap):
    best = {}
    for (u, v), w in wmap.items():
        for c in (u, v):
            k = (w, u, v)
            if c not in best or k < best[c]:
                best[c] = k
    return sorted({(u, v, w) for (w, u, v) in best.values()})


FIX = [
    (1, 2), (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6),
    (6, 7), (1, 4), (2, 2), (8, 1), (8, 2), (8, 3), (8, 4),
    (20, 21),               # separate component
    (30, 31), (31, 32), (32, 33), (30, 33),  # 4-cycle component
]


def test_round1_matches_brute(spark):
    w = weighted_canonical_edges(_edges_df(spark, FIX))
    got = sorted(tuple(r) for r in boruvka_min_edges(w).collect())
    assert got == _brute_round1(_canon(FIX))


def test_msf_matches_kruskal_fixture(spark):
    res = minimum_spanning_forest(spark, _edges_df(spark, FIX))
    got = sorted(tuple(r) for r in res.forest.collect())
    assert got == _kruskal(_canon(FIX))
    assert res.halted
    res.free()


def test_msf_matches_kruskal_random_graphs(spark):
    for seed in (3, 17):
        rng = random.Random(seed)
        edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(250)]
        res = minimum_spanning_forest(spark, _edges_df(spark, edges))
        got = sorted(tuple(r) for r in res.forest.collect())
        assert got == _kruskal(_canon(edges)), f"seed {seed}"
        res.free()


def test_msf_path_graph_chain_selection(spark):
    # monotone-weight path: round-1 selections form a chain — the
    # worst case for contraction; the CC delegate must still merge it
    edges = []
    for i in range(20):
        edges += [(i, i + 1)] * (i + 1)  # multiplicity grows along the path
    res = minimum_spanning_forest(spark, _edges_df(spark, edges))
    got = sorted(tuple(r) for r in res.forest.collect())
    assert got == _kruskal(_canon(edges))
    # a path's MSF is the path itself
    assert len(got) == 20
    res.free()


def test_msf_components_match_graph_components(spark):
    res = minimum_spanning_forest(spark, _edges_df(spark, FIX))
    comp = {r["id"]: r["comp"] for r in res.components.collect()}
    # 1..8 one component, 20/21 another, 30..33 another
    assert len({comp[i] for i in range(1, 9)}) == 1
    assert comp[20] == comp[21]
    assert len({comp[i] for i in (30, 31, 32, 33)}) == 1
    assert len({comp[1], comp[20], comp[30]}) == 3
    # forest size = V - #components (V counts only non-isolated vertices)
    n_comp = len(set(comp.values()))
    assert res.forest.count() == len(comp) - n_comp
    res.free()


def test_msf_explicit_weight_col(spark):
    rows = [(1, 2, 5.0), (2, 3, 1.0), (1, 3, 2.0), (3, 4, 9.0), (1, 4, 4.0)]
    df = spark.createDataFrame(rows, "src long, dst long, cost double")
    res = minimum_spanning_forest(spark, df, weight_col="cost")
    got = sorted(tuple(r) for r in res.forest.collect())
    assert got == [(1, 3, 2.0), (1, 4, 4.0), (2, 3, 1.0)]
    res.free()
