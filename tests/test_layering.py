"""Topological layering (longest-path build depth) vs brute DP oracles."""

from __future__ import annotations

import random

import pytest

from conftest import vertices_df
from duwamish_spark.algorithms import topological_depth
from duwamish_spark.pregel import free_local_checkpoint


def _run(spark, ids, edges, **kw):
    e = spark.createDataFrame(edges, "src string, dst string") if edges else (
        spark.createDataFrame([], "src string, dst string")
    )
    res = topological_depth(spark, vertices_df(spark, ids), e, **kw)
    got = {r["id"]: r["depth"] for r in res.state.collect()}
    free_local_checkpoint(res.state)
    return got, res


def _brute_rounds(ids, edges, t):
    """Replay of the bounded recurrence: longest walk of length <= t
    ending at each vertex over distinct simple arcs."""
    arcs = {(a, b) for a, b in edges if a != b}
    d = {v: 0 for v in ids}
    for _ in range(t):
        nxt = dict(d)
        for a, b in arcs:
            nxt[b] = max(nxt[b], d[a] + 1)
        d = nxt
    return d


def _brute_dag_longest(ids, edges):
    """Exact longest-path depth on a DAG (edges must be acyclic)."""
    d = _brute_rounds(ids, edges, len(ids))
    assert d == _brute_rounds(ids, edges, len(ids) + 1), "not a DAG"
    return d


def test_chain_and_diamond(spark):
    # 0→1→2→3 plus shortcut 0→3: depth = longest path, not shortest
    ids = ["0", "1", "2", "3"]
    edges = [("0", "1"), ("1", "2"), ("2", "3"), ("0", "3")]
    got, res = _run(spark, ids, edges)
    assert got == {"0": 0, "1": 1, "2": 2, "3": 3}
    assert res.halted


def test_duplicate_arcs_and_self_loops_ignored(spark):
    ids = ["a", "b"]
    edges = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "b")]
    got, res = _run(spark, ids, edges)
    assert got == {"a": 0, "b": 1}
    assert res.halted


def test_isolated_vertices_and_empty_edges(spark):
    got, res = _run(spark, ["x", "y"], [])
    assert got == {"x": 0, "y": 0}
    assert res.halted


@pytest.mark.parametrize("n,m,seed", [(30, 60, 3), (60, 200, 4)])
def test_random_dag_matches_longest_path(spark, n, m, seed):
    rng = random.Random(seed)
    ids = [str(i) for i in range(n)]
    # i -> j with i < j only: acyclic by construction
    edges = []
    for _ in range(m):
        i = rng.randrange(n - 1)
        j = rng.randrange(i + 1, n)
        edges.append((str(i), str(j)))
    got, res = _run(spark, ids, edges)
    assert res.halted
    assert got == _brute_dag_longest(ids, edges)


def test_cycle_caps_at_budget(spark):
    # 3-cycle: depth keeps climbing; budget caps the walk length
    ids = ["0", "1", "2"]
    edges = [("0", "1"), ("1", "2"), ("2", "0")]
    got, res = _run(spark, ids, edges, max_supersteps=5)
    assert not res.halted
    assert got == _brute_rounds(ids, edges, 5)


@pytest.mark.parametrize("n,m,seed,rounds", [(25, 80, 7, 3), (40, 150, 8, 4)])
def test_bounded_rounds_match_recurrence_with_cycles(spark, n, m, seed, rounds):
    rng = random.Random(seed)
    ids = [str(i) for i in range(n)]
    edges = [
        (str(rng.randrange(n)), str(rng.randrange(n))) for _ in range(m)
    ]
    got, _ = _run(spark, ids, edges, max_supersteps=rounds)
    assert got == _brute_rounds(ids, edges, rounds)
