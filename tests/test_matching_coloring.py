"""Maximal matching and Jones–Plassmann coloring — brute-force replays.

Both are deterministic (fixed md5 priorities), so the tests pin EXACT
equality against sequential Python replays of the same round semantics,
plus the structural invariants (matching validity + maximality; proper
coloring) on random graphs.
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from duwamish_spark.algorithms import greedy_coloring, maximal_matching
from duwamish_spark.graph import vertices_from

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("a", "b"), ("e", "a"), ("e", "e"),
]


def _graph(spark, edges=EDGES):
    e = spark.createDataFrame(edges, "src string, dst string")
    return vertices_from(None, e), e


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _sym_simple(edges):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict[str, set[str]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return und, adj


def _matching_replay(edges, seed="matching", max_rounds=60):
    """Sequential replay of the engine's mutual-pick rounds."""
    und, _ = _sym_simple(edges)
    live = set(und)
    mate: dict[str, tuple[str, int]] = {}
    for r in range(1, max_rounds + 1):
        if not live:
            break
        pick: dict[str, tuple] = {}
        for u, v in live:
            key = (_u32(f"{seed}:{u}:{v}"), u, v)
            for x in (u, v):
                if x not in pick or key > pick[x]:
                    pick[x] = key
        matched = {
            (u, v) for (u, v) in live if pick[u] == pick[v] == (_u32(f"{seed}:{u}:{v}"), u, v)
        }
        for u, v in matched:
            mate[u] = (v, r)
            mate[v] = (u, r)
        gone = {x for p in matched for x in p}
        live = {(u, v) for (u, v) in live if u not in gone and v not in gone}
    return mate, not live


def _coloring_replay(edges, vids, seed="coloring", max_rounds=60):
    """Sequential replay of the engine's Jones–Plassmann rounds."""
    _, adj = _sym_simple(edges)
    pri = {v: (_u32(f"{seed}:{v}"), v) for v in vids}
    uncolored = set(vids)
    color: dict[str, tuple[int, int]] = {}
    for r in range(1, max_rounds + 1):
        if not uncolored:
            break
        winners = {
            v for v in uncolored
            if all(
                pri[v] > pri[n]
                for n in adj.get(v, ())
                if n in uncolored and n != v
            )
        }
        for v in winners:
            used = {
                color[n][0] for n in adj.get(v, ()) if n in color
            }
            c = 0
            while c in used:
                c += 1
            color[v] = (c, r)
        uncolored -= winners
    return color, not uncolored


def test_matching_matches_replay(spark):
    v, e = _graph(spark)
    res = maximal_matching(spark, v, e)
    assert res.halted
    got = {
        r["id"]: (r["mate"], r["round"]) for r in res.state.collect()
    }
    mate, done = _matching_replay(EDGES)
    assert done
    ids = sorted({x for p in EDGES for x in p})
    for d in ids:
        assert got[d] == (mate[d] if d in mate else (None, None))


def test_matching_validity_and_maximality_random(spark):
    rng = random.Random(11)
    edges = list({
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}") for _ in range(120)
    })
    v, e = _graph(spark, edges)
    res = maximal_matching(spark, v, e)
    assert res.halted
    got = {r["id"]: r["mate"] for r in res.state.collect()}
    # validity: mate is symmetric, nobody matched to self
    for d, m in got.items():
        if m is not None:
            assert m != d and got[m] == d
    # maximality: no simple edge joins two unmatched vertices
    und, _ = _sym_simple(edges)
    for u, w in und:
        assert got.get(u) is not None or got.get(w) is not None, (u, w)
    # exact replay equality
    mate, done = _matching_replay(edges)
    assert done
    for d in got:
        assert got[d] == (mate[d][0] if d in mate else None)


def test_matching_empty_edges(spark):
    e = spark.createDataFrame([], "src string, dst string")
    v = spark.createDataFrame([("a",), ("b",)], "id string")
    res = maximal_matching(spark, v, e)
    assert res.halted and res.supersteps == 0
    got = {r["id"]: r["mate"] for r in res.state.collect()}
    assert got == {"a": None, "b": None}


def test_matching_endpoints_outside_vertices_ignored(spark):
    e = spark.createDataFrame([("a", "zz"), ("a", "b")], "src string, dst string")
    v = spark.createDataFrame([("a",), ("b",)], "id string")
    res = maximal_matching(spark, v, e)
    got = {r["id"]: r["mate"] for r in res.state.collect()}
    assert set(got) == {"a", "b"} and got["a"] == "b" and got["b"] == "a"


def test_coloring_matches_replay(spark):
    v, e = _graph(spark)
    res = greedy_coloring(spark, v, e)
    assert res.halted
    got = {
        r["id"]: (r["color"], r["round"]) for r in res.state.collect()
    }
    ids = sorted({x for p in EDGES for x in p})
    color, done = _coloring_replay(EDGES, ids)
    assert done
    for d in ids:
        assert got[d] == color[d], (d, got[d], color[d])


def test_coloring_proper_and_replay_random(spark):
    rng = random.Random(13)
    edges = list({
        (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(150)
    })
    v, e = _graph(spark, edges)
    res = greedy_coloring(spark, v, e)
    assert res.halted
    got = {r["id"]: r["color"] for r in res.state.collect()}
    und, _ = _sym_simple(edges)
    # properness: no simple edge joins two equal colors
    for u, w in und:
        assert got[u] != got[w], (u, w, got[u])
    ids = sorted({x for p in edges for x in p})
    color, done = _coloring_replay(edges, ids)
    assert done
    for d in ids:
        assert got[d] == color[d][0]


def test_coloring_star_two_colors(spark):
    # star: hub + leaves — greedy coloring must use exactly 2 colors
    edges = [("hub", f"l{i}") for i in range(12)]
    v, e = _graph(spark, edges)
    res = greedy_coloring(spark, v, e)
    assert res.halted
    got = {r["id"]: r["color"] for r in res.state.collect()}
    assert len({got[f"l{i}"] for i in range(12)}) == 1
    assert got["hub"] != got["l0"]
    assert max(got.values()) <= 1


def test_coloring_budget_exhaustion_contract(spark):
    # path graph forces several rounds; a 1-round budget leaves NULLs
    edges = [(f"p{i}", f"p{i+1}") for i in range(20)]
    v, e = _graph(spark, edges)
    res = greedy_coloring(spark, v, e, max_rounds=1)
    assert not res.halted
    rows = res.state.collect()
    assert len(rows) == 21  # one row per vertex, undecided included
    undecided = [r for r in rows if r["color"] is None]
    assert undecided  # a 21-path cannot fully color in one round
    # whatever IS colored in round 1 is color 0 and proper
    for r in rows:
        if r["color"] is not None:
            assert r["color"] == 0 and r["round"] == 1
