"""Weisfeiler-Lehman role signatures vs a pure-Python hashed-WL replay
and the classic 1-WL distinguishing properties."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

import pytest

from conftest import edges_df, vertices_df
from duwamish_spark.algorithms import wl_signatures
from duwamish_spark.pregel import free_local_checkpoint


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _brute_wl(ids, edges, rounds):
    nb = defaultdict(set)
    for a, b in edges:
        if a != b:
            nb[a].add(b)
            nb[b].add(a)
    sig = {v: _u32(f"wl0:{len(nb[v])}") for v in ids}
    for t in range(1, rounds + 1):
        h = {v: _u32(f"wlh:{sig[v]}") for v in ids}
        sig = {
            v: _u32(f"wl{t}:{sig[v]}:{sum(h[u] for u in nb[v])}")
            for v in ids
        }
    return sig


def _run(spark, ids, edges, rounds):
    res = wl_signatures(
        spark, vertices_df(spark, ids), edges_df(spark, edges), rounds=rounds
    )
    got = {r["id"]: r["wl_sig"] for r in res.state.collect()}
    free_local_checkpoint(res.state)
    return got, res


def test_wl_matches_brute_fixed(spark):
    ids = list("abcdefg")
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # triangle
        ("c", "d"), ("d", "e"),               # tail
        ("f", "f"),                           # self loop: isolated for WL
    ]                                          # g fully isolated
    for rounds in (0, 1, 3):
        got, res = _run(spark, ids, edges, rounds)
        assert got == _brute_wl(ids, edges, rounds), rounds
        assert res.supersteps == rounds
    # self-loop-only and fully-isolated vertices refine identically
    assert got["f"] == got["g"]


def test_wl_matches_brute_random(spark):
    for seed, n, m in [(7, 30, 90), (21, 50, 200)]:
        rng = random.Random(seed)
        ids = [f"v{i}" for i in range(n)]
        edges = [(ids[rng.randrange(n)], ids[rng.randrange(n)]) for _ in range(m)]
        got, _ = _run(spark, ids, edges, 3)
        assert got == _brute_wl(ids, edges, 3), seed


def test_wl_structural_equivalence(spark):
    # two disjoint triangles: all six vertices are 1-WL-equivalent
    ids = list("abcdef")
    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("d", "e"), ("e", "f"), ("f", "d")]
    got, _ = _run(spark, ids, edges, 3)
    assert len(set(got.values())) == 1
    # star: center differs from leaves; leaves all equal
    ids2 = list("zuvw")
    got2, _ = _run(spark, ids2, [("z", "u"), ("z", "v"), ("z", "w")], 2)
    assert len({got2["u"], got2["v"], got2["w"]}) == 1
    assert got2["z"] != got2["u"]


def test_wl_refinement_distinguishes_beyond_degree(spark):
    # path v0-v1-v2-v3-v4: v1 and v2 share degree 2 (equal at rounds=0)
    # but v1 touches an endpoint and v2 doesn't — round 1 separates
    # them. v1/v3 and v0/v4 are automorphic: equal at every depth.
    # (C6 vs 2xC3 would NOT separate — 1-WL is blind on regular graphs,
    # which is the documented boundary of this operator.)
    ids = [f"v{i}" for i in range(5)]
    edges = [("v0", "v1"), ("v1", "v2"), ("v2", "v3"), ("v3", "v4")]
    got0, _ = _run(spark, ids, edges, 0)
    assert got0["v1"] == got0["v2"]
    got1, _ = _run(spark, ids, edges, 1)
    assert got1["v1"] != got1["v2"]
    assert got1["v1"] == got1["v3"] and got1["v0"] == got1["v4"]


def test_wl_rejects_negative_rounds(spark):
    with pytest.raises(ValueError):
        wl_signatures(
            spark, vertices_df(spark, ["a"]), edges_df(spark, []), rounds=-1
        )
