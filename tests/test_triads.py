"""Triad census vs an isomorphism-based brute-force oracle.

The brute classifier names each triple by matching its canonical edge
set against EXEMPLAR graphs written straight from the standard MAN
definitions (sna/statnet triad.classify docs) — fully independent of
the engine's degree-code arithmetic."""

from __future__ import annotations

import random
from itertools import combinations, permutations, product

import pytest

from duwamish_spark.algorithms.triads import TRIAD_KEYS, TRIAD_NAMES, triad_census

# exemplars on vertices 0,1,2 — the textbook drawings
EXEMPLARS = {
    "003": [],
    "012": [(0, 1)],
    "102": [(0, 1), (1, 0)],
    "021D": [(1, 0), (1, 2)],                      # A<-B->C
    "021U": [(0, 1), (2, 1)],                      # A->B<-C
    "021C": [(0, 1), (1, 2)],                      # A->B->C
    "111D": [(0, 1), (1, 0), (2, 1)],              # A<->B<-C
    "111U": [(0, 1), (1, 0), (1, 2)],              # A<->B->C
    "030T": [(0, 1), (2, 1), (0, 2)],              # A->B<-C, A->C
    "030C": [(1, 0), (2, 1), (0, 2)],              # A<-B<-C, A->C
    "201": [(0, 1), (1, 0), (0, 2), (2, 0)],
    "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],      # A<-B->C, A<->C
    "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],      # A->B<-C, A<->C
    "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],      # A->B->C, A<->C
    "210": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)],
    "300": [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)],
}


def _canon(e):
    best = None
    for p in permutations(range(3)):
        k = tuple(sorted((p[u], p[v]) for u, v in e))
        if best is None or k < best:
            best = k
    return best


_CANON_TO_NAME = {_canon(set(es)): nm for nm, es in EXEMPLARS.items()}
assert len(_CANON_TO_NAME) == 16


def _brute_census(n_ids, edges):
    ids = sorted(n_ids)
    arcs = {(u, v) for u, v in edges if u != v}
    counts = dict.fromkeys(TRIAD_NAMES, 0)
    for t in combinations(ids, 3):
        pos = {v: i for i, v in enumerate(t)}
        e = {
            (pos[u], pos[v])
            for u, v in arcs
            if u in pos and v in pos
        }
        counts[_CANON_TO_NAME[_canon(e)]] += 1
    return counts


def test_key_table_matches_first_principles():
    """Regenerate the degree-code key table from all 64 flag patterns
    and assert it equals the module constant (and is collision-free)."""
    regen = {}
    for es, nm in ((set(v), k) for k, v in EXEMPLARS.items()):
        m = sum(
            1 for (u, v) in [(0, 1), (0, 2), (1, 2)]
            if (u, v) in es and (v, u) in es
        )
        a = sum(
            1 for (u, v) in [(0, 1), (0, 2), (1, 2)]
            if ((u, v) in es) != ((v, u) in es)
        )
        if m + a < 2:
            continue  # closed-form classes, not keyed
        codes = []
        for x in range(3):
            i = sum(1 for (u, v) in es if v == x)
            o = sum(1 for (u, v) in es if u == x)
            codes.append(i * 3 + o)
        regen[tuple(sorted(codes))] = nm
    assert regen == TRIAD_KEYS
    # exhaustive: every >=2-dyad digraph on 3 vertices keys to its class
    for f in product([0, 1], repeat=6):
        pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
        es = {p for bit, p in zip(f, pairs) if bit}
        dy = sum(
            1 for (u, v) in [(0, 1), (0, 2), (1, 2)]
            if (u, v) in es or (v, u) in es
        )
        if dy < 2:
            continue
        codes = tuple(sorted(
            sum(1 for (u, v) in es if v == x) * 3
            + sum(1 for (u, v) in es if u == x)
            for x in range(3)
        ))
        assert TRIAD_KEYS[codes] == _CANON_TO_NAME[_canon(es)], es


def _run(spark, ids, edges, **kw):
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    # self-loop placeholder keeps the schema when the edge list is
    # empty; loops are ignored by the census
    e = spark.createDataFrame(
        edges or [(ids[0], ids[0])], "src long, dst long"
    )
    out = triad_census(spark, v, e, **kw)
    return {r["triad"]: int(r["count"]) for r in out.collect()}


def test_census_exemplars(spark):
    # each exemplar graph on exactly 3 vertices: its own type counts 1
    for nm, es in EXEMPLARS.items():
        got = _run(spark, [0, 1, 2], es)
        want = dict.fromkeys(TRIAD_NAMES, 0)
        want[nm] = 1
        assert got == want, nm


def test_census_random_matches_brute(spark):
    for seed, n, m in [(3, 12, 40), (17, 18, 110), (29, 25, 60)]:
        rng = random.Random(seed)
        ids = list(range(n))
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _run(spark, ids, edges)
        assert got == _brute_census(ids, edges), seed
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_census_empty_and_isolated(spark):
    got = _run(spark, list(range(7)), [])
    want = dict.fromkeys(TRIAD_NAMES, 0)
    want["003"] = 35  # C(7,3)
    assert got == want


def test_census_center_degree_guard(spark):
    rng = random.Random(9)
    n = 15
    ids = list(range(n))
    # star-heavy digraph: hub 0 points everywhere + random extras
    edges = [(0, i) for i in range(1, n)] + [
        (rng.randrange(1, n), rng.randrange(1, n)) for _ in range(30)
    ]
    exact = _run(spark, ids, edges)
    capped = _run(spark, ids, edges, max_center_degree=3)
    enum_types = [t for t in TRIAD_NAMES if t not in ("003", "012", "102")]
    for t in enum_types:
        assert capped[t] <= exact[t], t  # lower bounds only
    assert sum(capped.values()) == sum(exact.values())  # total preserved
