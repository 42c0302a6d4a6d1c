"""Luby MIS vs a brute-force replay with identical md5 priorities, plus
the independence/maximality invariants."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from duwamish_spark.algorithms import maximal_independent_set
from duwamish_spark.pregel import free_local_checkpoint


def _p(v, seed="mis"):
    return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:8], 16)


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _verts_df(spark, edges, extra=()):
    ids = sorted({v for e in edges for v in e} | set(extra))
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _nbrs(edges):
    n = defaultdict(set)
    for a, b in edges:
        if a != b:
            n[a].add(b)
            n[b].add(a)
    return n


def _brute_luby(edges, vert_ids, seed="mis", max_rounds=60):
    nb = _nbrs(edges)
    und = set(vert_ids)
    decided = {}
    for r in range(1, max_rounds + 1):
        if not und:
            return decided, r - 1, True
        winners = {
            v
            for v in und
            if all(
                (_p(v, seed), v) > (_p(u, seed), u)
                for u in nb[v]
                if u in und
            )
        }
        losers = {u for w in winners for u in nb[w] if u in und}
        for w in winners:
            decided[w] = (True, r)
        for l in losers:
            decided[l] = (False, r)
        und -= winners | losers
    return decided, max_rounds, not und


FIX = [
    (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6), (6, 7),
    (1, 4), (2, 2), (1, 2), (8, 1), (8, 2), (8, 3), (8, 4), (20, 21),
]


def test_mis_matches_brute_fixture(spark):
    res = maximal_independent_set(
        spark, _verts_df(spark, FIX, extra=(99,)), _edges_df(spark, FIX)
    )
    got = {r["id"]: (r["in_mis"], r["round"]) for r in res.state.collect()}
    want, rounds, halted = _brute_luby(FIX, {v for e in FIX for v in e} | {99})
    assert got == want
    assert res.supersteps == rounds
    assert res.halted and halted
    free_local_checkpoint(res.state)


def test_mis_random_graphs_match_brute(spark):
    for seed in (6, 29):
        rng = random.Random(seed)
        edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(180)]
        vids = {v for e in edges for v in e}
        res = maximal_independent_set(
            spark, _verts_df(spark, edges), _edges_df(spark, edges)
        )
        got = {r["id"]: (r["in_mis"], r["round"]) for r in res.state.collect()}
        want, _, _ = _brute_luby(edges, vids)
        assert got == want, f"seed {seed}"
        free_local_checkpoint(res.state)


def test_mis_invariants(spark):
    rng = random.Random(77)
    edges = [(rng.randrange(50), rng.randrange(50)) for _ in range(300)]
    res = maximal_independent_set(
        spark, _verts_df(spark, edges), _edges_df(spark, edges)
    )
    rows = res.state.collect()
    in_mis = {r["id"] for r in rows if r["in_mis"]}
    all_ids = {r["id"] for r in rows}
    nb = _nbrs(edges)
    # every vertex decided
    assert all_ids == {v for e in edges for v in e}
    # independence: no two MIS members adjacent
    for v in in_mis:
        assert not (nb[v] & in_mis), f"MIS members adjacent at {v}"
    # maximality: every non-member has an MIS neighbor
    for v in all_ids - in_mis:
        assert nb[v] & in_mis, f"{v} could join the MIS"
    free_local_checkpoint(res.state)


def test_mis_isolated_vertices_win_round1(spark):
    edges = [(1, 2)]
    res = maximal_independent_set(
        spark, _verts_df(spark, edges, extra=(10, 11)), _edges_df(spark, edges)
    )
    got = {r["id"]: (r["in_mis"], r["round"]) for r in res.state.collect()}
    assert got[10] == (True, 1) and got[11] == (True, 1)
    free_local_checkpoint(res.state)


def test_mis_budget_exhausted_keeps_undecided_rows(spark):
    # max_rounds=0: nothing is decided, yet EVERY vertex must still get a
    # state row with NULL in_mis/round (ADVICE round-3: undecided vertices
    # used to be omitted entirely)
    ids = list(range(12))
    edges = [(i, i + 1) for i in range(11)]
    verts = spark.createDataFrame([(i,) for i in ids], "id long")
    es = spark.createDataFrame(edges, "src long, dst long")
    res = maximal_independent_set(spark, verts, es, max_rounds=0)
    rows = {r["id"]: (r["in_mis"], r["round"]) for r in res.state.collect()}
    assert set(rows) == set(ids), "every vertex must have a state row"
    assert all(v == (None, None) for v in rows.values())
    assert res.halted is False

    # mid-budget: with one round, decided vertices carry round=1 and the
    # rest (if any — priority-dependent) stay as NULL rows
    res1 = maximal_independent_set(spark, verts, es, max_rounds=1)
    rows1 = {r["id"]: (r["in_mis"], r["round"]) for r in res1.state.collect()}
    assert set(rows1) == set(ids)
    for m, rd in rows1.values():
        assert (m is None and rd is None) or rd == 1


def test_mis_edge_endpoints_outside_vertices_are_ignored(spark):
    # edge endpoint 99 is absent from `vertices`: it must not appear in
    # the output at all (in particular never as a loser)
    verts = spark.createDataFrame([(1,), (2,)], "id long")
    es = spark.createDataFrame([(1, 2), (2, 99)], "src long, dst long")
    res = maximal_independent_set(spark, verts, es, max_rounds=20)
    rows = {r["id"]: r["in_mis"] for r in res.state.collect()}
    assert set(rows) == {1, 2}
    assert sorted(rows.values()) == [False, True]
