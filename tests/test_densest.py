"""Densest-subgraph peeling vs a brute-force replay and the exact
(enumeration) optimum on small graphs."""

from __future__ import annotations

import itertools
import random
from collections import defaultdict

import pytest

from duwamish_spark.algorithms import densest_subgraph
from duwamish_spark.pregel import free_local_checkpoint


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _simple(edges):
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def _brute_peel(edges, eps, max_rounds):
    """Python replay of the exact same simultaneous-peel schedule."""
    simple = _simple(edges)
    alive = set(simple)
    best_density, best_round, best_state = -1.0, 0, {}
    hist = []
    for i in range(1, max_rounds + 1):
        deg = defaultdict(int)
        for a, b in alive:
            deg[a] += 1
            deg[b] += 1
        if not deg:
            break
        n_v, e2 = len(deg), sum(deg.values())
        density = (e2 / 2.0) / float(n_v)
        if density > best_density:
            best_density, best_round, best_state = density, i, dict(deg)
        thr = (1.0 + eps) * (float(e2) / float(n_v))
        drop = {v for v, d in deg.items() if d <= thr}
        hist.append((i, n_v, e2 // 2, density, len(drop)))
        alive = {(a, b) for a, b in alive if a not in drop and b not in drop}
    # final alive degrees (for return_best=False)
    deg = defaultdict(int)
    for a, b in alive:
        deg[a] += 1
        deg[b] += 1
    return best_density, best_round, best_state, dict(deg), hist


def _exact_densest(edges):
    simple = _simple(edges)
    verts = sorted({v for e in simple for v in e})
    best = 0.0
    for r in range(1, len(verts) + 1):
        for sub in itertools.combinations(verts, r):
            s = set(sub)
            m = sum(1 for a, b in simple if a in s and b in s)
            best = max(best, m / len(s))
    return best


# two 5-cliques sharing nothing, plus a sparse fringe hanging off one
CLIQUES = (
    [(a, b) for a in range(5) for b in range(5) if a < b]
    + [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    + [(0, 20), (20, 21), (21, 22), (1, 23), (23, 24)]
)


def test_peel_replay_matches_brute(spark):
    res = densest_subgraph(
        spark, _edges_df(spark, CLIQUES), epsilon=0.125, max_rounds=10
    )
    bd, br, bstate, _, hist = _brute_peel(CLIQUES, 0.125, 10)
    got = {r["id"]: r["degree"] for r in res.state.collect()}
    assert got == bstate
    assert res.last["best_density"] == pytest.approx(bd, abs=1e-12)
    assert res.last["best_round"] == br
    for m, (i, n_v, n_e, density, dropped) in zip(res.metrics, hist):
        assert (m["superstep"], m["vertices"], m["edges"], m["dropped"]) == (
            i, n_v, n_e, dropped,
        )
        assert m["density"] == pytest.approx(density, abs=1e-12)
    free_local_checkpoint(res.state)


def test_peel_random_graphs_match_brute(spark):
    for seed in (2, 13):
        rng = random.Random(seed)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(160)]
        res = densest_subgraph(
            spark, _edges_df(spark, edges), epsilon=0.25, max_rounds=20
        )
        bd, br, bstate, _, _ = _brute_peel(edges, 0.25, 20)
        got = {r["id"]: r["degree"] for r in res.state.collect()}
        assert got == bstate, f"seed {seed}"
        assert res.last["best_density"] == pytest.approx(bd, abs=1e-12)
        free_local_checkpoint(res.state)


def test_fixed_round_state_matches_brute(spark):
    res = densest_subgraph(
        spark, _edges_df(spark, CLIQUES), epsilon=0.125, max_rounds=2,
        return_best=False,
    )
    _, _, _, final_deg, _ = _brute_peel(CLIQUES, 0.125, 2)
    got = {r["id"]: r["degree"] for r in res.state.collect()}
    assert got == final_deg
    free_local_checkpoint(res.state)


def test_approximation_guarantee_small_graphs(spark):
    for seed in (4, 21):
        rng = random.Random(seed)
        edges = [(rng.randrange(9), rng.randrange(9)) for _ in range(24)]
        if not _simple(edges):
            continue
        res = densest_subgraph(
            spark, _edges_df(spark, edges), epsilon=0.1, max_rounds=30
        )
        opt = _exact_densest(edges)
        assert res.last["best_density"] >= opt / (2 * 1.1) - 1e-9
        free_local_checkpoint(res.state)


def test_clique_is_found_exactly(spark):
    # on clique-plus-fringe the best peel round IS the 5-clique (rho=2.0)
    res = densest_subgraph(
        spark, _edges_df(spark, CLIQUES), epsilon=0.125, max_rounds=10
    )
    assert res.last["best_density"] == pytest.approx(2.0)
    free_local_checkpoint(res.state)


def test_return_best_zero_rounds_is_collectable(spark):
    # max_rounds=0 leaves best=None; the fallback state must be
    # materialized BEFORE alive's localCheckpoint blocks are freed,
    # otherwise this collect() hits unrecomputable freed blocks.
    res = densest_subgraph(
        spark, _edges_df(spark, CLIQUES), epsilon=0.125, max_rounds=0,
        return_best=True,
    )
    got = {r["id"]: r["degree"] for r in res.state.collect()}
    sym_deg = defaultdict(int)
    for u, v in CLIQUES:
        sym_deg[u] += 1
        sym_deg[v] += 1
    assert got == dict(sym_deg)
    free_local_checkpoint(res.state)


def test_rejects_negative_epsilon(spark):
    with pytest.raises(ValueError):
        densest_subgraph(spark, _edges_df(spark, CLIQUES), epsilon=-0.1)
