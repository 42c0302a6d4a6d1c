"""SALSA — NumPy bipartite-walk oracle + stationary-law gates.

The reference has no counterpart program (its example set is PageRank /
SSSP / Recommendations); SALSA is a link-graph extension on the HITS
two-direction message machinery, pinned against an independent NumPy
replay, the exact mass-conservation invariant, and Lempel & Moran's
closed-form stationary law (auth ∝ indegree on a connected support
graph).
"""

from __future__ import annotations

import numpy as np
import pytest

from duwamish_spark.algorithms import salsa
from duwamish_spark.graph import vertices_from

# duplicate edge a->b, self-loop e->e, pure-authority d-target, pure-hub
# d, isolated-by-direction corners — same fixture family as HITS/eigen
EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("a", "b"), ("e", "a"), ("e", "e"),
]


def _graph(spark, edges=EDGES):
    e = spark.createDataFrame(edges, "src string, dst string")
    return vertices_from(None, e), e


def _salsa_numpy(edges, iters):
    ids = sorted({x for p in edges for x in p})
    ix = {d: i for i, d in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d in edges:
        A[ix[s], ix[d]] += 1.0
    od = A.sum(axis=1)
    idg = A.sum(axis=0)
    hubs = od > 0
    h = np.where(hubs, 1.0 / hubs.sum(), 0.0)
    a = np.zeros(len(ids))
    for _ in range(iters):
        # auth(v) = sum_u A[u,v] * h(u)/od(u); hub(u) = sum_v A[u,v]*a(v)/idg(v)
        a = (A * np.where(od > 0, 1.0 / np.where(od == 0, 1, od), 0.0)[:, None]).T @ h
        h = (A * np.where(idg > 0, 1.0 / np.where(idg == 0, 1, idg), 0.0)[None, :]) @ a
    return ids, ix, a, h


def test_salsa_matches_numpy(spark):
    v, e = _graph(spark)
    res = salsa(spark, v, e, max_iters=4, tol=0.0)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}
    ids, ix, a, h = _salsa_numpy(EDGES, 4)
    assert res.supersteps == 4 and not res.halted
    for d in ids:
        assert got[d][0] == pytest.approx(a[ix[d]], abs=1e-12)
        assert got[d][1] == pytest.approx(h[ix[d]], abs=1e-12)


def test_salsa_mass_conservation_every_iteration(spark):
    v, e = _graph(spark)
    res = salsa(spark, v, e, max_iters=5, tol=0.0)
    for m in res.metrics:
        assert m["auth_mass"] == pytest.approx(1.0, abs=1e-12)
        assert m["hub_mass"] == pytest.approx(1.0, abs=1e-12)


def test_salsa_halts_on_tol(spark):
    v, e = _graph(spark)
    res = salsa(spark, v, e, max_iters=100, tol=1e-9)
    assert res.halted and res.supersteps < 100
    assert res.metrics[-1]["delta"] < 1e-9
    ids, ix, a, h = _salsa_numpy(EDGES, res.supersteps)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}
    for d in ids:
        assert got[d][0] == pytest.approx(a[ix[d]], abs=1e-8)
        assert got[d][1] == pytest.approx(h[ix[d]], abs=1e-8)


def test_salsa_stationary_auth_proportional_to_indegree(spark):
    # connected authority support graph (c-d share hubs a+b, d-e share
    # hub b; self-transitions make the chain aperiodic): auth converges
    # to indeg/|E|, hub to outdeg/|E| (Lempel & Moran 2000, Prop. 2)
    edges = [("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("b", "e")]
    v, e = _graph(spark, edges)
    res = salsa(spark, v, e, max_iters=200, tol=1e-12)
    assert res.halted
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}
    assert got["c"][0] == pytest.approx(2 / 5, abs=1e-9)
    assert got["d"][0] == pytest.approx(2 / 5, abs=1e-9)
    assert got["e"][0] == pytest.approx(1 / 5, abs=1e-9)
    assert got["a"][1] == pytest.approx(2 / 5, abs=1e-9)
    assert got["b"][1] == pytest.approx(3 / 5, abs=1e-9)
    assert got["a"][0] == 0.0  # no in-edges: never an authority


def test_salsa_pure_roles_zero(spark):
    # d has no in-edges (auth 0 forever); c has no out-edges (hub 0)
    edges = [("d", "c"), ("a", "c"), ("a", "b")]
    v, e = _graph(spark, edges)
    res = salsa(spark, v, e, max_iters=3, tol=0.0)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}
    assert got["d"][0] == 0.0
    assert got["c"][1] == 0.0


def test_salsa_duplicate_edges_carry_multiplicity(spark):
    # doubled a->b must shift auth mass toward b vs the simple graph
    simple = [("a", "b"), ("a", "c")]
    doubled = [("a", "b"), ("a", "b"), ("a", "c")]
    v1, e1 = _graph(spark, simple)
    v2, e2 = _graph(spark, doubled)
    r1 = salsa(spark, v1, e1, max_iters=2, tol=0.0)
    r2 = salsa(spark, v2, e2, max_iters=2, tol=0.0)
    a1 = {r["id"]: r["auth"] for r in r1.state.collect()}
    a2 = {r["id"]: r["auth"] for r in r2.state.collect()}
    assert a1["b"] == pytest.approx(0.5)
    assert a2["b"] == pytest.approx(2 / 3)


def test_salsa_partitioned_matches_default(spark):
    v, e = _graph(spark)
    base = salsa(spark, v, e, max_iters=3, tol=0.0)
    part = salsa(spark, v, e, max_iters=3, tol=0.0, num_partitions=5, salt=2)
    b = {r["id"]: (r["auth"], r["hub"]) for r in base.state.collect()}
    p = {r["id"]: (r["auth"], r["hub"]) for r in part.state.collect()}
    for k in b:
        assert p[k][0] == pytest.approx(b[k][0], abs=1e-12)
        assert p[k][1] == pytest.approx(b[k][1], abs=1e-12)
