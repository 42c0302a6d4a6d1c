"""Eigenvector / Katz centrality — NumPy power-iteration oracles.

The reference has no counterpart programs (its example set is PageRank /
SSSP / Recommendations); these are link-graph extensions on the same
one-direction message machinery, pinned against independent replays.
"""

from __future__ import annotations

import numpy as np
import pytest

from duwamish_spark.algorithms import eigenvector_centrality, katz_centrality
from duwamish_spark.graph import vertices_from
from duwamish_spark.pregel import free_local_checkpoint

# duplicate edge a->b, self-loop e->e, no-in-edge d and e: exercises the
# multiplicity / self-delivery / zero-in-degree corners
EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("a", "b"), ("e", "a"), ("e", "e"),
]


def _graph(spark, edges=EDGES):
    e = spark.createDataFrame(edges, "src string, dst string")
    return vertices_from(None, e), e


def _adj(edges):
    ids = sorted({x for p in edges for x in p})
    ix = {d: i for i, d in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d in edges:
        A[ix[s], ix[d]] += 1.0
    return ids, ix, A


def _eig_numpy(edges, iters):
    ids, ix, A = _adj(edges)
    x = np.ones(len(ids))
    for _ in range(iters):
        raw = A.T @ x
        n = np.linalg.norm(raw)
        x = raw / n if n > 0 else raw * 0
    return ids, ix, x


def _katz_numpy(edges, iters, alpha, beta):
    ids, ix, A = _adj(edges)
    x = np.full(len(ids), beta)
    for _ in range(iters):
        x = beta + alpha * (A.T @ x)
    return ids, ix, x


def test_eigenvector_matches_numpy(spark):
    v, e = _graph(spark)
    res = eigenvector_centrality(spark, v, e, max_iters=5, tol=0.0)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    ids, ix, x = _eig_numpy(EDGES, 5)
    assert res.supersteps == 5 and not res.halted
    for d in ids:
        assert got[d] == pytest.approx(x[ix[d]], abs=1e-9)


def test_eigenvector_halts_on_tol(spark):
    v, e = _graph(spark)
    res = eigenvector_centrality(spark, v, e, max_iters=100, tol=1e-6)
    assert res.halted and res.supersteps < 100
    assert res.metrics[-1]["delta"] < 1e-6
    ids, ix, x = _eig_numpy(EDGES, res.supersteps)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    for d in ids:
        assert got[d] == pytest.approx(x[ix[d]], abs=1e-8)


def test_eigenvector_no_in_edges_zero(spark):
    # d and e have no in-edges except e's self-loop; e keeps mass via the
    # self-loop while d must be exactly 0 every iteration
    v, e = _graph(spark)
    res = eigenvector_centrality(spark, v, e, max_iters=3, tol=0.0)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    assert got["d"] == 0.0


def test_eigenvector_empty_edges(spark):
    e = spark.createDataFrame([], "src string, dst string")
    v = spark.createDataFrame([("a",), ("b",)], "id string")
    res = eigenvector_centrality(spark, v, e, max_iters=3, tol=0.0)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    assert got == {"a": 0.0, "b": 0.0}


def test_eigenvector_salted_equals_unsalted(spark):
    v, e = _graph(spark)
    a = eigenvector_centrality(
        spark, v, e, max_iters=3, tol=0.0, num_partitions=4
    )
    b = eigenvector_centrality(
        spark, v, e, max_iters=3, tol=0.0, num_partitions=4, salt=3
    )
    ra = {r["id"]: r["value"] for r in a.state.collect()}
    rb = {r["id"]: r["value"] for r in b.state.collect()}
    for k in ra:
        assert ra[k] == pytest.approx(rb[k], abs=1e-12)


def test_katz_matches_numpy(spark):
    v, e = _graph(spark)
    res = katz_centrality(
        spark, v, e, alpha=0.1, beta=1.0, max_iters=5, tol=0.0
    )
    got = {r["id"]: r["value"] for r in res.state.collect()}
    ids, ix, x = _katz_numpy(EDGES, 5, 0.1, 1.0)
    for d in ids:
        assert got[d] == pytest.approx(x[ix[d]], abs=1e-9)


def test_katz_converges_below_spectral_bound(spark):
    # alpha far below 1/lambda_max -> geometric convergence; the halted
    # fixpoint matches the closed form x = (I - alpha A^T)^-1 beta 1
    v, e = _graph(spark)
    res = katz_centrality(
        spark, v, e, alpha=0.05, beta=1.0, max_iters=200, tol=1e-12
    )
    assert res.halted
    ids, ix, A = _adj(EDGES)
    closed = np.linalg.solve(
        np.eye(len(ids)) - 0.05 * A.T, np.full(len(ids), 1.0)
    )
    got = {r["id"]: r["value"] for r in res.state.collect()}
    for d in ids:
        assert got[d] == pytest.approx(closed[ix[d]], abs=1e-9)


def test_katz_no_in_edges_is_beta(spark):
    v, e = _graph(spark)
    res = katz_centrality(
        spark, v, e, alpha=0.1, beta=2.5, max_iters=4, tol=0.0
    )
    got = {r["id"]: r["value"] for r in res.state.collect()}
    assert got["d"] == pytest.approx(2.5, abs=1e-12)


def test_eigenvector_releases_intermediate_storage(spark):
    def storage_ids():
        return {
            info.id()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    v, e = _graph(spark)
    before = storage_ids()
    res = eigenvector_centrality(spark, v, e, max_iters=4, tol=0.0, encode=False)
    res.state.count()
    free_local_checkpoint(res.state)
    leaked = storage_ids() - before
    assert not leaked, f"eigenvector leaked storage blocks: {leaked}"
