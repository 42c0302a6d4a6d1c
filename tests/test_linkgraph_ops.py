"""HITS, personalized PageRank, and k-core — NumPy / brute-force oracles.

The reference has no counterpart programs (its example set is PageRank /
SSSP / Recommendations); these are the engine's link-graph extensions,
so their semantics are pinned here against independent replays.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duwamish_spark.algorithms import hits, k_core, pagerank
from duwamish_spark.graph import vertices_from
from duwamish_spark.pregel import free_local_checkpoint

# duplicate edge a->b, self-loop e->e, dangling-ish d: exercises the
# multiplicity / self-delivery / zero-degree corners
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


def _hits_numpy(edges, iters):
    ids, ix, A = _adj(edges)
    hub = np.ones(len(ids))
    auth = np.zeros(len(ids))
    for _ in range(iters):
        araw = A.T @ hub
        hraw = A @ araw
        an, hn = np.linalg.norm(araw), np.linalg.norm(hraw)
        auth = araw / an if an > 0 else araw * 0
        hub = hraw / hn if hn > 0 else hraw * 0
    return ids, ix, auth, hub


def test_hits_matches_numpy(spark):
    v, e = _graph(spark)
    res = hits(spark, v, e, max_iters=5, tol=0.0)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}
    ids, ix, auth, hub = _hits_numpy(EDGES, 5)
    assert res.supersteps == 5 and not res.halted
    for d in ids:
        assert got[d][0] == pytest.approx(auth[ix[d]], abs=1e-9)
        assert got[d][1] == pytest.approx(hub[ix[d]], abs=1e-9)


def test_hits_halts_on_tol_and_reports_metrics(spark):
    v, e = _graph(spark)
    res = hits(spark, v, e, max_iters=50, tol=1e-4)
    assert res.halted and res.supersteps < 50
    assert res.metrics[-1]["delta"] < 1e-4
    assert res.metrics[0]["auth_norm"] > 0
    # converged vector still matches a long NumPy replay
    ids, ix, auth, hub = _hits_numpy(EDGES, res.supersteps)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.state.collect()}
    for d in ids:
        assert got[d][0] == pytest.approx(auth[ix[d]], abs=1e-8)


def test_hits_salted_equals_unsalted(spark):
    v, e = _graph(spark)
    a = hits(spark, v, e, max_iters=3, tol=0.0, num_partitions=4)
    b = hits(spark, v, e, max_iters=3, tol=0.0, num_partitions=4, salt=3)
    ra = {r["id"]: (r["auth"], r["hub"]) for r in a.state.collect()}
    rb = {r["id"]: (r["auth"], r["hub"]) for r in b.state.collect()}
    for k in ra:
        assert ra[k][0] == pytest.approx(rb[k][0], abs=1e-12)
        assert ra[k][1] == pytest.approx(rb[k][1], abs=1e-12)


def test_hits_releases_intermediate_storage(spark):
    def storage_ids():
        return {
            info.id()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    v, e = _graph(spark)
    before = storage_ids()
    res = hits(spark, v, e, max_iters=4, tol=0.0, encode=False)
    res.state.count()
    free_local_checkpoint(res.state)
    leaked = storage_ids() - before
    # per-iteration intermediates (araw/hraw/prev state) must be freed as
    # the loop advances — only the final state may remain, freed above
    assert not leaked, f"hits leaked storage blocks: {leaked}"


def _ppr_numpy(edges, seeds, iters, damping=0.85):
    ids, ix, A = _adj(edges)
    n = len(ids)
    outd = A.sum(axis=1)
    p = np.zeros(n)
    for s in seeds:
        p[ix[s]] = 1.0
    p = p * n / p.sum()
    rank = np.ones(n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if outd[i] > 0:
                contrib += A[i] / outd[i] * rank[i]
        rank = (1 - damping) * p + damping * contrib
    return ids, ix, rank


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_ppr_seeded_matches_numpy(spark, strategy):
    v, e = _graph(spark)
    tp = spark.createDataFrame([("a", 1.0), ("d", 3.0)], "id string, weight double")
    res = pagerank(
        spark, v, e, tol=0.0, max_supersteps=6, teleport=tp, strategy=strategy
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    # weight 3 on d: replicate by seed multiplicity in the numpy replay
    ids, ix, A = _adj(EDGES)
    n = len(ids)
    p = np.zeros(n)
    p[ix["a"]], p[ix["d"]] = 1.0, 3.0
    p = p * n / p.sum()
    rank = np.ones(n)
    outd = A.sum(axis=1)
    for _ in range(6):
        contrib = np.zeros(n)
        for i in range(n):
            if outd[i] > 0:
                contrib += A[i] / outd[i] * rank[i]
        rank = 0.15 * p + 0.85 * contrib
    for d in ids:
        assert got[d] == pytest.approx(rank[ix[d]], abs=1e-9)
    # teleport column must not leak into the result schema
    assert set(res.state.columns) == {"id", "rank"}


def test_ppr_uniform_teleport_is_classic_pagerank(spark):
    v, e = _graph(spark)
    tp = v.select("id", F.lit(2.5).alias("weight"))  # any uniform weight
    classic = pagerank(spark, v, e, tol=0.0, max_supersteps=5)
    ppr = pagerank(spark, v, e, tol=0.0, max_supersteps=5, teleport=tp)
    rc = {r["id"]: r["rank"] for r in classic.state.collect()}
    rp = {r["id"]: r["rank"] for r in ppr.state.collect()}
    for k in rc:
        assert rc[k] == pytest.approx(rp[k], abs=1e-12)


def test_ppr_rejects_nonpositive_weights(spark):
    v, e = _graph(spark)
    tp = spark.createDataFrame([("a", 0.0)], "id string, weight double")
    with pytest.raises(ValueError, match="positive"):
        pagerank(spark, v, e, max_supersteps=2, teleport=tp)


def _kcore_brute(edges, k):
    es = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    alive = {x for p in es for x in p}
    while True:
        deg: dict[str, int] = {v: 0 for v in alive}
        for s, d in es:
            if s in alive and d in alive:
                deg[s] += 1
                deg[d] += 1
        drop = {v for v in alive if deg[v] < k}
        if not drop:
            return {v: deg[v] for v in alive}
        alive -= drop


@pytest.mark.parametrize("k", [1, 2, 3])
def test_kcore_matches_brute_force(spark, k):
    v, e = _graph(spark)
    res = k_core(spark, v, e, k)
    got = {r["id"]: r["degree"] for r in res.state.collect()}
    assert got == _kcore_brute(EDGES, k)
    assert res.halted
    assert res.metrics[-1]["dropped"] == 0


def test_kcore_random_graph_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    edges = [
        (f"n{a}", f"n{b}")
        for a, b in rng.integers(0, 30, size=(120, 2)).tolist()
    ]
    v, e = _graph(spark, edges)
    for k in (2, 3, 4):
        res = k_core(spark, v, e, k)
        got = {r["id"]: r["degree"] for r in res.state.collect()}
        assert got == _kcore_brute(edges, k), f"k={k}"


def test_kcore_rejects_bad_k(spark):
    v, e = _graph(spark)
    with pytest.raises(ValueError, match="k must be"):
        k_core(spark, v, e, 0)


def test_kcore_max_rounds_truncation(spark):
    # chain 0-1-2-...-9 with k=2 peels one endpoint pair per round from
    # each side; a tiny round budget must stop early and report halted=False
    edges = [(f"c{i}", f"c{i+1}") for i in range(10)]
    v, e = _graph(spark, edges)
    res = k_core(spark, v, e, 2, max_rounds=2)
    assert not res.halted
    assert res.supersteps == 2
    full = k_core(spark, v, e, 2)
    assert full.halted
    assert full.state.count() == 0  # a path has no 2-core
