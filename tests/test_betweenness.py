"""Sampled hop-bounded betweenness (Brandes) vs a brute-force replay."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from duwamish_spark.algorithms import betweenness_sampled
from duwamish_spark.pregel import free_local_checkpoint

EDGES = [
    (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5),
    (5, 6), (6, 7), (1, 4), (2, 2), (1, 2),
    (8, 1), (8, 2), (8, 3), (8, 4), (7, 8),
]


def _dfs(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return v, e


def _brute(edges, sources, max_depth):
    de = {(s, d) for s, d in edges if s != d}
    adj = defaultdict(list)
    radj = defaultdict(list)
    for s, d in de:
        adj[s].append(d)
        radj[d].append(s)
    verts = {x for p in de for x in p}
    bet = defaultdict(float)
    dist_sum = defaultdict(int)
    reaching = defaultdict(int)
    for s in sources:
        if s not in verts:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        levels = defaultdict(list)
        levels[0] = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    levels[dist[w]].append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[u]
        delta = defaultdict(float)
        for d in range(max_depth - 1, -1, -1):
            for v in levels[d]:
                acc = 0.0
                for w in adj[v]:
                    if dist.get(w) == d + 1:
                        acc += (1.0 + delta[w]) / sigma[w]
                delta[v] = sigma[v] * acc
        for v, dd in dist.items():
            if dd > 0:
                bet[v] += delta[v]
                dist_sum[v] += dd
                reaching[v] += 1
    return (
        {v: round(b, 6) for v, b in bet.items()},
        dict(dist_sum),
        dict(reaching),
    )


def _collect(spark, edges, sources, max_depth):
    v, e = _dfs(spark, edges)
    src = spark.createDataFrame([(s,) for s in sources], "id long")
    out = betweenness_sampled(spark, v, e, src, max_depth)
    rows = {
        r["id"]: (r["betweenness"], r["seed_dist_sum"], r["seeds_reaching"])
        for r in out.collect()
    }
    free_local_checkpoint(out)
    return rows


@pytest.mark.parametrize("depth", [1, 3, 6])
def test_betweenness_matches_brute(spark, depth):
    sources = [1, 8, 5]
    got = _collect(spark, EDGES, sources, depth)
    bet, ds, nr = _brute(EDGES, sources, depth)
    for vid, (b, d, n) in got.items():
        assert b == pytest.approx(bet.get(vid, 0.0), abs=1e-9), (vid, depth)
        assert d == ds.get(vid, 0)
        assert n == nr.get(vid, 0)


def test_betweenness_random_graph(spark):
    rng = random.Random(19)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(140)]
    sources = [0, 5, 11, 23]
    got = _collect(spark, edges, sources, 4)
    bet, ds, nr = _brute(edges, sources, 4)
    for vid, (b, d, n) in got.items():
        assert b == pytest.approx(bet.get(vid, 0.0), abs=1e-9), vid
        assert d == ds.get(vid, 0)
        assert n == nr.get(vid, 0)


def test_betweenness_path_graph_exact(spark):
    # path 1->2->3->4 from source 1: delta(2)=2, delta(3)=1 (textbook)
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _collect(spark, edges, [1], 5)
    assert got[2][0] == pytest.approx(2.0)
    assert got[3][0] == pytest.approx(1.0)
    assert got[4][0] == pytest.approx(0.0)
    assert got[1] == (0.0, 0, 0)  # source itself accumulates nothing


def test_betweenness_releases_storage(spark):
    _, e = _dfs(spark, EDGES)
    v, _ = _dfs(spark, EDGES)
    src = spark.createDataFrame([(1,), (8,)], "id long")
    before = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    out = betweenness_sampled(spark, v, e, src, 3)
    out.count()
    free_local_checkpoint(out)
    after = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after <= before


def test_betweenness_rejects_bad_depth(spark):
    v, e = _dfs(spark, EDGES)
    src = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        betweenness_sampled(spark, v, e, src, 0)


# ---------------------------------------------------------------------------
# edge betweenness (shared Brandes state, edge-keyed dependency post-pass)
# ---------------------------------------------------------------------------


def _brute_edges(edges, sources, max_depth):
    """Per-arc dependency sum: sigma(s,v) * (1 + delta(s,w)) / sigma(s,w)
    over DAG arcs — independent replay of Brandes' edge recursion."""
    de = {(s, d) for s, d in edges if s != d}
    adj = defaultdict(list)
    for s, d in de:
        adj[s].append(d)
    verts = {x for p in de for x in p}
    eb = defaultdict(float)
    for s in sources:
        if s not in verts:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        levels = defaultdict(list)
        levels[0] = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    levels[dist[w]].append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] = sigma.get(w, 0) + sigma[u]
        delta = defaultdict(float)
        for d in range(max_depth - 1, -1, -1):
            for v in levels[d]:
                acc = 0.0
                for w in adj[v]:
                    if dist.get(w) == d + 1:
                        acc += (1.0 + delta[w]) / sigma[w]
                delta[v] = sigma[v] * acc
        for v, dv in dist.items():
            for w in adj[v]:
                if dist.get(w) == dv + 1:
                    eb[(v, w)] += sigma[v] * (1.0 + delta[w]) / sigma[w]
    return {k: round(b, 6) for k, b in eb.items()}


def _collect_edges(spark, edges, sources, max_depth):
    from duwamish_spark.algorithms import edge_betweenness_sampled

    _, e = _dfs(spark, edges)
    src = spark.createDataFrame([(s,) for s in sources], "id long")
    out = edge_betweenness_sampled(spark, e, src, max_depth)
    rows = {(r["src"], r["dst"]): r["betweenness"] for r in out.collect()}
    free_local_checkpoint(out)
    return rows


@pytest.mark.parametrize("depth", [1, 3, 6])
def test_edge_betweenness_matches_brute(spark, depth):
    sources = [1, 8, 5]
    got = _collect_edges(spark, EDGES, sources, depth)
    want = _brute_edges(EDGES, sources, depth)
    # every distinct simple arc gets a row, including zero-score arcs
    assert set(got) == {(s, d) for s, d in EDGES if s != d}
    for arc, b in got.items():
        assert b == pytest.approx(want.get(arc, 0.0), abs=1e-9), (arc, depth)


def test_edge_betweenness_random_graph(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(140)]
    sources = [0, 5, 11, 23]
    got = _collect_edges(spark, edges, sources, 4)
    want = _brute_edges(edges, sources, 4)
    for arc, b in got.items():
        assert b == pytest.approx(want.get(arc, 0.0), abs=1e-9), arc


def test_edge_betweenness_path_graph_exact(spark):
    # path 1->2->3->4 from source 1: every arc carries all downstream
    # pair dependencies — (1,2)=3, (2,3)=2, (3,4)=1 (textbook)
    got = _collect_edges(spark, [(1, 2), (2, 3), (3, 4)], [1], 5)
    assert got[(1, 2)] == pytest.approx(3.0)
    assert got[(2, 3)] == pytest.approx(2.0)
    assert got[(3, 4)] == pytest.approx(1.0)


def test_edge_betweenness_vertex_consistency(spark):
    # Brandes identity: delta(s,v) = sum of edge dependencies of v's
    # out-DAG-arcs. Summed over shared sources this gives vertex
    # betweenness — EXCEPT at the sources themselves, whose out-arcs
    # carry delta(s,s), which the vertex convention excludes (dist > 0).
    sources = [1, 8, 5]
    vb = _collect(spark, EDGES, sources, 4)
    eb = _collect_edges(spark, EDGES, sources, 4)
    out_sum = defaultdict(float)
    for (s, d), b in eb.items():
        out_sum[s] += b
    for vid, (b, _d, _n) in vb.items():
        if vid in sources:
            continue
        assert b == pytest.approx(round(out_sum.get(vid, 0.0), 6), abs=1e-5), vid
