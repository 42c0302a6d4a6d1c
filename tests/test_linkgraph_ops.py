"""HITS, personalized PageRank, and k-core — NumPy / brute-force oracles.

The reference has no counterpart programs (its example set is PageRank /
SSSP / Recommendations); these are the engine's link-graph extensions,
so their semantics are pinned here against independent replays.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duwamish_spark.algorithms import (
    hits,
    k_core,
    pagerank,
    strongly_connected_components,
    random_walks,
)
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


# ---------------------------------------------------------------------------
# SCC — Kosaraju oracle (iterative, pure Python)
# ---------------------------------------------------------------------------


def _scc_kosaraju(edges):
    """{id: min-member-of-SCC} via iterative Kosaraju."""
    ids = sorted({x for p in edges for x in p})
    fwd, rev = {v: [] for v in ids}, {v: [] for v in ids}
    for s, d in edges:
        if s != d:
            fwd[s].append(d)
            rev[d].append(s)
    seen, order = set(), []
    for root in ids:
        if root in seen:
            continue
        stack = [(root, iter(fwd[root]))]
        seen.add(root)
        while stack:
            v, it = stack[-1]
            nxt = next((w for w in it if w not in seen), None)
            if nxt is None:
                order.append(v)
                stack.pop()
            else:
                seen.add(nxt)
                stack.append((nxt, iter(fwd[nxt])))
    comp = {}
    for root in reversed(order):
        if root in comp:
            continue
        members, stack = [root], [root]
        comp[root] = root
        while stack:
            v = stack.pop()
            for w in rev[v]:
                if w not in comp:
                    comp[w] = root
                    members.append(w)
                    stack.append(w)
        mn = min(members)
        for m in members:
            comp[m] = mn
    return comp


def _scc_state(res):
    return {r["id"]: r["scc_id"] for r in res.state.collect()}


def test_scc_matches_kosaraju_on_fixture(spark):
    # EDGES: a<->b<->c 3-cycle (via c->a), d one-way feeder (trim),
    # e self-loop only in-edge (trim) — exercises both phases
    v, e = _graph(spark)
    res = strongly_connected_components(spark, v, e)
    assert _scc_state(res) == _scc_kosaraju(EDGES)
    assert res.halted


def test_scc_two_cycles_one_way_bridge(spark):
    edges = (
        [(f"x{i}", f"x{(i + 1) % 4}") for i in range(4)]
        + [(f"y{i}", f"y{(i + 1) % 3}") for i in range(3)]
        + [("x0", "y0"), ("t0", "x1"), ("x2", "t1")]
    )
    v, e = _graph(spark, edges)
    res = strongly_connected_components(spark, v, e)
    got = _scc_state(res)
    assert got == _scc_kosaraju(edges)
    # the two cycles stay separate SCCs despite the bridge
    assert got["x0"] == "x0" and got["y2"] == "y0"
    assert got["t0"] == "t0" and got["t1"] == "t1"


def test_scc_random_graphs_match_kosaraju(spark):
    rng = np.random.default_rng(5)
    for n, m in ((12, 30), (25, 60), (40, 200)):
        edges = [
            (f"v{a:02d}", f"v{b:02d}")
            for a, b in rng.integers(0, n, size=(m, 2)).tolist()
        ]
        v, e = _graph(spark, edges)
        res = strongly_connected_components(spark, v, e)
        assert _scc_state(res) == _scc_kosaraju(edges), f"n={n},m={m}"
        assert res.halted


def test_scc_pure_dag_is_all_trim(spark):
    # a DAG must be fully assigned by the trim phase alone (every SCC is a
    # singleton) — no coloring rounds should appear in the metrics
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    v, e = _graph(spark, edges)
    res = strongly_connected_components(spark, v, e)
    got = _scc_state(res)
    assert got == {x: x for x in "abcde"}
    assert all(m["phase"] == "trim" for m in res.metrics)


def test_scc_max_rounds_truncation(spark):
    # chain of 3 2-cycles: p0<->p1 -> p2<->p3 -> p4<->p5; trim removes
    # nothing and confinement needs multiple outer passes under a tiny
    # budget — must report halted=False without raising
    edges = []
    for i in (0, 2, 4):
        edges += [(f"p{i}", f"p{i+1}"), (f"p{i+1}", f"p{i}")]
    edges += [("p1", "p2"), ("p3", "p4")]
    v, e = _graph(spark, edges)
    res = strongly_connected_components(spark, v, e, max_rounds=2)
    assert not res.halted
    full = strongly_connected_components(spark, v, e)
    assert full.halted
    assert _scc_state(full) == _scc_kosaraju(edges)


# ---------------------------------------------------------------------------
# random walks — md5-replay oracle (pure Python)
# ---------------------------------------------------------------------------


def _walks_python(edges, length, walks_per_vertex, starts=None):
    import hashlib

    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(ds) for s, ds in adj.items()}
    rows = set()
    for s in sorted(starts if starts is not None else adj):
        for w in range(walks_per_vertex):
            v = s
            rows.add((s, w, 0, v))
            for t in range(1, length + 1):
                nbrs = adj.get(v)
                if not nbrs:
                    break
                h = int(
                    hashlib.md5(f"{s}:{w}:{t}".encode()).hexdigest()[:8], 16
                )
                v = nbrs[h % len(nbrs)]
                rows.add((s, w, t, v))
    return rows


def _walk_rows(df):
    return {
        (r["start_id"], r["walk"], r["step"], r["vertex"])
        for r in df.collect()
    }


def test_random_walks_match_md5_replay(spark):
    v, e = _graph(spark)
    got = _walk_rows(random_walks(spark, e, walk_length=4, walks_per_vertex=3))
    assert got == _walks_python(EDGES, 4, 3)


def test_random_walks_dead_end_terminates_early(spark):
    # b has no out-edges: every walk reaching b stops there
    edges = [("a", "b"), ("a", "c"), ("c", "a")]
    v, e = _graph(spark, edges)
    got = _walk_rows(random_walks(spark, e, walk_length=6, walks_per_vertex=2))
    assert got == _walks_python(edges, 6, 2)
    ended_at_b = {(s, w) for s, w, t, x in got if x == "b"}
    for s, w in ended_at_b:
        last = max(t for s2, w2, t, _ in got if (s2, w2) == (s, w))
        assert any((s, w, last, "b") == r for r in got)


def test_random_walks_custom_starts_and_length_zero(spark):
    v, e = _graph(spark)
    starts = spark.createDataFrame([("a",), ("d",)], "id string")
    got = _walk_rows(
        random_walks(spark, e, walk_length=3, walks_per_vertex=1, starts=starts)
    )
    assert got == _walks_python(EDGES, 3, 1, starts=["a", "d"])
    zero = random_walks(spark, e, walk_length=0, walks_per_vertex=1)
    assert {r["step"] for r in zero.collect()} == {0}


def test_random_walks_partitioning_invariant(spark):
    v, e = _graph(spark)
    a = _walk_rows(random_walks(spark, e, walk_length=5, walks_per_vertex=2))
    b = _walk_rows(
        random_walks(
            spark, e, walk_length=5, walks_per_vertex=2, num_partitions=7
        )
    )
    assert a == b


def test_random_walks_rejects_bad_args(spark):
    v, e = _graph(spark)
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(spark, e, walk_length=-1)
    with pytest.raises(ValueError, match="walks_per_vertex"):
        random_walks(spark, e, walks_per_vertex=0)


def test_scc_and_walks_release_intermediate_storage(spark):
    def storage_ids():
        return {
            info.id()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    v, e = _graph(spark)
    before = storage_ids()
    res = strongly_connected_components(spark, v, e)
    res.state.count()
    free_local_checkpoint(res.state)
    leaked = storage_ids() - before
    assert not leaked, f"scc leaked storage blocks: {leaked}"

    before = storage_ids()
    w = random_walks(spark, e, walk_length=3, walks_per_vertex=2)
    w.count()
    free_local_checkpoint(w)
    leaked = storage_ids() - before
    assert not leaked, f"random_walks leaked storage blocks: {leaked}"


# ---------------------------------------------------------------------------
# ANF / HyperANF — md5-register replay + exact-BFS sanity
# ---------------------------------------------------------------------------


def _anf_python(edges, h, m):
    import hashlib

    de = {(s, d) for s, d in edges if s != d}
    verts = sorted({x for p in de for x in p})
    out_adj = {}
    for s, d in de:
        out_adj.setdefault(s, []).append(d)

    def u32(s, off):
        return int(hashlib.md5(s.encode()).hexdigest()[off : off + 8], 16)

    sk = {}
    for v in verts:
        x2 = u32(str(v), 8)
        sk[v] = {u32(str(v), 0) % m: 33 - x2.bit_length() if x2 else 33}
    for _ in range(h):
        nxt = {}
        for v in verts:
            merged = dict(sk[v])
            for w in out_adj.get(v, []):
                for r, val in sk[w].items():
                    if merged.get(r, -1) < val:
                        merged[r] = val
            nxt[v] = merged
        sk = nxt
    return {(v, r, val) for v in verts for r, val in sk[v].items()}


def _ball_sizes(edges, h):
    de = {(s, d) for s, d in edges if s != d}
    verts = sorted({x for p in de for x in p})
    out_adj = {}
    for s, d in de:
        out_adj.setdefault(s, set()).add(d)
    sizes = {}
    for v in verts:
        ball = {v}
        for _ in range(h):
            ball |= {w for u in ball for w in out_adj.get(u, ())}
        sizes[v] = len(ball)
    return sizes


def test_anf_sketches_match_md5_replay(spark):
    from duwamish_spark.algorithms import anf_sketches

    v, e = _graph(spark)
    for h in (0, 1, 3):
        res = anf_sketches(spark, e, h, m=16)
        got = {(r["id"], r["reg"], r["val"]) for r in res.state.collect()}
        assert got == _anf_python(EDGES, h, 16), f"h={h}"


def test_anf_fixpoint_halts_early(spark):
    from duwamish_spark.algorithms import anf_sketches

    v, e = _graph(spark)
    res = anf_sketches(spark, e, 50, m=16)
    assert res.halted and res.supersteps < 50
    # fixpoint state equals an exact long replay
    got = {(r["id"], r["reg"], r["val"]) for r in res.state.collect()}
    assert got == _anf_python(EDGES, 50, 16)


def test_neighborhood_function_matches_python_estimator(spark):
    import math

    from duwamish_spark.algorithms import neighborhood_function
    from duwamish_spark.algorithms.anf import _alpha

    m = 16
    v, e = _graph(spark)
    counts, res = neighborhood_function(spark, e, 3, m=m)

    def est_from(sk_rows):
        per = {}
        for vid, r, val in sk_rows:
            per.setdefault(vid, {})[r] = val
        total = 0.0
        for vid, regs in per.items():
            z = (m - len(regs)) + sum(2.0 ** -v for v in regs.values())
            raw = _alpha(m) * m * m / z
            zeros = m - len(regs)
            if raw <= 2.5 * m and zeros > 0:
                raw = m * math.log(m / zeros)
            total += raw
        return total

    for h in range(4):
        expect = est_from(_anf_python(EDGES, h, m))
        assert counts[h] == pytest.approx(expect, rel=1e-9), f"h={h}"
    # monotone series
    assert all(b >= a - 1e-9 for a, b in zip(counts, counts[1:]))


def test_neighborhood_function_tracks_exact_balls(spark):
    # bigger random digraph: estimates at m=64 should land within 35% of
    # the exact pair counts (deterministic — fixed registers, no RNG)
    from duwamish_spark.algorithms import neighborhood_function

    rng = np.random.default_rng(3)
    edges = [
        (f"v{a:02d}", f"v{b:02d}")
        for a, b in rng.integers(0, 40, size=(120, 2)).tolist()
    ]
    v, e = _graph(spark, edges)
    counts, _ = neighborhood_function(spark, e, 4, m=64)
    for h in (1, 2, 4):
        exact = sum(_ball_sizes(edges, h).values())
        assert counts[h] == pytest.approx(exact, rel=0.35), f"h={h}"


def test_effective_diameter_interpolation():
    from duwamish_spark.algorithms import effective_diameter

    assert effective_diameter([]) == 0.0
    assert effective_diameter([10.0]) == 0.0
    # N = [4, 8, 10]; target 9 -> between hop 1 and 2 at (9-8)/(10-8)
    assert effective_diameter([4.0, 8.0, 10.0]) == pytest.approx(1.5)
    # flat series: diameter 0 (q*N already met at hop 0)
    assert effective_diameter([5.0, 5.0, 5.0]) == 0.0


def test_anf_rejects_bad_args(spark):
    from duwamish_spark.algorithms import anf_sketches

    v, e = _graph(spark)
    with pytest.raises(ValueError, match="h must"):
        anf_sketches(spark, e, -1)
    with pytest.raises(ValueError, match="m must"):
        anf_sketches(spark, e, 2, m=0)


# ---------------------------------------------------------------------------
# Harmonic centrality from ANF sketches
# ---------------------------------------------------------------------------


def _harmonic_python(edges, h, m):
    """Per-vertex harmonic estimate replayed from the md5 sketches with
    the exact float-op order of anf.harmonic_centrality."""
    import math

    from duwamish_spark.algorithms.anf import _alpha

    def est_per_vertex(sk_rows):
        per = {}
        for vid, r, val in sk_rows:
            per.setdefault(vid, {})[r] = val
        out = {}
        for vid, regs in per.items():
            z = (m - len(regs)) + sum(2.0 ** -v for v in regs.values())
            raw = _alpha(m) * m * m / z
            zeros = m - len(regs)
            if raw <= 2.5 * m and zeros > 0:
                raw = m * math.log(m / zeros)
            out[vid] = raw
        return out

    ests = [est_per_vertex(_anf_python(edges, t, m)) for t in range(h + 1)]
    verts = ests[0].keys()
    return {
        v: round(
            sum((ests[t][v] - ests[t - 1][v]) / float(t) for t in range(1, h + 1)),
            6,
        )
        for v in verts
    }


def test_harmonic_centrality_matches_python_replay(spark):
    from duwamish_spark.algorithms import harmonic_centrality

    _, e = _graph(spark)
    for h in (1, 3):
        got = {
            r["id"]: r["harmonic"]
            for r in harmonic_centrality(spark, e, h, m=16).collect()
        }
        want = _harmonic_python(EDGES, h, 16)
        assert set(got) == set(want)
        for vid in want:
            assert got[vid] == pytest.approx(want[vid], abs=2e-6), (vid, h)


def test_harmonic_centrality_fixpoint_padding(spark):
    # h far past the graph radius: extra hops add exactly zero terms
    from duwamish_spark.algorithms import harmonic_centrality

    _, e = _graph(spark)
    a = {r["id"]: r["harmonic"] for r in harmonic_centrality(spark, e, 4, m=16).collect()}
    b = {r["id"]: r["harmonic"] for r in harmonic_centrality(spark, e, 9, m=16).collect()}
    assert a == b


def test_harmonic_centrality_tracks_exact_on_random_graph(spark):
    # m=64 HLL error ~13% per ball; harmonic sums of ball deltas should
    # land near the exact BFS harmonic values in aggregate
    import math

    rng = np.random.default_rng(5)
    edges = [
        (f"v{a:02d}", f"v{b:02d}")
        for a, b in rng.integers(0, 40, size=(130, 2)).tolist()
    ]
    from duwamish_spark.algorithms import harmonic_centrality

    _, e = _graph(spark, edges)
    got = {r["id"]: r["harmonic"] for r in harmonic_centrality(spark, e, 6, m=64).collect()}

    de = {(s, d) for s, d in edges if s != d}
    out_adj = {}
    for s, d in de:
        out_adj.setdefault(s, set()).add(d)
    verts = sorted({x for p in de for x in p})
    exact = {}
    for v in verts:
        dist = {v: 0}
        frontier = {v}
        d = 0
        while frontier and d < 6:
            d += 1
            frontier = {
                w for u in frontier for w in out_adj.get(u, ()) if w not in dist
            }
            for w in frontier:
                dist[w] = d
        exact[v] = sum(1.0 / dd for w, dd in dist.items() if dd > 0)
    tot_got = sum(got.values())
    tot_exact = sum(exact.values())
    assert tot_got == pytest.approx(tot_exact, rel=0.3)


def _storage_ids(spark):
    return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}


def test_harmonic_centrality_releases_sketch_storage(spark):
    from duwamish_spark.algorithms import harmonic_centrality
    from duwamish_spark.pregel import free_local_checkpoint

    _, e = _graph(spark)
    before = _storage_ids(spark)
    out = harmonic_centrality(spark, e, 3, m=16)
    out.count()
    free_local_checkpoint(out)
    # no NEW storage left behind (earlier tests in the shared session may
    # legitimately hold their own checkpoints)
    assert _storage_ids(spark) <= before


# ---------------------------------------------------------------------------
# node2vec second-order biased walks
# ---------------------------------------------------------------------------


def _n2v_python(edges, length, wpv, p, q, scale=10_000):
    import hashlib

    wr, wf = round(scale / p), round(scale / q)
    de = sorted({(s, d) for s, d in edges})
    adj = {}
    for s, d in de:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s] = sorted(set(adj[s]))
    eset = set(de)

    def H(start, w, t):
        return int(
            hashlib.md5(f"{start}:{w}:{t}".encode()).hexdigest()[:8], 16
        )

    rows = set()
    for s0 in sorted({s for s, _ in de}):
        for w in range(wpv):
            cur, prev = s0, None
            rows.add((s0, w, 0, cur))
            for t in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if prev is None:
                    nxt = nbrs[H(s0, w, t) % len(nbrs)]
                else:
                    wts = [
                        wr if c == prev
                        else (scale if (prev, c) in eset else wf)
                        for c in nbrs
                    ]
                    pick = H(s0, w, t) % sum(wts)
                    cum = 0
                    for c, wt in zip(nbrs, wts):
                        cum += wt
                        if pick < cum:
                            nxt = c
                            break
                prev, cur = cur, nxt
                rows.add((s0, w, t, cur))
    return rows


@pytest.mark.parametrize("p,q", [(1.0, 1.0), (2.0, 0.5), (0.25, 4.0)])
def test_node2vec_matches_python_replay(spark, p, q):
    from duwamish_spark.algorithms import node2vec_walks

    from duwamish_spark.pregel import free_local_checkpoint

    _, e = _graph(spark)
    res = node2vec_walks(
        spark, e, walk_length=5, walks_per_vertex=2, p=p, q=q
    )
    got = {
        (r["start_id"], r["walk"], r["step"], r["vertex"])
        for r in res.collect()
    }
    free_local_checkpoint(res)
    assert got == _n2v_python(EDGES, 5, 2, p, q)


def test_node2vec_random_graph_replay(spark):
    from duwamish_spark.algorithms import node2vec_walks

    rng = np.random.default_rng(9)
    edges = [
        (f"v{a:02d}", f"v{b:02d}")
        for a, b in rng.integers(0, 30, size=(100, 2)).tolist()
    ]
    from duwamish_spark.pregel import free_local_checkpoint

    _, e = _graph(spark, edges)
    res = node2vec_walks(
        spark, e, walk_length=4, walks_per_vertex=1, p=4.0, q=0.25
    )
    got = {
        (r["start_id"], r["walk"], r["step"], r["vertex"])
        for r in res.collect()
    }
    free_local_checkpoint(res)
    assert got == _n2v_python(edges, 4, 1, 4.0, 0.25)


def test_node2vec_partitioning_invariant(spark):
    from duwamish_spark.algorithms import node2vec_walks

    from duwamish_spark.pregel import free_local_checkpoint

    _, e = _graph(spark)
    a = node2vec_walks(spark, e, walk_length=3, p=0.5, q=2.0)
    b = node2vec_walks(
        spark, e, walk_length=3, p=0.5, q=2.0, num_partitions=7
    )
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    free_local_checkpoint(a)
    free_local_checkpoint(b)
    assert ra == rb


def test_node2vec_releases_storage_and_rejects_bad_args(spark):
    from duwamish_spark.algorithms import node2vec_walks
    from duwamish_spark.pregel import free_local_checkpoint

    _, e = _graph(spark)
    before = _storage_ids(spark)
    out = node2vec_walks(spark, e, walk_length=2)
    out.count()
    free_local_checkpoint(out)
    assert _storage_ids(spark) <= before
    with pytest.raises(ValueError):
        node2vec_walks(spark, e, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(spark, e, q=-1.0)
    with pytest.raises(ValueError):
        node2vec_walks(spark, e, p=1e9)
