"""Bow-tie decomposition + reachable_set + contract_graph — brute-force
oracles.

The bow-tie oracle is an independent pure-Python replay: BFS closures
over an adjacency dict, largest-SCC selection by (size desc, min id) via
Tarjan-free mutual reachability — no shared code with the engine path.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from duwamish_spark.algorithms import bowtie_decomposition, reachable_set
from duwamish_spark.graph import contract_graph, repo_mapping, vertices_from


def _edges(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


# hand-built graph exercising all eight regions
ALL_REGIONS = [
    (1, 2), (2, 3), (3, 1),      # core 1-2-3
    (10, 1), (11, 10),           # in: 10, 11
    (3, 20), (20, 21),           # out: 20, 21
    (10, 30), (30, 20),          # tube: 30
    (10, 40),                    # tendril_in: 40
    (50, 20),                    # tendril_out: 50
    (60, 40),                    # other_wcc: 60
    (70, 71),                    # disconnected: 70, 71
]
ALL_WANT = {
    1: "core", 2: "core", 3: "core", 10: "in", 11: "in",
    20: "out", 21: "out", 30: "tube", 40: "tendril_in",
    50: "tendril_out", 60: "other_wcc", 70: "disconnected",
    71: "disconnected",
}


def _brute_bowtie(edges):
    """Independent replay of the region contract over Python sets."""
    verts = sorted({x for p in edges for x in p})
    fwd_adj, bwd_adj, sym_adj = {}, {}, {}
    for s, d in edges:
        if s == d:
            continue
        fwd_adj.setdefault(s, set()).add(d)
        bwd_adj.setdefault(d, set()).add(s)
        sym_adj.setdefault(s, set()).add(d)
        sym_adj.setdefault(d, set()).add(s)

    def bfs(seeds, adj):
        seen, todo = set(seeds), list(seeds)
        while todo:
            v = todo.pop()
            for w in adj.get(v, ()):
                if w not in seen:
                    seen.add(w)
                    todo.append(w)
        return seen

    # SCC by mutual reachability (fine at test sizes)
    reach = {v: bfs([v], fwd_adj) for v in verts}
    scc_id = {
        v: min(w for w in verts if w in reach[v] and v in reach[w])
        for v in verts
    }
    sizes = {}
    for v in verts:
        sizes[scc_id[v]] = sizes.get(scc_id[v], 0) + 1
    core_lbl = min(
        sizes, key=lambda lbl: (-sizes[lbl], lbl)
    )
    core = {v for v in verts if scc_id[v] == core_lbl}
    fwd = bfs(core, fwd_adj)
    bwd = bfs(core, bwd_adj)
    ins = bwd - core
    outs = fwd - core
    from_in = bfs(ins, fwd_adj)
    to_out = bfs(outs, bwd_adj)
    wcc = bfs(core, sym_adj)
    out = {}
    for v in verts:
        if v in core:
            out[v] = "core"
        elif v in bwd:
            out[v] = "in"
        elif v in fwd:
            out[v] = "out"
        elif v in from_in and v in to_out:
            out[v] = "tube"
        elif v in from_in:
            out[v] = "tendril_in"
        elif v in to_out:
            out[v] = "tendril_out"
        elif v in wcc:
            out[v] = "other_wcc"
        else:
            out[v] = "disconnected"
    return out


def test_bowtie_all_eight_regions(spark):
    e = _edges(spark, ALL_REGIONS)
    res = bowtie_decomposition(spark, vertices_from(None, e), e)
    got = {r["id"]: r["region"] for r in res.state.collect()}
    assert got == ALL_WANT
    assert res.halted
    assert res.metrics[-1]["n_core"] == 3
    assert _brute_bowtie(ALL_REGIONS) == ALL_WANT  # oracle sanity


def test_bowtie_matches_brute_on_random_sparse(spark):
    rng = random.Random(7)
    n = 60
    edges = sorted(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(80)}
    )
    e = _edges(spark, edges)
    res = bowtie_decomposition(spark, vertices_from(None, e), e)
    got = {r["id"]: r["region"] for r in res.state.collect()}
    assert got == _brute_bowtie(edges)
    assert res.halted


def test_bowtie_single_giant_scc(spark):
    # a directed cycle: everything is core, no other region
    edges = [(i, (i + 1) % 6) for i in range(6)]
    e = _edges(spark, edges)
    res = bowtie_decomposition(spark, vertices_from(None, e), e)
    got = {r["id"]: r["region"] for r in res.state.collect()}
    assert got == {i: "core" for i in range(6)}


def test_reachable_set_includes_seeds_and_bounds(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (9, 9)])
    seeds = spark.createDataFrame([(0,)], "id long")
    reached, rounds, done = reachable_set(spark, seeds, e)
    assert sorted(r["id"] for r in reached.collect()) == [0, 1, 2, 3]
    assert rounds == 3 and done
    # hop bound: max_rounds=1 sees only the 1-hop ball
    reached1, rounds1, done1 = reachable_set(spark, seeds, e, max_rounds=1)
    assert sorted(r["id"] for r in reached1.collect()) == [0, 1]
    assert rounds1 == 1 and not done1


def test_reachable_set_empty_seeds(spark):
    e = _edges(spark, [(0, 1)])
    seeds = spark.createDataFrame([], "id long")
    reached, rounds, done = reachable_set(spark, seeds, e)
    assert reached.count() == 0 and rounds == 0 and done


# ---------------------------------------------------------------------------
# contract_graph / repo_mapping
# ---------------------------------------------------------------------------

def test_contract_graph_counts_and_self_loop_drop(spark):
    m = spark.createDataFrame(
        [(i, i // 10) for i in range(100)], "id long, group long"
    )
    e = _edges(spark, [(1, 2), (2, 15), (3, 15), (4, 25), (14, 25), (99, 1)])
    got = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in contract_graph(e, m).collect()
    )
    # (1,2) is intra-group 0 -> dropped; (2,15),(3,15) collapse to (0,1) w=2
    assert got == [(0, 1, 2), (0, 2, 1), (1, 2, 1), (9, 0, 1)]


def test_contract_graph_keeps_self_loops_when_asked(spark):
    m = spark.createDataFrame([(1, 0), (2, 0)], "id long, group long")
    e = _edges(spark, [(1, 2), (1, 2)])
    got = contract_graph(e, m, drop_self_loops=False).collect()
    assert [(r["src"], r["dst"], r["weight"]) for r in got] == [(0, 0, 2)]


def test_contract_graph_partial_mapping_keeps_own_id(spark):
    # 7 is unmapped: it stays itself on both sides
    m = spark.createDataFrame([(1, 100)], "id long, group long")
    e = _edges(spark, [(1, 7), (7, 1), (7, 7)])
    got = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in contract_graph(e, m).collect()
    )
    assert got == [(7, 100, 1), (100, 7, 1)]


def test_contract_graph_composes_with_weights(spark):
    # contracting an already-weighted graph sums weights exactly
    m1 = spark.createDataFrame(
        [(i, i // 2) for i in range(8)], "id long, group long"
    )
    m2 = spark.createDataFrame(
        [(i, i // 2) for i in range(4)], "id long, group long"
    )
    e = _edges(spark, [(0, 4), (1, 5), (0, 6), (2, 6), (3, 7)])
    once = contract_graph(e, spark.createDataFrame(
        [(i, i // 4) for i in range(8)], "id long, group long"
    ))
    twice = contract_graph(
        contract_graph(e, m1), m2, weight_col="weight"
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_repo_mapping_and_contract_on_corpus(spark):
    from duwamish_spark.corpus import corpus_df
    from duwamish_spark.graph import corpus_vertex_ids
    from duwamish_spark.parse import extract_edges

    corpus = corpus_df(spark, 200, max_out_degree=6, seed=3)
    edges = extract_edges(corpus)
    mapping = repo_mapping(corpus)
    rg = contract_graph(edges, mapping)
    rows = rg.collect()
    assert rows, "repo graph should not be empty"
    repos = {r["group"] for r in mapping.select("group").distinct().collect()}
    for r in rows:
        assert r["src"] in repos and r["dst"] in repos and r["src"] != r["dst"]
    # total weight = number of cross-repo file edges
    cross = (
        edges.join(mapping.withColumnRenamed("id", "src")
                   .withColumnRenamed("group", "gs"), "src")
        .join(mapping.withColumnRenamed("id", "dst")
              .withColumnRenamed("group", "gd"), "dst")
        .where(F.col("gs") != F.col("gd"))
        .count()
    )
    assert sum(r["weight"] for r in rows) == cross


# ---------------------------------------------------------------------------
# percolation snowball sampling (gsample.py)
# ---------------------------------------------------------------------------


def _pu32(salt, u, v):
    import hashlib

    return int(hashlib.md5(f"{salt}:{u}:{v}".encode()).hexdigest()[:8], 16)


def _brute_percolation(edges, seeds, p_ppm, rounds, salt="burn"):
    thr = p_ppm * (1 << 32) // 1_000_000
    kept = {
        (u, v)
        for u, v in set(edges)
        if u != v and _pu32(salt, u, v) < thr
    }
    reached = set(seeds)
    frontier = set(seeds)
    for _ in range(rounds):
        nxt = {v for u, v in kept if u in frontier} - reached
        if not nxt:
            break
        reached |= nxt
        frontier = nxt
    return reached


def test_percolation_sample_matches_brute(spark):
    from duwamish_spark.algorithms import percolation_sample

    rng = random.Random(31)
    n, m = 60, 240
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    seeds = [0, 7, 13]
    e = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(s,) for s in seeds], "id long")
    for p in (0, 300_000, 700_000, 1_000_000):
        res = percolation_sample(spark, e, sd, p_ppm=p)
        got = {r["id"] for r in res.state.collect()}
        assert got == _brute_percolation(edges, seeds, p, 10_000), p
        assert res.halted
    # p=0: nothing burns beyond the seeds
    res0 = percolation_sample(spark, e, sd, p_ppm=0)
    assert {r["id"] for r in res0.state.collect()} == set(seeds)


def test_percolation_fixed_rounds_is_hop_ball(spark):
    from duwamish_spark.algorithms import percolation_sample

    # chain 0->1->2->3->4, p=1: r rounds reach exactly r hops
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    sd = spark.createDataFrame([(0,)], "id long")
    res = percolation_sample(spark, e, sd, p_ppm=1_000_000, max_rounds=2)
    assert {r["id"] for r in res.state.collect()} == {0, 1, 2}
    assert not res.halted


def test_percolation_deterministic_and_monotone_in_p(spark):
    from duwamish_spark.algorithms import percolation_edges

    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    e = spark.createDataFrame(edges, "src long, dst long")
    kept_lo = {(r["src"], r["dst"]) for r in percolation_edges(e, p_ppm=200_000).collect()}
    kept_hi = {(r["src"], r["dst"]) for r in percolation_edges(e, p_ppm=800_000).collect()}
    assert kept_lo <= kept_hi  # nested samples: same coin, higher threshold
    again = {(r["src"], r["dst"]) for r in percolation_edges(e.repartition(7), p_ppm=200_000).collect()}
    assert again == kept_lo
    with pytest.raises(ValueError):
        percolation_edges(e, p_ppm=2_000_000)
