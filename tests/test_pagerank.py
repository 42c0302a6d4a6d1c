"""PageRank: golden graphs (FIXTURES.md F4), oracle equivalence, salting."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df, vertices_df
from duwamish_spark.algorithms import pagerank
from duwamish_spark.graph import vertices_from
from oracle import pagerank_oracle, rand_graph


def _run(spark, ids, edges, **kw):
    res = pagerank(spark, vertices_df(spark, ids), edges_df(spark, edges), **kw)
    return {r["id"]: r["rank"] for r in res.state.collect()}, res


def test_cycle3_all_ones(spark):
    # unnormalized update on a cycle: every rank stays exactly 1.0
    ids = ["0", "1", "2"]
    edges = [("0", "1"), ("1", "2"), ("2", "0")]
    ranks, res = _run(spark, ids, edges, tol=1e-6)
    assert ranks == {"0": 1.0, "1": 1.0, "2": 1.0}
    assert res.halted and res.supersteps <= 2


def test_dangling_pair(spark):
    # dangling mass dropped: rank(0)=0.15, rank(1)=0.15+0.85*0.15 at fixpoint
    ids = ["0", "1"]
    edges = [("0", "1")]
    ranks, res = _run(spark, ids, edges, tol=1e-9)
    assert ranks["0"] == pytest.approx(0.15, abs=1e-9)
    assert ranks["1"] == pytest.approx(0.15 + 0.85 * 0.15, abs=1e-9)
    oracle, _ = pagerank_oracle(ids, edges, tol=1e-9)
    for v in ids:
        assert ranks[v] == pytest.approx(oracle[v], abs=1e-9)


def test_dup_selfloop_multiplicity(spark):
    # duplicate edge => duplicate message; self-loop delivers to self
    ids = ["0", "1"]
    edges = [("0", "1"), ("0", "1"), ("1", "1")]
    oracle, steps = pagerank_oracle(ids, edges, fixed_supersteps=5)
    ranks, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=5)
    for v in ids:
        assert ranks[v] == pytest.approx(oracle[v], abs=1e-9)


@pytest.mark.parametrize("v,maxdeg,seed", [(200, 6, 1), (500, 15, 2)])
def test_random_graph_vs_oracle(spark, v, maxdeg, seed):
    ids, edges = rand_graph(v, maxdeg, seed)
    oracle, _ = pagerank_oracle(ids, edges, fixed_supersteps=20)
    ranks, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=20)
    got = np.array([ranks[i] for i in ids])
    want = np.array([oracle[i] for i in ids])
    assert np.allclose(got, want, atol=1e-6)


def test_salted_equals_unsalted(spark):
    ids, edges = rand_graph(150, 10, 5)
    plain, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=8, strategy="shuffle")
    salted, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=8, salt=8, strategy="shuffle")
    for v in ids:
        assert salted[v] == pytest.approx(plain[v], abs=1e-9)


def test_strategies_and_encoding_equivalent(spark):
    ids, edges = rand_graph(150, 8, 17)
    variants = [
        _run(spark, ids, edges, tol=0.0, max_supersteps=8, strategy="shuffle", encode=False)[0],
        _run(spark, ids, edges, tol=0.0, max_supersteps=8, strategy="shuffle", encode=True)[0],
        _run(spark, ids, edges, tol=0.0, max_supersteps=8, strategy="broadcast", encode=True)[0],
    ]
    base = variants[0]
    for other in variants[1:]:
        assert set(other) == set(base)
        for v in ids:
            assert other[v] == pytest.approx(base[v], abs=1e-12)


def test_convergence_to_l1_tolerance(spark):
    ids, edges = rand_graph(60, 4, 11)
    ranks, res = _run(spark, ids, edges, tol=1e-6)
    oracle, osteps = pagerank_oracle(ids, edges, tol=1e-6)
    assert res.halted
    assert res.supersteps == osteps
    got = np.array([ranks[i] for i in ids])
    want = np.array([oracle[i] for i in ids])
    assert np.allclose(got, want, atol=1e-6)
    assert res.last["residual"] < 1e-6


def test_raw_combine_equals_partial(spark):
    # raw = exchange-then-aggregate (cache-resident per-task maps, the
    # strong-scaling configuration); partial = map-side combine. Same math.
    ids, edges = rand_graph(150, 10, 11)
    partial, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=8, strategy="shuffle")
    raw, _ = _run(
        spark, ids, edges, tol=0.0, max_supersteps=8, strategy="shuffle", combine="raw"
    )
    raw_salted, _ = _run(
        spark, ids, edges, tol=0.0, max_supersteps=8, strategy="shuffle",
        combine="raw", salt=8,
    )
    for v in ids:
        assert raw[v] == pytest.approx(partial[v], abs=1e-9)
        assert raw_salted[v] == pytest.approx(partial[v], abs=1e-9)


def test_custom_partitioner_invariant_and_placed(spark):
    # the public placement hook (reference: model/Partitioner.java:19-21):
    # results are identical under any partitioner, and partition_by really
    # co-locates rows by the custom expression
    from pyspark.sql import functions as F

    from duwamish_spark.graph import partition_by

    ids, edges = rand_graph(150, 8, 23)
    modulo = lambda c: F.pmod(F.hash(c), F.lit(3))  # noqa: E731
    base, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=6, strategy="shuffle")
    custom, _ = _run(
        spark, ids, edges, tol=0.0, max_supersteps=6, strategy="shuffle",
        num_partitions=4, partitioner=modulo,
    )
    for v in ids:
        assert custom[v] == pytest.approx(base[v], abs=1e-12)

    # placement: every modulo-class lives in exactly one partition
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    placed = partition_by(df, 4, "id", modulo).select(
        "id", F.spark_partition_id().alias("pid"),
        F.pmod(F.hash("id"), F.lit(3)).alias("cls"),
    )
    per_class = placed.groupBy("cls").agg(
        F.countDistinct("pid").alias("n_pids")
    ).collect()
    assert per_class and all(r["n_pids"] == 1 for r in per_class)

    from duwamish_spark.algorithms import connected_components
    from conftest import edges_df, vertices_df as _vdf

    e = edges_df(spark, edges)
    v = vertices_from(None, e)
    cc_base = connected_components(spark, v, e, strategy="shuffle").state.collect()
    cc_custom = connected_components(
        spark, v, e, strategy="shuffle", num_partitions=4, partitioner=modulo
    ).state.collect()
    assert {(r.id, r.label) for r in cc_base} == {(r.id, r.label) for r in cc_custom}


def test_auto_salt_decision(spark):
    from pyspark.sql import functions as F

    from duwamish_spark.graph import suggest_salt

    # balanced: uniform dsts -> no salt
    balanced = spark.range(1000).select(
        (F.col("id") % 100).alias("src"), ((F.col("id") * 7) % 100).alias("dst")
    )
    assert suggest_salt(balanced, 8) == 0
    # hub: 90% of edges hit one dst -> salt > 1, capped
    hub = spark.range(1000).select(
        (F.col("id") % 100).alias("src"),
        F.when(F.col("id") % 10 != 0, F.lit(42)).otherwise(F.col("id") % 100).alias("dst"),
    )
    s = suggest_salt(hub, 8)
    assert 1 < s <= 64
    # auto-salted pagerank equals unsalted
    ids, edges = rand_graph(120, 8, 31)
    plain, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=6, strategy="shuffle")
    auto, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=6, strategy="shuffle", salt="auto")
    for v in ids:
        assert auto[v] == pytest.approx(plain[v], abs=1e-9)


def test_warm_start_converges_faster_and_equal(spark):
    # converge a graph; grow it with a few extra edges; warm-starting from
    # the previous ranks must (a) reach the same fixpoint as a cold start
    # and (b) take fewer supersteps
    ids, edges = rand_graph(300, 8, 41)
    _, first = _run(spark, ids, edges, tol=1e-8)
    grown = edges + [(ids[1], ids[5]), (ids[7], ids[2]), (ids[0], ids[9])]
    cold, cold_res = _run(spark, ids, grown, tol=1e-8)
    warm, warm_res = _run(
        spark, ids, grown, tol=1e-8, initial_ranks=first.state
    )
    assert warm_res.halted and cold_res.halted
    assert warm_res.supersteps < cold_res.supersteps
    for v in ids:
        assert warm[v] == pytest.approx(cold[v], abs=1e-6)


# ---------------------------------------------------------------------------
# weighted edges (weight_col)
# ---------------------------------------------------------------------------


def _weighted_pr_numpy(ids, wedges, steps, damping=0.85):
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    r = np.ones(n)
    strength = np.zeros(n)
    for s, _, w in wedges:
        strength[ix[s]] += w
    for _ in range(steps):
        nxt = np.full(n, 1.0 - damping)
        for s, d, w in wedges:
            nxt[ix[d]] += damping * r[ix[s]] * w / strength[ix[s]]
        r = nxt
    return {v: r[ix[v]] for v in ids}


def _wedges_df(spark, wedges):
    return spark.createDataFrame(wedges, "src string, dst string, wt double")


def test_weighted_equal_weights_is_classic(spark):
    ids = ["0", "1", "2", "3"]
    edges = [("0", "1"), ("0", "2"), ("1", "2"), ("2", "3"), ("3", "0")]
    wedges = [(s, d, 7.5) for s, d in edges]
    classic, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=8)
    res = pagerank(
        spark, vertices_df(spark, ids), _wedges_df(spark, wedges),
        tol=0.0, max_supersteps=8, weight_col="wt",
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    for v in ids:
        assert got[v] == pytest.approx(classic[v], abs=1e-12)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_weighted_random_graph_vs_numpy(spark, strategy):
    rng = np.random.default_rng(17)
    ids = [str(i) for i in range(60)]
    wedges = [
        (str(int(a)), str(int(b)), float(w))
        for (a, b), w in zip(
            rng.integers(0, 60, size=(300, 2)).tolist(),
            (0.25 + rng.random(300) * 4).tolist(),
        )
    ]
    oracle = _weighted_pr_numpy(ids, wedges, 12)
    res = pagerank(
        spark, vertices_df(spark, ids), _wedges_df(spark, wedges),
        tol=0.0, max_supersteps=12, weight_col="wt", strategy=strategy,
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    for v in ids:
        assert got[v] == pytest.approx(oracle[v], abs=1e-9), v


def test_weighted_survives_encoding_and_salt(spark):
    rng = np.random.default_rng(23)
    ids = [str(i) for i in range(40)]
    wedges = [
        (str(int(a)), str(int(b)), float(w))
        for (a, b), w in zip(
            rng.integers(0, 40, size=(200, 2)).tolist(),
            (0.5 + rng.random(200)).tolist(),
        )
    ]
    oracle = _weighted_pr_numpy(ids, wedges, 6)
    res = pagerank(
        spark, vertices_df(spark, ids), _wedges_df(spark, wedges),
        tol=0.0, max_supersteps=6, weight_col="wt",
        strategy="shuffle", salt=4, combine="raw", encode=True,
    )
    got = {r["id"]: r["rank"] for r in res.state.collect()}
    for v in ids:
        assert got[v] == pytest.approx(oracle[v], abs=1e-9), v


def test_weighted_missing_column_rejected(spark):
    ids = ["0", "1"]
    edges = [("0", "1")]
    with pytest.raises(ValueError):
        pagerank(
            spark, vertices_df(spark, ids), edges_df(spark, edges),
            weight_col="nope",
        )


def test_dangling_redistribute_conserves_total_rank(spark):
    # 0 -> 1, 1 dangling: with redistribution total rank stays exactly V
    ids = ["0", "1", "2"]
    edges = [("0", "1"), ("2", "1")]
    ranks, res = _run(
        spark, ids, edges, tol=0.0, max_supersteps=8, dangling="redistribute"
    )
    assert sum(ranks.values()) == pytest.approx(3.0, abs=1e-9)
    oracle, _ = pagerank_oracle(
        ids, edges, fixed_supersteps=8, dangling="redistribute"
    )
    for v in ids:
        assert ranks[v] == pytest.approx(oracle[v], abs=1e-9)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_dangling_redistribute_random_graph(spark, strategy):
    # rand_graph leaves some vertices without out-edges only if maxdeg
    # draws 0 — force danglings by dropping all out-edges of a vertex set
    ids, edges = rand_graph(120, 4, seed=9)
    dang = set(ids[::7])
    edges = [(s, d) for s, d in edges if s not in dang]
    oracle, _ = pagerank_oracle(
        ids, edges, fixed_supersteps=12, dangling="redistribute"
    )
    ranks, _ = _run(
        spark, ids, edges, tol=0.0, max_supersteps=12,
        dangling="redistribute", strategy=strategy,
    )
    got = np.array([ranks[i] for i in ids])
    want = np.array([oracle[i] for i in ids])
    assert np.allclose(got, want, atol=1e-9)
    assert got.sum() == pytest.approx(len(ids), abs=1e-6)


def test_dangling_drop_unchanged_when_no_danglings(spark):
    # graphs with no dangling vertex: redistribute == drop exactly
    ids = ["0", "1", "2"]
    edges = [("0", "1"), ("1", "2"), ("2", "0"), ("0", "2")]
    a, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=6)
    b, _ = _run(spark, ids, edges, tol=0.0, max_supersteps=6, dangling="redistribute")
    assert a == b


def test_dangling_rejects_unknown_mode(spark):
    ids = ["0", "1"]
    with pytest.raises(ValueError, match="dangling"):
        _run(spark, ids, [("0", "1")], dangling="teleport")
