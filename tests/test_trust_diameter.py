"""TrustRank / spam mass and ANF effective diameter — independent replays.

The reference's only ranking program is plain PageRank
(reference: example/PageRank.java:37-126); trust.spam_mass composes it
with the engine's personalized teleport, and
anf.effective_diameter_estimate summarizes the HyperANF neighborhood
function — both pinned here against NumPy / pure-Python oracles.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from duwamish_spark.algorithms import (
    effective_diameter,
    effective_diameter_estimate,
    spam_mass,
)
from duwamish_spark.graph import vertices_from

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("a", "b"), ("e", "a"), ("e", "e"),
    ("f", "f"),  # self-loop-ONLY vertex: must still appear everywhere
]


def _graph(spark, edges=EDGES):
    e = spark.createDataFrame(edges, "src string, dst string")
    return vertices_from(None, e), e


# ---------------------------------------------------------------------------
# spam mass
# ---------------------------------------------------------------------------


def _pr_numpy(edges, iters, seeds=None):
    """Reference-exact PageRank: dangling mass drops, duplicate edges
    send duplicate messages, optional teleport normalized to sum V."""
    ids = sorted({x for p in edges for x in p})
    ix = {d: i for i, d in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for s, _ in edges:
        out[ix[s]] += 1.0
    p = np.full(n, 1.0)
    if seeds is not None:
        p = np.zeros(n)
        for s in seeds:
            p[ix[s]] = 1.0
        p *= n / p.sum()
    r = np.ones(n)
    for _ in range(iters):
        nxt = 0.15 * p
        for s, d in edges:
            nxt[ix[d]] += 0.85 * r[ix[s]] / out[ix[s]]
        r = nxt
    return {v: r[ix[v]] for v in ids}


def test_spam_mass_matches_numpy(spark):
    v, e = _graph(spark)
    trusted = spark.createDataFrame([("a",), ("d",)], "id string")
    got = {
        r["id"]: r
        for r in spam_mass(spark, v, e, trusted, max_supersteps=6).collect()
    }
    pr = _pr_numpy(EDGES, 6)
    tr = _pr_numpy(EDGES, 6, seeds=["a", "d"])
    assert set(got) == set(pr)
    for vid in pr:
        assert got[vid]["rank"] == pytest.approx(pr[vid], abs=1e-9)
        assert got[vid]["trust"] == pytest.approx(tr[vid], abs=1e-9)
        assert got[vid]["spam_mass"] == pytest.approx(
            (pr[vid] - tr[vid]) / pr[vid], abs=1e-9
        )


def test_spam_mass_zero_when_everyone_trusted(spark):
    # uniform teleport over ALL vertices == classic PageRank rank-for-rank
    # (the engine's sum-V normalization), so spam mass vanishes identically
    v, e = _graph(spark)
    got = spam_mass(spark, v, e, v.select("id"), max_supersteps=5).collect()
    for r in got:
        assert r["spam_mass"] == pytest.approx(0.0, abs=1e-12), r["id"]
        assert r["trust"] == pytest.approx(r["rank"], abs=1e-12)


def test_spam_mass_validates_seeds(spark):
    v, e = _graph(spark)
    with pytest.raises(ValueError, match="empty"):
        spam_mass(spark, v, e, v.where(F.lit(False)).select("id"))
    with pytest.raises(ValueError, match="'id'"):
        spam_mass(spark, v, e, v.select(F.col("id").alias("vertex")))


def test_spam_mass_spam_farm_ranks_high_mass(spark):
    # a clique pumping rank into a target, disconnected from the trusted
    # core: the target's spam mass must dwarf the trusted-reachable pages'
    edges = (
        [("t", "x"), ("x", "t"), ("x", "y"), ("y", "x")]
        + [(f"s{i}", "spam") for i in range(4)]
        + [("spam", f"s{i}") for i in range(4)]
    )
    v, e = _graph(spark, edges)
    trusted = spark.createDataFrame([("t",)], "id string")
    got = {
        r["id"]: r["spam_mass"]
        for r in spam_mass(spark, v, e, trusted, max_supersteps=20).collect()
    }
    assert got["spam"] > 0.9
    assert got["x"] < 0.5
    assert got["spam"] > got["x"] and got["spam"] > got["y"]


# ---------------------------------------------------------------------------
# effective diameter
# ---------------------------------------------------------------------------


def _ed_python(edges, h, m, q):
    """Pure-Python replay of effective_diameter_estimate: md5 sketches,
    out-ball union, HLL estimates in the engine's float-op order, micros
    rounded HALF_UP per vertex before the integer sum."""
    from duwamish_spark.algorithms.anf import _alpha

    raw_verts = sorted({x for p in edges for x in p})
    de = {(s, d) for s, d in edges if s != d}
    out_adj: dict[str, set] = {}
    for s, d in de:
        out_adj.setdefault(s, set()).add(d)

    def u32(s, off):
        return int(hashlib.md5(s.encode()).hexdigest()[off : off + 8], 16)

    def seed(v):
        x2 = u32(str(v), 8)
        return {u32(str(v), 0) % m: 33 - x2.bit_length() if x2 else 33}

    def est(regs):
        z = (m - len(regs)) + sum(2.0 ** -v for v in regs.values())
        raw = _alpha(m) * m * m / z
        zeros = m - len(regs)
        if raw <= 2.5 * m and zeros > 0:
            raw = m * math.log(m / zeros)
        return raw

    def total(sk):
        return sum(math.floor(est(regs) * 1e6 + 0.5) for regs in sk.values())

    sk = {v: seed(v) for v in raw_verts}
    totals = [total(sk)]
    for _ in range(h):
        nxt = {}
        for v in raw_verts:
            merged = dict(sk[v])
            for w in out_adj.get(v, ()):
                for r, val in sk[w].items():
                    if merged.get(r, -1) < val:
                        merged[r] = val
            nxt[v] = merged
        sk = nxt
        totals.append(total(sk))
    return effective_diameter([float(t) for t in totals], q), totals


def test_effective_diameter_matches_python_replay(spark):
    _, e = _graph(spark)
    ed, totals, _ = effective_diameter_estimate(spark, e, 3, m=16, q=0.9)
    want_ed, want_totals = _ed_python(EDGES, 3, 16, 0.9)
    assert totals == want_totals
    assert ed == pytest.approx(want_ed, abs=1e-9)
    # self-consistency: the scalar is a pure function of the totals
    assert ed == effective_diameter([float(t) for t in totals], 0.9)


def test_effective_diameter_totals_monotone_and_fixpoint(spark):
    # complete K4: every out-ball saturates at hop 1
    edges = [(a, b) for a in "abcd" for b in "abcd" if a != b]
    _, e = _graph(spark, edges)
    ed, totals, _ = effective_diameter_estimate(spark, e, 3, m=32, q=0.9)
    assert totals[1] == totals[2] == totals[3]
    assert totals[0] <= totals[1]
    assert 0.0 <= ed <= 1.0


def test_effective_diameter_partition_invariant(spark):
    _, e = _graph(spark)
    ed1, t1, _ = effective_diameter_estimate(spark, e, 2, m=16, q=0.9)
    ed2, t2, _ = effective_diameter_estimate(
        spark, e.repartition(7), 2, m=16, q=0.9, num_partitions=3
    )
    assert t1 == t2 and ed1 == ed2


def test_effective_diameter_path_graph(spark):
    # directed path 0->1->...->9: out-balls keep growing through hop 3,
    # so the interpolated diameter must exceed 1 and totals strictly rise
    edges = [(str(i), str(i + 1)) for i in range(9)]
    _, e = _graph(spark, edges)
    ed, totals, _ = effective_diameter_estimate(spark, e, 3, m=64, q=0.9)
    assert totals[0] < totals[1] < totals[2] < totals[3]
    assert ed > 1.0
