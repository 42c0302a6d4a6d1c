"""Seeded SimRank (coupled fingerprint estimator) vs a pure-Python
replay of the exact same deterministic coupled walks, plus estimator
invariants (self-score 1, symmetry, structural-twin affinity)."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

import pytest

from duwamish_spark.algorithms import simrank_seeded
from duwamish_spark.algorithms.simrank import decay_micros_table
from duwamish_spark.pregel import free_local_checkpoint


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _brute_simrank(edges, seeds, n_walks, walk_length, decay, salt="sr"):
    de = {(u, v) for u, v in edges if u != v}
    inn = defaultdict(list)
    for u, v in de:
        inn[v].append(u)
    for v in inn:
        inn[v] = sorted(set(inn[v]))
    verts = sorted({u for e in de for u in e})
    micros = decay_micros_table(decay, walk_length)

    # coupled trajectories: pos[r][v][t]
    pos = {}
    for r in range(n_walks):
        pos[r] = {}
        for v in verts:
            traj = [v]
            p = v
            for t in range(walk_length):
                nbrs = inn.get(p, [])
                if not nbrs:
                    break
                p = nbrs[_u32(f"{salt}:{r}:{t}:{p}") % len(nbrs)]
                traj.append(p)
            pos[r][v] = traj

    out = {}
    for a in seeds:
        for b in verts:
            total, met = 0, 0
            for r in range(n_walks):
                ta, tb = pos[r][a], pos[r][b]
                mt = None
                for t in range(min(len(ta), len(tb))):
                    if ta[t] == tb[t]:
                        mt = t
                        break
                if mt is not None:
                    met += 1
                    total += micros[mt]
            if met:
                out[(a, b)] = (met, round(total / (n_walks * 1_000_000), 6))
    return out


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    sd = spark.createDataFrame([(s,) for s in seeds], "id long")
    df = simrank_seeded(spark, e, sd, **kw)
    got = {
        (r["seed"], r["id"]): (r["met_reps"], r["simrank"]) for r in df.collect()
    }
    free_local_checkpoint(df)
    return got


def test_simrank_matches_brute_replay(spark):
    rng = random.Random(13)
    n, m = 30, 110
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    seeds = [0, 5, 9]
    got = _run(spark, edges, seeds, n_walks=4, walk_length=4)
    want = _brute_simrank(edges, seeds, 4, 4, 0.8)
    assert got == want
    # self-similarity is exactly 1 for every seed that has edges
    present = {u for e in edges if e[0] != e[1] for u in e}
    for s in seeds:
        if s in present:
            assert got[(s, s)] == (4, 1.0), s


def test_simrank_symmetric_between_seeds(spark):
    rng = random.Random(4)
    n, m = 25, 90
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    got = _run(spark, edges, [1, 2], n_walks=6, walk_length=4)
    # meeting time is symmetric, so the estimator is too
    if (1, 2) in got or (2, 1) in got:
        assert got.get((1, 2)) == got.get((2, 1))


def test_simrank_structural_twins_meet(spark):
    # 1 and 2 have IDENTICAL in-neighborhoods {10, 11}: each repetition
    # meets at step 1 iff both position-keyed hashes pick the same
    # neighbor (~1/2 of reps, deterministic given the salt); 10/11 have
    # no in-edges so trajectories die after step 1 — any meeting scores
    # exactly decay^1 per met rep
    edges = [(10, 1), (11, 1), (10, 2), (11, 2), (1, 99), (2, 99)]
    got = _run(spark, edges, [1], n_walks=16, walk_length=3, decay=0.8)
    want = _brute_simrank(edges, [1], 16, 3, 0.8)
    assert got == want
    met, score = got[(1, 2)]
    assert 0 < met <= 16
    assert score == pytest.approx(met * 0.8 / 16, abs=1e-6)


def test_simrank_rejects_bad_params(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    sd = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        simrank_seeded(spark, e, sd, n_walks=0)
    with pytest.raises(ValueError):
        simrank_seeded(spark, e, sd, decay=1.5)
