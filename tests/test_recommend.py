"""SGD recommendations vs the NumPy oracle (reference program #3,
Recommendations.java — array-typed state, superstep-parity control flow)."""

from __future__ import annotations

import numpy as np
import pytest

from duwamish_spark.algorithms.recommend import recommendations
from oracle import bipartite_ratings, recommend_oracle


def _run(spark, ratings, **kw):
    df = spark.createDataFrame(
        ratings, "user_id string, movie_id string, rating_id string, rating double"
    )
    return recommendations(spark, df, **kw)


def test_matches_oracle(spark):
    ratings = bipartite_ratings(m=3, u=6, maxr=5, seed=9)
    assert len(ratings) > 5
    res = _run(spark, ratings, n_features=2, runs_per_feature=3)
    assert res.supersteps == 2 * 3 * 2

    U, M, residue, mse = recommend_oracle(ratings, n_features=2, runs_per_feature=3)
    rows = res.state.collect()
    for r in rows:
        if r["kind"] == "user":
            assert np.allclose(r["fvec"], U[r["id"]], atol=1e-9), r["id"]
        elif r["kind"] == "movie":
            assert np.allclose(r["fvec"], M[r["id"]], atol=1e-9), r["id"]
        else:
            assert r["residue"] == pytest.approx(residue[r["id"]], abs=1e-9)
    # MSE accumulator parity on the final rating round
    odd_rows = [m_ for m_ in res.metrics if m_["superstep"] % 2 == 1]
    assert odd_rows[-1]["mse"] == pytest.approx(mse, abs=1e-12)


def test_feature_vector_clamped(spark):
    # huge learning rate forces the ±10 clamp (Recommendations.java:70)
    ratings = bipartite_ratings(m=2, u=4, maxr=4, seed=3)
    res = _run(spark, ratings, n_features=1, runs_per_feature=2, learning_rate=100.0)
    for r in res.state.collect():
        if r["kind"] != "rating":
            assert all(-10.0 <= x <= 10.0 for x in r["fvec"])


def test_broadcast_strategy_matches_oracle(spark):
    ratings = bipartite_ratings(m=3, u=6, maxr=5, seed=9)
    res = _run(spark, ratings, n_features=2, runs_per_feature=3, strategy="broadcast")
    assert res.supersteps == 2 * 3 * 2

    U, M, residue, mse = recommend_oracle(ratings, n_features=2, runs_per_feature=3)
    for r in res.state.collect():
        if r["kind"] == "user":
            assert np.allclose(r["fvec"], U[r["id"]], atol=1e-9), r["id"]
        elif r["kind"] == "movie":
            assert np.allclose(r["fvec"], M[r["id"]], atol=1e-9), r["id"]
        else:
            assert r["residue"] == pytest.approx(residue[r["id"]], abs=1e-9)
    odd_rows = [m_ for m_ in res.metrics if m_["superstep"] % 2 == 1]
    assert odd_rows[-1]["mse"] == pytest.approx(mse, abs=1e-12)


def test_halt_interval_chaining_equivalent(spark):
    # the 1000-superstep schedule never halts early, so chaining k
    # supersteps into one job must be numerically exact
    ratings = bipartite_ratings(m=3, u=5, maxr=4, seed=4)
    a = _run(spark, ratings, n_features=2, runs_per_feature=2)
    b = _run(spark, ratings, n_features=2, runs_per_feature=2, halt_interval=4)

    def snap(res):
        return {
            r["id"]: (r["kind"], r["fvec"], r["rating"], r["residue"])
            for r in res.state.collect()
        }

    sa, sb = snap(a), snap(b)
    assert set(sa) == set(sb)
    for k in sa:
        ka, kb = sa[k], sb[k]
        assert ka[0] == kb[0]
        if ka[1] is None:
            assert kb[1] is None
            assert kb[3] == pytest.approx(ka[3], abs=1e-12)
        else:
            assert np.allclose(ka[1], kb[1], atol=1e-12)


def test_broadcast_checkpoint_resume(spark, tmp_path):
    ratings = bipartite_ratings(m=3, u=6, maxr=5, seed=9)
    kw = dict(n_features=2, runs_per_feature=3, strategy="broadcast")
    full = _run(spark, ratings, **kw)
    want = {
        r["id"]: (r["fvec"], r["residue"]) for r in full.state.collect()
    }

    ck = str(tmp_path / "ck")
    # run only the first 5 supersteps with durable checkpoints...
    _run(spark, ratings, checkpoint_dir=ck, run_id="rb",
         reliable_interval=2, max_supersteps=5, **kw)
    # ...then resume through the full schedule
    res = _run(spark, ratings, checkpoint_dir=ck, run_id="rb",
               reliable_interval=2, resume=True, **kw)
    got = {r["id"]: (r["fvec"], r["residue"]) for r in res.state.collect()}
    assert set(got) == set(want)
    for k in want:
        fa, ra = want[k]
        fb, rb = got[k]
        if fa is None:
            assert fb is None and rb == pytest.approx(ra, abs=1e-12)
        else:
            assert np.allclose(fa, fb, atol=1e-12)
