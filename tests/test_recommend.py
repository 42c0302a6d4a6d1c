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
