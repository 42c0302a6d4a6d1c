from __future__ import annotations

import pytest

from conftest import edges_df, vertices_df
from duwamish_spark.algorithms import label_propagation
from oracle import lp_oracle, rand_graph

TWO_TRIANGLES = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("d", "e"), ("e", "f"), ("f", "d"),
]


def _run(spark, ids, edges, rounds=10):
    res = label_propagation(
        spark, vertices_df(spark, ids), edges_df(spark, edges), max_supersteps=rounds
    )
    return {r["id"]: r["label"] for r in res.state.collect()}, res


def test_two_triangles(spark):
    ids = list("abcdef")
    got, _ = _run(spark, ids, TWO_TRIANGLES)
    want = lp_oracle(ids, TWO_TRIANGLES, rounds=10)
    assert got == want


def test_mode_min_tiebreak(spark):
    # z hears {a: 1, b: 1} -> tie -> smallest label wins
    ids = ["a", "b", "z"]
    edges = [("a", "z"), ("b", "z")]
    got, _ = _run(spark, ids, edges, rounds=1)
    assert got["z"] == "a"


@pytest.mark.parametrize("v,maxdeg,seed,rounds", [(200, 4, 8, 5), (300, 8, 9, 10)])
def test_random_vs_oracle_exact(spark, v, maxdeg, seed, rounds):
    ids, edges = rand_graph(v, maxdeg, seed)
    want = lp_oracle(ids, edges, rounds=rounds)
    got, _ = _run(spark, ids, edges, rounds=rounds)
    assert got == want


def test_salt_and_raw_combine_invariant(spark):
    # LP now has the same skew knobs as CC/PR: salted and raw-exchange
    # shuffle paths must produce identical labels to the plain path
    ids, edges = rand_graph(150, 3, 23)
    v, e = vertices_df(spark, ids), edges_df(spark, edges)

    def labels(**kw):
        res = label_propagation(
            spark, v, e, max_supersteps=3, strategy="shuffle", **kw
        )
        return {r["id"]: r["label"] for r in res.state.collect()}

    plain = labels()
    assert labels(salt=8) == plain
    assert labels(combine="raw") == plain
    assert labels(salt=8, combine="raw") == plain
