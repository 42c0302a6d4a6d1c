from __future__ import annotations

import pytest

from conftest import vertices_df
from duwamish_spark.algorithms import shortest_paths
from oracle import sssp_oracle, weighted_rand_graph


def _run(spark, ids, wedges, source):
    e = spark.createDataFrame(wedges, "src string, dst string, weight double")
    res = shortest_paths(spark, vertices_df(spark, ids), e, source)
    return {r["id"]: (r["dist"], r["pred"]) for r in res.state.collect()}, res


def test_chain(spark):
    # FIXTURES.md F4 chain_sssp: 0→1→2→3 weights {5,7,1} → dist {0,5,12,13}
    ids = ["0", "1", "2", "3"]
    wedges = [("0", "1", 5.0), ("1", "2", 7.0), ("2", "3", 1.0)]
    got, res = _run(spark, ids, wedges, "0")
    assert {v: d for v, (d, _) in got.items()} == {"0": 0.0, "1": 5.0, "2": 12.0, "3": 13.0}
    assert got["3"][1] == "2"
    assert res.halted


def test_unreachable_is_null(spark):
    ids = ["0", "1", "2"]
    got, _ = _run(spark, ids, [("0", "1", 1.0)], "0")
    assert got["2"] == (None, None)


@pytest.mark.parametrize("v,maxdeg,seed", [(200, 4, 13), (400, 8, 14)])
def test_random_vs_oracle(spark, v, maxdeg, seed):
    ids, wedges = weighted_rand_graph(v, maxdeg, seed)
    want = sssp_oracle(ids, wedges, "0")
    got, _ = _run(spark, ids, wedges, "0")
    for v_ in ids:
        wd, wp = want[v_]
        gd, gp = got[v_]
        assert (gd is None) == (wd is None)
        if wd is not None:
            assert gd == pytest.approx(wd, abs=1e-9)
            assert gp == wp  # deterministic struct-min predecessor
