from __future__ import annotations

import pytest

from conftest import edges_df, vertices_df
from duwamish_spark.algorithms import connected_components
from oracle import cc_oracle, rand_graph

TWO_TRIANGLES = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("d", "e"), ("e", "f"), ("f", "d"),
]


def _run(spark, ids, edges, **kw):
    res = connected_components(spark, vertices_df(spark, ids), edges_df(spark, edges), **kw)
    return {r["id"]: r["label"] for r in res.state.collect()}, res


def test_two_triangles_exact(spark):
    ids = list("abcdef")
    labels, res = _run(spark, ids, TWO_TRIANGLES)
    assert labels == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "d"}
    assert res.halted


@pytest.mark.parametrize("v,maxdeg,seed", [(200, 2, 3), (400, 1, 4)])
def test_random_vs_oracle_exact(spark, v, maxdeg, seed):
    ids, edges = rand_graph(v, maxdeg, seed)
    want = cc_oracle(ids, edges)
    got, res = _run(spark, ids, edges)
    assert got == want
    assert res.halted


def test_isolated_vertices_keep_own_label(spark):
    ids = ["x", "y", "z"]
    got, _ = _run(spark, ids, [("x", "y")])
    assert got == {"x": "x", "y": "x", "z": "z"}


def test_salted_equals_unsalted(spark):
    ids, edges = rand_graph(150, 3, 6)
    plain, _ = _run(spark, ids, edges, strategy="shuffle")
    salted, _ = _run(spark, ids, edges, salt=8, strategy="shuffle")
    assert plain == salted


def test_raw_combine_equals_partial(spark):
    # raw = exchange-then-aggregate (the strong-scaling / hub-salting
    # configuration); with salt, identical-label hub messages spread by
    # the sender-derived sub-key term. Same labels either way.
    ids, edges = rand_graph(150, 3, 29)
    partial, _ = _run(spark, ids, edges, strategy="shuffle")
    raw, _ = _run(spark, ids, edges, strategy="shuffle", combine="raw")
    raw_salted, _ = _run(
        spark, ids, edges, strategy="shuffle", combine="raw", salt=8
    )
    assert partial == raw == raw_salted


def test_auto_algorithm_switches_on_high_diameter(spark):
    # a 200-vertex path exhausts the hash-min round budget (2*log2(200)+4
    # ~ 20 << 200 diameter) -> auto finishes with alternating star; on a
    # shallow random graph auto stays on hash-min and halts
    from duwamish_spark.algorithms.components import connected_components

    ids = [f"{i:04d}" for i in range(200)]
    edges = [(ids[i], ids[i + 1]) for i in range(199)]
    v, e = vertices_df(spark, ids), edges_df(spark, edges)
    res = connected_components(spark, v, e, algorithm="auto")
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert got == {i: "0000" for i in ids}
    assert res.halted
    assert res.run_id == "cc_alternating"

    ids2, edges2 = rand_graph(150, 3, 31)
    v2, e2 = vertices_df(spark, ids2), edges_df(spark, edges2)
    res2 = connected_components(spark, v2, e2, algorithm="auto")
    assert res2.halted
    assert res2.run_id != "cc_alternating"


def test_strategies_and_encoding_exact_equal(spark):
    ids, edges = rand_graph(200, 2, 19)
    a, _ = _run(spark, ids, edges, strategy="shuffle", encode=False)
    b, _ = _run(spark, ids, edges, strategy="shuffle", encode=True)
    c, _ = _run(spark, ids, edges, strategy="broadcast", encode=True)
    assert a == b == c


def test_alternating_equals_hashmin_random(spark):
    from duwamish_spark.algorithms.components import (
        connected_components,
        connected_components_alternating,
    )

    ids, edges = rand_graph(200, 4, 23)
    v, e = vertices_df(spark, ids), edges_df(spark, edges)
    hm = {r["id"]: r["label"] for r in connected_components(spark, v, e).state.collect()}
    alt = {
        r["id"]: r["label"]
        for r in connected_components_alternating(spark, v, e).state.collect()
    }
    assert alt == hm


def test_alternating_logarithmic_on_path(spark):
    # path 0-1-2-...-63: hash-min needs ~63 supersteps, alternating O(log n)
    from duwamish_spark.algorithms.components import connected_components_alternating

    n = 64
    ids = [f"v{i:03d}" for i in range(n)]
    edges = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    res = connected_components_alternating(
        spark, vertices_df(spark, ids), edges_df(spark, edges)
    )
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    assert set(labels.values()) == {"v000"}
    assert res.supersteps <= 12, f"took {res.supersteps} rounds"


def test_alternating_edge_cases(spark):
    from duwamish_spark.algorithms.components import connected_components_alternating

    # no edges: every vertex is its own component
    ids = ["a", "b", "c"]
    res = connected_components_alternating(
        spark, vertices_df(spark, ids), edges_df(spark, [])
    )
    assert {r["id"]: r["label"] for r in res.state.collect()} == {
        "a": "a", "b": "b", "c": "c"
    }
    # self-loops and duplicate edges don't affect labels
    res2 = connected_components_alternating(
        spark,
        vertices_df(spark, ids),
        edges_df(spark, [("a", "a"), ("b", "c"), ("c", "b"), ("b", "c")]),
    )
    assert {r["id"]: r["label"] for r in res2.state.collect()} == {
        "a": "a", "b": "b", "c": "b"
    }


def test_alternating_checkpoint_resume(spark, tmp_path):
    # the auto fallback phase is resumable: run to convergence writing
    # durable round checkpoints, then resume from an EARLIER round manifest
    # and from the converged manifest -- identical labels both ways
    from duwamish_spark.algorithms.components import connected_components_alternating

    ids = [f"{i:04d}" for i in range(120)]
    edges = [(ids[i], ids[i + 1]) for i in range(119)]  # one long path
    v, e = vertices_df(spark, ids), edges_df(spark, edges)
    ck = str(tmp_path / "ck")

    full = connected_components_alternating(
        spark, v, e, checkpoint_dir=ck, run_id="alt", reliable_interval=1
    )
    want = {r["id"]: r["label"] for r in full.state.collect()}
    assert full.halted and want == {i: "0000" for i in ids}

    import os
    import shutil

    root = os.path.join(ck, "alt")
    rounds = sorted(
        int(n.split("=")[1])
        for n in os.listdir(root)
        if n.startswith("round=")
    )
    assert len(rounds) >= 2
    # drop everything after round 1 to force a real mid-run resume
    for r in rounds[1:]:
        shutil.rmtree(os.path.join(root, f"round={r:05d}"))
    resumed = connected_components_alternating(
        spark, v, e, checkpoint_dir=ck, run_id="alt",
        reliable_interval=1, resume=True,
    )
    assert resumed.halted
    assert {r["id"]: r["label"] for r in resumed.state.collect()} == want

    # resuming at the converged manifest returns immediately with the
    # same labels
    again = connected_components_alternating(
        spark, v, e, checkpoint_dir=ck, run_id="alt",
        reliable_interval=1, resume=True,
    )
    assert again.halted
    assert {r["id"]: r["label"] for r in again.state.collect()} == want
