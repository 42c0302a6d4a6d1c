"""Pregel kernel: checkpointing, resume-mid-run equivalence, metrics/lineage.

The resume test is SURVEY.md §5.5: kill after superstep k, restart from the
checkpoint, final state identical to the uninterrupted run (the reference's
double-buffered vertex-file rotation made the same thing possible on one
machine; reference: Partition.java:240-262).
"""

from __future__ import annotations

import json
import os

import pytest

from conftest import edges_df, vertices_df
from duwamish_spark.algorithms import pagerank
from oracle import rand_graph


@pytest.fixture()
def graph(spark):
    ids, edges = rand_graph(120, 5, 21)
    return vertices_df(spark, ids), edges_df(spark, edges)


def test_halt_interval_equivalence(spark, graph):
    """Chaining k supersteps per job must not change the computed state."""
    v, e = graph
    a = pagerank(spark, v, e, tol=0.0, max_supersteps=10, halt_interval=1)
    b = pagerank(spark, v, e, tol=0.0, max_supersteps=10, halt_interval=5)
    ra = {r["id"]: r["rank"] for r in a.state.collect()}
    rb = {r["id"]: r["rank"] for r in b.state.collect()}
    assert a.supersteps == b.supersteps == 10
    for k in ra:
        assert rb[k] == pytest.approx(ra[k], abs=1e-12)
    # convergence with halt_interval still halts below tolerance
    c = pagerank(spark, v, e, tol=1e-6, halt_interval=5)
    assert c.halted and c.last["residual"] < 1e-6


def test_resume_equals_uninterrupted(spark, graph, tmp_path):
    v, e = graph
    full = pagerank(spark, v, e, tol=0.0, max_supersteps=12)
    want = {r["id"]: r["rank"] for r in full.state.collect()}

    ck = str(tmp_path / "ck")
    # "crash" after 6 supersteps (reliable checkpoint every 3)
    pagerank(spark, v, e, tol=0.0, max_supersteps=6,
             checkpoint_dir=ck, run_id="r1", reliable_interval=3)
    resumed = pagerank(spark, v, e, tol=0.0, max_supersteps=12,
                       checkpoint_dir=ck, run_id="r1", reliable_interval=3,
                       resume=True)
    got = {r["id"]: r["rank"] for r in resumed.state.collect()}
    assert resumed.supersteps == 12
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_checkpoint_layout_and_metrics_log(spark, graph, tmp_path):
    v, e = graph
    ck = str(tmp_path / "ck")
    res = pagerank(spark, v, e, tol=0.0, max_supersteps=4,
                   checkpoint_dir=ck, run_id="r2", reliable_interval=2)
    root = os.path.join(ck, "r2")
    manifests = sorted(p for p in os.listdir(root) if p.startswith("superstep="))
    assert "superstep=00001" in manifests and "superstep=00003" in manifests
    with open(os.path.join(root, "superstep=00003", "_MANIFEST.json")) as f:
        man = json.load(f)
    assert man["superstep"] == 3
    assert sum(man["partition_vertex_counts"].values()) == 120
    with open(os.path.join(root, "metrics.jsonl")) as f:
        lines = [json.loads(line) for line in f]
    assert [r["superstep"] for r in lines] == [0, 1, 2, 3]
    assert all("residual" in r and "wall_ms" in r and r["vertex_count"] == 120 for r in lines)
    assert len(res.metrics) == 4


def test_resume_skips_completed_run(spark, graph, tmp_path):
    v, e = graph
    ck = str(tmp_path / "ck")
    done = pagerank(spark, v, e, tol=1e-3, max_supersteps=50,
                    checkpoint_dir=ck, run_id="r3", reliable_interval=1)
    assert done.halted
    again = pagerank(spark, v, e, tol=1e-3, max_supersteps=50,
                     checkpoint_dir=ck, run_id="r3", reliable_interval=1,
                     resume=True)
    assert again.halted
    a = {r["id"]: r["rank"] for r in done.state.collect()}
    b = {r["id"]: r["rank"] for r in again.state.collect()}
    assert a == b


def test_input_validation_messages(spark):
    import pytest as _pytest

    from duwamish_spark.algorithms import pagerank

    bad_edges = spark.createDataFrame([("a", "b")], "x string, y string")
    verts = spark.createDataFrame([("a",)], "id string")
    with _pytest.raises(ValueError, match="edges is missing column"):
        pagerank(spark, verts, bad_edges)
    bad_verts = spark.createDataFrame([("a",)], "vertex string")
    good_edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pytest.raises(ValueError, match="vertices is missing column"):
        pagerank(spark, bad_verts, good_edges)


def test_custom_vertex_program_max_flood(spark):
    """A user-written program through the public Pregel API — the
    reference's entire query surface is user vertex programs
    (model/Vertex.java:23-24) and this is the Spark-shaped equivalent:
    flood the maximum initial value across a connected graph."""
    from pyspark.sql import functions as F

    from duwamish_spark.pregel import Pregel, combine_messages

    n = 10
    ids = [f"v{i}" for i in range(n)]
    vals = {v: (i * 37) % n for i, v in enumerate(ids)}
    edges = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    e = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src string, dst string"
    ).persist()
    init = spark.createDataFrame(
        [(v, float(vals[v]), 1, 0) for v in ids],
        "id string, val double, _changed int, _msgs int",
    )

    def step(state, s):
        frontier = state.where(F.col("_changed") == 1)
        msgs = frontier.join(e, frontier["id"] == e["src"]).select(
            "dst", F.col("val").alias("m")
        )
        best = combine_messages(
            msgs, [("mmax", "m", "max"), ("mcnt", "m", "count")], key="dst"
        ).withColumnRenamed("dst", "id")
        new_val = F.greatest("val", F.coalesce("mmax", "val"))
        return state.join(best, "id", "left").select(
            "id",
            new_val.alias("val"),
            F.when(new_val != F.col("val"), 1).otherwise(0).alias("_changed"),
            F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
        )

    res = Pregel(
        spark,
        step=step,
        metrics_exprs={"changed": F.sum("_changed"), "vmax": F.max("val")},
        halt=lambda m, s: (m["changed"] or 0) == 0,
        max_supersteps=50,
    ).run(init)
    got = {r["id"]: r["val"] for r in res.state.collect()}
    assert set(got.values()) == {float(max(vals.values()))}
    assert res.halted and res.supersteps <= n + 1


def test_salt_subkey_spreads_identical_values(spark):
    # The CC/LP late-round hub shape: every incoming message carries the
    # SAME value. A value-only sub-key hash collapses to one reducer key
    # (silently disabling salting); the sender-derived term in salt_subkey
    # keeps the hub's traffic spread. Result stays exact either way.
    from pyspark.sql import functions as F

    from duwamish_spark.pregel import combine_messages, salt_subkey

    msgs = (
        spark.range(80_000)
        .repartition(8)
        .select(F.lit(0).alias("dst"), F.lit(7.0).alias("m"))
    )
    n_sub = msgs.select(salt_subkey([F.col("m")], 16).alias("s")).distinct().count()
    n_value_only = msgs.select(
        F.pmod(F.hash("m"), F.lit(16)).alias("s")
    ).distinct().count()
    assert n_value_only == 1  # the pre-fix derivation: collapsed
    assert n_sub > 4  # fixed: one sub-key per upstream partition

    row = combine_messages(
        msgs, [("msum", "m", "sum"), ("mcnt", "m", "count")],
        salt=16, pre_shuffle=True,
    ).collect()[0]
    assert row["dst"] == 0
    assert row["mcnt"] == 80_000
    assert row["msum"] == 7.0 * 80_000


def test_local_checkpoint_stats_reset_bounds_plan_stats(spark):
    # Catalyst's checkpoint copies plan-size estimates onto the LogicalRDD;
    # in a prev ⋈ derived-from-prev loop they then MULTIPLY per round
    # (digits ~double), and by round ~25 stats estimation does Toom-Cook
    # multiplications on million-digit BigIntegers — an apparent driver
    # hang (found via jstack on eigenvector's tol loop). The reset variant
    # must keep the estimate CONSTANT in the round number.
    from pyspark.sql import functions as F

    from duwamish_spark.pregel import (
        free_local_checkpoint,
        local_checkpoint_stats_reset,
    )

    def digits(df):
        q = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return len(str(q))

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "c")],
        "src string, dst string",
    )
    st = local_checkpoint_stats_reset(
        e.select(F.col("src").alias("id"), F.lit(1.0).alias("value"))
    )
    base = digits(st)
    for _ in range(6):
        raw = local_checkpoint_stats_reset(
            st.join(e, st["id"] == e["src"])
            .groupBy("dst")
            .agg(F.sum("value").alias("raw"))
            .withColumnRenamed("dst", "id")
        )
        nxt = local_checkpoint_stats_reset(
            st.join(raw, "id", "left").select(
                "id", F.coalesce(F.col("raw"), F.lit(0.0)).alias("value")
            )
        )
        for tmp in (st, raw):
            free_local_checkpoint(tmp)
        st = nxt
        assert digits(st) == base  # constant, not compounding
    # rows and values still correct after 6 re-wraps
    got = {r["id"]: r["value"] for r in st.collect()}
    assert set(got) == {"a", "b", "c", "d"}
    # free still works on the rebuilt plan: storage shrinks
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    free_local_checkpoint(st)
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after == before - 1
