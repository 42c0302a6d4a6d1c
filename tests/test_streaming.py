"""Streaming edge-ingest surface: the batch parser over a streaming corpus,
stateful degree maintenance, windowed rates with watermark."""

from __future__ import annotations

import os

import pytest

from duwamish_spark.corpus import synth_corpus
from duwamish_spark.parse import extract_edges
from duwamish_spark.streaming import (
    run_to_table,
    stream_corpus,
    stream_extract_edges,
    streaming_degree_counts,
    streaming_edge_rates,
)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_corpus")
    # two "commit batches" landing as separate files
    for i, (n, seed) in enumerate([(120, 5), (80, 9)]):
        corpus, _ = synth_corpus(n, 6, seed)
        corpus.to_parquet(str(d / f"batch{i}.parquet"), index=False)
    return str(d)


def test_stream_edges_match_batch(spark, corpus_dir, tmp_path):
    stream = stream_extract_edges(stream_corpus(spark, corpus_dir))
    assert stream.isStreaming
    run_to_table(stream, "edges_stream_t", str(tmp_path / "ck1"))
    got = spark.sql("SELECT count(*) AS n FROM edges_stream_t").collect()[0]["n"]
    batch = extract_edges(spark.read.parquet(corpus_dir)).count()
    assert got == batch > 0


def test_streaming_degree_counts(spark, corpus_dir, tmp_path):
    edges = stream_extract_edges(stream_corpus(spark, corpus_dir))
    degrees = streaming_degree_counts(edges)
    run_to_table(degrees, "deg_stream_t", str(tmp_path / "ck2"), output_mode="complete")
    got = {
        r["id"]: (r["out_degree"], r["in_degree"])
        for r in spark.sql("SELECT * FROM deg_stream_t").collect()
    }
    from pyspark.sql import functions as F

    be = extract_edges(spark.read.parquet(corpus_dir))
    out_d = {r["src"]: r["n"] for r in be.groupBy("src").agg(F.count("*").alias("n")).collect()}
    in_d = {r["dst"]: r["n"] for r in be.groupBy("dst").agg(F.count("*").alias("n")).collect()}
    for vid, (o, i) in got.items():
        assert o == out_d.get(vid, 0)
        assert i == in_d.get(vid, 0)


def test_streaming_ingest_to_warm_start_pagerank(spark, tmp_path):
    """End-to-end incremental loop: commits land -> streaming parser keeps
    an append-only edge table current -> PageRank re-converges from the
    previous ranks in far fewer supersteps than a cold start, with the
    same fixpoint. (The 10^12-file operating loop: the corpus only ever
    grows; full recomputation per delta is the thing this avoids.)"""
    import numpy as np

    from duwamish_spark.algorithms import pagerank
    from duwamish_spark.graph import vertices_from

    corpus = tmp_path / "inc_corpus"
    edges_out = tmp_path / "inc_edges"
    ck = tmp_path / "inc_ck"
    corpus.mkdir()

    def drain():
        stream = stream_extract_edges(stream_corpus(spark, str(corpus)))
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(edges_out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(edges_out))

    # batch 0 lands -> cold start
    base, _ = synth_corpus(250, 6, seed=31)
    base.to_parquet(str(corpus / "batch0.parquet"), index=False)
    e0 = drain()
    v0 = vertices_from(None, e0)
    cold = pagerank(spark, v0, e0, tol=1e-5)
    assert cold.halted

    # batch 1 lands (the corpus GROWS) -> streaming checkpoint processes
    # only the new file; warm start re-converges from the previous ranks.
    # New repos get a fresh namespace (same-repo imports follow the rename;
    # go imports keep referencing old repos = a few cross-links into the
    # existing graph — the realistic incremental-commit shape)
    delta, _ = synth_corpus(25, 6, seed=77)
    delta["repo"] = "new" + delta["repo"]
    delta.to_parquet(str(corpus / "batch1.parquet"), index=False)
    e1 = drain()
    assert e1.count() > e0.count()
    v1 = vertices_from(None, e1)
    warm = pagerank(spark, v1, e1, tol=1e-5, initial_ranks=cold.state)
    fresh = pagerank(spark, v1, e1, tol=1e-5)
    assert warm.halted
    # brand-new vertices still start at 1.0, so their neighborhood pays a
    # local cold start; measured: 36 vs 62 supersteps on this shape
    assert warm.supersteps < fresh.supersteps * 0.75

    w = {r.id: r.rank for r in warm.state.collect()}
    f = {r.id: r.rank for r in fresh.state.collect()}
    assert set(w) == set(f)
    diff = max(abs(w[k] - f[k]) for k in w)
    assert diff < 1e-3, f"warm/cold fixpoints diverge: {diff}"


def test_streaming_edge_rates_window(spark, tmp_path):
    d = tmp_path / "timed_edges"
    d.mkdir()
    rows = [
        ("a", "b", "2026-01-01 00:00:01"),
        ("b", "c", "2026-01-01 00:00:05"),
        ("c", "d", "2026-01-01 00:00:12"),
        ("d", "a", "2026-01-01 00:00:14"),
    ]
    (
        spark.createDataFrame(rows, "src string, dst string, ts string")
        .selectExpr("src", "dst", "CAST(ts AS TIMESTAMP) AS event_time")
        .write.mode("overwrite")
        .parquet(str(d / "e.parquet"))
    )
    stream = (
        spark.readStream.schema("src string, dst string, event_time timestamp")
        .parquet(str(d / "e.parquet"))
    )
    rates = streaming_edge_rates(stream, window="10 seconds")
    # append mode only emits windows after the watermark passes them in a
    # LATER batch; with a single availableNow batch use complete mode
    run_to_table(rates, "rates_t", str(tmp_path / "ck3"), output_mode="complete")
    got = {
        str(r["window_start"]): r["n_edges"]
        for r in spark.sql("SELECT * FROM rates_t").collect()
    }
    assert got == {"2026-01-01 00:00:00": 2, "2026-01-01 00:00:10": 2}


def test_streaming_dedup_first_occurrence_across_batches(spark, tmp_path):
    """applyInPandasWithState exact dedup: one state row per content hash
    in the state store; duplicates are dropped both within a micro-batch
    and across micro-batches (state survives via the checkpoint)."""
    from duwamish_spark.streaming import streaming_dedup

    d = tmp_path / "dd_docs"
    ck = tmp_path / "dd_ck"
    out = tmp_path / "dd_out"
    d.mkdir()

    def drain():
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .parquet(str(d))
        )
        q = (
            streaming_dedup(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["doc_id"], r["text_hash"])
            for r in spark.read.parquet(str(out)).collect()
        }

    import pandas as pd

    # plain parquet FILES (not Spark output dirs): the streaming file
    # source lists files, it does not recurse into subdirectories
    pd.DataFrame(
        [("d1", "alpha"), ("d2", "beta"), ("d3", "alpha")],  # d3 dups d1
        columns=["doc_id", "text"],
    ).to_parquet(str(d / "b0.parquet"), index=False)
    got0 = drain()
    assert {x[0] for x in got0} == {"d1", "d2"}

    # batch 1: dup of beta (cross-batch) + genuinely new gamma
    pd.DataFrame(
        [("d4", "beta"), ("d5", "gamma")], columns=["doc_id", "text"]
    ).to_parquet(str(d / "b1.parquet"), index=False)
    got1 = drain()
    assert {x[0] for x in got1} == {"d1", "d2", "d5"}


def test_streaming_dedup_ttl_evicts_state(spark, tmp_path):
    """ttl= bounds the state store: a hash unseen for longer than the TTL
    is evicted (ProcessingTimeTimeout) and a later duplicate re-admits.
    Eviction happens during a trigger where the key has NO new data, so an
    unrelated batch is drained between the original and the re-send."""
    import time as _t

    import pandas as pd

    from duwamish_spark.streaming import streaming_dedup

    d = tmp_path / "ttl_docs"
    ck = tmp_path / "ttl_ck"
    out = tmp_path / "ttl_out"
    d.mkdir()

    def drain():
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .parquet(str(d))
        )
        q = (
            streaming_dedup(stream, ttl="1 second")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # with pending processing-time timeouts the availableNow query can
        # keep scheduling timeout-processing batches instead of
        # terminating — bound the wait (data batches commit within a
        # couple seconds; 30 s is ample), then stop explicitly
        q.awaitTermination(30)
        q.stop()
        q.awaitTermination()
        return sorted(
            (r["doc_id"], r["text_hash"])
            for r in spark.read.parquet(str(out)).collect()
        )

    pd.DataFrame([("d1", "alpha")], columns=["doc_id", "text"]).to_parquet(
        str(d / "b0.parquet"), index=False
    )
    assert [x[0] for x in drain()] == ["d1"]

    _t.sleep(2.5)  # let d1's state expire
    # unrelated batch: its trigger processes the timeout and evicts alpha
    pd.DataFrame([("d2", "beta")], columns=["doc_id", "text"]).to_parquet(
        str(d / "b1.parquet"), index=False
    )
    assert [x[0] for x in drain()] == ["d1", "d2"]

    # alpha again: state was evicted, so it re-admits (the documented
    # bounded-state trade; exact dedup across epochs = baseline compaction)
    pd.DataFrame([("d3", "alpha")], columns=["doc_id", "text"]).to_parquet(
        str(d / "b2.parquet"), index=False
    )
    assert [x[0] for x in drain()] == ["d1", "d2", "d3"]


def test_streaming_dedup_baseline_compaction(spark, tmp_path):
    """Compaction path: drain the operator's own output into a static
    parquet hash table, then restart with baseline= and a FRESH checkpoint
    — already-seen hashes are filtered stream-static before the stateful
    operator, so state only accumulates post-compaction arrivals."""
    import pandas as pd

    from duwamish_spark.streaming import streaming_dedup

    d = tmp_path / "bc_docs"
    d.mkdir()

    def drain(ck, out, baseline=None):
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .parquet(str(d))
        )
        q = (
            streaming_dedup(stream, baseline=baseline)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out))

    # epoch 1: alpha + beta seen, output drained into the baseline table
    pd.DataFrame(
        [("d1", "alpha"), ("d2", "beta")], columns=["doc_id", "text"]
    ).to_parquet(str(d / "b0.parquet"), index=False)
    first = drain(tmp_path / "ck_e1", tmp_path / "out_e1")
    assert {r["doc_id"] for r in first.collect()} == {"d1", "d2"}

    # epoch 2 (post-compaction restart: fresh checkpoint, baseline = the
    # epoch-1 output): duplicates of alpha/beta are anti-joined away
    # BEFORE the state store; only gamma lands (and creates state)
    pd.DataFrame(
        [("d3", "alpha"), ("d4", "gamma")], columns=["doc_id", "text"]
    ).to_parquet(str(d / "b1.parquet"), index=False)
    second = drain(tmp_path / "ck_e2", tmp_path / "out_e2", baseline=first)
    got = {r["doc_id"] for r in second.collect()}
    assert "d4" in got and "d3" not in got


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    from duwamish_spark.functions.events import sessionize
    from duwamish_spark.streaming import streaming_sessionize

    d = tmp_path / "sess_events"
    d.mkdir()
    rows = [
        # user u1: two sessions (gap > 10 min between :00:05 and :30:00)
        (1, "u1", "2026-01-01 00:00:01", 1.0),
        (2, "u1", "2026-01-01 00:00:05", 1.0),
        (3, "u1", "2026-01-01 00:30:00", 1.0),
        (4, "u1", "2026-01-01 00:35:00", 1.0),
        (5, "u1", "2026-01-01 00:39:00", 1.0),
        # user u2: one session
        (6, "u2", "2026-01-01 00:10:00", 1.0),
        (7, "u2", "2026-01-01 00:15:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts string, value double"
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    df.write.mode("overwrite").parquet(str(d / "e.parquet"))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id string, ts timestamp, value double"
        ).parquet(str(d / "e.parquet"))
        .withColumnRenamed("ts", "event_time")
    )
    sess = streaming_sessionize(stream, gap="10 minutes")
    run_to_table(sess, "sess_t", str(tmp_path / "ck_sess"), output_mode="complete")
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_t").collect()
    }

    batch = sessionize(df, gap_minutes=10)
    want = {
        (
            r["user_id"],
            str(__import__("datetime").datetime.utcfromtimestamp(
                r["start_us"] / 1_000_000
            ).strftime("%Y-%m-%d %H:%M:%S")),
            r["n_events"],
        )
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 3  # u1 x2 sessions, u2 x1


def test_streaming_sessionize_window_end_is_last_plus_gap(spark, tmp_path):
    from duwamish_spark.streaming import streaming_sessionize

    d = tmp_path / "sess_events2"
    d.mkdir()
    df = spark.createDataFrame(
        [(1, "u", "2026-01-01 00:00:00")], "event_id long, user_id string, ts string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS event_time")
    df.write.mode("overwrite").parquet(str(d / "e.parquet"))
    stream = spark.readStream.schema(
        "event_id long, user_id string, event_time timestamp"
    ).parquet(str(d / "e.parquet"))
    sess = streaming_sessionize(stream, gap="5 minutes")
    run_to_table(sess, "sess_t2", str(tmp_path / "ck_sess2"), output_mode="complete")
    r = spark.sql("SELECT * FROM sess_t2").collect()[0]
    assert str(r["session_start"]) == "2026-01-01 00:00:00"
    assert str(r["session_end"]) == "2026-01-01 00:05:00"
    assert r["n_events"] == 1


def test_streaming_enrich_edges_matches_batch_join(spark, tmp_path):
    """Stream-stream watermark join == the same range join on the
    bounded tables (every event inside the watermark)."""
    from duwamish_spark.streaming import streaming_enrich_edges

    ed = tmp_path / "enrich_edges"
    ad = tmp_path / "enrich_attrs"
    ed.mkdir()
    ad.mkdir()
    edge_rows = [
        ("h1", "x", "2026-01-01 00:00:05"),
        ("h1", "y", "2026-01-01 00:00:45"),
        ("h2", "x", "2026-01-01 00:00:50"),
        ("h3", "z", "2026-01-01 00:01:10"),
    ]
    attr_rows = [
        # h1 re-scored twice: the edge at :05 sees only the :00 version,
        # the edge at :45 sees both (:00 within 60s lag, :30 newer)
        ("h1", "2026-01-01 00:00:00", 0.2),
        ("h1", "2026-01-01 00:00:30", 0.9),
        ("h2", "2026-01-01 00:00:10", 0.5),
        # h3's only version is OLDER than max_lag before its edge: no row
        ("h3", "2026-01-01 00:00:01", 0.7),
    ]
    (
        spark.createDataFrame(edge_rows, "src string, dst string, ts string")
        .selectExpr("src", "dst", "CAST(ts AS TIMESTAMP) AS event_time")
        .write.mode("overwrite")
        .parquet(str(ed / "e.parquet"))
    )
    (
        spark.createDataFrame(attr_rows, "id string, ts string, score double")
        .selectExpr("id", "CAST(ts AS TIMESTAMP) AS attr_time", "score")
        .write.mode("overwrite")
        .parquet(str(ad / "a.parquet"))
    )
    es = spark.readStream.schema(
        "src string, dst string, event_time timestamp"
    ).parquet(str(ed / "e.parquet"))
    as_ = spark.readStream.schema(
        "id string, attr_time timestamp, score double"
    ).parquet(str(ad / "a.parquet"))
    out = streaming_enrich_edges(es, as_, max_lag="60 seconds")
    run_to_table(out, "enriched_t", str(tmp_path / "ck_enrich"))
    got = {
        (r["src"], r["dst"], str(r["attr_time"]), r["score"])
        for r in spark.sql("SELECT * FROM enriched_t").collect()
    }

    # batch replay of the identical range-join condition
    be = spark.read.parquet(str(ed / "e.parquet"))
    ba = spark.read.parquet(str(ad / "a.parquet")).withColumnRenamed("id", "aid")
    import pyspark.sql.functions as F

    batch = be.join(
        ba,
        (F.col("src") == F.col("aid"))
        & (F.col("attr_time") <= F.col("event_time"))
        & (F.col("attr_time") >= F.expr("event_time - interval 60 seconds")),
    )
    want = {
        (r["src"], r["dst"], str(r["attr_time"]), r["score"])
        for r in batch.collect()
    }
    assert got == want
    # the documented content: h1's second edge sees both versions, h3 none
    assert ("h1", "y", "2026-01-01 00:00:00", 0.2) in got
    assert ("h1", "y", "2026-01-01 00:00:30", 0.9) in got
    assert not any(s == "h3" for s, _, _, _ in got)
