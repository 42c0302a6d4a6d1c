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
