"""Parse stage: truth-equality of extracted edges + content sha256 invariant."""

from __future__ import annotations

import hashlib
from collections import Counter

from duwamish_spark.corpus import synth_corpus
from duwamish_spark.parse import extract_edges, sha256_manifest


def test_corpus_deterministic():
    c1, e1 = synth_corpus(300, 7, seed=42)
    c2, e2 = synth_corpus(300, 7, seed=42)
    assert c1.equals(c2)
    assert e1.equals(e2)


def test_edges_match_generator_truth(spark):
    corpus, truth = synth_corpus(400, 9, seed=7)
    df = spark.createDataFrame(corpus)
    got = extract_edges(df).toPandas()
    got_ms = Counter(zip(got["src"], got["dst"]))
    want_ms = Counter(zip(truth["src"], truth["dst"]))
    assert got_ms == want_ms  # duplicates + self-loops preserved, decoys ignored


def test_content_sha256_invariant(spark):
    """input_hint: per-row content sha256 equality through the parse stage."""
    corpus, _ = synth_corpus(200, 5, seed=3)
    df = spark.createDataFrame(corpus)
    # force the parse to actually run over the same frame
    extract_edges(df).count()
    manifest = {
        (r["repo"], r["path"]): r["sha256"]
        for r in sha256_manifest(df).collect()
    }
    for _, row in corpus.iterrows():
        want = hashlib.sha256(row["content"].encode()).hexdigest()
        assert manifest[(row["repo"], row["path"])] == want
