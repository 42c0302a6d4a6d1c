"""Property-based checks (hypothesis) for the corpus -> edge parse stage.

These run the batch kernel directly in pandas (no Spark session), so each
example is milliseconds — wide random coverage of corpus shapes beyond the
fixed-seed Spark tests in test_parse.py.
"""

from __future__ import annotations

import hashlib
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from duwamish_spark.corpus import synth_corpus
from duwamish_spark.parse import _resolve_batch


@given(
    n=st.integers(min_value=30, max_value=400),
    deg=st.integers(min_value=0, max_value=12),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=20, deadline=None)
def test_parser_recovers_ground_truth_multiset(n, deg, seed):
    """The parser must reproduce the generator's ground-truth edge multiset
    exactly — duplicates preserved (each duplicate import is a duplicate
    message downstream), self-loops legal, decoy lines ignored."""
    corpus, truth = synth_corpus(n, deg, seed)
    parsed = _resolve_batch(corpus[["repo", "path", "lang", "content"]])
    a = sorted(map(tuple, truth[["src", "dst"]].to_numpy()))
    b = sorted(map(tuple, parsed[["src", "dst"]].to_numpy()))
    assert a == b


@given(
    n=st.integers(min_value=30, max_value=200),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=15, deadline=None)
def test_content_sha_stable_through_parse(n, seed):
    """Parsing must not mutate content (the input_hint per-row invariant):
    hashing the column before and after a parse pass is identical."""
    corpus, _ = synth_corpus(n, 6, seed)
    before = [hashlib.sha256(c.encode()).hexdigest() for c in corpus["content"]]
    _resolve_batch(corpus[["repo", "path", "lang", "content"]])
    after = [hashlib.sha256(c.encode()).hexdigest() for c in corpus["content"]]
    assert before == after


@given(
    text=st.binary(min_size=0, max_size=200),
    kind=st.sampled_from(["image", "audio", "video"]),
)
@settings(max_examples=30, deadline=None)
def test_media_payload_header_roundtrip(text, kind):
    from duwamish_spark.functions.multimodal import MAGIC, _synth_payload

    p = _synth_payload(text, kind)
    assert p[:4] == MAGIC
    w, h = struct.unpack(">II", p[4:12])
    body = p[16:]
    if kind == "video":
        assert len(body) % (w * h) == 0 and len(body) // (w * h) >= 2
    else:
        assert len(body) == w * h
