"""Pipeline operators: minhash/jaccard vs a Python oracle, simhash,
LSH-ANN sanity. (The SQL-expressible operators are oracle-checked in
test_entry_contract.py.)"""

from __future__ import annotations

from collections import defaultdict

import pytest

from duwamish_spark.functions import (
    exact_dedup,
    minhash_near_dups,
    simhash64,
    knn_cosine,
)
from duwamish_spark.functions.similarity import knn_cosine_lsh

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river shore"),  # near-dup of 1
    (3, "completely different content about spark shuffles and partitions"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "spark shuffles move data between partitions during wide stages"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark):
    out = {r["text_hash"]: (r["keep_id"], r["n_dups"]) for r in exact_dedup(_docs_df(spark)).collect()}
    assert len(out) == 4  # docs 1 and 4 collapse
    assert (1, 2) in out.values()


def test_minhash_near_dups_vs_python_jaccard(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dups(_docs_df(spark), threshold=0.2).collect()
    }
    # exact dup pair must be found with jaccard 1.0
    assert got[(1, 4)] == pytest.approx(1.0)
    # near-dup pair found with the exact shingle jaccard value
    assert (1, 2) in got
    assert got[(1, 2)] == pytest.approx(_py_jaccard(DOCS[0][1], DOCS[1][1]), abs=1e-9)
    # verified jaccard is exact for every reported pair
    texts = dict(DOCS)
    for (a, b), j in got.items():
        assert j == pytest.approx(_py_jaccard(texts[a], texts[b]), abs=1e-9)


def test_minhash_pre_dedup_output_identical(spark):
    # pre_dedup collapses exact duplicates before the LSH pipeline and
    # expands members back — the result set must be IDENTICAL to the
    # direct pipeline, including: dup groups >2 members, empty-token
    # duplicate docs (no shingles -> never banded -> NO within-group
    # pair in either path), and cross-group member fan-out.
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the bank"),
            (2, "the quick brown fox jumps over the lazy dog near the bank"),
            (3, "the quick brown fox jumps over the lazy dog near the bank"),
            (4, "the quick brown fox leaps over the lazy dog near the bank"),
            (5, "totally unrelated text about spark shuffle partitions"),
            (6, "   "),
            (7, "   "),
            (8, ""),
        ],
        "doc_id long, text string",
    )
    kw = dict(threshold=0.2, n_hashes=16, bands=4)
    direct = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dups(docs, pre_dedup=False, **kw).collect()
    }
    pre = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dups(docs, pre_dedup=True, **kw).collect()
    }
    assert set(direct) == set(pre)
    for p in direct:
        assert pre[p] == pytest.approx(direct[p], abs=1e-12)
    # sanity: the dup triple is all-pairs 1.0; empty docs appear nowhere
    for p in ((1, 2), (1, 3), (2, 3)):
        assert pre[p] == pytest.approx(1.0)
    assert not any(6 in p or 7 in p or 8 in p for p in pre)


def test_simhash_identical_docs_equal(spark):
    out = {r["id"]: r["simhash"] for r in simhash64(_docs_df(spark)).collect()}
    assert out[1] == out[4]

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_knn_lsh_finds_exact_twin(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16)).astype("float32")
    vecs[7] = vecs[3]  # exact twin
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {r["vec_id"]: r["neighbor_id"] for r in knn_cosine(emb, k=1).collect()}
    assert exact[3] == 7 and exact[7] == 3
    approx = {
        r["vec_id"]: r["neighbor_id"]
        for r in knn_cosine_lsh(emb, k=1, n_planes=6, dim=16).collect()
    }
    assert approx.get(3) == 7 and approx.get(7) == 3


def test_ngram_jaccard_exact(spark):
    from duwamish_spark.functions import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the dog"),
            ("b", "the quick brown fox jumps over the cat"),
            ("c", "completely different words entirely here now"),
        ],
        "doc_id string, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.1).collect()
    }
    # a: 6 shingles, b: 6 shingles, 5 common -> j = 5/7
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] == pytest.approx(5 / 7, abs=1e-6)


def test_ngram_jaccard_candidates_mode_and_guard(spark):
    # the enforced scale contract: verify-only on given candidate pairs
    # equals the standalone result restricted to those pairs; standalone
    # above the doc cap refuses instead of going quadratic
    from duwamish_spark.functions import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the dog"),
            ("b", "the quick brown fox jumps over the cat"),
            ("c", "the quick brown fox sits under the cat"),
            ("d", "completely different words entirely here now"),
        ],
        "doc_id string, text string",
    )
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.05).collect()
    }
    # ("b", "a") is deliberately REVERSED: the verify mode must
    # normalize pair order, not silently drop unordered input
    cand = spark.createDataFrame(
        [("b", "a"), ("a", "d")], "id_a string, id_b string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, k=3, threshold=0.05, candidates=cand
        ).collect()
    }
    assert got == {("a", "b"): full[("a", "b")]}  # (a,d) below threshold

    with pytest.raises(ValueError, match="standalone_max_docs"):
        ngram_jaccard_pairs(docs, k=3, standalone_max_docs=2)
    # explicit opt-in still works
    assert (
        ngram_jaccard_pairs(
            docs, k=3, threshold=0.05, standalone_max_docs=2, allow_quadratic=True
        ).count()
        == len(full)
    )


def test_embedding_near_dups_exact_vs_lsh(spark):
    import numpy as np

    from duwamish_spark.functions import embedding_near_dups

    rng = np.random.default_rng(4)
    base = rng.standard_normal(64)
    rows = [
        ("v0", [float(x) for x in base]),
        ("v1", [float(x) for x in base + 0.01 * rng.standard_normal(64)]),
        ("v2", [float(x) for x in rng.standard_normal(64)]),
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(emb, threshold=0.9).collect()}
    assert exact == {("v0", "v1")}
    # LSH candidates are a superset filter: near-identical vectors share buckets
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, threshold=0.9, n_planes=4).collect()
    }
    assert lsh == exact


def test_semdedup_keep_first_within_cluster(spark):
    import numpy as np

    from duwamish_spark.functions import semdedup

    rng = np.random.default_rng(9)
    base = rng.standard_normal(16)
    other = rng.standard_normal(16)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base + 0.001 * rng.standard_normal(16)]),
        (2, [float(x) for x in base + 0.001 * rng.standard_normal(16)]),
        (3, [float(x) for x in other]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.keep for r in semdedup(emb, k=2, threshold=0.95).collect()}
    # smallest id of the near-dup chain survives; the independent vector too
    assert out == {0: True, 1: False, 2: False, 3: True}


def test_semdedup_cluster_scoping(spark):
    # identical vectors FORCED into different clusters via assignments=
    # are never compared -> both kept (cluster-locality is the contract)
    from duwamish_spark.functions import semdedup

    v = [1.0] * 8
    emb = spark.createDataFrame(
        [(0, v), (1, v)], "vec_id long, embedding array<float>"
    )
    asg = spark.createDataFrame([(0, 0), (1, 1)], "vec_id long, cluster long")
    out = {r.vec_id: r.keep for r in semdedup(emb, assignments=asg).collect()}
    assert out == {0: True, 1: True}
    # same cluster -> the larger id is dropped
    asg2 = spark.createDataFrame([(0, 0), (1, 0)], "vec_id long, cluster long")
    out2 = {r.vec_id: r.keep for r in semdedup(emb, assignments=asg2).collect()}
    assert out2 == {0: True, 1: False}


def test_semdedup_max_cluster_guard(spark):
    import pytest as _pytest

    from duwamish_spark.functions import semdedup

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    asg = spark.createDataFrame(
        [(i, 0) for i in range(12)], "vec_id long, cluster long"
    )
    with _pytest.raises(ValueError, match="max_cluster_size"):
        semdedup(emb, assignments=asg, max_cluster_size=5)


def test_simhash_near_dups_pigeonhole_complete(spark):
    # banding must find EVERY pair within the hamming threshold (pigeonhole
    # guarantee), for both hash families; md5 family == xxhash64 family in
    # structure (same votes machinery, different token hash)
    from duwamish_spark.functions import simhash_near_dups, simhash_parts

    rows = [
        ("a", "alpha beta gamma delta epsilon zeta eta theta"),
        ("b", "alpha beta gamma delta epsilon zeta eta iota"),   # near a
        ("c", "alpha beta gamma delta epsilon zeta mu iota"),    # near b
        ("d", "one two three four five six seven eight"),
        ("e", "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    for family in ("xxhash64", "md5"):
        parts = {r["id"]: (r["sim_hi"], r["sim_lo"])
                 for r in simhash_parts(docs, family=family).collect()}
        def ham(x, y):
            return bin((parts[x][0] ^ parts[y][0])).count("1") + bin(
                (parts[x][1] ^ parts[y][1])).count("1")
        ids = sorted(parts)
        for threshold in (7, 15):
            want = {
                (x, y, ham(x, y))
                for i, x in enumerate(ids) for y in ids[i + 1:]
                if ham(x, y) <= threshold
            }
            got = {
                (r["id_a"], r["id_b"], r["hamming"])
                for r in simhash_near_dups(
                    docs, max_hamming=threshold, family=family
                ).collect()
            }
            assert got == want, (family, threshold)


def test_knn_ivf_full_probe_equals_brute_and_finds_twin(spark):
    import numpy as np

    from duwamish_spark.functions import knn_cosine, knn_cosine_ivf

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((60, 16)).astype("float32")
    vecs[11] = vecs[5]  # exact twin
    rows = [(f"v{i:02d}", [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")

    brute = {
        (r["vec_id"], r["knn_rank"]): r["neighbor_id"]
        for r in knn_cosine(emb, k=2, strategy="brute").collect()
    }
    # probing every bucket makes IVF exhaustive -> identical to brute
    full = {
        (r["vec_id"], r["knn_rank"]): r["neighbor_id"]
        for r in knn_cosine_ivf(emb, k=2, n_centroids=4, n_probe=4).collect()
    }
    assert full == brute
    # a twin shares its own bucket, so even 1-probe IVF must find it
    one = {
        r["vec_id"]: r["neighbor_id"]
        for r in knn_cosine_ivf(emb, k=1, n_centroids=4, n_probe=1).collect()
    }
    assert one["v05"] == "v11" and one["v11"] == "v05"


def test_rolling_fingerprints_winnowing_guarantee(spark):
    # MOSS winnowing property: two docs sharing a character run of at
    # least k + window - 1 (= 11) share >= 1 fingerprint; disjoint docs
    # share none
    from duwamish_spark.functions import rolling_fingerprints

    shared = "identical plagiarized passage here"
    docs = spark.createDataFrame(
        [
            ("a", "some unique prefix text " + shared),
            ("b", shared + " followed by other words"),
            ("c", "nothing in common with either document at all"),
        ],
        "doc_id string, text string",
    )
    fps = {}
    for r in rolling_fingerprints(docs, k=8, window=4).collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    assert fps["a"] & fps["b"], "shared passage must share a fingerprint"
    assert not (fps["a"] & fps["c"]) and not (fps["b"] & fps["c"])


def test_knn_ivf_releases_storage(spark):
    # the intermediate O(n*n_centroids) ranked cache and the quantizer's
    # k-row localCheckpoints must not outlive the call: after freeing the
    # materialized result, no new storage blocks remain pinned
    import numpy as np

    from duwamish_spark.functions import knn_cosine_ivf
    from duwamish_spark.pregel import free_local_checkpoint

    def storage_ids():
        return {
            info.id()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    rng = np.random.default_rng(21)
    rows = [
        (f"v{i:02d}", [float(x) for x in v])
        for i, v in enumerate(rng.standard_normal((50, 16)).astype("float32"))
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")

    before = storage_ids()
    res = knn_cosine_ivf(emb, k=2, n_centroids=4, n_probe=2)
    assert len(res.collect()) == 100  # 50 ids x k=2
    free_local_checkpoint(res)
    leaked = storage_ids() - before
    assert not leaked, f"knn_cosine_ivf leaked storage blocks: {leaked}"


def test_repetition_stats_multiline(spark):
    from duwamish_spark.functions import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 line instances: "aa bb" x3 + "cc" x1 -> 2 dup instances
            (1, "aa bb\naa bb\ncc\naa bb"),
            (2, "xx yy\nzz ww"),          # no repetition
            (3, "\n\n  \n"),              # whitespace-only: vanishes
            (4, "solo"),                  # 1 token: no 2-grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 2, 4}
    r1 = out[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == pytest.approx(2 / 4)
    # chars: dup instances 2*5, total 3*5 + 2
    assert r1["dup_line_char_frac"] == pytest.approx(10 / 17)
    # tokens: aa bb aa bb cc aa bb -> 6 bigrams, top "aa bb" x3
    assert r1["n_ngrams"] == 6
    assert r1["top_ngram_frac"] == pytest.approx(3 / 6)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_ngram_frac"] == pytest.approx(1 / 3)
    assert out[4] == {
        "doc_id": 4, "n_lines": 1, "dup_line_frac": 0.0,
        "dup_line_char_frac": 0.0, "n_ngrams": 0, "top_ngram_frac": 0.0,
    }


def test_paragraph_dedup_first_occurrence(spark):
    from duwamish_spark.functions import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "shared boilerplate\nunique to one"),
            (2, "own content\nshared boilerplate\nmore own"),
            (3, "shared boilerplate"),              # all paras are later copies
            (4, "twice\ntwice\nother"),             # intra-doc dup
            (5, "   \n\n"),                         # whitespace-only paras: dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in paragraph_dedup(docs).collect()}
    # doc 5 has zero non-empty paragraphs -> no row (matches oracle CTE)
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["text_clean"] == "shared boilerplate\nunique to one"
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 2)
    # doc 2 loses the shared paragraph (doc 1 got there first), keeps order
    assert out[2]["text_clean"] == "own content\nmore own"
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (3, 2)
    # doc 3 is emptied but still present with "" text
    assert out[3]["text_clean"] == ""
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (1, 0)
    # intra-doc dedup: second "twice" dropped
    assert out[4]["text_clean"] == "twice\nother"
    assert (out[4]["n_paras"], out[4]["n_kept"]) == (3, 2)


def test_boilerplate_strip_host_local(spark):
    from duwamish_spark.functions import boilerplate_strip

    docs = spark.createDataFrame(
        [
            # host A: "cookie banner" in 3/4 docs -> boilerplate
            (1, "cookie banner\nreal content one", "a"),
            (2, "cookie banner\nreal content two", "a"),
            (3, "real content three", "a"),
            (4, "cookie banner", "a"),  # emptied entirely
            # host B: the same line appears in only 1/2 docs -> kept
            (5, "cookie banner\nb content", "b"),
            (6, "other b content", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_strip(docs, min_docs=2, min_frac=0.5).collect()
    }
    assert out[1]["text_clean"] == "real content one"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (2, 1)
    assert out[2]["text_clean"] == "real content two"
    assert out[3]["text_clean"] == "real content three"
    assert out[3]["n_removed"] == 0
    assert out[4]["text_clean"] == "" and out[4]["n_removed"] == 1
    # host-locality: same line is NOT boilerplate on host b
    assert out[5]["text_clean"] == "cookie banner\nb content"
    assert out[5]["n_removed"] == 0


def test_boilerplate_strip_thresholds_exact(spark):
    from duwamish_spark.functions import boilerplate_strip

    # 10 docs on one host; a line in exactly 5 of them sits ON the 0.5
    # boundary: integer-exact test (5 * 1e6 >= 500000 * 10) -> stripped
    docs = spark.createDataFrame(
        [
            (i, ("edge line\nbody %d" % i) if i < 5 else ("body %d" % i), "h")
            for i in range(10)
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in boilerplate_strip(docs, min_frac=0.5).collect()}
    assert all(out[i]["n_removed"] == 1 for i in range(5))
    # just above the boundary: 0.500001 -> kept
    out2 = {
        r["doc_id"]: r
        for r in boilerplate_strip(docs, min_frac=0.500001).collect()
    }
    assert all(out2[i]["n_removed"] == 0 for i in range(5))
    # min_docs dominates when frac passes: one doc duplicating the line
    # intra-doc still counts df=1
    docs1 = spark.createDataFrame(
        [(1, "only\nonly\nbody", "h")], "doc_id long, text string, source string"
    )
    r = boilerplate_strip(docs1, min_docs=2, min_frac=0.0).collect()[0]
    assert r["n_removed"] == 0


def test_boilerplate_strip_partition_invariant(spark):
    from duwamish_spark.functions import boilerplate_strip

    docs = spark.createDataFrame(
        [
            (i, "shared footer\nbody %d\nshared footer" % (i % 9), "h%d" % (i % 3))
            for i in range(60)
        ],
        "doc_id long, text string, source string",
    )
    a = sorted(map(tuple, boilerplate_strip(docs).collect()))
    b = sorted(map(tuple, boilerplate_strip(docs.repartition(17)).collect()))
    assert a == b
    # footer is in 100% of every host's docs -> stripped everywhere,
    # including BOTH copies inside one doc
    assert all("shared footer" not in t[1] for t in a)


def test_paragraph_dedup_deterministic_under_partitioning(spark):
    from duwamish_spark.functions import paragraph_dedup

    docs = spark.createDataFrame(
        [(i, f"common para\nbody {i % 7}\ncommon para") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(paragraph_dedup(docs).collect())
    b = sorted(paragraph_dedup(docs.repartition(13)).collect())
    assert a == b
    # exactly one copy of "common para" survives corpus-wide, in doc 0
    keeper = [r for r in a if "common para" in r["text_clean"]]
    assert len(keeper) == 1 and keeper[0]["doc_id"] == 0


def test_pii_scrub_redacts_and_counts(spark):
    from duwamish_spark.functions import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org or call 555-867-5309"),
            (2, "server 10.0.255.3 and 192.168.1.1 ok"),
            # email containing an IPv4-shaped host: redacted as EMAIL once,
            # the inner dotted quad must NOT also count as an ipv4
            (3, "root@10.20.30.40.example.com logged in"),
            (4, "nothing sensitive here"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert out[1]["text_redacted"] == "mail me at <EMAIL> or call <PHONE>"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 1, 0)
    assert out[2]["text_redacted"] == "server <IPV4> and <IPV4> ok"
    assert out[2]["n_ipv4"] == 2
    assert out[3]["n_email"] == 1 and out[3]["n_ipv4"] == 0
    assert out[3]["text_redacted"] == "<EMAIL> logged in"
    assert out[4]["text_redacted"] == "nothing sensitive here"
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (0, 0, 0)
    assert out[5]["text_redacted"] is None
    assert (out[5]["n_email"], out[5]["n_phone"], out[5]["n_ipv4"]) == (0, 0, 0)


def test_pii_scrub_is_pure_projection(spark):
    from duwamish_spark.functions import pii_scrub

    docs = spark.createDataFrame(
        [(i, f"u{i}@example.com x") for i in range(20)], "doc_id long, text string"
    )
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dedup_groups_transitive_chain(spark):
    from duwamish_spark.functions import dedup_groups

    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(6)], "doc_id string"
    )
    # chain d0~d1~d2 plus reversed-order pair d4~d3 (order must not matter)
    pairs = spark.createDataFrame(
        [("d0", "d1"), ("d1", "d2"), ("d4", "d3")], "id_a string, id_b string"
    )
    got = {r["doc_id"]: (r["group"], r["keep"]) for r in dedup_groups(spark, docs, pairs).collect()}
    assert got == {
        "d0": ("d0", True),
        "d1": ("d0", False),
        "d2": ("d0", False),
        "d3": ("d3", True),
        "d4": ("d3", False),
        "d5": ("d5", True),
    }


def test_dedup_groups_matches_union_find(spark):
    import random

    from duwamish_spark.functions import dedup_groups

    rng = random.Random(11)
    ids = [f"x{i:03d}" for i in range(80)]
    pairs = [tuple(rng.sample(ids, 2)) for _ in range(60)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    pdf = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {r["doc_id"]: r["group"] for r in dedup_groups(spark, docs, pdf).collect()}

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    want = {i: min(comp[find(i)]) for i in ids}
    assert got == want
    keepers = [i for i in ids if got[i] == i]
    assert sorted(keepers) == sorted(set(want.values()))


# ---------------------------------------------------------------------------
# importance_weights (DSIR)
# ---------------------------------------------------------------------------

def _dsir_brute(docs, tgt, B, K=2, salt="dsir"):
    import hashlib
    import math
    from collections import Counter

    def u32(s):
        return int(hashlib.md5((salt + ":" + s).encode()).hexdigest()[:8], 16)

    def ngrams(t):
        toks = t.strip().split()
        if len(toks) < K:
            return []
        return [" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)]

    cr = Counter(u32(g) % B for _, t in docs for g in ngrams(t))
    ct = Counter(u32(g) % B for _, t in tgt for g in ngrams(t))
    nr, nt = sum(cr.values()), sum(ct.values())

    def term(b):
        return round(1e6 * (((math.log(ct.get(b, 0) + 1)
                              - math.log(cr.get(b, 0) + 1))
                             - math.log(nt + B)) + math.log(nr + B)))

    return {
        did: (len(ngrams(t)), sum(term(u32(g) % B) for g in ngrams(t)))
        for did, t in docs
    }


def test_importance_weights_matches_brute(spark):
    from duwamish_spark.functions import importance_weights

    docs = [
        ("d0", "the cat sat on the mat"),
        ("d1", "spark runs a dag of stages over partitions"),
        ("d2", "the dog sat on the log"),
        ("d3", "x"),
        ("d4", "  "),
        ("d5", "the cat sat quietly near the dog"),
    ]
    tgt = [("t0", "the cat sat quietly"), ("t1", "the dog sat still")]
    want = _dsir_brute(docs, tgt, B=64)
    out = importance_weights(
        spark.createDataFrame(docs, "doc_id string, text string"),
        spark.createDataFrame(tgt, "doc_id string, text string"),
        k=2, n_buckets=64,
    )
    got = {r["doc_id"]: (r["n_ngrams"], r["weight_micros"]) for r in out.collect()}
    assert got == want
    # target-like docs score above target-unlike ones
    assert got["d5"][1] > got["d1"][1]


def test_importance_weights_short_docs_get_zero(spark):
    from duwamish_spark.functions import importance_weights

    docs = spark.createDataFrame(
        [("a", "one"), ("b", ""), ("c", "two tokens here")],
        "doc_id string, text string",
    )
    tgt = spark.createDataFrame([("t", "two tokens here")], "doc_id string, text string")
    got = {r["doc_id"]: (r["n_ngrams"], r["weight_micros"])
           for r in importance_weights(docs, tgt, k=2, n_buckets=16).collect()}
    assert got["a"] == (0, 0) and got["b"] == (0, 0)
    # c is the ONLY multi-token raw doc, so raw == target distribution
    # and the log-ratio is exactly zero — the identity the fixed-point
    # arithmetic must land on precisely
    assert got["c"] == (2, 0)


def test_importance_weights_stable_under_repartition(spark):
    from duwamish_spark.functions import importance_weights

    docs = spark.createDataFrame(
        [(f"d{i}", f"tok{i % 7} tok{i % 5} tok{i % 3} tok{i % 11}") for i in range(60)],
        "doc_id string, text string",
    )
    tgt = docs.where("doc_id like 'd1%'")
    a = sorted(map(tuple, importance_weights(docs, tgt).collect()))
    b = sorted(map(tuple, importance_weights(docs.repartition(13), tgt).collect()))
    assert a == b


def test_importance_weights_rejects_bad_params(spark):
    from duwamish_spark.functions import importance_weights

    docs = spark.createDataFrame([("a", "x y")], "doc_id string, text string")
    with pytest.raises(ValueError, match="k must"):
        importance_weights(docs, docs, k=0)
    with pytest.raises(ValueError, match="n_buckets"):
        importance_weights(docs, docs, n_buckets=1)


def _resample_brute(weights, n, salt="dsir"):
    """Pure-Python replay of importance_resample's race over given
    {doc_id: weight_micros} — same float-op order, same tie-break."""
    import hashlib
    import math

    keyed = []
    for did, wm in weights.items():
        h = int(hashlib.md5((salt + "#u:" + did).encode()).hexdigest()[:8], 16)
        k = round(math.log(math.log(4294967297.0 / (h + 1))) - wm / 1000000.0, 6)
        keyed.append((k, did))
    keyed.sort()
    return {(did, k) for k, did in keyed[:n]}


def _lm_brute(docs, tgt, B1, B2, salt="lm"):
    import hashlib
    import math

    def u32(s, sl):
        return int(hashlib.md5(f"{sl}:{s}".encode()).hexdigest()[:8], 16)

    def bigrams(t):
        w = t.split()
        return [(w[i], f"{w[i]} {w[i+1]}") for i in range(len(w) - 1)]

    c1, c2 = {}, {}
    for _, t in tgt:
        for w1, g in bigrams(t):
            c1[u32(w1, salt + "1") % B1] = c1.get(u32(w1, salt + "1") % B1, 0) + 1
            c2[u32(g, salt + "2") % B2] = c2.get(u32(g, salt + "2") % B2, 0) + 1

    out = {}
    for did, t in docs:
        bgs = bigrams(t)
        ce = sum(
            round(
                1e6
                * (
                    math.log(c1.get(u32(w1, salt + "1") % B1, 0) + B2)
                    - math.log(c2.get(u32(g, salt + "2") % B2, 0) + 1)
                )
            )
            for w1, g in bgs
        )
        n = len(bgs)
        ppl = 0.0 if n == 0 else round(math.exp(ce / n / 1e6), 6)
        out[did] = (n, ce, ppl)
    return out


def test_lm_perplexity_matches_brute(spark):
    from duwamish_spark.functions import lm_perplexity

    docs = [
        ("d0", "the cat sat on the mat"),
        ("d1", "spark runs a dag of stages over partitions"),
        ("d2", "the cat sat quietly near the dog"),
        ("d3", "x"),
        ("d4", ""),
    ]
    tgt = [("t0", "the cat sat quietly"), ("t1", "the dog sat on the mat")]
    want = _lm_brute(docs, tgt, B1=64, B2=256)
    out = lm_perplexity(
        spark.createDataFrame(docs, "doc_id string, text string"),
        spark.createDataFrame(tgt, "doc_id string, text string"),
        n_ctx_buckets=64, n_big_buckets=256,
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["ce_micros"], r["ppl"]) for r in out.collect()}
    assert got == want
    # target-like docs measure lower perplexity than target-unlike ones
    assert got["d2"][2] < got["d1"][2]
    # short docs: 0 bigrams, 0 entropy, sentinel ppl
    assert got["d3"] == (0, 0, 0.0) and got["d4"] == (0, 0, 0.0)


def test_lm_perplexity_stable_under_repartition(spark):
    from pyspark.sql import functions as F

    from duwamish_spark.functions import lm_perplexity

    docs = spark.createDataFrame(
        [(i, "tok%d tok%d tok%d" % (i % 5, i % 3, i % 7)) for i in range(40)],
        "doc_id long, text string",
    )
    tgt = docs.where(F.col("doc_id") % 4 == 0)
    a = sorted(map(tuple, lm_perplexity(docs, tgt).collect()))
    b = sorted(map(tuple, lm_perplexity(docs.repartition(13), tgt).collect()))
    assert a == b


def test_importance_resample_matches_brute(spark):
    from duwamish_spark.functions import importance_resample, importance_weights

    docs = [
        ("d0", "the cat sat on the mat"),
        ("d1", "spark runs a dag of stages over partitions"),
        ("d2", "the dog sat on the log"),
        ("d3", "x"),
        ("d4", "the cat sat quietly near the dog"),
        ("d5", "shuffle exchange hash aggregate codegen"),
        ("d6", "the cat and the dog sat together"),
        ("d7", "tokens and buckets and logs"),
    ]
    tgt = [("t0", "the cat sat quietly"), ("t1", "the dog sat still")]
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    tdf = spark.createDataFrame(tgt, "doc_id string, text string")
    w = {
        r["doc_id"]: r["weight_micros"]
        for r in importance_weights(ddf, tdf, k=2, n_buckets=64).collect()
    }
    got = {
        (r["doc_id"], r["sample_key"])
        for r in importance_resample(ddf, tdf, 4, k=2, n_buckets=64).collect()
    }
    assert got == _resample_brute(w, 4)
    # weights= fast path selects the identical set, and the selection is
    # partitioning-independent (a pure function of ids + weights)
    wdf = spark.createDataFrame(
        [(d, int(m)) for d, m in w.items()], "doc_id string, weight_micros long"
    ).repartition(7)
    got2 = {
        (r["doc_id"], r["sample_key"])
        for r in importance_resample(ddf, tdf, 4, weights=wdf).collect()
    }
    assert got2 == got


def test_importance_resample_favors_target_like_docs(spark):
    # DSIR selects docs that look like the TARGET but are RARE in the raw
    # corpus (the log-ratio penalizes anything already frequent in raw):
    # 3 long target-phrased docs hidden among 57 junk docs, target with
    # strong bigram counts -> the like docs' ~50e6-micro margin dwarfs
    # the Gumbel noise of the race, so select-3 must find exactly them
    from duwamish_spark.functions import importance_resample

    phrase = "the quick brown fox jumps over the lazy dog near the river bank "
    like = [(f"a{i}", phrase * 5) for i in range(3)]
    junk = [
        (f"z{i:02d}", f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
        for i in range(57)
    ]
    tgt = [(f"t{j}", phrase * 10) for j in range(2)]
    ddf = spark.createDataFrame(like + junk, "doc_id string, text string")
    tdf = spark.createDataFrame(tgt, "doc_id string, text string")
    picked = sorted(
        r["doc_id"]
        for r in importance_resample(ddf, tdf, 3, k=2, n_buckets=256).collect()
    )
    assert picked == ["a0", "a1", "a2"]


def test_importance_resample_validates(spark):
    import pytest as _pytest

    from duwamish_spark.functions import importance_resample

    ddf = spark.createDataFrame([("d0", "a b")], "doc_id string, text string")
    with _pytest.raises(ValueError, match="n must"):
        importance_resample(ddf, ddf, 0)


# ---------------------------------------------------------------------------
# duplicate_spans (winnowed exact-substring pair detection)
# ---------------------------------------------------------------------------

def test_duplicate_spans_finds_shared_block(spark):
    from duwamish_spark.functions import duplicate_spans

    block = "import org apache spark sql functions as F and then some"
    docs = [
        ("a", "left context " + block + " right context"),
        ("b", "totally different prefix " + block),
        ("c", "no overlap here at all zq xw vu ts rq"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    pairs = {(r["id_a"], r["id_b"]): r["shared_fps"]
             for r in duplicate_spans(df, k=8, window=4, min_shared=1).collect()}
    assert ("a", "b") in pairs and pairs[("a", "b")] >= 2
    assert all(k == ("a", "b") for k in pairs), pairs  # c pairs with nobody


def test_duplicate_spans_winnowing_guarantee(spark):
    # two docs sharing EXACTLY a (k + window - 1)-char run must share at
    # least one fingerprint (the MOSS guarantee), and id_a < id_b
    from duwamish_spark.functions import duplicate_spans

    k, w = 8, 4
    run = "zxqwvuty" + "abc" * ((k + w - 1 - 8 + 2) // 3)
    run = run[: k + w - 1]
    assert len(run) == k + w - 1
    docs = [
        ("d2", "PAD1 PAD1 " + run + " TAILX"),
        ("d1", "OTHER pad " + run + " YTAIL"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = duplicate_spans(df, k=k, window=w, min_shared=1).collect()
    assert rows and all(r["id_a"] < r["id_b"] for r in rows)
    assert {(r["id_a"], r["id_b"]) for r in rows} == {("d1", "d2")}


def test_duplicate_spans_max_df_prunes_boilerplate(spark):
    # a licence block welded into EVERY doc is a template, not a dup pair:
    # with max_df below the doc count its fingerprints must not produce
    # pairs, while a rarer shared block still does
    from duwamish_spark.functions import duplicate_spans

    licence = "this file is licensed under the apache license version two"
    rare = "the quick brown fox jumps over the lazy dog tonight"
    docs = [(f"n{i}", f"doc{i} body {licence} trailer{i}") for i in range(6)]
    docs += [("r1", "xx " + rare + " yy"), ("r2", "zz " + rare + " ww " + licence)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    pruned = {(r["id_a"], r["id_b"])
              for r in duplicate_spans(df, k=8, window=4, min_shared=1, max_df=3).collect()}
    assert ("r1", "r2") in pruned
    assert not any(a.startswith("n") or b.startswith("n") for a, b in pruned), pruned
    full = {(r["id_a"], r["id_b"])
            for r in duplicate_spans(df, k=8, window=4, min_shared=1).collect()}
    assert any(a.startswith("n") and b.startswith("n") for a, b in full)


def test_duplicate_spans_validates(spark):
    import pytest as _pytest

    from duwamish_spark.functions import duplicate_spans

    df = spark.createDataFrame([("a", "b c")], "doc_id string, text string")
    with _pytest.raises(ValueError, match="min_shared"):
        duplicate_spans(df, min_shared=0)


# ---------------------------------------------------------------------------
# chunk_documents (sliding-window chunking)
# ---------------------------------------------------------------------------


def _brute_chunks(text, chunk, overlap):
    toks = text.split()
    n = len(toks)
    stride = chunk - overlap
    out = []
    for s in range(0, max(n, 1), stride):
        if s >= max(1, n - overlap) or s >= n:
            break
        piece = toks[s : s + chunk]
        out.append((s // stride, s, len(piece), " ".join(piece)))
    return out


def test_chunk_documents_matches_brute(spark):
    from duwamish_spark.functions import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # 10 toks
            (2, " ".join(f"t{i}" for i in range(4))),    # exactly one chunk
            (3, "a"),                                    # single token
            (4, "   "),                                  # whitespace-only: no rows
            (5, "a  b\tc\nd e f g h"),                   # mixed whitespace, 8 toks
            (6, " ".join(f"t{i}" for i in range(12))),   # n - overlap boundary
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    got = defaultdict(list)
    for r in rows:
        got[r["id"]].append((r["chunk_id"], r["start"], r["n_tokens"], r["chunk"]))
    for did, text in [
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, " ".join(f"t{i}" for i in range(4))),
        (3, "a"),
        (4, ""),
        (5, "a b c d e f g h"),
        (6, " ".join(f"t{i}" for i in range(12))),
    ]:
        assert sorted(got.get(did, [])) == _brute_chunks(text, 4, 2), did


def test_chunk_documents_covers_every_token(spark):
    from duwamish_spark.functions import chunk_documents

    text = " ".join(f"w{i}" for i in range(57))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, chunk_tokens=16, overlap=4).collect(),
        key=lambda r: r["start"],
    )
    # contiguous cover: first starts at 0, each next start <= prev end,
    # last chunk reaches the final token
    assert rows[0]["start"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["start"] <= a["start"] + a["n_tokens"]
    assert rows[-1]["start"] + rows[-1]["n_tokens"] == 57
    # no chunk fully contained in its predecessor
    for a, b in zip(rows, rows[1:]):
        assert b["start"] + b["n_tokens"] > a["start"] + a["n_tokens"]


def test_chunk_documents_rejects_bad_params(spark):
    from duwamish_spark.functions import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=-1)


# ---------------------------------------------------------------------------
# incremental_dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------


def _brute_incremental(new_rows, corpus_rows, threshold, k=3):
    import hashlib as _hl

    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 1))} - {""}

    def jac(a, b):
        A, B = sh(a), sh(b)
        if not A or not B:
            return 0.0
        return len(A & B) / len(A | B)

    chash = {_hl.md5(t.encode()).hexdigest() for _, t in corpus_rows}
    out = {}
    for i, t in new_rows:
        h = _hl.md5(t.encode()).hexdigest()
        if h in chash:
            out[i] = "exact_corpus"
        elif any(
            _hl.md5(t2.encode()).hexdigest() == h for j, t2 in new_rows if j < i
        ):
            out[i] = "exact_batch"
        elif any(jac(t, t2) >= threshold for _, t2 in corpus_rows):
            out[i] = "near_corpus"
        elif any(jac(t, t2) >= threshold for j, t2 in new_rows if j < i):
            out[i] = "near_batch"
        else:
            out[i] = "kept"
    return out


_INC_CORPUS = [
    (100, "the quick brown fox jumps over the lazy dog near the river bank"),
    (101, "spark executes queries with whole stage code generation enabled"),
    (102, "completely unrelated corpus text about databases and storage"),
]
_INC_NEW = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact_corpus
    (2, "fresh new document with novel tokens alpha beta gamma delta"),       # kept
    (3, "fresh new document with novel tokens alpha beta gamma delta"),       # exact_batch of 2
    (4, "spark executes queries with whole stage code generation disabled"),  # near_corpus (101)
    (5, "brand new content entirely different words here zeta eta theta"),    # kept
    (6, "brand new content entirely different words here zeta eta iota"),     # near_batch of 5
    (7, "totally singular document nothing shares these rare tokens"),        # kept
]


def test_incremental_dedup_matches_brute(spark):
    from duwamish_spark.functions import incremental_dedup

    nd = spark.createDataFrame(_INC_NEW, "doc_id long, text string")
    cp = spark.createDataFrame(_INC_CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(
            nd, cp, threshold=0.5, n_hashes=64, bands=64
        ).collect()
    }
    want = _brute_incremental(_INC_NEW, _INC_CORPUS, 0.5)
    assert got == want
    assert got[1] == "exact_corpus" and got[3] == "exact_batch"
    assert got[4] == "near_corpus" and got[6] == "near_batch"
    assert got[2] == "kept" and got[5] == "kept" and got[7] == "kept"


def test_incremental_dedup_priority_and_chain(spark):
    from duwamish_spark.functions import incremental_dedup

    corpus = [(100, "shared exact text aaa bbb ccc ddd eee fff ggg")]
    new = [
        # exact corpus dup AND near-batch of nothing earlier: exact wins
        (1, "shared exact text aaa bbb ccc ddd eee fff ggg"),
        # chain: 2 kept; 3 near of 2; 4 near of 3 (and of 2) -> both dropped
        (2, "chain doc one two three four five six seven eight nine"),
        (3, "chain doc one two three four five six seven eight ten"),
        (4, "chain doc one two three four five six seven nine ten"),
    ]
    got = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(
            spark.createDataFrame(new, "doc_id long, text string"),
            spark.createDataFrame(corpus, "doc_id long, text string"),
            threshold=0.5, n_hashes=64, bands=64,
        ).collect()
    }
    assert got[1] == "exact_corpus"
    assert got[2] == "kept"
    assert got[3] == "near_batch" and got[4] == "near_batch"
    assert got == _brute_incremental(new, corpus, 0.5)


def test_incremental_banding_equals_exact_at_gate_config(spark):
    """The q_incremental_dedup gate claims the 64x1 banded near relation
    EMPIRICALLY equals the exact n-gram Jaccard relation at the gate's
    config and corpus (miss probability (1-j)^64 per true pair, not a
    proof) — diff the two relations on the gate SF's documents so the
    claim is a measurement, not an assertion (r4 ADVICE)."""
    import os

    import __spark_entry__ as entrymod
    from duwamish_spark.functions import minhash_near_dups, ngram_jaccard_pairs

    p = os.path.join(entrymod._ORACLE_SF_DIR, "documents.parquet")
    if not os.path.exists(p):
        pytest.skip("no documents.parquet at the oracle SF dir")
    docs = spark.read.parquet(p)
    banded = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(
            docs, k=3, n_hashes=64, bands=64, threshold=0.2
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.2).collect()
    }
    assert banded == exact


def test_incremental_dedup_partition_invariant(spark):
    from duwamish_spark.functions import incremental_dedup

    nd = spark.createDataFrame(_INC_NEW, "doc_id long, text string")
    cp = spark.createDataFrame(_INC_CORPUS, "doc_id long, text string")
    a = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(nd, cp, threshold=0.5, n_hashes=64, bands=64).collect()
    }
    b = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(
            nd.repartition(7), cp.repartition(5), threshold=0.5, n_hashes=64, bands=64
        ).collect()
    }
    assert a == b
