"""Data-selection importance weights — DSIR-style hashed n-gram
log-likelihood ratios (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling").

Given a RAW corpus to be resampled and a (much smaller) TARGET corpus
that defines the distribution you want, score every raw document by

    w(doc) = Σ_{g ∈ ngrams(doc)}  log p_target(bucket(g)) - log p_raw(bucket(g))

where n-grams are hashed into a fixed number of buckets and each bucket
distribution is add-one smoothed. High-weight documents look like the
target; resampling the raw corpus by these weights (e.g. with
``sampling.hash_split`` thresholds or a top-k cut) is the standard
importance-resampling recipe for building a domain-matched training mix
from a web-scale crawl.

Determinism contract (the reason the output is integer micros): each
n-gram instance's term is rounded to integer micros FIRST and the
per-document sum runs over BIGINTs, so the result is independent of
partitioning/combine order and replayable by the DuckDB oracle
(same fixed-point discipline as link_prediction's Adamic-Adar sum).

Scale shape: the two bucket-count tables are at most ``n_buckets`` rows
(vocabulary-hash-sized BY CONSTRUCTION — this is why DSIR hashes), so
they broadcast; scoring is ONE linear pass over the exploded n-gram
instances with two broadcast joins and a map-side-combinable groupBy.
No shuffle is ever larger than the token stream itself; the target
corpus is read once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duwamish_spark.graph import require_columns


def _ngram_instances(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, ngram) with MULTIPLICITY (DSIR counts every occurrence),
    strictly: a doc with t tokens yields max(t - k + 1, 0) instances."""
    from duwamish_spark.functions.text import tokens_col

    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("t")
    ).where(F.size("t") >= k)
    return toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice("t", i, k)),
            )
        ).alias("ngram"),
    )


def _bucket(col: Column, n_buckets: int, salt: str) -> Column:
    """uint32(md5(salt:ngram)) % n_buckets — the sampling.py hash family,
    replayable in DuckDB as ('0x' || substring(md5(...),1,8))::UINTEGER."""
    from duwamish_spark.functions.sampling import _u32_of

    return (_u32_of(col, salt) % n_buckets).cast("long")


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    *,
    k: int = 2,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """Score every ``docs`` row against the ``target`` distribution.

    Returns one row per input doc (docs with fewer than ``k`` tokens get
    0 n-grams and weight 0): ``(id_col, n_ngrams, weight_micros)`` where
    ``weight_micros`` is the DSIR log-likelihood-ratio sum in integer
    micros:

        term(b) = round(1e6 · (ln(ct[b]+1) − ln(cr[b]+1)
                               − ln(Nt+B) + ln(Nr+B)))
        weight_micros = Σ over the doc's n-gram instances of term(bucket)

    with ct/cr the target/raw bucket instance counts, Nt/Nr the total
    instance counts, B = ``n_buckets`` (add-one smoothing on both sides).
    All four logs take INTEGER arguments, so the floats are identical
    across engines; the rounding-then-BIGINT-sum makes the total
    order-independent.

    ``docs`` itself is the raw/reference distribution (the DSIR setup:
    you reweight the corpus you are about to resample). Pass a distinct
    ``target`` slice — e.g. a trusted source, a wiki dump, a curated set.
    """
    require_columns(docs, (id_col, text_col), "docs")
    require_columns(target, (text_col,), "target")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    raw_inst = _ngram_instances(docs, k, id_col, text_col)
    # target only needs (ngram); reuse the same builder with a dummy id
    tgt_inst = _ngram_instances(
        target.select(F.lit("_").alias("_tid"), F.col(text_col)),
        k, "_tid", text_col,
    )

    raw_b = raw_inst.select(
        "id", _bucket(F.col("ngram"), n_buckets, salt).alias("bucket")
    )
    tgt_b = tgt_inst.select(
        _bucket(F.col("ngram"), n_buckets, salt).alias("bucket")
    )

    # the count tables are <= n_buckets rows (vocabulary-hash-sized BY
    # CONSTRUCTION), so collecting them is a model-sized pull — the same
    # boundedness argument as the SGD model broadcast. Re-parallelizing
    # the collected rows (instead of joining the lazy aggregates) also
    # means the scoring pass below re-reads only the RAW instance stream,
    # not the aggregations.
    spark = docs.sparkSession
    ct_rows = tgt_b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("ct")
    ).collect()
    cr_rows = raw_b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr")
    ).collect()
    nt = sum(r["ct"] for r in ct_rows)
    nr = sum(r["cr"] for r in cr_rows)
    ct = spark.createDataFrame(
        [(r["bucket"], r["ct"]) for r in ct_rows], "bucket long, ct long"
    )
    cr = spark.createDataFrame(
        [(r["bucket"], r["cr"]) for r in cr_rows], "bucket long, cr long"
    )

    term = F.round(
        F.lit(1e6)
        * (
            (
                (F.log(F.coalesce("ct", F.lit(0)) + F.lit(1))
                 - F.log(F.coalesce("cr", F.lit(0)) + F.lit(1)))
                - F.log(F.lit(float(nt + n_buckets)))
            )
            + F.log(F.lit(float(nr + n_buckets)))
        ),
        0,
    ).cast("long")

    scored = (
        raw_b.join(F.broadcast(ct), "bucket", "left")
        .join(F.broadcast(cr), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(term).alias("weight_micros"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_ngrams", F.lit(0).cast("long")).alias("n_ngrams"),
            F.coalesce("weight_micros", F.lit(0).cast("long")).alias(
                "weight_micros"
            ),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    target: DataFrame,
    *,
    n_ctx_buckets: int = 4096,
    n_big_buckets: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "lm",
) -> DataFrame:
    """Per-document perplexity under a hashed-bigram language model
    trained on ``target`` — the CCNet quality filter (Wenzek et al.
    2020: score every crawl document with a LM trained on a trusted
    corpus, keep the low-perplexity head). KenLM's 5-gram model becomes
    a hashed bigram model here: the conditional probability of token
    w_i given w_{i-1} is add-one estimated from target bucket counts

        p(w_i | w_{i-1}) = (c2[b2(w_{i-1} w_i)] + 1)
                           / (c1[b1(w_{i-1})] + n_big_buckets)

    with b1/b2 the md5-bucket of the context token / the bigram, and c1
    counting target bigram INSTANCES by context bucket (so the estimate
    is a proper conditional up to hash collisions).

    Returns ``(id_col, n_bigrams, ce_micros, ppl)``: ce_micros is the
    total cross-entropy Σ -ln p in integer micros (each instance term
    rounded to micros BEFORE the BIGINT sum — order-independent and
    DuckDB-replayable, the importance_weights discipline; every ln takes
    an integer argument), and ppl = round(exp(ce/n/1e6), 6) is the
    display perplexity (0.0 for docs with < 2 tokens).

    Scale shape: both count tables are bucket-bounded by construction
    (<= n_ctx/n_big rows — model-sized broadcasts); scoring is one
    linear pass over the raw bigram stream with two broadcast joins and
    a map-side-combinable per-doc sum. Nothing shuffles more than the
    token stream.
    """
    require_columns(docs, (id_col, text_col), "docs")
    require_columns(target, (text_col,), "target")
    if n_ctx_buckets < 2 or n_big_buckets < 2:
        raise ValueError("bucket counts must be >= 2")

    from duwamish_spark.functions.sampling import _u32_of
    from duwamish_spark.functions.text import tokens_col

    def _bigrams(d: DataFrame, idc: str) -> DataFrame:
        toks = d.select(
            F.col(idc).alias("id"), tokens_col(text_col).alias("t")
        ).where(F.size("t") >= 2)
        return toks.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.concat_ws(" ", F.slice("t", i, 2)).alias("gram"),
                    ),
                )
            ).alias("bg"),
        ).select(
            "id",
            (_u32_of(F.col("bg.w1"), salt + "1") % n_ctx_buckets).alias("b1"),
            (_u32_of(F.col("bg.gram"), salt + "2") % n_big_buckets).alias("b2"),
        )

    tgt = _bigrams(target.select(F.lit("_").alias("_tid"), F.col(text_col)), "_tid")
    spark = docs.sparkSession
    c2_rows = tgt.groupBy("b2").agg(F.count(F.lit(1)).alias("c2")).collect()
    c1_rows = tgt.groupBy("b1").agg(F.count(F.lit(1)).alias("c1")).collect()
    c2 = spark.createDataFrame(
        [(r["b2"], r["c2"]) for r in c2_rows] or [(None, None)], "b2 long, c2 long"
    ).where(F.col("b2").isNotNull())
    c1 = spark.createDataFrame(
        [(r["b1"], r["c1"]) for r in c1_rows] or [(None, None)], "b1 long, c1 long"
    ).where(F.col("b1").isNotNull())

    term = F.round(
        F.lit(1e6)
        * (
            F.log(F.coalesce("c1", F.lit(0)) + F.lit(n_big_buckets))
            - F.log(F.coalesce("c2", F.lit(0)) + F.lit(1))
        ),
        0,
    ).cast("long")

    scored = (
        _bigrams(docs, id_col)
        .join(F.broadcast(c1), "b1", "left")
        .join(F.broadcast(c2), "b2", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(term).alias("ce_micros"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("ce_micros", F.lit(0).cast("long")).alias("ce_micros"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.exp(
                        F.col("ce_micros").cast("double")
                        / F.col("n_bigrams").cast("double")
                        / F.lit(1e6)
                    ),
                    6,
                )
            )
            .alias("ppl"),
        )
    )


def importance_resample(
    docs: DataFrame,
    target: DataFrame,
    n: int,
    *,
    k: int = 2,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
    weights: DataFrame | None = None,
) -> DataFrame:
    """Deterministic DSIR importance resampling: the ``n`` documents
    selected by a weighted sampling-without-replacement race.

    The DSIR recipe (Xie et al. 2023 §2) resamples the raw corpus with
    probability ∝ exp(weight). The classic distributed formulation is
    the exponential race / Gumbel-top-k (Efraimidis & Spirakis 2006):
    draw ``u_i`` uniform per doc, keep the n smallest
    ``-ln(u_i) / w_i``. Taking logs (monotone) gives the sort key

        sample_key = ln(ln(1/u_i)) − weight_micros/10⁶

    which never materializes ``exp(weight)`` (overflow-proof for any
    weight) and stays in a small numeric range. ``u_i`` is the md5-u32
    of the doc id under a sampling-specific salt, mapped to
    ``(h+1)/(2³²+1) ∈ (0,1)`` — a pure function of (id, salt), so the
    selected set is reproducible, partitioning-independent, and
    engine-replayable (the key is rounded to 6 decimals with an id
    tie-break before the cut).

    Scale shape: one linear pass to key + a global top-n — Spark plans
    ``orderBy().limit(n)`` as TakeOrderedAndProject (per-task partial
    top-n, no full sort shuffle), so the cut moves ~n rows per task.
    ``weights``: pass a precomputed :func:`importance_weights` result to
    skip re-scoring (must carry ``id_col`` and ``weight_micros``).

    Returns ``(id_col, sample_key)`` for the selected docs.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if weights is None:
        weights = importance_weights(
            docs, target, k=k, n_buckets=n_buckets,
            id_col=id_col, text_col=text_col, salt=salt,
        )
    require_columns(weights, (id_col, "weight_micros"), "weights")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "#u:"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    key = F.round(
        F.log(F.log(F.lit(4294967297.0) / (h + F.lit(1))))
        - F.col("weight_micros") / F.lit(1000000.0),
        6,
    )
    return (
        weights.select(F.col(id_col), key.alias("sample_key"))
        .orderBy("sample_key", id_col)
        .limit(n)
    )
