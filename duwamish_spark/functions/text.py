"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python UDFs. Each operator has a DuckDB-SQL
twin in ``__spark_entry__.oracle_sql`` so the driver's correctness gate
covers it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and")


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization; empty text → empty array."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, avg_token_len) — exploded/aggregated, scales linearly."""
    toks = docs.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    return toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(F.length("tok")), 6).alias("avg_token_len"),
    )


def stopword_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """(id, n_tokens, stop_ratio) — a quality-scoring signal."""
    toks = docs.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    is_stop = F.col("tok").isin(*stopwords).cast("int")
    return toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum(is_stop) / F.count(F.lit(1)), 6).alias("stop_ratio"),
    )


# BPE-ish pre-tokenization pattern (GPT-2-family shape, minus lookahead so
# the SAME pattern runs in Spark's Java regex and DuckDB's RE2): common
# English contractions, letter runs, digit runs, non-space punctuation runs
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_tokens_col(text: str | Column = "text", pattern: str = BPE_PATTERN) -> Column:
    """Regex pre-tokenization (the BPE-style splitter): array of matches.

    Subword merge tables are model-specific; what a data pipeline needs at
    scale is the PRE-tokenizer — this split is what BPE vocabularies are
    trained over, and its token count is the standard length signal."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(t, F.lit(pattern), 0)


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bpe_tokens, n_alpha, n_digit, n_punct) — regex-tokenizer
    counts per class; the length/composition signal for quality filters."""
    toks = docs.select(
        id_col, F.explode(bpe_tokens_col(text_col)).alias("tok")
    )
    alpha = F.col("tok").rlike(r"^[A-Za-z]+$|^'").cast("int")
    digit = F.col("tok").rlike(r"^[0-9]+$").cast("int")
    return toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bpe_tokens"),
        F.sum(alpha).alias("n_alpha"),
        F.sum(digit).alias("n_digit"),
        (F.count(F.lit(1)) - F.sum(alpha) - F.sum(digit)).alias("n_punct"),
    )


def doc_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len, stop_ratio, punct_ratio,
    quality) — the composite quality-scoring signal over length, stopword
    and punctuation ratios (each sub-signal is also exposed standalone).

    quality = mean of three [0,1] subscores: length in a sane band
    (n_tokens/100 capped at 1), stopword presence (stop_ratio*4 capped at
    1 — natural prose contains stopwords), low punctuation (1 -
    punct_ratio). Single groupBy over exploded tokens + one char count.
    """
    base = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        tokens_col(text_col).alias("_t"),
    )
    toks = base.select(id_col, "n_chars", F.explode("_t").alias("tok"))
    is_stop = F.col("tok").isin(*stopwords).cast("int")
    n_punct_chars = F.length(F.regexp_replace("tok", r"[A-Za-z0-9]", ""))
    agg = toks.groupBy(id_col).agg(
        F.first("n_chars").alias("n_chars"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(F.length("tok")), 6).alias("avg_token_len"),
        F.round(F.sum(is_stop) / F.count(F.lit(1)), 6).alias("stop_ratio"),
        F.round(
            F.sum(n_punct_chars) / F.sum(F.length("tok")), 6
        ).alias("punct_ratio"),
    )
    q = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + F.least(F.col("stop_ratio") * 4.0, F.lit(1.0))
        + (F.lit(1.0) - F.col("punct_ratio"))
    ) / 3.0
    return agg.select(
        id_col, "n_chars", "n_tokens", "avg_token_len", "stop_ratio",
        "punct_ratio", F.round(q, 6).alias("quality"),
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fingerprint) — md5 of whitespace-normalized text.

    Deterministic content fingerprint for dedup joins; normalization makes
    it robust to whitespace-only edits.
    """
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return docs.select(id_col, F.md5(norm).alias("fingerprint"))


def lang_marker_scores(
    docs: DataFrame,
    markers: dict[str, tuple[str, ...]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """N-gram-heuristic language ID: count marker-token hits per language,
    predict the argmax (ties → lexicographically smallest lang).

    ``markers``: {lang: (marker tokens...)}.
    """
    toks = docs.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    scores = [
        F.sum(F.col("tok").isin(*m).cast("int")).alias(f"score_{lang}")
        for lang, m in sorted(markers.items())
    ]
    agg = toks.groupBy(id_col).agg(*scores)
    best = F.expr(
        "array("
        + ",".join(
            f"struct(-score_{lang} as ns, '{lang}' as lang)" for lang in sorted(markers)
        )
        + ")"
    )
    return agg.select(
        id_col, F.array_min(best).getField("lang").alias("pred_lang")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, tok, tf, tfidf, rnk) with

        tfidf = tf(doc, tok) · ln(N / df(tok))

    over whitespace tokens — the standard keyword/feature-selection
    signal a training-data pipeline derives per document (topic tags,
    near-dup explanations, quality filters on keyword burstiness).

    Plan shape at 100 TB: two linear groupBys (term frequency per doc,
    document frequency per term) + one scalar N (agg, crossJoined — no
    driver collect), then a per-doc window top-k that Spark executes
    with the map-side WindowGroupLimit prune (rank pushed before the
    shuffle), so the exchange carries at most k rows per document.
    Determinism: tf/df/N are exact integers, the float tfidf is one
    product of one ln per row in both engines, and rank order is
    (unrounded tfidf DESC, tok ASC) — total, so the window is exactly
    SQL-replayable; the emitted tfidf is round(·, 6).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "_tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(id_col, "tok", "tf", F.round("_tfidf", 6).alias("tfidf"), "rnk")
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    the "repetitious text" quality filters): (id, n_lines, dup_line_frac,
    dup_line_char_frac, n_ngrams, top_ngram_frac).

    - dup_line_frac: fraction of line INSTANCES beyond the first occurrence
      of each distinct line, Σ(c−1)/Σc over per-(doc, line) counts c.
    - dup_line_char_frac: same, weighted by line length in characters.
    - top_ngram_frac: count share of the single most frequent word n-gram,
      max(c)/Σc (count-share, not Gopher's char-share: the max is
      tie-invariant, so the result is deterministic without a gram
      tie-break and replays exactly in SQL).

    Plan shape at 100 TB: two exploded linear groupBys — (doc, line) and
    (doc, gram) — each re-aggregated to the doc key; both shuffles carry
    partial aggregates (map-side combine) and the final doc-keyed join
    reuses the groupBy partitioning (no extra exchange). Whitespace-only
    lines are dropped; docs with fewer than ngram_n tokens get n_ngrams=0,
    top_ngram_frac=0.0. Docs whose text is all-whitespace vanish (no
    lines), matching token_stats/stopword_ratio semantics.
    """
    if ngram_n < 1:
        raise ValueError(f"ngram_n must be >= 1, got {ngram_n}")
    lines = docs.select(
        id_col, F.explode(F.split(F.col(text_col), "\n")).alias("line")
    ).where(F.length(F.trim("line")) > 0)
    per_line = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("c"))
    line_agg = per_line.select(
        id_col, "c", F.length("line").alias("len")
    ).groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        F.round(F.sum(F.col("c") - 1) / F.sum("c"), 6).alias("dup_line_frac"),
        F.round(
            F.sum((F.col("c") - 1) * F.col("len")) / F.sum(F.col("c") * F.col("len")), 6
        ).alias("dup_line_char_frac"),
    )

    w = tokens_col(text_col)
    # word n-grams: positions 1..size-n+1, each joined with single spaces
    # (tokens are whitespace-split, so the join is collision-free)
    gram = F.transform(
        F.sequence(F.lit(1), F.size(w) - (ngram_n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(ngram_n)]
        ),
    )
    grams = docs.select(
        F.col(id_col),
        # sequence(1, size-n+1) DESCENDS when size < n — guard to empty
        F.explode(
            F.when(F.size(w) >= ngram_n, gram).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    gram_agg = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_frac"),
    )
    return line_agg.join(gram_agg, id_col, "left").select(
        id_col, "n_lines", "dup_line_frac", "dup_line_char_frac",
        F.coalesce("n_ngrams", F.lit(0).cast("long")).alias("n_ngrams"),
        F.coalesce("top_ngram_frac", F.lit(0.0)).alias("top_ngram_frac"),
    )


# PII patterns chosen to parse IDENTICALLY under Spark's Java regex and
# DuckDB's RE2 (no lookaround, no backrefs; \b and {m,n} are common):
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
)


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Redact PII-shaped spans (emails, NANP-dashed phones, IPv4s) and
    count the redactions — the scrubbing pass every published pretraining
    pipeline runs before tokenization (e.g. the C4/ROOTS cleanups).

    Returns (id, text_redacted, n_email, n_phone, n_ipv4). Patterns apply
    IN ORDER to the progressively redacted text, so each count is exactly
    the number of replacements that pattern performed (an IPv4 inside an
    already-redacted email is neither counted nor re-replaced) and the
    counts are reproducible from text_redacted's construction alone.

    Plan shape at 100 TB: a pure per-row projection — no shuffle, no
    explode, whole-stage-codegen JVM regex; scales embarrassingly and
    pushes through any partitioning untouched. Order of rows never
    matters; NULL text yields NULL redaction and zero counts.
    """
    t = F.col(text_col)
    out: list[Column] = [F.col(id_col)]
    counts: list[Column] = []
    for name, pat, repl in patterns:
        counts.append(
            F.coalesce(F.regexp_count(t, F.lit(pat)), F.lit(0))
            .cast("long").alias(f"n_{name}")
        )
        t = F.regexp_replace(t, pat, repl)
    return docs.select(*out, t.alias("text_redacted"), *counts)


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    whitespace-token windows of ``chunk_tokens`` tokens advancing by
    ``chunk_tokens - overlap`` — the retrieval/embedding-prep cut
    (RAG indexing, context-window packing precursors). Output one row
    per chunk: ``(id, chunk_id, start, n_tokens, chunk)`` with
    ``start`` the 0-based token offset and ``chunk_id = start/stride``.

    Window rule: offsets 0, stride, 2·stride, … while
    ``start < max(1, n_tokens − overlap)`` — every token is covered,
    the tail chunk may be short, and no chunk is fully contained in
    its predecessor. Whitespace-empty documents produce zero rows.

    Scale shape: pure per-row projection + explode — no shuffle, no
    UDF, whole-stage codegen; output volume is input tokens ×
    (1 + overlap/stride), visible in the knobs, not hidden. The
    construction (trim-split, sequence, slice, array_join) maps
    1:1 onto DuckDB list functions, so the driver oracle replays
    every chunk string byte-for-byte.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = tokens_col(text_col)
    d = docs.select(
        F.col(id_col).alias("id"), toks.alias("toks"), F.size(toks).alias("n")
    )
    starts = F.when(
        F.col("n") >= 1,
        F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select("id", "toks", "n", F.explode(starts).alias("start"))
        .where(F.col("start") < F.greatest(F.lit(1), F.col("n") - F.lit(overlap)))
        .select(
            "id",
            F.expr(f"CAST(start DIV {stride} AS BIGINT)").alias("chunk_id"),
            F.col("start").cast("long").alias("start"),
            F.size(F.slice("toks", F.col("start") + 1, F.lit(chunk_tokens)))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice("toks", F.col("start") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk"),
        )
    )
