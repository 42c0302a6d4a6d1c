"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python UDFs. Each operator has a DuckDB-SQL
twin in ``__spark_entry__.oracle_sql`` so the driver's correctness gate
covers it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
