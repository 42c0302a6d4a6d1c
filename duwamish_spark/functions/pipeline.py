"""End-to-end corpus curation — the composed training-data pipeline.

The individual operators (exact dedup, quality scoring, per-source caps,
content-keyed splits) are each oracled standalone; this module composes
them into the pass a user actually runs over a crawl before training:

    raw docs ──exact-dedup keepers──► quality ≥ τ ──cap per source──►
    train/validation/test split

Everything stays one declarative DataFrame graph (Catalyst sees the
whole pipeline: the quality filter and dedup semi-join prune rows BEFORE
the window cap, the split is a pure projection on top), so the composed
pass costs what its most expensive stage costs — there is no
materialization between stages and no driver-side loop.

Scale shape per stage: dedup keeper set = hash groupBy (linear);
quality = one exploded-token groupBy (linear in tokens); cap =
WindowGroupLimit (per-key top-cap pruned map-side); split = projection.
Nothing quadratic, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duwamish_spark.functions.dedup import exact_dedup
from duwamish_spark.functions.sampling import cap_per_key, hash_split
from duwamish_spark.functions.text import doc_quality
from duwamish_spark.graph import require_columns


def curate_corpus(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    per_source_cap: int = 20,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(id, source, quality, cap_rank, split) for every SURVIVING doc.

    Stages, in order (each row must pass all of them):

    1. exact dedup — only each content hash's keeper (min id) survives,
    2. quality — composite score (:func:`doc_quality`) ≥ ``min_quality``,
    3. anti-domination — at most ``per_source_cap`` docs per source,
       survivors chosen by the content-keyed hash order
       (:func:`cap_per_key`; the rank is computed over the already
       deduped+filtered set, so a source's cap is spent on usable docs),
    4. split — content-keyed train/validation/test assignment
       (:func:`hash_split`, default 98/1/1).

    Deterministic end-to-end: every stage is a pure function of content
    and ids, so the curated set is reproducible across runs, partition
    layouts, and engines (the driver gate replays the whole composition
    in DuckDB).
    """
    require_columns(docs, (id_col, text_col, source_col), "docs")
    keepers = exact_dedup(docs, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept = docs.join(keepers, id_col, "left_semi")
    q = (
        doc_quality(kept, id_col, text_col)
        .where(F.col("quality") >= min_quality)
        .select(id_col, "quality")
    )
    filtered = kept.select(id_col, source_col).join(q, id_col)
    capped = cap_per_key(filtered, source_col, per_source_cap, id_col=id_col)
    return hash_split(capped, id_col, weights).select(
        id_col, source_col, "quality",
        F.col("cap_rank").cast("long").alias("cap_rank"), "split",
    )
