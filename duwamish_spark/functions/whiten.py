"""PCA whitening for embedding columns (array<float>).

Motivation: real embedding corpora are anisotropic — a few directions
carry most of the variance, so cosine similarity (and every LSH/IVF
structure built on it) is dominated by those directions and near-dup /
kNN recall suffers. Whitening — x' = Λ^(-1/2) Vᵀ (x − μ) from the
eigendecomposition Σ = V Λ Vᵀ — equalizes the spectrum so every
direction contributes, the standard preprocessing step before
similarity search (e.g. Jégou & Chum 2012).

Scale shape (the kmeans_centroids discipline — distributed moments,
model-sized driver math):

1. :func:`embedding_moments` — ONE linear scan: two chained
   ``posexplode`` generators expand each row to its d(d+1)/2 upper-tri
   dimension pairs IN THE PIPELINE (no join, no per-row shuffle) and a
   (i, j)-keyed aggregate map-side-combines them to d(d+1)/2 total rows.
   All sums are exact fixed-point integers (``floor(x·micro)`` before
   summing — the aa_micro discipline), second moments as DECIMAL(38,0)
   (the degree_assortativity overflow bound: 10^12 rows × micro² terms
   ≫ 2^63), so the relation is bit-reproducible under any shuffle order
   and DuckDB-replayable (driver gate ``emb_moments``).
2. :func:`pca_whitening_model` — collects those d(d+1)/2 rows (model-
   sized: 2,080 at d=64), builds μ/Σ in float, and runs ``numpy.eigh``
   on the d×d matrix driver-side. The covariance is that of the
   micro-QUANTIZED embeddings — deterministic by construction; the
   quantization error is ~1e-6, far below embedding noise.
3. :func:`whiten_embeddings` — broadcast the (d, d+1)-sized model,
   apply x' = (x − μ) W ᵀ per Arrow batch with one numpy matmul
   (``mapInPandas``, no per-row Python).

Reference scope: duwamish has no embedding operators; this extends the
engine's similarity family (similarity.py) with the standard recall-
improving preprocessing step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import require_columns

DEFAULT_MICRO = 1_000_000


def embedding_moments(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    micro: int = DEFAULT_MICRO,
) -> DataFrame:
    """Exact fixed-point moment relation of the embedding matrix: one
    row per dimension pair ``(i, j)`` with ``i <= j`` (0-based):

        (i, j, n, s_i, s_j, s_ij)

    where ``s_i = Σ floor(x_i·micro)`` (BIGINT) and
    ``s_ij = Σ floor(x_i·micro)·floor(x_j·micro)`` (DECIMAL(38,0)).
    ``n`` = embedding count. Plan: two chained generators (no join),
    one (i, j)-keyed aggregate — linear in N·d², zero pre-aggregation
    shuffle, map-side combine to d(d+1)/2 rows.
    """
    require_columns(emb, (vec_col,), "emb")
    mic = (
        emb.select(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * F.lit(float(micro))).cast(
                    "long"
                ),
            ).alias("_m")
        )
    )
    ex = mic.select(F.posexplode("_m").alias("i", "xi"), F.col("_m"))
    pairs = ex.select(
        "i", "xi", F.posexplode("_m").alias("j", "xj")
    ).where(F.col("j") >= F.col("i"))
    xd = F.col("xi").cast("decimal(19,0)")
    yd = F.col("xj").cast("decimal(19,0)")
    return (
        pairs.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xi").alias("s_i"),
            F.sum("xj").alias("s_j"),
            F.sum(xd * yd).cast("decimal(38,0)").alias("s_ij"),
        )
        .select("i", "j", "n", "s_i", "s_j", "s_ij")
    )


@dataclass(frozen=True)
class WhiteningModel:
    """Model-sized whitening parameters: ``mean`` (d,), ``w`` (d, d) with
    rows scaled by 1/sqrt(λ+eps), ``eigvals`` (d,) ascending."""

    mean: np.ndarray
    w: np.ndarray
    eigvals: np.ndarray
    micro: int


def pca_whitening_model(
    spark: SparkSession,
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    micro: int = DEFAULT_MICRO,
    eps: float = 1e-6,
) -> WhiteningModel:
    """Fit PCA whitening from the exact moment relation: the only
    distributed work is :func:`embedding_moments`; the d×d eigh runs
    driver-side on the model-sized matrix (2,080 moments at d=64 —
    the kmeans_centroids small-model discipline)."""
    rows = embedding_moments(emb, vec_col=vec_col, micro=micro).collect()
    if not rows:
        raise ValueError("pca_whitening_model: empty embedding table")
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    s1 = np.zeros(d)
    s2 = np.zeros((d, d))
    for r in rows:
        i, j = r["i"], r["j"]
        s1[i] = float(r["s_i"])  # written d times with identical values
        s2[i, j] = s2[j, i] = float(r["s_ij"])
    mean_mic = s1 / n
    cov = (s2 / n - np.outer(mean_mic, mean_mic)) / (float(micro) ** 2)
    eigvals, eigvecs = np.linalg.eigh(cov)
    w = (eigvecs / np.sqrt(eigvals + eps)).T  # rows = scaled components
    return WhiteningModel(
        mean=mean_mic / float(micro), w=w, eigvals=eigvals, micro=micro
    )


def whiten_embeddings(
    emb: DataFrame,
    model: WhiteningModel,
    *,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Project every embedding through the whitening model:
    ``out = (x − μ) Wᵀ`` — one numpy matmul per Arrow batch
    (``mapInPandas``; the model rides the closure, broadcast once per
    executor). Output column replaces ``vec_col`` unless ``out_col``
    names a new one; all other columns pass through untouched."""
    require_columns(emb, (vec_col,), "emb")
    dst = out_col or vec_col
    mean, w = model.mean, model.w
    schema_parts = []
    for f in emb.schema.fields:
        if f.name == dst:
            schema_parts.append(f"{dst} array<float>")
        else:
            schema_parts.append(f"{f.name} {f.dataType.simpleString()}")
    if dst not in emb.columns:
        schema_parts.append(f"{dst} array<float>")
    schema = ", ".join(schema_parts)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = (x - mean) @ w.T
            pdf = pdf.copy()
            pdf[dst] = list(out.astype(np.float32))
            yield pdf

    import pandas as pd  # noqa: F401 — annotation namespace for kernel

    return emb.mapInPandas(kernel, schema=schema)
