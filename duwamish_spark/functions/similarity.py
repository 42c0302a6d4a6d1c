"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; an LSH-bucketed
variant (random hyperplanes → band join) as the scale path — at 100 TB
the all-pairs cross join is quadratic and must be replaced by bucketing.
Everything is built-in higher-order functions (``zip_with`` /
``aggregate``) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


# above this row count the all-pairs cross join is the scale-killer, so
# `strategy="auto"` switches to the LSH-bucketed plan (mirrors pagerank's
# strategy="auto" broadcast/shuffle selection)
AUTO_LSH_THRESHOLD = 100_000


def knn_cosine(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    strategy: str = "auto",
    lsh_threshold: int = AUTO_LSH_THRESHOLD,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """(vec_id, neighbor_id, knn_rank, cos_sim) — cosine top-k.

    Deterministic ordering: similarity desc, then neighbor id asc.

    ``strategy``: ``"brute"`` = exact all-pairs (O(n²) — correctness
    baseline / small-N); ``"lsh"`` = :func:`knn_cosine_lsh` (bucketed,
    the 100 TB path, approximate); ``"auto"`` (default) counts rows once
    and picks brute below ``lsh_threshold``, LSH above — the default plan
    is never all-pairs at scale.
    """
    if strategy == "auto":
        strategy = "brute" if emb.count() <= lsh_threshold else "lsh"
    if strategy == "lsh":
        return knn_cosine_lsh(
            emb, k=k, n_planes=n_planes, seed=seed,
            id_col=id_col, vec_col=vec_col, dim=dim,
        )
    a = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "vec_id",
        "neighbor_id",
        cosine_sim_col(F.col("va"), F.col("vb")).alias("sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(
            "vec_id",
            "neighbor_id",
            "knn_rank",
            F.round("sim", 4).alias("cos_sim"),
        )
    )


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(id, bucket) — random-hyperplane LSH signature (cosine-preserving).

    Candidate generation for ANN: only same-bucket pairs are scored, so the
    join is keyed and linear-ish in practice instead of all-pairs.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return emb.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def knn_cosine_lsh(
    emb: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only same-LSH-bucket pairs."""
    buckets = lsh_buckets(emb, n_planes, seed, id_col, vec_col, dim)
    e = emb.join(buckets.withColumnRenamed("id", id_col), id_col)
    a = e.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "vec_id", "neighbor_id", cosine_sim_col(F.col("va"), F.col("vb")).alias("sim")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select("vec_id", "neighbor_id", "knn_rank", F.round("sim", 4).alias("cos_sim"))
    )


def label_centroids(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """(label, pos, v) — per-label centroid, flattened for stable comparison."""
    ex = emb.select(label_col, F.posexplode(vec_col).alias("pos", "x"))
    return ex.groupBy(label_col, "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("v")
    )


def embedding_near_dups(
    emb: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    lsh_threshold: int = AUTO_LSH_THRESHOLD,
    auto_planes: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim >= t).

    ``n_planes=None`` (default, auto): counts rows once — exact all-pairs
    below ``lsh_threshold`` (the verifier / small-N path), LSH with
    ``auto_planes`` hyperplanes above it, so the default plan is never
    all-pairs at scale.
    ``n_planes=0``: force exact all-pairs. ``n_planes>0``: force the
    LSH-bucketed path — random-hyperplane signatures prune the pair space
    first (same bucket => candidate), then exact cosine on candidates
    only; at 100 TB only the bucket join shuffles.
    ``id_a < id_b``; cos_sim rounded to 6 places.
    """
    if n_planes is None:
        n_planes = 0 if emb.count() <= lsh_threshold else auto_planes
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if n_planes:
        ba = lsh_buckets(emb, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
        bb = ba.select(F.col("id").alias("id_b"), F.col("bucket").alias("bucket_b"))
        cand = (
            ba.select(F.col("id").alias("id_a"), "bucket")
            .join(bb, F.col("bucket") == F.col("bucket_b"))
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine_sim_col(F.col("va"), F.col("vb"))
    return pairs.where(sim >= threshold).select(
        "id_a", "id_b", F.round(sim, 6).alias("cos_sim")
    )


def knn_lsh_recall(
    emb: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> float:
    """Recall of the LSH top-k against the brute-force top-k:
    |LSH ∩ exact| / |exact| over (vec_id, neighbor_id) pairs. The quality
    gate for the approximate scale path — run at a sampled SF, not on the
    full corpus (the exact side is O(n²))."""
    exact = knn_cosine(emb, k, id_col, vec_col, strategy="brute").select(
        "vec_id", "neighbor_id"
    )
    approx = knn_cosine_lsh(emb, k, n_planes, seed, id_col, vec_col, dim).select(
        "vec_id", "neighbor_id"
    )
    denom = exact.count()
    if denom == 0:
        return 1.0
    return exact.intersect(approx).count() / denom
