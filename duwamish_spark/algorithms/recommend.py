"""SGD matrix-factorization recommendations — the reference's third example
program (reference: example/Recommendations.java:31-186), re-expressed as
alternating DataFrame supersteps.

Exact semantics carried over (constants at Recommendations.java:35-39):

- tripartite graph: movie/user *feature* vertices (N-dim feature vector,
  every component init 1.0, Recommendations.java:122-128) and *rating*
  vertices (rating + residue, init residue 0, Recommendations.java:130-132);
  edges user→rating, rating→user (tagged USER), movie→rating, rating→movie
  (tagged MOVIE) (Recommendations.java:174-177);
- **even supersteps** (feature rounds, Recommendations.java:51-80):
  currentRound = s/2, currentFeature = currentRound/runsPerFeature; the
  receiving index steps back one feature on the first run of a new feature
  (Recommendations.java:60-62); newValue = old + Σ incoming updates,
  clamped to [-10, 10] (Recommendations.java:64-71); every feature vertex
  then sends its currentFeature component to its rating vertices
  (Recommendations.java:73-80);
- **odd supersteps** (rating rounds, Recommendations.java:81-116): each
  rating vertex receives exactly one USER and one MOVIE value;
  prediction = residue + u*m, error = learningRate * (rating - prediction)
  (Recommendations.java:94-95); it sends error*movieValue along its
  USER-tagged edge and error*userValue along its MOVIE-tagged edge
  (Recommendations.java:97-108); on the last run of a feature the residue
  folds in the prediction (Recommendations.java:111-113); MSE accumulator
  = Σ error² (Recommendations.java:115);
- total supersteps = featureCount * runsPerFeature * 2
  (Recommendations.java:183).

Dataflow note: the Pregel step contract computes messages from the current
state, but a rating round's messages depend on what the rating vertex
*received* — so received aggregates are materialized INTO the state
(``gsum`` for feature vertices, ``uval``/``mval`` for rating vertices), the
standard re-expression of message-carried dataflow as state columns. The
``repeated double featureVector`` maps to ``ArrayType(DoubleType)``
(examples.proto:21-26) updated positionally with ``F.transform``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.pregel import Pregel, PregelResult


def _feature_round(state: DataFrame, e_f2r: DataFrame, rf: int, cf: int, cap: float) -> DataFrame:
    """Even superstep: apply gradient sums at index rf, deliver component cf
    to rating vertices (stored as uval/mval)."""
    is_feat = F.col("kind") != "rating"
    old_rf = F.element_at("fvec", rf + 1)
    new_rf = F.greatest(
        F.lit(-cap), F.least(F.lit(cap), old_rf + F.coalesce("gsum", F.lit(0.0)))
    )
    updated = state.select(
        "id",
        "kind",
        F.when(
            is_feat,
            F.transform("fvec", lambda x, i: F.when(i == rf, new_rf).otherwise(x)),
        )
        .otherwise(F.col("fvec"))
        .alias("fvec"),
        "rating",
        "residue",
        "uval",
        "mval",
        F.lit(None).cast("double").alias("gsum"),
        F.lit(None).cast("double").alias("_mse"),
        F.lit(0).alias("_msgs"),
    )
    feats = updated.where(F.col("kind") != "rating").select(
        "id", "kind", F.element_at("fvec", cf + 1).alias("val")
    )
    msgs = feats.hint("shuffle_hash").join(e_f2r, feats["id"] == e_f2r["src"]).select(
        F.col("dst").alias("rid"), "kind", "val"
    )
    recv = msgs.groupBy("rid").agg(
        F.max(F.when(F.col("kind") == "user", F.col("val"))).alias("new_uval"),
        F.max(F.when(F.col("kind") == "movie", F.col("val"))).alias("new_mval"),
        F.count(F.lit(1)).alias("mcnt"),
    ).withColumnRenamed("rid", "id")
    return updated.join(recv.hint("shuffle_hash"), "id", "left").select(
        "id",
        "kind",
        "fvec",
        "rating",
        "residue",
        F.coalesce("new_uval", "uval").alias("uval"),
        F.coalesce("new_mval", "mval").alias("mval"),
        "gsum",
        "_mse",
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    )


def _rating_round(
    state: DataFrame, e_r2f: DataFrame, fold_residue: bool, learning_rate: float
) -> DataFrame:
    """Odd superstep: rating vertices compute prediction/error, send updates
    back along tagged edges (stored as gsum on feature vertices)."""
    is_rating = F.col("kind") == "rating"
    pred = F.col("residue") + F.col("uval") * F.col("mval")
    err = F.lit(learning_rate) * (F.col("rating") - pred)
    computed = state.select(
        "id",
        "kind",
        "fvec",
        "rating",
        F.when(is_rating & F.lit(fold_residue), F.col("residue") + pred)
        .otherwise(F.col("residue"))
        .alias("residue"),
        "uval",
        "mval",
        F.when(is_rating, err).alias("_err"),
        F.when(is_rating, err * err).alias("_mse"),
    )
    senders = computed.where(is_rating).select(
        "id", "_err", "uval", "mval"
    )
    msgs = senders.hint("shuffle_hash").join(
        e_r2f, senders["id"] == e_r2f["src"]
    ).select(
        F.col("dst").alias("fid"),
        F.when(F.col("tag") == "user", F.col("_err") * F.col("mval"))
        .otherwise(F.col("_err") * F.col("uval"))
        .alias("upd"),
    )
    sums = msgs.groupBy("fid").agg(
        F.sum("upd").alias("new_gsum"), F.count(F.lit(1)).alias("mcnt")
    ).withColumnRenamed("fid", "id")
    return computed.drop("_err").join(sums.hint("shuffle_hash"), "id", "left").select(
        "id",
        "kind",
        "fvec",
        "rating",
        "residue",
        "uval",
        "mval",
        F.col("new_gsum").alias("gsum"),
        "_mse",
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    )


def recommendations(
    spark: SparkSession,
    ratings: DataFrame,
    *,
    n_features: int = 10,
    runs_per_feature: int = 50,
    learning_rate: float = 0.001,
    cap: float = 10.0,
    checkpoint_dir: str | None = None,
    run_id: str = "recommend",
    reliable_interval: int = 50,
    num_partitions: int | None = None,
    resume: bool = False,
    max_supersteps: int | None = None,
) -> PregelResult:
    """Train per-feature SGD factors.

    ``ratings``: (user_id string, movie_id string, rating_id string,
    rating double). Result state rows: feature vertices (id, kind, fvec)
    and rating vertices (id, kind='rating', rating, residue).

    ``max_supersteps`` caps the run below the reference's full
    ``featureCount * runsPerFeature * 2`` schedule
    (Recommendations.java:183) — a fixed-round prefix of the same
    deterministic arithmetic, used by the SQL-oracled driver query.
    """
    e_f2r = (
        ratings.select(F.col("user_id").alias("src"), F.col("rating_id").alias("dst"))
        .unionAll(
            ratings.select(F.col("movie_id").alias("src"), F.col("rating_id").alias("dst"))
        )
    )
    e_r2f = (
        ratings.select(
            F.col("rating_id").alias("src"),
            F.col("user_id").alias("dst"),
            F.lit("user").alias("tag"),
        )
        .unionAll(
            ratings.select(
                F.col("rating_id").alias("src"),
                F.col("movie_id").alias("dst"),
                F.lit("movie").alias("tag"),
            )
        )
    )
    if num_partitions:
        e_f2r = e_f2r.repartition(num_partitions, "src")
        e_r2f = e_r2f.repartition(num_partitions, "src")
    e_f2r = e_f2r.persist(StorageLevel.MEMORY_AND_DISK)
    e_r2f = e_r2f.persist(StorageLevel.MEMORY_AND_DISK)
    e_f2r.count(), e_r2f.count()

    init_fvec = F.array(*[F.lit(1.0) for _ in range(n_features)])
    users = ratings.select(F.col("user_id").alias("id")).distinct().select(
        "id", F.lit("user").alias("kind")
    )
    movies = ratings.select(F.col("movie_id").alias("id")).distinct().select(
        "id", F.lit("movie").alias("kind")
    )
    feats = users.unionAll(movies).select(
        "id",
        "kind",
        init_fvec.alias("fvec"),
        F.lit(None).cast("double").alias("rating"),
        F.lit(None).cast("double").alias("residue"),
    )
    rverts = ratings.select(
        F.col("rating_id").alias("id"),
        F.lit("rating").alias("kind"),
        F.lit(None).cast("array<double>").alias("fvec"),
        F.col("rating").cast("double").alias("rating"),
        F.lit(0.0).alias("residue"),
    )
    init = feats.unionAll(rverts).select(
        "*",
        F.lit(None).cast("double").alias("uval"),
        F.lit(None).cast("double").alias("mval"),
        F.lit(None).cast("double").alias("gsum"),
        F.lit(None).cast("double").alias("_mse"),
        F.lit(0).alias("_msgs"),
    )
    if num_partitions:
        init = init.repartition(num_partitions, "id")

    def step(state: DataFrame, s: int) -> DataFrame:
        current_round = s // 2
        cf = current_round // runs_per_feature
        if s % 2 == 0:
            rf = cf
            if current_round % runs_per_feature == 0 and current_round != 0:
                rf -= 1  # fold the finished feature (Recommendations.java:60-62)
            return _feature_round(state, e_f2r, rf, cf, cap)
        fold = (current_round + 1) % runs_per_feature == 0
        return _rating_round(state, e_r2f, fold, learning_rate)

    metrics = {
        "mse": F.sum("_mse"),  # reference: MSE DoubleSumAccumulator
        "message_count": F.sum("_msgs"),
    }
    runner = Pregel(
        spark,
        step=step,
        metrics_exprs=metrics,
        halt=lambda m, s: False,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        reliable_interval=reliable_interval,
        max_supersteps=(
            max_supersteps
            if max_supersteps is not None
            else n_features * runs_per_feature * 2
        ),
    )
    try:
        res = runner.run(init, resume=resume)
        res.state = res.state.select("id", "kind", "fvec", "rating", "residue")
        return res
    finally:
        e_f2r.unpersist()
        e_r2f.unpersist()
