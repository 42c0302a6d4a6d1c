"""TrustRank and spam mass — link-spam scoring over the web graph.

The reference ships plain PageRank as its ranking program (reference:
example/PageRank.java:37-126). At web scale the standard companion pass
is TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004): PageRank
whose restart mass is concentrated on a hand-audited trusted seed set,
so trust decays outward along links and pages reachable only from spam
farms get almost none. Spam mass (Gyöngyi et al., 2006) then compares
the two vectors: the fraction of a page's PageRank that does NOT arrive
through trusted paths.

Both passes are compositions of the engine's existing oracled PageRank
machinery (algorithms/pagerank.py):

- ``rank``  = classic PageRank (uniform teleport),
- ``trust`` = personalized PageRank with teleport weights on the seed
  set (normalized to sum V inside ``pagerank`` — the engine's
  unnormalized-rank convention, so a trusted-set-of-everyone run is
  EXACTLY classic PageRank, rank-for-rank),
- ``spam_mass`` = (rank − trust) / rank  (relative spam mass; negative
  for pages holding more trust than rank, e.g. the seeds themselves).

Physical plan: two independent PageRank runs (each the audited
one-E-bounded-exchange-per-superstep plan) plus ONE V-row equi-join at
the end — nothing here grows faster than a single PageRank at 10^12
edges, and the two runs share no state so a scheduler may overlap them.

`rank >= (1-d)` > 0 for every vertex under the classic uniform teleport,
so the division is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.algorithms.pagerank import pagerank


def spam_mass(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    trusted: DataFrame,
    *,
    damping: float = 0.85,
    tol: float = 0.0,
    max_supersteps: int = 10,
    checkpoint_dir: str | None = None,
    run_id: str = "spam_mass",
    num_partitions: int | None = None,
    strategy: str = "auto",
    partitioner=None,
) -> DataFrame:
    """Per-vertex ``(id, rank, trust, spam_mass)``.

    ``trusted``: the seed set — an ``(id)`` or ``(id, weight)``
    DataFrame (weights default to 1.0, i.e. uniform trust over seeds;
    they are normalized inside :func:`pagerank`). Must be non-empty.

    Both underlying runs use the same ``damping`` / ``tol`` /
    ``max_supersteps`` so the vectors are comparable at the same
    truncation of the power series. With ``tol=0.0`` (default) the pass
    is a fixed-superstep computation and exactly SQL-replayable; with a
    positive tol each run halts at its own L1 residual.
    """
    if "id" not in trusted.columns:
        raise ValueError("trusted must have an 'id' column")
    tp = (
        trusted
        if "weight" in trusted.columns
        else trusted.select("id", F.lit(1.0).alias("weight"))
    )
    if tp.isEmpty():
        raise ValueError("trusted seed set is empty")

    common = dict(
        damping=damping,
        tol=tol,
        max_supersteps=max_supersteps,
        checkpoint_dir=checkpoint_dir,
        num_partitions=num_partitions,
        strategy=strategy,
        partitioner=partitioner,
    )
    rank = pagerank(
        spark, vertices, edges, run_id=f"{run_id}_rank", **common
    ).state
    trust = (
        pagerank(
            spark,
            vertices,
            edges,
            teleport=tp,
            run_id=f"{run_id}_trust",
            **common,
        )
        .state.withColumnRenamed("rank", "trust")
    )
    return rank.join(trust, "id").select(
        "id",
        "rank",
        "trust",
        ((F.col("rank") - F.col("trust")) / F.col("rank")).alias("spam_mass"),
    )
