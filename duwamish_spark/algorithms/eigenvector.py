"""Eigenvector and Katz centrality — single-vector power iterations.

The reference ships PageRank as its ranking program (reference:
example/PageRank.java:37-126); eigenvector centrality is the
un-damped/un-normalized-out-degree ancestor of that ranking (Bonacich
1972) and Katz centrality its attenuated cousin (Katz 1953). Both drop
straight onto the engine's one-direction message machinery: HITS'
auth half-step (algorithms/hits.py) repeated on a single vector.

Semantics (deterministic, fixed evaluation order):

- eigenvector: ``x_0 = 1``; iteration ``i``:
  ``raw(v) = Σ_{u→v} x_{i-1}(u)`` then ``x_i = raw / ‖raw‖₂``.
  Vertices with no in-edges hold 0. Duplicate edges send duplicate
  messages and self-loops deliver to self (PageRank-message parity).
  Halt when ``Σ|x_i − x_{i-1}| < tol`` or at ``max_iters``. Converges
  to the principal eigenvector of Aᵀ when the graph is strongly
  connected & aperiodic; on general graphs it is the standard
  power-iteration estimate at the halt step (deterministic either way).
- katz: ``x_0 = beta``; iteration ``i``:
  ``x_i(v) = beta + alpha · Σ_{u→v} x_{i-1}(u)``.
  No normalization — bounded iff ``alpha < 1/λ_max``; the truncated
  series Σ_k alpha^k (Aᵀ)^k β at the halt step, exact and replayable.

Physical plan (the one you'd want at 10^12 edges): the edge table is
persisted once, pre-partitioned on ``src``; every iteration is exactly
ONE E-bounded exchange (the dst-keyed message combine) — the state side
streams through a SHUFFLE_HASH join against the persisted edges without
re-exchanging them, and the L2 norm / halt delta ride the materializing
state job as an Observation (the reference's accumulator reduce,
util/Accumulators.java, kept distributed). This is half of hits.py's
per-iteration cost: one direction instead of two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import (
    decode_state,
    partition_by,
    prepare_encoding,
    require_columns,
)
from duwamish_spark.pregel import (
    PregelResult,
    combine_messages,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def _power_iteration(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    update,  # (raw_col, norm_col) -> Column: new value expression
    init: float,
    needs_norm: bool,
    tol: float,
    max_iters: int,
    num_partitions: int | None,
    salt: int,
    encode: bool,
    partitioner,
    run_id: str,
) -> PregelResult:
    """Shared one-direction power-iteration driver (see module doc)."""
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    mapping = None
    verts, e = vertices, edges
    if encode:
        mapping, verts, e = prepare_encoding(
            spark, vertices, edges, num_partitions
        )

    e = e.select("src", "dst")
    if num_partitions:
        e = partition_by(e, num_partitions, "src", partitioner)
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    state = local_checkpoint_stats_reset(
        verts.select("id", F.lit(float(init)).alias("value"))
    )
    metrics_hist: list[dict] = []
    halted = False
    iters = 0
    try:
        for i in range(1, max_iters + 1):
            msgs = state.hint("shuffle_hash").join(
                e, state["id"] == e["src"]
            ).select("dst", F.col("value").alias("m"))
            raw = local_checkpoint_stats_reset(
                combine_messages(
                    msgs, [("raw", "m", "sum")], key="dst", salt=salt
                ).withColumnRenamed("dst", "id")
            )

            if needs_norm:
                norm = raw.agg(
                    F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("_n")
                )
            else:
                norm = spark.range(1).select(F.lit(1.0).alias("_n"))
            new_e = update(
                F.coalesce(F.col("raw"), F.lit(0.0)), F.col("_n")
            )
            prev = state
            obs = Observation()
            new_state = (
                prev.join(raw, "id", "left")
                .crossJoin(F.broadcast(norm))
                .select(
                    "id",
                    new_e.alias("value"),
                    F.abs(new_e - prev["value"]).alias("_delta"),
                    F.col("_n"),
                )
                # metrics ride the materializing job (pregel.py pattern);
                # project transient columns away BEFORE the checkpoint so
                # the kept state is a bare freeable LogicalRDD
                .observe(
                    obs,
                    F.sum("_delta").alias("d"),
                    F.first("_n").alias("n"),
                )
                .select("id", "value")
            )
            new_state = local_checkpoint_stats_reset(new_state)
            mrow = dict(obs.get)
            delta = float(mrow["d"] or 0.0)
            state = new_state
            for tmp in (prev, raw):
                free_local_checkpoint(tmp)
            iters = i
            metrics_hist.append(
                {
                    "superstep": i,
                    "delta": delta,
                    "norm": float(mrow["n"] or 0.0),
                }
            )
            if delta < tol:
                halted = True
                break

        if mapping is not None:
            state = decode_state(state, mapping, ("id",))
        return PregelResult(
            state=state,
            supersteps=iters,
            metrics=metrics_hist,
            halted=halted,
            run_id=run_id,
        )
    finally:
        e.unpersist()


def eigenvector_centrality(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    tol: float = 1e-6,
    max_iters: int = 50,
    num_partitions: int | None = None,
    salt: int = 0,
    encode: bool = True,
    partitioner=None,
) -> PregelResult:
    """Power-iteration eigenvector centrality to L1 convergence.

    Result state: (id, value) — the L2-normalized in-edge power-iteration
    vector at the halt step. ``salt`` splits hot aggregation keys across
    reducer sub-keys in the message combine (same knob and economics as
    pagerank/CC — see pregel.combine_messages).
    """

    def upd(raw, n):
        return F.when(n > 0.0, raw / n).otherwise(F.lit(0.0))

    return _power_iteration(
        spark, vertices, edges,
        update=upd, init=1.0, needs_norm=True,
        tol=tol, max_iters=max_iters, num_partitions=num_partitions,
        salt=salt, encode=encode, partitioner=partitioner,
        run_id="eigenvector",
    )


def katz_centrality(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    tol: float = 1e-6,
    max_iters: int = 50,
    num_partitions: int | None = None,
    salt: int = 0,
    encode: bool = True,
    partitioner=None,
) -> PregelResult:
    """Katz centrality ``x = beta·1 + alpha·Aᵀx`` by fixpoint iteration.

    Result state: (id, value) — the truncated attenuated-path series at
    the halt step (exact when halted; bounded iff ``alpha < 1/λ_max``).
    """

    def upd(raw, _n):
        return F.lit(float(beta)) + F.lit(float(alpha)) * raw

    return _power_iteration(
        spark, vertices, edges,
        update=upd, init=float(beta), needs_norm=False,
        tol=tol, max_iters=max_iters, num_partitions=num_partitions,
        salt=salt, encode=encode, partitioner=partitioner,
        run_id="katz",
    )
