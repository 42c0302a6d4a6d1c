"""SALSA — the Stochastic Approach for Link-Structure Analysis
(Lempel & Moran 2000), the degree-normalized sibling of HITS.

The reference ships PageRank as its link-ranking program (reference:
example/PageRank.java:37-126); SALSA is the other classic web ranking —
a two-step random walk on the bipartite hub/authority graph — and drops
straight onto the engine's two-direction message machinery
(algorithms/hits.py) with the degree normalization folded into the
persisted edge tables exactly like weighted PageRank's
``rank·w/out_strength``.

Semantics (deterministic, fixed evaluation order):

- hubs H = vertices with ≥1 out-edge, authorities = vertices with ≥1
  in-edge (a vertex can be both);
- ``h_0(u) = 1/|H|`` for hubs, 0 otherwise; ``auth_0 = 0``;
- iteration ``i`` (the two halves of the bipartite walk step):

      auth_i(v) = Σ_{u→v} h_{i-1}(u) · wf(u),   wf(u) = 1/outdeg(u)
      hub_i(u)  = Σ_{u→v} auth_i(v) · wb(v),    wb(v) = 1/indeg(v)

- both transitions are row-stochastic, so ``Σ auth_i = Σ hub_i = 1``
  EXACTLY each iteration (up to fp rounding) — no normalization step
  exists to replay, unlike HITS;
- duplicate edges count with multiplicity on both the degree and the
  message side (mass conservation needs them consistent); self-loops
  deliver to self (PageRank-message parity);
- halt when ``Σ|auth_i − auth_{i-1}| + Σ|hub_i − hub_{i-1}| < tol`` or
  at ``max_iters``. On a connected support graph the stationary
  authority vector is ∝ indegree (Lempel & Moran Prop. 2); on general
  graphs per-component — the tests pin both.

Physical plan (the one you'd want at 10^12 edges): the edge table is
persisted twice with the degree weights PRE-FOLDED — ``(src, dst, wf)``
partitioned on ``src`` and ``(src, dst, wb)`` partitioned on ``dst`` —
so every iteration is exactly two E-bounded exchanges (the auth combine
by dst, the hub combine by src); the V-sized state streams through
SHUFFLE_HASH joins against the persisted edge sides without
re-exchanging them, and the halt delta / mass totals ride the
materializing state job as an Observation. Identical per-iteration
economics to hits.py; the degree joins run once at init.
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


def salsa(
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
    """Run SALSA to L1 convergence. Result state: (id, auth, hub).

    ``auth``/``hub`` are probability distributions over authorities/hubs
    (each sums to 1); vertices with no in-edges hold ``auth = 0``, no
    out-edges ``hub = 0``. ``salt`` splits hot aggregation keys across
    reducer sub-keys in both message combines (same knob and economics
    as pagerank/CC — see pregel.combine_messages).
    """
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    mapping = None
    verts, e = vertices, edges
    if encode:
        mapping, verts, e = prepare_encoding(
            spark, vertices, edges, num_partitions
        )

    e = e.select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    # degree weights folded into the persisted edge tables ONCE — the
    # per-iteration plan then matches unweighted HITS exactly (the same
    # trick as pagerank's weight_col: normalize at init, not per step)
    e_fwd = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("od")).alias("wf")
    )
    e_bwd = e.join(indeg, "dst").select(
        "src", "dst", (F.lit(1.0) / F.col("idg")).alias("wb")
    )
    if num_partitions:
        e_fwd = partition_by(e_fwd, num_partitions, "src", partitioner)
        e_bwd = partition_by(e_bwd, num_partitions, "dst", partitioner)
    e_fwd = e_fwd.persist(StorageLevel.MEMORY_AND_DISK)
    e_bwd = e_bwd.persist(StorageLevel.MEMORY_AND_DISK)
    e_fwd.count()
    e_bwd.count()

    n_hubs = outdeg.count()
    hubs = outdeg.select(F.col("src").alias("id"), F.lit(1).alias("_h"))
    state = (
        verts.join(hubs, "id", "left")
        .select(
            "id",
            F.lit(0.0).alias("auth"),
            F.when(F.col("_h").isNotNull(), F.lit(1.0 / max(n_hubs, 1)))
            .otherwise(F.lit(0.0))
            .alias("hub"),
        )
        .transform(local_checkpoint_stats_reset)
    )

    metrics_hist: list[dict] = []
    halted = False
    iters = 0
    try:
        for i in range(1, max_iters + 1):
            # auth half-step: forward walk hub→authority (E-shuffle by dst)
            amsgs = state.hint("shuffle_hash").join(
                e_fwd, state["id"] == e_fwd["src"]
            ).select("dst", (F.col("hub") * F.col("wf")).alias("m"))
            araw = combine_messages(
                amsgs, [("araw", "m", "sum")], key="dst", salt=salt
            ).withColumnRenamed("dst", "id").transform(local_checkpoint_stats_reset)

            # hub half-step: backward walk authority→hub (E-shuffle by src)
            hmsgs = araw.hint("shuffle_hash").join(
                e_bwd, araw["id"] == e_bwd["dst"]
            ).select("src", (F.col("araw") * F.col("wb")).alias("m"))
            hraw = combine_messages(
                hmsgs, [("hraw", "m", "sum")], key="src", salt=salt
            ).withColumnRenamed("src", "id").transform(local_checkpoint_stats_reset)

            auth_e = F.coalesce("araw", F.lit(0.0))
            hub_e = F.coalesce("hraw", F.lit(0.0))
            prev = state
            obs = Observation()
            new_state = (
                prev.join(araw, "id", "left")
                .join(hraw, "id", "left")
                .select(
                    "id",
                    auth_e.alias("auth"),
                    hub_e.alias("hub"),
                    (
                        F.abs(auth_e - prev["auth"])
                        + F.abs(hub_e - prev["hub"])
                    ).alias("_delta"),
                )
                # metrics ride the materializing job (pregel.py pattern);
                # the mass totals double as a conservation check — both
                # must stay 1.0 up to fp rounding every iteration
                .observe(
                    obs,
                    F.sum("_delta").alias("d"),
                    F.sum("auth").alias("am"),
                    F.sum("hub").alias("hm"),
                )
                .select("id", "auth", "hub")
                .transform(local_checkpoint_stats_reset)
            )
            mrow = dict(obs.get)
            delta = float(mrow["d"] or 0.0)
            state = new_state
            for tmp in (prev, araw, hraw):
                free_local_checkpoint(tmp)
            iters = i
            metrics_hist.append(
                {
                    "superstep": i,
                    "delta": delta,
                    "auth_mass": float(mrow["am"] or 0.0),
                    "hub_mass": float(mrow["hm"] or 0.0),
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
            run_id="salsa",
        )
    finally:
        e_fwd.unpersist()
        e_bwd.unpersist()
