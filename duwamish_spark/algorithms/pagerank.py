"""PageRank with reference-exact semantics (reference: example/PageRank.java:37-126).

Semantics pinned to the reference:

- **unnormalized** update ``rank = (1-d) + d * Σ incoming`` with d = 0.85
  (reference: PageRank.java:48-54) — ranks sum ≈ V, not 1;
- every vertex starts at rank **1.0** (reference: PageRank.java:115);
- each out-edge carries ``rank / out_degree``; duplicate edges send
  duplicate messages, self-loops deliver to self
  (reference: PageRank.java:57-63);
- **dangling vertices send nothing — their mass is dropped, not
  redistributed** (the reference's send loop simply never runs,
  PageRank.java:58-63);
- halt on the L1 residual Σ|rank_s − rank_{s−1}| — the exact quantity the
  reference accumulates as ``PageRankChange`` (PageRank.java:65,102); the
  north rule sets the threshold at 1e-6;
- hard cap 200 supersteps (reference: PageRank.java:41,87,124).

Physical strategies (measured on the 100k-vertex / 6.35M-edge bench graph,
local[32]):

- ``shuffle`` — the 10^12-scale path. ``edges_w`` persisted pre-partitioned
  on ``src``; per superstep: state exchanges (V rows) to the edge
  partitioning, SHUFFLE_HASH join generates messages, map-side partial
  aggregation combines before the one E-bounded shuffle by ``dst``.
- ``broadcast`` — when the vertex state fits a broadcast (V ≤
  ``broadcast_max_vertices``): ``edges_w`` persisted pre-partitioned on
  ``dst``; the rank vector is broadcast each superstep, so message combine
  is PARTITION-LOCAL (partial+final hash aggregate in one codegen stage,
  zero message shuffle). ~2x faster at bench scale (0.64s vs 1.25s per
  superstep).
- ``auto`` — pick broadcast iff V ≤ broadcast_max_vertices (mirrors
  Spark's own broadcast-join selection).

With ``encode=True`` (default), string vertex ids are dictionary-encoded to
dense order-preserving longs once up front (graph.encode_vertices) and
decoded on the way out — fixed-width join/agg keys, ~1.6x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from duwamish_spark.graph import decode_state, out_degrees, prepare_encoding
from duwamish_spark.pregel import Pregel, PregelResult, combine_messages


def _edges_weighted(
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None,
    part_col: str = "src",
    partitioner=None,
    weight_col: str | None = None,
) -> DataFrame:
    from duwamish_spark.graph import partition_by

    if weight_col is None:
        deg = out_degrees(vertices, edges)
        ew = edges.join(
            deg.withColumnRenamed("id", "src"), "src"
        ).select("src", "dst", (F.lit(1.0) / F.col("out_degree")).alias("w"))
    else:
        # weighted graph: each out-edge carries weight/out-strength, the
        # standard generalization of 1/out_degree (reduces to it when all
        # weights are equal). Vertices whose out-strength is zero or
        # negative would make the division meaningless — weights must be
        # positive (ANSI mode turns a zero strength into a hard error).
        strength = edges.groupBy("src").agg(F.sum(weight_col).alias("_s"))
        ew = edges.join(strength, "src").select(
            "src", "dst", (F.col(weight_col) / F.col("_s")).alias("w")
        )
    if num_partitions:
        ew = partition_by(ew, num_partitions, part_col, partitioner)
    return ew


def _update(state: DataFrame, sums: DataFrame, damping: float, extra=None) -> DataFrame:
    # personalized teleport: state carries a `_p` column (Σ_p = V, so the
    # uniform vector `_p = 1` reduces exactly to the classic update) and the
    # restart mass lands as (1-d)·p_i instead of (1-d)·1
    personalized = "_p" in state.columns
    base = (
        F.lit(1.0 - damping) * F.col("_p")
        if personalized
        else F.lit(1.0 - damping)
    )
    # `extra` (dangling-redistribute share) joins INSIDE the damping factor:
    # rank = base + d·(Σ incoming + extra) — kept off the default path so the
    # reference-exact plan/arithmetic is untouched when extra is None
    incoming = F.coalesce("msum", F.lit(0.0))
    if extra is not None:
        incoming = incoming + extra
    new_rank = base + F.lit(damping) * incoming
    cols = [
        F.col("id"),
        new_rank.alias("rank"),
        F.abs(new_rank - F.col("rank")).alias("_delta"),
        F.coalesce("mcnt", F.lit(0)).alias("_msgs"),
    ]
    if personalized:
        cols.append(F.col("_p"))
    if "_dang" in state.columns:
        cols.append(F.col("_dang"))
    return state.join(sums.hint("shuffle_hash"), "id", "left").select(*cols)


def _dangling_share(state: DataFrame, n_verts: int) -> tuple[DataFrame, "F.Column"]:
    """(state ⨯ broadcast scalar, per-vertex share column) for the
    standard dangling-mass redistribution: D = Σ rank over out-degree-0
    vertices (from the PREVIOUS superstep's state), each vertex receives
    D/V inside the damping factor. One V-row aggregate + a broadcast
    scalar cross join per superstep — the same scalar-broadcast pattern
    as the HITS/modularity norms, never an E-row cost."""
    dm = state.agg(
        F.sum(F.when(F.col("_dang"), F.col("rank")).otherwise(F.lit(0.0))).alias("_dm")
    )
    return state.crossJoin(F.broadcast(dm)), F.col("_dm") / F.lit(float(n_verts))


def pagerank_step(
    state: DataFrame, edges_w: DataFrame, damping: float = 0.85, salt: int = 0,
    combine: str = "partial", n_verts: int | None = None,
) -> DataFrame:
    """One shuffle-strategy superstep: state(id, rank) → (id, rank, _delta, _msgs).

    ``shuffle_hash`` hints pin the physical strategy: the state side (V
    rows) is the hash-build side, so the persisted edge table — already
    hash-partitioned on ``src`` — is streamed with NO re-exchange, re-sort,
    or per-superstep broadcast rebuild. The only E-row shuffle left is the
    message combine itself (map-side partial aggregated; ``salt`` splits
    hot destinations across reducer sub-keys).
    """
    msgs = state.hint("shuffle_hash").join(
        edges_w, state["id"] == edges_w["src"]
    ).select("dst", (F.col("rank") * F.col("w")).alias("m"))
    sums = combine_messages(
        msgs, [("msum", "m", "sum"), ("mcnt", "m", "count")], key="dst", salt=salt,
        pre_shuffle=(combine == "raw"),
    ).withColumnRenamed("dst", "id")
    if "_dang" in state.columns:
        state, share = _dangling_share(state, n_verts)
        return _update(state, sums, damping, extra=share)
    return _update(state, sums, damping)


def pagerank_step_broadcast(
    state: DataFrame, edges_w: DataFrame, damping: float = 0.85,
    n_verts: int | None = None,
) -> DataFrame:
    """One broadcast-strategy superstep: edges are dst-partitioned, the rank
    vector is broadcast, message combine is partition-local (no shuffle)."""
    msgs = edges_w.join(F.broadcast(state), state["id"] == edges_w["src"]).select(
        "dst", (F.col("rank") * F.col("w")).alias("m")
    )
    sums = msgs.groupBy("dst").agg(
        F.sum("m").alias("msum"), F.count("m").alias("mcnt")
    ).withColumnRenamed("dst", "id")
    if "_dang" in state.columns:
        state, share = _dangling_share(state, n_verts)
        return _update(state, sums, damping, extra=share)
    return _update(state, sums, damping)


def pagerank(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_supersteps: int = 200,
    checkpoint_dir: str | None = None,
    run_id: str = "pagerank",
    reliable_interval: int = 10,
    num_partitions: int | None = None,
    salt: int | str = 0,
    halt_interval: int = 1,
    strategy: str = "auto",
    combine: str = "partial",
    encode: bool = True,
    broadcast_max_vertices: int = 5_000_000,
    resume: bool = False,
    initial_ranks: DataFrame | None = None,
    teleport: DataFrame | None = None,
    partitioner=None,
    weight_col: str | None = None,
    dangling: str = "drop",
) -> PregelResult:
    """Run PageRank to L1-residual convergence. Result state: (id, rank).

    ``dangling``: what happens to the rank mass of out-degree-0 vertices.
    ``"drop"`` (default) is REFERENCE-EXACT — the reference's send loop
    simply never runs for them (PageRank.java:58-63), so their mass
    vanishes. ``"redistribute"`` is the standard formulation (Page et al.
    1999): each superstep the previous ranks of dangling vertices are
    summed (D) and every vertex receives d·D/V alongside its inbound
    messages — total rank stays V exactly. Cost: one V-row aggregate +
    one broadcast-scalar cross join per superstep (the E-row message
    plan is unchanged); per-vertex danglingness is a boolean computed
    once at init, riding the state like the teleport column.

    ``initial_ranks`` (id, rank): warm start — seed from a previous
    converged run instead of 1.0 everywhere. When the corpus grows
    incrementally (new commits -> new files/edges), re-converging from the
    previous ranks takes a fraction of the supersteps of a cold start:
    vertices absent from the seed (new files) start at 1.0.

    ``teleport`` (id, weight): personalized PageRank — the restart mass
    lands on the given vertices proportionally to ``weight`` instead of
    uniformly. Weights are normalized so they sum to V (keeping the
    engine's unnormalized-rank convention: a uniform teleport vector is
    EXACTLY classic PageRank, rank-for-rank); vertices absent from
    ``teleport`` get zero restart mass and rank purely by inbound links.
    One extra V-sized join at init; per-superstep cost is unchanged (the
    teleport column rides the state, no extra shuffle).

    ``partitioner``: optional ``Column -> Column`` placement hook applied
    to the persisted edge table and the initial state (see
    graph.partition_by; reference: model/Partitioner.java:19-21). Results
    are partitioner-invariant (tested).

    ``weight_col``: name of a positive edge-weight column — each out-edge
    then carries ``rank * weight / out_strength`` instead of
    ``rank / out_degree`` (identical when all weights are equal). The
    normalization is computed once into the persisted edge table, so the
    per-superstep plan is unchanged: weighted PageRank costs exactly the
    same as unweighted.
    """
    from duwamish_spark.graph import require_columns

    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")
    if weight_col is not None:
        require_columns(edges, (weight_col,), "edges")
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be 'drop' or 'redistribute', got {dangling!r}")

    mapping = None
    verts, e = vertices, edges
    if encode:
        mapping, verts, e = prepare_encoding(
            spark, vertices, edges, num_partitions, checkpoint_dir, run_id, resume
        )

    n_verts = verts.count()
    use_broadcast = strategy == "broadcast" or (
        strategy == "auto" and n_verts <= broadcast_max_vertices
    )

    if salt == "auto":
        if use_broadcast:
            # broadcast combine is partition-local — salt is never used,
            # so skip the full-edge-table degree probe + driver collect
            salt = 0
        else:
            from duwamish_spark.graph import suggest_salt

            p = num_partitions or int(
                spark.conf.get("spark.sql.shuffle.partitions")
            )
            salt = suggest_salt(e, p)

    edges_w = _edges_weighted(
        verts, e, num_partitions, "dst" if use_broadcast else "src", partitioner,
        weight_col,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    edges_w.count()  # materialize once; reused every superstep

    if initial_ranks is not None:
        seed = initial_ranks.select("id", F.col("rank").alias("_seed"))
        if mapping is not None:
            m_enc = mapping.select(F.col("id"), F.col("vid"))
            seed = seed.join(m_enc, "id").select(
                F.col("vid").alias("id"), F.col("_seed")
            )
        init = verts.join(seed, "id", "left").select(
            "id", F.coalesce("_seed", F.lit(1.0)).alias("rank")
        )
    else:
        init = verts.select("id", F.lit(1.0).alias("rank"))
    if teleport is not None:
        require_columns(teleport, ("id", "weight"), "teleport")
        total = teleport.agg(F.sum("weight").alias("t")).collect()[0]["t"]
        if not total or total <= 0:
            raise ValueError("teleport weights must sum to a positive value")
        tp = teleport.select("id", (F.col("weight") * n_verts / total).alias("_p"))
        if mapping is not None:
            m_enc = mapping.select(F.col("id"), F.col("vid"))
            tp = tp.join(m_enc, "id").select(F.col("vid").alias("id"), "_p")
        init = init.join(tp, "id", "left").select(
            "id", "rank", F.coalesce("_p", F.lit(0.0)).alias("_p")
        )
    if dangling == "redistribute":
        # danglingness is structural — computed ONCE from the edge set,
        # then rides the state as a boolean (like the teleport column)
        srcs = e.select(F.col("src").alias("id")).distinct()
        init = init.join(
            srcs.withColumn("_has_out", F.lit(True)), "id", "left"
        ).withColumn("_dang", F.col("_has_out").isNull()).drop("_has_out")
    if num_partitions:
        from duwamish_spark.graph import partition_by

        init = partition_by(init, num_partitions, "id", partitioner)

    metrics = {
        # reference accumulators: PageRankChange / MaxPageRank / MinPageRank
        # (PageRank.java:102-104) + built-in message count
        "residual": F.sum("_delta"),
        "max_rank": F.max("rank"),
        "min_rank": F.min("rank"),
        "message_count": F.sum("_msgs"),
    }

    if use_broadcast:
        # chained (lazy) supersteps re-execute the upstream chain inside
        # each broadcast build, so recompute grows quadratically with the
        # chain depth; measured sweet spot is 4 (18.7M e/s vs 8.0M at 8 on
        # the SF=0.1 bench graph) — cap rather than let it degrade
        halt_interval = min(halt_interval, 4)
        step = lambda st, s: pagerank_step_broadcast(st, edges_w, damping, n_verts)  # noqa: E731
    else:
        step = lambda st, s: pagerank_step(st, edges_w, damping, salt, combine, n_verts)  # noqa: E731

    runner = Pregel(
        spark,
        step=step,
        metrics_exprs=metrics,
        halt=lambda m, s: m["residual"] < tol,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        reliable_interval=reliable_interval,
        max_supersteps=max_supersteps,
        halt_interval=halt_interval,
    )
    try:
        res = runner.run(init, resume=resume)
        if mapping is not None:
            res.state = decode_state(res.state, mapping, ("id",))
        return res
    finally:
        edges_w.unpersist()
