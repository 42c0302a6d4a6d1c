"""k-core decomposition by iterative peeling — link-graph structure mining.

The k-core of a graph is the maximal subgraph in which every vertex has
degree ≥ k (Seidman 1983); cores are the standard way to strip the
low-degree fringe of a web/link graph before heavier analytics (dense
community detection, spam-farm isolation, crawl prioritization). The
reference has no such program — this extends the engine's program set on
the same machinery class as CC/LP (reference: example/ConnectedComponents
semantics family): an iterative frontier computation over the symmetrized
simple graph (both directions, self-loops removed, duplicate edges
collapsed — graph.symmetrize, the same adjacency CC and LP use).

Peel semantics (deterministic):

- round i: compute each alive vertex's degree among alive edges; drop
  every vertex with degree < k (all at once — the standard simultaneous
  peel, which makes the round count and the result independent of any
  tie-break order);
- halt when a round drops nobody; the survivors (with their final
  degrees) are exactly the k-core.

Physical plan: the alive edge set shrinks monotonically; each round is
one E-bounded groupBy (degree count) plus two anti-joins against the
just-dropped vertex set (small after the first round — broadcast-sized in
the common case, AQE picks that up). State is localCheckpoint'ed per
round and the previous round's blocks are freed immediately, so peak
storage is one copy of the alive edge set. At 10^12 edges the dominant
cost is the first two rounds (fringe removal); later rounds touch only
the surviving core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import (
    decode_state,
    partition_by,
    prepare_encoding,
    require_columns,
    symmetrize,
)
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def k_core(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 200,
    num_partitions: int | None = None,
    encode: bool = True,
    partitioner=None,
) -> PregelResult:
    """Peel to the k-core. Result state: (id, degree) for core members only
    (isolated vertices and the peeled fringe are absent — a vertex with no
    qualifying edges is not in any k≥1 core).

    Metrics per round: ``dropped`` (vertices peeled), ``alive_edges``.
    ``halted=True`` iff a fixpoint was reached within ``max_rounds``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    mapping = None
    verts, e = vertices, edges
    if encode:
        mapping, verts, e = prepare_encoding(
            spark, vertices, edges, num_partitions
        )

    alive = symmetrize(e)
    if num_partitions:
        alive = partition_by(alive, num_partitions, "src", partitioner)
    alive = alive.transform(local_checkpoint_stats_reset)

    metrics_hist: list[dict] = []
    halted = False
    rounds = 0
    deg = None
    for i in range(1, max_rounds + 1):
        # sym table holds both directions, so degree(v) = |rows with src=v|;
        # Σ degree IS the alive row count. Metrics ride the materializing
        # job via Observation (pregel.py pattern) — no extra job per round.
        obs = Observation()
        deg = (
            alive.groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("degree"))
            .observe(
                obs,
                F.sum(
                    F.when(F.col("degree") < k, 1).otherwise(0)
                ).alias("nd"),
                F.sum("degree").alias("ae"),
            )
            .transform(local_checkpoint_stats_reset)
        )
        dropped = deg.where(F.col("degree") < k).select("id")
        mrow = dict(obs.get)
        n_dropped = int(mrow["nd"] or 0)
        n_edges = int(mrow["ae"] or 0)
        rounds = i
        metrics_hist.append(
            {"superstep": i, "dropped": n_dropped, "alive_edges": n_edges}
        )
        if n_dropped == 0:
            halted = True
            free_local_checkpoint(alive)
            break
        nxt = (
            alive.join(dropped, alive["src"] == dropped["id"], "left_anti")
            .join(dropped, alive["dst"] == dropped["id"], "left_anti")
            .transform(local_checkpoint_stats_reset)
        )
        for tmp in (alive, deg):
            free_local_checkpoint(tmp)
        alive, deg = nxt, None

    if deg is None:  # max_rounds hit before fixpoint: degrees of last state
        deg = alive.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("degree")
        ).transform(local_checkpoint_stats_reset)
        free_local_checkpoint(alive)

    state = deg.where(F.col("degree") >= k)
    if mapping is not None:
        state = decode_state(state, mapping, ("id",))
    return PregelResult(
        state=state,
        supersteps=rounds,
        metrics=metrics_hist,
        halted=halted,
        run_id="kcore",
    )
