"""Strongly connected components — directed link-graph structure.

The import/include graph the north rule targets is *directed*; CC on the
symmetrized graph answers "which files are transitively related" while SCC
answers "which files are mutually reachable" (circular-import clusters,
link farms on the web graph). The reference ships no SCC program — this
extends the engine's program set on the same superstep machinery as
CC/LP (reference semantics family: example/ConnectedComponents.java), but
over the *directed* edge set.

Algorithm: trim + forward-min coloring + backward confinement (the
"coloring" SCC algorithm of Orzan 2004, the standard BSP/MapReduce SCC
used in lieu of Tarjan — Tarjan's single DFS stack is inherently
sequential and cannot survive a 10^12-edge graph):

1. **Trim**: a vertex with no alive in-edge or no alive out-edge cannot
   sit on a cycle → it is its own singleton SCC. Peel iteratively (like
   k-core, `kcore.py`). On web-scale import graphs the overwhelming
   majority of SCCs are singletons in a near-DAG, so trimming assigns
   most of the graph in a few E-bounded rounds before any propagation
   runs — this is the 100 TB workhorse phase.
2. **Forward coloring**: hash-min propagation *along* edge direction to a
   fixpoint: ``c(v) = min id over vertices that reach v`` (seeded
   ``c(v)=v``). O(diameter) rounds, each one E-bounded shuffle — the
   exact cost model of hash-min CC.
3. **Backward confinement**: the root of a color class is the vertex
   ``r`` with ``c(r)=r`` (provably the minimum member of its SCC). Every
   vertex on any path back to ``r`` from a same-colored vertex is itself
   colored ``r``, so a frontier sweep along *reversed* same-color edges
   from all roots simultaneously marks exactly ``SCC(r)`` for every root
   ``r``. Assign ``scc_id = c(v)`` to the marked set, drop it, repeat
   from 1 with the residue.

Each outer round eliminates at least one SCC per surviving color class;
near-DAG graphs finish in 1-2 outer rounds (trim does the work), and the
pathological chain-of-SCCs case is guarded by ``max_rounds``.

Output contract: ``(id, scc_id)`` with ``scc_id`` = minimum member id of
the SCC — the same "label = component min" contract as
``connected_components`` (util/Comparators.java:26-33 ordering via the
order-preserving encode of graph.py), oracle-checked against a DuckDB
mutual-reachability closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import (
    decode_state,
    partition_by,
    prepare_encoding,
    require_columns,
)
from duwamish_spark.pregel import (
    PregelResult,
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def strongly_connected_components(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    *,
    max_rounds: int = 200,
    num_partitions: int | None = None,
    encode: bool = True,
    partitioner=None,
) -> PregelResult:
    """SCC of the directed graph. State: ``(id, scc_id)``, one row per
    vertex, ``scc_id`` = min member id.

    ``supersteps`` counts every E-bounded iteration (trim rounds +
    coloring rounds + confinement rounds across all outer passes) so the
    metric is comparable with the other iterative programs.
    ``halted=False`` iff ``max_rounds`` iterations elapsed with vertices
    still unassigned (the partial assignment is still exact for the
    vertices it covers; unassigned vertices are absent from the state).
    """
    require_columns(vertices, ("id",), "vertices")
    require_columns(edges, ("src", "dst"), "edges")

    mapping = None
    verts, e = vertices, edges
    if encode:
        mapping, verts, e = prepare_encoding(
            spark, vertices, edges, num_partitions
        )

    # directed simple edges: self-loops never affect SCC membership
    alive_e = (
        e.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    )
    if num_partitions:
        alive_e = partition_by(alive_e, num_partitions, "src", partitioner)
    alive_e = alive_e.transform(local_checkpoint_stats_reset)
    alive_v = verts.select("id").transform(local_checkpoint_stats_reset)

    assigned: list[DataFrame] = []  # each checkpointed (id, scc_id)
    metrics_hist: list[dict] = []
    steps = 0
    halted = False

    def _tick(kind: str, **kw) -> None:
        nonlocal steps
        steps += 1
        metrics_hist.append({"superstep": steps, "phase": kind, **kw})

    while steps < max_rounds:
        # ---- phase 1: trim (singleton SCCs: no in-edge or no out-edge)
        while steps < max_rounds:
            has_out = alive_e.select(F.col("src").alias("id")).distinct()
            has_in = alive_e.select(F.col("dst").alias("id")).distinct()
            keep = (
                alive_v.join(has_out, "id", "left_semi")
                .join(has_in, "id", "left_semi")
                .transform(local_checkpoint_stats_reset)
            )
            trivial = (
                alive_v.join(keep, "id", "left_anti")
                .select("id", F.col("id").alias("scc_id"))
                .transform(local_checkpoint_stats_reset)
            )
            n_trivial = trivial.count()
            _tick("trim", assigned=n_trivial)
            if n_trivial == 0:
                free_local_checkpoint(trivial)
                free_local_checkpoint(alive_v)
                alive_v = keep
                break
            assigned.append(trivial)
            nxt_e = (
                alive_e.join(keep, alive_e["src"] == keep["id"], "left_semi")
                .join(keep, alive_e["dst"] == keep["id"], "left_semi")
                .transform(local_checkpoint_stats_reset)
            )
            free_local_checkpoint(alive_e)
            free_local_checkpoint(alive_v)
            alive_e, alive_v = nxt_e, keep

        if alive_v.rdd.isEmpty():
            halted = True
            break
        if steps >= max_rounds:
            break

        # ---- phase 2: forward-min coloring to fixpoint
        color = alive_v.select("id", F.col("id").alias("c")).localCheckpoint(
            eager=True
        )
        while steps < max_rounds:
            msgs = (
                alive_e.join(color, alive_e["src"] == color["id"])
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("c").alias("mc"))
            )
            obs = Observation()
            nxt = (
                color.join(msgs, "id", "left")
                .select(
                    F.col("id"),
                    F.least("c", F.coalesce("mc", "c")).alias("c"),
                    (F.coalesce("mc", "c") < F.col("c")).alias("_chg"),
                )
                .observe(obs, F.sum(F.col("_chg").cast("long")).alias("chg"))
                .drop("_chg")
                .transform(local_checkpoint_stats_reset)
            )
            changed = int(obs.get["chg"] or 0)
            _tick("color", changed=changed)
            free_local_checkpoint(color)
            color = nxt
            if changed == 0:
                break
        if steps >= max_rounds and not halted:
            free_local_checkpoint(color)
            break

        # ---- phase 3: backward confinement along same-color edges
        cs = color.select(F.col("id").alias("src"), F.col("c").alias("c_src"))
        cd = color.select(F.col("id").alias("dst"), F.col("c").alias("c_dst"))
        same = (
            alive_e.join(cs, "src")
            .join(cd, "dst")
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .transform(local_checkpoint_stats_reset)
        )
        reached = (
            color.where(F.col("id") == F.col("c"))
            .select("id")
            .transform(local_checkpoint_stats_reset)
        )
        frontier = reached
        while steps < max_rounds:
            nf = (
                same.join(frontier, same["dst"] == frontier["id"], "left_semi")
                .select(F.col("src").alias("id"))
                .distinct()
                .join(reached, "id", "left_anti")
                .transform(local_checkpoint_stats_reset)
            )
            n_new = nf.count()
            _tick("confine", reached_new=n_new)
            if n_new == 0:
                free_local_checkpoint(nf)
                break
            nr = reached.unionAll(nf).transform(local_checkpoint_stats_reset)
            if frontier is not reached:
                free_local_checkpoint(frontier)
            free_local_checkpoint(reached)
            reached, frontier = nr, nf

        done = (
            reached.join(color, "id")
            .select("id", F.col("c").alias("scc_id"))
            .transform(local_checkpoint_stats_reset)
        )
        assigned.append(done)
        nxt_v = alive_v.join(done, "id", "left_anti").localCheckpoint(
            eager=True
        )
        nxt_e = (
            alive_e.join(done, alive_e["src"] == done["id"], "left_anti")
            .join(done, alive_e["dst"] == done["id"], "left_anti")
            .transform(local_checkpoint_stats_reset)
        )
        for tmp in (alive_v, alive_e, color, same, reached):
            free_local_checkpoint(tmp)
        if frontier is not reached:
            free_local_checkpoint(frontier)
        alive_v, alive_e = nxt_v, nxt_e
        if alive_v.rdd.isEmpty():
            halted = True
            break

    for tmp in (alive_v, alive_e):
        free_local_checkpoint(tmp)
    if assigned:
        state = assigned[0]
        for part in assigned[1:]:
            state = state.unionAll(part)
    else:
        state = verts.select(
            "id", F.col("id").alias("scc_id")
        ).where(F.lit(False))
    if mapping is not None:
        state = decode_state(state, mapping, ("id", "scc_id"))
    # single freeable checkpoint for the caller (decode folded in so the
    # plan is a bare LogicalRDD either way); release the per-pass parts
    # and the id mapping now — similarity.py IVF leak lesson: never hand
    # back a plan over pinned blocks the caller can't free
    state = state.transform(local_checkpoint_stats_reset)
    for part in assigned:
        free_local_checkpoint(part)
    if mapping is not None:
        free_local_checkpoint(mapping)
    return PregelResult(
        state=state,
        supersteps=steps,
        metrics=metrics_hist,
        halted=halted,
        run_id="scc",
    )
