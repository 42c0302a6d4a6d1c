"""Deterministic graph sampling: bond-percolation snowball from seeds.

Extracting a representative subgraph is the standard prelude to
expensive whole-graph analytics at 10^12-edge scale (algorithm tuning,
parameter sweeps, visualization). The classic recipes — forest fire
(Leskovec & Faloutsos 2006), snowball/BFS sampling — are sequential
and RNG-stateful; the scalable, reproducible formulation is BOND
PERCOLATION + CLOSURE:

- every directed edge (u, v) is independently KEPT iff
  ``u32(md5(salt:u:v)) < p·2^32`` — a deterministic coin that is a
  pure function of (edge, salt), so the percolated subgraph is
  engine/partitioning-stable and re-runs are bit-identical
  (the hash_split contamination discipline applied to edges);
- the sample is everything reachable from the ``seeds`` through kept
  edges (multi-source BFS closure — the engine's ``reachable_set``
  machinery, E-bounded per round with a shrinking frontier).

With p=1 this degenerates to plain snowball/BFS sampling (the
``max_rounds`` hop cap is then the only cut); with seeds=all vertices
it degenerates to percolation component extraction. Like forest fire,
the expected burn spreads geometrically with branching factor
p·out-degree, so p tunes sample size exponentially.

Scale shape: the percolation filter is a zero-shuffle predicate pushed
into the edge scan; each closure round is one keyed join of the
frontier against the kept-edge relation + anti-join dedup (V-bounded
state rotation, localCheckpoint'ed). No driver-side row loops.
Reference scope: duwamish has no sampling operator; this extends the
engine's extraction family (contract_graph, reachable_set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import require_columns
from duwamish_spark.pregel import PregelResult

_U32_SPACE = 1 << 32


def percolation_edges(
    edges: DataFrame, *, p_ppm: int, salt: str = "burn"
) -> DataFrame:
    """The kept directed simple edges under the deterministic per-edge
    coin: distinct non-loop (src, dst) with u32(md5(salt:src:dst)) <
    p_ppm·2^32/10^6 (exact integer threshold)."""
    if not (0 <= p_ppm <= 1_000_000):
        raise ValueError(f"p_ppm must be in [0, 1e6], got {p_ppm}")
    require_columns(edges, ("src", "dst"), "edges")
    thr = p_ppm * _U32_SPACE // 1_000_000
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("dst").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .where(u < F.lit(thr))
    )


def percolation_sample(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    p_ppm: int = 500_000,
    salt: str = "burn",
    max_rounds: int = 10_000,
) -> PregelResult:
    """Snowball sample by bond percolation: state ``(id)`` — the seeds
    plus every vertex reachable from them through kept edges within
    ``max_rounds`` hops. ``halted`` reports closure (frontier empty);
    with ``halted=False`` the state is the exact ``max_rounds``-hop
    ball, which is itself a standard sample definition (fixed-depth
    snowball) — the driver oracle replays that fixed-round semantics.

    The induced sampled edge table is ``percolation_edges(edges,
    p_ppm=..., salt=...)`` semi-joined to the state on both endpoints
    (composition left to the caller so the vertex set can also induce
    over the UNPERCOLATED edges when the use case wants real
    connectivity among sampled vertices).
    """
    from duwamish_spark.algorithms.bowtie import reachable_set

    kept = percolation_edges(edges, p_ppm=p_ppm, salt=salt)
    reached, rounds, completed = reachable_set(
        spark, seeds, kept, max_rounds=max_rounds
    )
    return PregelResult(
        state=reached,
        supersteps=rounds,
        metrics=[],
        halted=completed,
        run_id="percolation_sample",
    )
