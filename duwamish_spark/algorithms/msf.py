"""Minimum spanning forest via distributed Borůvka rounds.

The MSF of the link graph is the "strongest-link backbone": with the
default weight = −(link multiplicity) per undirected pair, the forest
keeps, for every vertex, its most-strongly-connected attachment and
spans each component with the maximum-total-multiplicity tree — the
standard seed structure for hierarchical clustering / single-linkage
over a similarity graph (and the classic MapReduce graph primitive the
reference's engine family is usually benchmarked on).

Spark-first decomposition — Borůvka is two operations the engine
already has, alternated:

1. **min-edge selection**: every current component picks its minimum
   incident cross-component edge under the TOTAL order (w, u, v) — a
   groupBy-min over the component-projected edge relation (E-bounded,
   map-side combinable, the same cost shape as one hash-min superstep);
2. **contraction**: every component's selection is a parent pointer
   (c → the other endpoint's component), so the selection graph is a
   FUNCTIONAL graph — and with a total edge order its only cycles are
   mutual-selection 2-cycles (a longer cycle would need strictly
   decreasing weights all the way around). Contraction is therefore
   pointer doubling: break each 2-cycle toward the min id (making the
   structure a forest of rooted trees), then square the pointer until
   fixpoint — O(log depth) self-joins on a component-sized relation,
   no nested CC machinery. Chain-shaped selections (a path graph with
   monotone weights) are the worst case and still cost only
   log2(chain) jumps.

Each round at least halves the number of components, so there are at
most log2(V) rounds; the edge relation is RE-CONTRACTED each round
(groupBy (cu, cv) keeping the min original edge), so the per-round join
input shrinks with the component count rather than staying at |E|.

Tie-breaking by the total order (w, u, v) makes the forest UNIQUE, so
results are deterministic and the first round is exactly replayable by
a DuckDB window query (driver gate `boruvka_round1`); full convergence
is pytest-gated against a sequential Kruskal oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.graph import require_columns
from duwamish_spark.pregel import (
    free_local_checkpoint,
    local_checkpoint_stats_reset,
)


def weighted_canonical_edges(
    edges: DataFrame, weight_col: str | None = None
) -> DataFrame:
    """(u, v, w) distinct undirected simple pairs, u < v.

    Default weight is −multiplicity (BIGINT): more parallel links ⇒
    smaller weight ⇒ preferred by the minimum forest. With an explicit
    ``weight_col`` the pair weight is the MIN over its parallel arcs.
    Integer or otherwise, (w, u, v) is a total order, so every
    downstream min is deterministic.
    """
    require_columns(edges, ("src", "dst"), "edges")
    pairs = edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        *([F.col(weight_col).alias("_w")] if weight_col else []),
    )
    if weight_col:
        return pairs.groupBy("u", "v").agg(F.min("_w").alias("w"))
    return pairs.groupBy("u", "v").agg((-F.count(F.lit(1))).alias("w"))


def boruvka_min_edges(wedges: DataFrame) -> DataFrame:
    """Round-1 selection on singleton components: every vertex picks its
    minimum incident edge by (w, u, v); output is the distinct chosen
    edge set (u, v, w). This is the exactly-SQL-replayable unit the
    driver gate checks."""
    incident = wedges.select(F.col("u").alias("c"), "u", "v", "w").unionAll(
        wedges.select(F.col("v").alias("c"), "u", "v", "w")
    )
    sel = incident.groupBy("c").agg(F.min(F.struct("w", "u", "v")).alias("m"))
    return sel.select(
        F.col("m.u").alias("u"), F.col("m.v").alias("v"), F.col("m.w").alias("w")
    ).distinct()


def _contract_selection(sel: DataFrame, max_jumps: int = 64) -> DataFrame:
    """(c, root) for every selecting component: pointer-double the
    functional selection graph c -> m.oc to its tree roots.

    2-cycles (mutual selections — the only cycles, see module
    docstring) are first broken toward the min id, making every
    component a rooted tree (root points to itself); then p := p(p)
    until nothing changes. Each jump is one self-equi-join of a
    |components|-row relation.
    """
    par = sel.select(F.col("c"), F.col("m.oc").alias("p"))
    # break mutual selections toward the min id: c and p select each
    # other iff the pair (p, c) is also a parent row
    rev = par.select(F.col("p").alias("c"), F.col("c").alias("p"))
    par = (
        par.join(rev, ["c", "p"], "left_semi")
        .select("c", F.least("c", "p").alias("p"))
        .unionAll(par.join(rev, ["c", "p"], "left_anti"))
        .transform(local_checkpoint_stats_reset)
    )
    for _ in range(max_jumps):
        # p2(c) = p(p(c))
        nxt = (
            par.alias("a")
            .join(
                par.select(F.col("c").alias("p"), F.col("p").alias("p2")).alias("b"),
                "p",
            )
            .select(F.col("c"), F.col("p2").alias("p"), (F.col("p") != F.col("p2")).alias("ch"))
        )
        changed = nxt.where(F.col("ch")).limit(1).count()
        nxt = nxt.select("c", "p").transform(local_checkpoint_stats_reset)
        free_local_checkpoint(par)
        par = nxt
        if changed == 0:
            break
    out = par.select("c", F.col("p").alias("root")).transform(local_checkpoint_stats_reset)
    free_local_checkpoint(par)
    return out


@dataclass
class MSFResult:
    forest: DataFrame        # (u, v, w) — edges of the unique MSF
    components: DataFrame    # (id, comp) — final component label per vertex
    rounds: int
    metrics: list[dict] = field(default_factory=list)
    halted: bool = False

    def free(self) -> None:
        free_local_checkpoint(self.forest)
        free_local_checkpoint(self.components)


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    *,
    weight_col: str | None = None,
    max_rounds: int = 40,
    num_partitions: int | None = None,
) -> MSFResult:
    """Unique minimum spanning forest of the undirected simple graph
    under the total order (w, u, v). See module docstring for the
    round structure and scale argument.
    """
    p = num_partitions or spark.conf.get("spark.sql.shuffle.partitions")
    p = int(p)

    wedges = weighted_canonical_edges(edges, weight_col)
    # contracted edge state: (cu, cv, w, u, v) — current component
    # endpoints plus the original edge this contracted pair represents
    cur = (
        wedges.select(
            F.col("u").alias("cu"), F.col("v").alias("cv"), "w", "u", "v"
        )
        .repartition(p, "cu")
        .transform(local_checkpoint_stats_reset)
    )
    labels: DataFrame | None = None  # (id, comp); None = identity
    forest_parts: list[DataFrame] = []
    metrics: list[dict] = []
    halted = False
    rounds = 0

    for r in range(1, max_rounds + 1):
        n_cross = cur.count()
        if n_cross == 0:
            halted = True
            break
        rounds = r
        # 1. min incident cross edge per component, by (w, u, v); carry
        # the OTHER endpoint's component so the contraction graph can be
        # read straight off the selection (an edge merges its two
        # components even when only one of them chose it)
        incident = cur.select(
            F.col("cu").alias("c"), "w", "u", "v", F.col("cv").alias("oc")
        ).unionAll(
            cur.select(
                F.col("cv").alias("c"), "w", "u", "v", F.col("cu").alias("oc")
            )
        )
        sel = incident.groupBy("c").agg(
            F.min(F.struct("w", "u", "v", "oc")).alias("m")
        )
        chosen = (
            sel.select(
                F.col("m.u").alias("u"),
                F.col("m.v").alias("v"),
                F.col("m.w").alias("w"),
            )
            .distinct()
            .transform(local_checkpoint_stats_reset)
        )
        forest_parts.append(chosen)

        # 2. contraction: pointer-double the functional selection graph
        roots = _contract_selection(sel)

        # labels: id -> new root (components not in `sel` are finished —
        # they keep their label)
        if labels is None:
            labels = roots.select(F.col("c").alias("id"), F.col("root").alias("comp"))
        else:
            labels = labels.join(roots, labels.comp == roots.c, "left").select(
                "id", F.coalesce("root", "comp").alias("comp")
            )
        labels = labels.transform(local_checkpoint_stats_reset)

        # 3. re-contract the edge relation onto the merged components,
        # keeping one min original edge per (cu, cv) pair
        relab = roots
        nxt = (
            cur.join(relab.withColumnRenamed("c", "cu").withColumnRenamed("root", "ru"),
                     "cu", "left")
            .join(relab.withColumnRenamed("c", "cv").withColumnRenamed("root", "rv"),
                  "cv", "left")
            .select(
                F.coalesce("ru", "cu").alias("nu"),
                F.coalesce("rv", "cv").alias("nv"),
                "w", "u", "v",
            )
            .where(F.col("nu") != F.col("nv"))
            .select(
                F.least("nu", "nv").alias("cu"),
                F.greatest("nu", "nv").alias("cv"),
                "w", "u", "v",
            )
            .groupBy("cu", "cv")
            .agg(F.min(F.struct("w", "u", "v")).alias("m"))
            .select(
                "cu", "cv",
                F.col("m.w").alias("w"),
                F.col("m.u").alias("u"),
                F.col("m.v").alias("v"),
            )
            .repartition(p, "cu")
            .transform(local_checkpoint_stats_reset)
        )
        metrics.append(
            {
                "round": r,
                "cross_edges": n_cross,
                "chosen": chosen.count(),
                "components_merged": int(
                    roots.where(F.col("c") != F.col("root")).count()
                ),
            }
        )
        free_local_checkpoint(cur)
        free_local_checkpoint(roots)
        cur = nxt

    if cur is not None and not halted:
        # budget exhausted with cross edges left: forest is partial
        pass

    forest = forest_parts[0] if forest_parts else weighted_canonical_edges(
        edges, weight_col
    ).where(F.lit(False))
    for part in forest_parts[1:]:
        forest = forest.unionAll(part)
    forest = forest.distinct().transform(local_checkpoint_stats_reset)
    for part in forest_parts:
        free_local_checkpoint(part)
    free_local_checkpoint(cur)

    # final per-vertex component labels: vertices never touched by any
    # selection are isolated (label = self)
    verts = wedges.select(F.col("u").alias("id")).unionAll(
        wedges.select(F.col("v").alias("id"))
    ).distinct()
    if labels is None:
        comps = verts.select("id", F.col("id").alias("comp"))
    else:
        comps = verts.join(labels, "id", "left").select(
            "id", F.coalesce("comp", "id").alias("comp")
        )
    comps = comps.transform(local_checkpoint_stats_reset)
    if labels is not None:
        free_local_checkpoint(labels)

    return MSFResult(
        forest=forest,
        components=comps,
        rounds=rounds,
        metrics=metrics,
        halted=halted,
    )
