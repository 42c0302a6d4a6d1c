"""Graph-table derivations shared by all algorithms (FIXTURES.md F2).

Conventions (pinned; they are correctness-relevant):

- ``vertices(id)``: one row per corpus file **and** per referenced id, so
  every message destination exists. This turns the reference's
  orphan-message hazard (a message to an unknown vertex stalls the shared
  cursor — reference: Partition.java:391-393) into defined drop/left-join
  semantics: unknown destinations simply never match a state row.
- ``edges(src, dst)``: directed, duplicates + self-loops preserved.
- ``degrees(id, out_degree)``: every vertex present, dangling vertices with
  0 (the reference keeps dangling vertices alive because the vertex file
  drives iteration; reference: Partition.java:196, PageRank.java:58-63).
- ``symmetrize``: undirected view for CC/LP — union of edges and reversed
  edges, self-loops dropped, deduplicated.
- ``canonical_edges``: undirected distinct ``src < dst`` pairs (triangles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertices_from(corpus_ids: DataFrame | None, edges: DataFrame) -> DataFrame:
    """``vertices(id)`` = corpus file ids ∪ edge endpoints, distinct.

    ``corpus_ids`` is a single-column DF of file ids (may be None when the
    graph comes straight from an edge list).
    """
    ids = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    if corpus_ids is not None:
        ids = ids.unionAll(corpus_ids.toDF("id"))
    return ids.distinct()


def corpus_vertex_ids(corpus: DataFrame) -> DataFrame:
    return corpus.select(F.concat_ws("/", "repo", "path").alias("id"))


def out_degrees(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """``(id, out_degree)`` with dangling vertices present at 0."""
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    return vertices.join(deg, "id", "left").select(
        "id", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
    )


def degree_histogram(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Log2-bucketed out-degree distribution: (bucket, n_vertices,
    min_degree, max_degree) with bucket = bit length of the out-degree
    (degree 0 → bucket 1, bin(0) = "0" in both Spark and DuckDB).

    The first thing run on a new 10^12-edge crawl: one groupBy over the
    degree table, all integers — skew diagnosis (how heavy is the hub
    tail) before choosing salt/partitioning knobs.
    """
    deg = out_degrees(vertices, edges)
    return deg.groupBy(
        F.length(F.bin("out_degree")).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.min("out_degree").alias("min_degree"),
        F.max("out_degree").alias("max_degree"),
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected adjacency for CC/LP: both directions, no self-loops, distinct."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()


def encode_vertices(vertices: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Order-preserving dense id encoding: ``(id, vid)`` with vid ∈ [0, V).

    ``vid`` order mirrors ``id`` order (range-partition → sort-within →
    per-partition offset + arange), so min/tie-break semantics over encoded
    labels are identical to the string semantics (the reference compares
    ids lexicographically, util/Comparators.java:26-33). Fully distributed:
    no global sort on one partition, no driver collect of ids — scales to
    10^12 vertices (the offsets collected are one long per partition).

    Why: superstep join/agg keys become fixed-width longs — hashing and
    shuffle bytes drop ~2-3x vs path strings.
    """
    import numpy as np
    import pandas as pd

    spark = vertices.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    id_type = vertices.schema["id"].dataType.simpleString()
    srt = (
        vertices.select("id")
        .repartitionByRange(p, "id")
        .sortWithinPartitions("id")
        .persist()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in srt.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bo = spark.sparkContext.broadcast(offsets)

    def assign(batches):
        from pyspark import TaskContext

        off = bo.value.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {"id": pdf["id"], "vid": np.arange(off, off + n, dtype=np.int64)}
            )
            off += n

    # localCheckpoint pins the assignment: the range-partition sampling ran
    # exactly once, and the mapping stays valid for lazy consumers (decode
    # joins) after upstream caches are dropped
    out = srt.mapInPandas(assign, f"id {id_type}, vid long").localCheckpoint(eager=True)
    srt.unpersist()
    return out


def encode_edges(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Translate (src, dst) to encoded vids via two mapping joins (one-time).
    Extra edge columns (weights, labels, ...) ride along unchanged."""
    m_src = mapping.select(F.col("id").alias("src"), F.col("vid").alias("svid"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("vid").alias("dvid"))
    extra = [c for c in edges.columns if c not in ("src", "dst")]
    return (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .select(F.col("svid").alias("src"), F.col("dvid").alias("dst"), *extra)
    )


def prepare_encoding(
    spark,
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str = "run",
    resume: bool = False,
):
    """(mapping, vertices_encoded, edges_encoded) with the mapping persisted
    to the checkpoint dir when one is set (so a resumed run reuses the SAME
    id assignment its checkpoints were written with)."""
    import os

    map_path = (
        os.path.join(checkpoint_dir, run_id, "mapping.parquet")
        if checkpoint_dir
        else None
    )
    if resume and map_path and os.path.exists(map_path):
        mapping = spark.read.parquet(map_path)
    else:
        mapping = encode_vertices(vertices, num_partitions)
        if map_path:
            mapping.write.mode("overwrite").parquet(map_path)
            mapping = spark.read.parquet(map_path)
    verts = mapping.select(F.col("vid").alias("id"))
    return mapping, verts, encode_edges(edges, mapping)


def decode_state(state: DataFrame, mapping: DataFrame, cols: tuple[str, ...] = ("id",)) -> DataFrame:
    """Translate encoded vid columns back to original ids (one join per col)."""
    out = state
    for c in cols:
        m = mapping.select(
            F.col("vid").alias(f"_{c}_vid"), F.col("id").alias(f"_{c}_orig")
        )
        out = out.join(m, out[c] == m[f"_{c}_vid"]).drop(c, f"_{c}_vid").withColumnRenamed(
            f"_{c}_orig", c
        )
    return out.select(*state.columns)


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected pairs with ``src < dst`` (triangle counting)."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    *,
    weight_col: str | None = None,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Quotient (coarsened) graph: map both endpoints of every edge through
    ``mapping(id, group)`` and collapse parallel edges into a weight —
    the page→host/page→domain contraction of web-graph analysis (a host
    graph is ~100-1000x smaller than its page graph, so host-level
    PageRank/CC/SCC run on a fraction of the data; pair with
    ``pagerank(weight_col="weight")`` for weighted host rank).

    - ``mapping``: ``(id, group)``; endpoints absent from the mapping keep
      their own id (``group`` must therefore be the same type as the edge
      endpoints). Partial mappings are legal — e.g. contract only one
      site's pages.
    - ``weight`` = number of original edges collapsed into the group pair,
      or ``sum(weight_col)`` when the input edges already carry weights
      (so contraction composes: contract(contract(e, m1), m2) keeps exact
      multiplicities).
    - ``drop_self_loops``: intra-group edges (the overwhelming majority on
      real web graphs — most links are site-internal) are dropped by
      default BEFORE the aggregation, so they never shuffle.

    Scale shape: two E⋈V hash joins (Catalyst broadcasts the mapping when
    it is small; AQE handles the skewed-group case) followed by one
    map-side-combinable groupBy on (src, dst) — linear in E, no all-pairs
    step anywhere. Output edges are distinct (src, dst) pairs.
    """
    require_columns(edges, ("src", "dst"), "edges")
    require_columns(mapping, ("id", "group"), "mapping")
    if weight_col is not None:
        require_columns(edges, (weight_col,), "edges")
    m_src = mapping.select(F.col("id").alias("src"), F.col("group").alias("_gs"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("group").alias("_gd"))
    w = F.col(weight_col) if weight_col is not None else F.lit(1).cast("long")
    e = (
        edges.join(m_src, "src", "left")
        .join(m_dst, "dst", "left")
        .select(
            F.coalesce("_gs", F.col("src")).alias("src"),
            F.coalesce("_gd", F.col("dst")).alias("dst"),
            w.alias("_w"),
        )
    )
    if drop_self_loops:
        e = e.where(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.sum("_w").alias("weight"))


def repo_mapping(corpus: DataFrame) -> DataFrame:
    """``(id, group)`` mapping from corpus file ids (``repo/path``, the
    ``corpus_vertex_ids`` convention) to their repo — the link-graph
    equivalent of the web's page→host mapping, for ``contract_graph``."""
    return corpus.select(
        F.concat_ws("/", "repo", "path").alias("id"), F.col("repo").alias("group")
    ).distinct()


def suggest_salt(
    edges: DataFrame,
    num_partitions: int,
    dst_col: str = "dst",
    factor: int = 2,
    cap: int = 64,
) -> int:
    """Pick a destination-salt factor from measured in-degree skew.

    A reducer partition averages E/P messages; a destination whose
    in-degree exceeds ``factor`` times that average dominates its reducer
    (the straggler), so spread it over ~4x ceil(max_in_degree / (E/P))
    sub-keys (capped — beyond ~64 the second-stage merge cost outweighs
    the balance gain). On the Zipf(1.3) hub graph this rule picks 12
    (measured 1.23x over unsalted; hand-tuned 32 reached 1.43x — the rule
    is deliberately conservative, BENCH/skew.json). Returns 0 (no salting) for
    balanced graphs. The decision is one E-row aggregation, run once per
    graph, and is exactly the statistic the streaming degree feed
    (streaming.streaming_degree_counts) maintains continuously.
    """
    import math

    row = (
        edges.groupBy(dst_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .collect()[0]
    )
    if not row["tot"]:
        return 0
    per_part = max(1, row["tot"] // max(num_partitions, 1))
    if row["mx"] > factor * per_part:
        return min(cap, 4 * math.ceil(row["mx"] / per_part))
    return 0


def partition_by(
    df: DataFrame,
    num_partitions: int,
    key_col: str,
    partitioner=None,
) -> DataFrame:
    """Explicit placement of a graph table — the engine's pluggable
    partitioner hook (reference: model/Partitioner.java:19-21, default
    util/HashPartitioner.java).

    ``partitioner``: optional ``Column -> Column`` mapping the routing-key
    column to a partition-key expression (range bucketing, modulo routing,
    locality grouping, ...). Default None = Spark hash partitioning on the
    key itself.

    Spark scope note (honest contract, not the reference's): this controls
    the PLACEMENT of persisted tables and checkpoints — where vertex/edge
    rows live between supersteps. Message routing inside a shuffle is
    always Spark's hash exchange on the join/groupBy key: a custom
    placement that differs from it costs one extra exchange per superstep,
    same as any Spark job whose storage partitioning differs from its
    shuffle partitioning.
    """
    expr = partitioner(F.col(key_col)) if partitioner is not None else F.col(key_col)
    return df.repartition(num_partitions, expr)


def require_columns(df: DataFrame, cols: tuple[str, ...], what: str) -> None:
    """Fail fast with a readable message instead of a deep Catalyst error."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"{what} is missing column(s) {missing}; found {list(df.columns)}"
        )
