"""Structured Streaming surface: incremental edge ingest + live graph stats.

The BSP superstep loop is inherently batch-iterative (each superstep reads
the previous one's full state — there is nothing to stream there, and the
reference has no streaming surface at all; SURVEY.md §2.5). What IS
streaming-shaped at 10^12-file scale is the *front* of the pipeline: new
commits land continuously, and the engine should keep the edge table and
its summary statistics current without re-scanning the corpus. That is
what this module provides:

- :func:`stream_corpus` — `readStream` over the corpus table directory
  (new parquet files = new commits).
- :func:`stream_extract_edges` — the SAME vectorized Arrow parser as the
  batch path (`parse.extract_edges` is a pure DataFrame transform, so it
  composes with a streaming DataFrame unchanged) writing an append-only
  edge table. Graph algorithms then run batch supersteps over the current
  snapshot of that table.
- :func:`streaming_degree_counts` — continuously-maintained in/out-degree
  (stateful aggregation, update mode): the hub-detection input for salting
  decisions.
- :func:`streaming_edge_rates` — per-window edge-arrival rates with a
  watermark for late data.

All of it is plain `readStream → transform → writeStream`; state lives in
the streaming state store, checkpointed to `checkpoint_dir` exactly like
the Pregel loop checkpoints vertex state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duwamish_spark.parse import extract_edges
from duwamish_spark.sources import CORPUS_COLUMNS

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def stream_corpus(spark: SparkSession, location: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming read of the corpus directory (each new parquet file is a
    micro-batch of newly-landed commits)."""
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(location)
    return df.select(*CORPUS_COLUMNS)


def stream_extract_edges(corpus_stream: DataFrame) -> DataFrame:
    """The batch parser applied to a streaming corpus — identical kernel,
    append-only output (stateless transform: safe in append mode)."""
    return extract_edges(corpus_stream)


def streaming_degree_counts(edges_stream: DataFrame) -> DataFrame:
    """Continuously-maintained degree table ``(id, out_degree, in_degree)``.

    Stateful streaming aggregation — emit with ``outputMode("update")`` or
    ``"complete"``. At scale this is the live hub-detection feed for the
    salting decision (pregel.combine_messages salt path).
    """
    ends = edges_stream.select(
        F.col("src").alias("id"), F.lit(1).alias("out"), F.lit(0).alias("in")
    ).unionAll(
        edges_stream.select(
            F.col("dst").alias("id"), F.lit(0).alias("out"), F.lit(1).alias("in")
        )
    )
    return ends.groupBy("id").agg(
        F.sum("out").alias("out_degree"), F.sum("in").alias("in_degree")
    )


def streaming_edge_rates(
    edges_stream: DataFrame,
    event_time_col: str = "event_time",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Edge-arrival counts per event-time window with late-data watermark.

    The input stream must carry an ``event_time`` timestamp column (at
    deploy time: the commit timestamp).
    """
    return (
        edges_stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(F.col("w.start").alias("window_start"), "n_edges")
    )


def streaming_dedup(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ttl: str | int | None = None,
    baseline: DataFrame | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit each document the FIRST time its
    content hash is seen, across micro-batches — the custom stateful
    operator surface (``applyInPandasWithState``): one state entry per
    content hash in the streaming state store, checkpointed like all
    other state, so the dedup survives restarts and the corpus only ever
    pays for first occurrences downstream.

    Output: (doc_id, text_hash) of first occurrences, append mode.
    Within a batch, ties break to the smallest doc_id (deterministic).

    **State-size story at 100 TB** — with neither knob below, the state
    store holds one ~50-byte entry per distinct hash FOREVER (10^12 docs
    → ~50 TB of streaming state: untenable). Two complementary bounds:

    ``ttl``: processing-time timeout (``"10 minutes"`` or ms int) — a hash
    unseen for `ttl` is evicted, so state size is bounded by the distinct
    hashes of the ACTIVE window, at the cost of re-admitting a duplicate
    whose original landed more than `ttl` ago. The timeout refreshes on
    every sighting (LRU semantics).

    ``baseline``: a STATIC table of already-seen hashes (column
    ``text_hash``) joined as a stream-static LEFT ANTI filter *before*
    the stateful operator — the compaction path: periodically drain this
    operator's own output into the baseline table (plain parquet append:
    its (doc_id, text_hash) rows ARE the hash table), restart the stream
    with the grown baseline and a fresh checkpoint, and the streaming
    state shrinks to only what arrived since the last compaction. TTL +
    compaction together give EXACT dedup with bounded state: the static
    side scales as a parquet table (cheap, columnar, partitionable),
    not as per-key state-store entries.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms: int | None = None
    if ttl is not None:
        if isinstance(ttl, int):
            ttl_ms = ttl
        else:
            qty, unit = ttl.split()
            ttl_ms = int(
                float(qty)
                * {
                    "millisecond": 1, "milliseconds": 1,
                    "second": 1000, "seconds": 1000,
                    "minute": 60_000, "minutes": 60_000,
                    "hour": 3_600_000, "hours": 3_600_000,
                }[unit]
            )

    hashed = docs_stream.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_hash"),
    )
    if baseline is not None:
        hashed = hashed.join(
            baseline.select("text_hash").distinct(), "text_hash", "left_anti"
        )

    def first_occurrence(key, pdfs, state):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # refresh on sighting (LRU)
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                cand = pdf["doc_id"].astype(str).min()
                best = cand if best is None or cand < best else best
        if best is None:
            return
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"doc_id": [best], "text_hash": [key[0]]})

    return hashed.groupBy("text_hash").applyInPandasWithState(
        first_occurrence,
        outputStructType="doc_id string, text_hash string",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_enrich_edges(
    edges_stream: DataFrame,
    attrs_stream: DataFrame,
    *,
    edge_time_col: str = "event_time",
    attr_time_col: str = "attr_time",
    watermark: str = "30 seconds",
    max_lag: str = "60 seconds",
) -> DataFrame:
    """Stream-stream watermark join: enrich the live edge stream with a
    slowly-changing vertex-attribute stream (host reputation, language
    re-detection, license re-scan — the attributes a crawler re-emits).

    ``attrs_stream`` must carry ``(id, <attr_time_col>, attribute
    columns...)``. An edge joins every attribute version for its ``src``
    whose timestamp lies in ``[edge_time − max_lag, edge_time]`` — the
    event-time RANGE condition Spark requires to bound stream-stream
    join state: each side is watermarked, and a buffered edge/attribute
    can be evicted once the other side's watermark passes its eligible
    window (state is bounded by max_lag × arrival rate, not by history).
    Downstream code wanting only the LATEST version takes a max over
    ``attr_time`` per edge (a separate stateful agg kept out of this
    operator on purpose — composability and state isolation).

    Batch equivalence: running the SAME join condition over the two
    bounded tables gives identical rows (pytest-gated on a bounded
    replay); streaming only adds late-arrival eviction beyond the
    watermark.

    Scale shape: the join is key-partitioned on (src = id) by the
    engine's stream-stream join exchange; a hub vertex's attribute row
    fan-out is bounded by its in-window edge arrivals — the same skew
    surface as the batch combine, handled by the same salting decision
    upstream if a hub host dominates a micro-batch.
    """
    e = edges_stream.withWatermark(edge_time_col, watermark)
    a = attrs_stream.withWatermark(attr_time_col, watermark).withColumnRenamed(
        "id", "_attr_id"
    )
    cond = (
        (F.col("src") == F.col("_attr_id"))
        & (F.col(attr_time_col) <= F.col(edge_time_col))
        & (
            F.col(attr_time_col)
            >= F.expr(f"{edge_time_col} - interval {max_lag}")
        )
    )
    return e.join(a, cond, "inner").drop("_attr_id")


def run_to_table(
    stream: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Drain all currently-available input into an in-memory sink (tests /
    local ops). At deploy time the sink is a parquet/Iceberg table — same
    writeStream call with ``format('parquet').option('path', ...)``."""
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_sessionize(
    events_stream: DataFrame,
    *,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    event_time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization — the live counterpart of the
    batch ``functions.events.sessionize``: Spark's built-in
    ``session_window`` merges a user's events into sessions that extend
    while consecutive events arrive within ``gap``, and the watermark
    bounds session state (a session whose close time falls behind the
    watermark is finalized and its state evicted — the TTL discipline
    of ``streaming_dedup``, here enforced by the engine itself).

    One row per closed session: ``(user_id, session_start, session_end,
    n_events)``. Session identity matches the batch operator (same gap
    rule; ``session_end`` here is last-event + gap, Spark's window-end
    convention, vs the batch op's last-event timestamp — tested
    equivalent modulo that constant).

    Scale shape: state is per-OPEN-session (user-keyed), not per-event;
    merging is the engine's native session-window state store operation
    and partial aggregation applies map-side. At 10^12 events/day the
    watermark is the knob that caps state to the live-session working
    set.
    """
    return (
        events_stream.withWatermark(event_time_col, watermark)
        .groupBy(
            F.session_window(F.col(event_time_col), gap).alias("w"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
