"""Event-log operators — sessionization and tumbling-window rates.

A web-scale training-data pipeline ingests interaction/event logs next
to the document corpus (click streams for quality signals, error logs
for source health, usage events for mixture weighting). These are the
two canonical batch shapes over such a log; the streaming twins (live
rates with watermark, stateful dedup) live in ``streaming.py``.

Scale notes:

- ``sessionize`` shuffles once on the user key; the per-user window
  sort is bounded by that user's event count. A hot user (bot) makes
  one big partition-local sort, not a global one — the standard
  sessionization cost model. At 10^12 events the key is
  (user, day-bucket) pre-split if single users exceed memory; the
  operator takes any composite key via ``user_col``.
- ``event_window_rates`` is one map-side-combinable groupBy on
  (window_start, event_type) — fully linear, no window function at all
  (the tumbling bucket is integer arithmetic on epoch micros, so it is
  exactly SQL-replayable, unlike session windows which need the lag
  chain).

Determinism: all time arithmetic runs on BIGINT epoch micros extracted
timezone-independently — TIMESTAMP_NTZ columns (what Spark 4 reads from
naive parquet timestamps) are diffed against the NTZ epoch with
``timestamp_diff``, never cast through the session timezone, so the
integers equal DuckDB's ``epoch_us`` on the same parquet. Ties in the
per-user order fall back to the event id (total order). Float sums are
rounded to 6 places for the cross-engine gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duwamish_spark.graph import require_columns

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_micros(df: DataFrame, ts_col: str) -> F.Column:
    """BIGINT epoch micros from a timestamp column, timezone-independent:
    TIMESTAMP_NTZ (naive parquet) is wall-clock-diffed against the NTZ
    epoch (== DuckDB epoch_us on the same file); TIMESTAMP uses
    unix_micros (already an instant)."""
    dt = dict(df.dtypes).get(ts_col)
    c = F.col(ts_col)
    if dt == "timestamp_ntz":
        return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), c)
    return F.unix_micros(c)


def sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the user's previous event exceeds ``gap_minutes``. Returns one row
    per session: (user_id, session_idx, n_events, start_us, end_us,
    duration_micros[, total_value]); session_idx is 1-based in time
    order within the user; start_us/end_us are BIGINT epoch micros.
    """
    require_columns(events, (user_col, ts_col, id_col), "events")
    gap_us = int(gap_minutes) * 60 * 1_000_000
    us = epoch_micros(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    tagged = events.select(
        F.col(user_col).alias("user_id"),
        us.alias("_us"),
        F.col(id_col).alias("_eid"),
        *([F.col(value_col).alias("_val")] if value_col else []),
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy("_us", "_eid")
    sess = tagged.select(
        "user_id",
        "_us",
        *(["_val"] if value_col else []),
        F.sum("_new").over(w2).alias("session_idx"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_micros"),
    ]
    if value_col:
        aggs.append(F.round(F.sum("_val"), 6).alias("total_value"))
    return sess.groupBy("user_id", "session_idx").agg(*aggs)


def event_window_rates(
    events: DataFrame,
    *,
    window_minutes: int = 60,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts per event type: (window_start_us,
    event_type, n, [total_value]). The bucket is integer floor-division
    on epoch micros (NOT a window function), so the whole query is one
    map-side-combinable groupBy and the bucket boundary is bit-exact
    across engines."""
    require_columns(events, (ts_col, type_col), "events")
    win_us = int(window_minutes) * 60 * 1_000_000
    us = epoch_micros(events, ts_col)
    bucket = F.floor(us / F.lit(win_us)) * win_us
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("total_value"))
    return (
        events.select(
            bucket.cast("long").alias("window_start_us"),
            F.col(type_col).alias("event_type"),
            *([F.col(value_col)] if value_col else []),
        )
        .groupBy("window_start_us", "event_type")
        .agg(*aggs)
    )
