"""Event-log operators: gap sessionization + tumbling-window rates —
brute replays and boundary pins.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from duwamish_spark.functions import event_window_rates, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
T0_US = int((T0 - dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000
MIN_US = 60 * 1_000_000


def _ev(eid, minutes, user=1, etype="click", value=1.5):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, float(value))


SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"


def test_sessionize_gap_boundaries(spark):
    rows = [
        _ev(0, 0), _ev(1, 10), _ev(2, 41),       # 10 -> 41 is 31 min > gap -> new session
        _ev(3, 71), _ev(4, 100),                 # 41->71 == 30min EXACTLY: NOT > gap -> same
        _ev(10, 0, user=2), _ev(11, 200, user=2),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r.user_id, r.session_idx): r.asDict()
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    # user 1: [0,10] | [41,71,100] (exact-gap events stay in-session)
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 1)]["duration_micros"] == 10 * MIN_US
    assert out[(1, 2)]["n_events"] == 3
    assert out[(1, 2)]["start_us"] == T0_US + 41 * MIN_US
    assert out[(1, 2)]["end_us"] == T0_US + 100 * MIN_US
    # user 2: two singleton sessions
    assert out[(2, 1)]["n_events"] == 1 and out[(2, 2)]["n_events"] == 1
    assert out[(1, 1)]["total_value"] == 3.0


def test_sessionize_same_ts_tiebreak_deterministic(spark):
    rows = [_ev(5, 0), _ev(3, 0), _ev(9, 0)]  # identical ts, ids decide order
    ev = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, sessionize(ev).collect()))
    b = sorted(map(tuple, sessionize(ev.repartition(5)).collect()))
    assert a == b
    assert len(a) == 1 and a[0][2] == 3  # one session, 3 events


def test_sessionize_ltz_timestamps_supported(spark):
    # same fixture through a TIMESTAMP (with-tz) column: the epoch
    # extraction dispatches to unix_micros and the sessions are identical
    rows = [_ev(0, 0), _ev(1, 10), _ev(2, 41)]
    ntz = spark.createDataFrame(rows, SCHEMA)
    ltz = ntz.withColumn("ts", F.col("ts").cast("timestamp"))
    a = sorted(map(tuple, sessionize(ntz, gap_minutes=30).collect()))
    b = sorted(map(tuple, sessionize(ltz, gap_minutes=30).collect()))
    assert a == b


def test_event_window_rates_buckets(spark):
    rows = [
        _ev(0, 0, etype="click", value=1.0),
        _ev(1, 59, etype="click", value=2.0),     # same 60-min bucket
        _ev(2, 60, etype="click", value=4.0),     # next bucket (boundary)
        _ev(3, 30, etype="error", value=8.0),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r.window_start_us, r.event_type): (r.n, r.total_value)
        for r in event_window_rates(ev, window_minutes=60).collect()
    }
    hour_us = 60 * MIN_US
    assert out[(T0_US, "click")] == (2, 3.0)
    assert out[(T0_US + hour_us, "click")] == (1, 4.0)
    assert out[(T0_US, "error")] == (1, 8.0)


def test_event_window_rates_linear_plan(spark):
    # no window function: the physical plan must be exchange+agg only
    ev = spark.createDataFrame([_ev(i, i) for i in range(50)], SCHEMA)
    plan = event_window_rates(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
