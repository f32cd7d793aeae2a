from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from data_warehouse_spark.operators.sessionize import sessionize, with_session_id


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def test_session_ids_increment_on_gap(spark):
    rows = [
        Row(k="a", ts=_ts(0), v=1.0),
        Row(k="a", ts=_ts(1), v=1.0),   # gap 60s  -> same session
        Row(k="a", ts=_ts(30), v=1.0),  # gap 29m  -> new session (gap=600s)
        Row(k="b", ts=_ts(5), v=1.0),   # separate key
    ]
    df = spark.createDataFrame(rows)
    out = with_session_id(df, key="k", ts="ts", gap_seconds=600).collect()
    by = {(r.k, r.ts.minute): r.session_id for r in out}
    assert by[("a", 0)] == 1
    assert by[("a", 1)] == 1
    assert by[("a", 30)] == 2
    assert by[("b", 5)] == 1


def test_sessionize_aggregates_and_min_events(spark):
    rows = [
        Row(k="a", ts=_ts(0), v=2.0),
        Row(k="a", ts=_ts(1), v=3.0),
        Row(k="a", ts=_ts(30), v=9.0),  # singleton session -> dropped
    ]
    df = spark.createDataFrame(rows)
    out = sessionize(df, key="k", ts="ts", gap_seconds=600, value="v").collect()
    assert len(out) == 1
    s = out[0]
    assert s.n_events == 2
    assert s.sum_value == 5.0
    assert s.duration_sec == 60.0


def test_sessionize_invariant_gaps_bounded(spark, sf_dir):
    """Within a session, every inter-event gap <= threshold -> session
    duration <= (n_events - 1) * gap."""
    from data_warehouse_spark.io import load_table
    events = load_table(spark, sf_dir, "events")
    out = sessionize(events, key="user_id", ts="ts", gap_seconds=14400,
                     value="value", order_tiebreak="event_id").collect()
    assert len(out) > 0
    for r in out:
        assert r.duration_sec <= (r.n_events - 1) * 14400
