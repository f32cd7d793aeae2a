"""Time/timezone column helpers.

The reference stores UTC `timestamp without time zone` and converts to
Europe/Zurich at query time (trips_lambda.py:99,102). Spark mapping:
session timezone pinned to UTC (session.py) and explicit
from_utc_timestamp at the edges.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LOCAL_TZ = "Europe/Zurich"


def to_local(ts: Column, tz: str = LOCAL_TZ) -> Column:
    """UTC-naive timestamp -> local wall-clock timestamp (still naive).

    Equivalent of `ts AT TIME ZONE 'UTC' AT TIME ZONE 'Europe/Zurich'`
    (trips_lambda.py:99,102).
    """
    return F.from_utc_timestamp(ts, tz)


def duration_seconds(start: Column, end: Column) -> Column:
    """Exact difference in seconds (double, sub-second precise).

    Reference: EXTRACT(EPOCH FROM (t2-t1)) (trips_lambda.py:118,128).
    unix_micros keeps integer arithmetic until the final division, so
    there is no float drift against SQL engines that do the same.
    """
    return (F.unix_micros(end) - F.unix_micros(start)) / F.lit(1_000_000.0)


def duration_minutes(start: Column, end: Column) -> Column:
    """Reference: EXTRACT(EPOCH FROM (end-start))/60.0 (trips_lambda.py:118)."""
    return duration_seconds(start, end) / F.lit(60.0)
