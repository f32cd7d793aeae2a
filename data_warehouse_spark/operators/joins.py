"""Composite join operators Spark lacks natively: as-of and range joins.

The reference implies both through its temporal-enrichment design (the
fact table's weather columns, trips_lambda.py:67-72, fed by
weather_data indexed on (city, timestamp), weather_lambda.py:47-49):
each trip needs the nearest-preceding weather reading per city.

Scale design: both operators avoid the O(n*m) broadcast-nested-loop
plan Spark would pick for a raw theta join.

- as-of join: union the two sides tagged, sort within one hash
  partitioning by (key, ts), and carry the right side's last values
  forward with last(ignorenulls) — one shuffle, no BNL, and works for
  arbitrarily large both sides (pd.merge_asof per group would need the
  whole key group in memory; last() streams).
- range join: bucketize the range key to coarse buckets, equi-join on
  (key, bucket) over the small enumeration of buckets a range spans,
  then apply the exact range predicate — turns BNL into a hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, left_ts: str,
              right_ts: str, value_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (per key `on`). Nulls where no prior right row.

    Implementation: tag and union both sides, then last(value,
    ignorenulls=True) over (partition by key order by ts, side, rid)
    with an unbounded-preceding frame. Left rows sort after right rows
    at equal ts (side 1 > 0) so an exactly-simultaneous right row is
    visible, matching e.g. DuckDB ASOF JOIN (ts >= match) semantics.

    Ties among right rows sharing (key, ts) are broken by a content
    hash of the right row (``__rid``): without it the window order is
    nondeterministic across shuffles, so repeated runs (or the oracle
    comparison) could see different winners. The hash is computed from
    the row's values, so the winner is stable no matter how the data is
    partitioned; the highest hash wins.

    The value columns ride in ONE struct, not per-column last()s: the
    struct is non-null for every right row even when its fields are
    null, so the winning right ROW is carried atomically. Independent
    per-column last(ignorenulls) would skip a genuine NULL in the most
    recent row and backfill it from an OLDER row — a chimera mixing
    columns of different right rows (and native ASOF JOIN semantics,
    which this must match, take the whole row).
    """
    if direction != "backward":
        raise ValueError("only backward as-of supported")
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")
    from pyspark.sql import types as T

    lcols = [c for c in left.columns]
    v_type = T.StructType([right.schema[c] for c in value_cols])
    tagged_r = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.xxhash64(*[F.col(c) for c in right.columns]).alias("__rid"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"), F.lit(0).cast("long").alias("__rid"),
        F.lit(None).cast(v_type).alias("__v"),
        *lcols,
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (Window.partitionBy("__k").orderBy("__ts", "__side", "__rid")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "*", F.last("__v", ignorenulls=True).over(w).alias("__f"))
    return (filled.filter(F.col("__side") == 1)
            .select(*lcols, *[F.col("__f")[c].alias(c) for c in value_cols]))


def range_join_bucketed(left: DataFrame, right: DataFrame,
                        left_val: str, range_lo: Column, range_hi: Column,
                        bucket_width: int, extra_key: str | None = None,
                        how: str = "inner") -> DataFrame:
    """Equi-join acceleration of `left.{left_val} BETWEEN right.lo AND
    right.hi` (optionally ANDed with an equality on extra_key).

    Explodes each right interval into the coarse buckets it overlaps
    (interval width is bounded in practice: reference weather readings
    are daily), then hash-joins on bucket and filters exactly. With AQE
    this is a shuffle or broadcast hash join, never a nested loop.

    Inner-only: the exact range predicate sits ABOVE the join, so an
    outer join's null-extended (or wrong-bucket) rows would be
    filtered right back out — accepting how='left' here would silently
    return inner-join results. An outer rewrite needs the predicate in
    the join condition itself.
    """
    if how != "inner":
        raise ValueError(
            f"range_join_bucketed supports how='inner' only, got {how!r} "
            "— the post-join exact filter drops outer-extended rows")
    lb = left.withColumn("__bucket", (F.col(left_val).cast("long") / bucket_width).cast("long"))
    rb = (right
          .withColumn("__lo", range_lo).withColumn("__hi", range_hi)
          .withColumn("__bucket", F.explode(F.sequence(
              (F.col("__lo").cast("long") / bucket_width).cast("long"),
              (F.col("__hi").cast("long") / bucket_width).cast("long")))))
    keys = ["__bucket"] + ([extra_key] if extra_key else [])
    joined = lb.join(rb, on=keys, how=how)
    return (joined
            .filter((F.col(left_val) >= F.col("__lo")) & (F.col(left_val) <= F.col("__hi")))
            .drop("__bucket", "__lo", "__hi"))
