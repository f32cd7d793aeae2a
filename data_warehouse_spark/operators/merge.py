"""Upsert / MERGE semantics without a transactional table format.

The reference's load side is `INSERT ... ON CONFLICT (bike_id,
trip_start) DO UPDATE SET ...` (trips_lambda.py:180-206) — idempotent
daily re-runs over a sliding window. Spark has no ON CONFLICT; the
engine provides the standard two rewrites:

  upsert(old, new, keys) — "new wins": keep every new row, plus old
  rows whose key doesn't appear in new. One left-anti hash join + a
  union; both sides stream, no driver state.

  dedup_latest(df, keys, order_col) — collapse to the newest row per
  key via row_number()=1 (used when multiple new versions arrive in
  one batch).

At 100 TB the upsert writes via dynamic partition overwrite: only the
date partitions containing changed keys rewrite (the reference's
24h-window re-run maps to exactly one or two partitions), not the
whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """INSERT ... ON CONFLICT(keys) DO UPDATE equivalent: every row of
    `new`, plus rows of `old` whose key is absent from `new`.

    Columns must match. Idempotent: upsert(upsert(o, n), n) ==
    upsert(o, n).
    """
    survivors = old.join(new.select(*keys).distinct(), on=keys, how="left_anti")
    return survivors.unionByName(new)


def dedup_latest(df: DataFrame, keys: list[str], order_col: str,
                 tiebreak: str | None = None) -> DataFrame:
    """Newest row per key (PK semantics for batches with duplicates)."""
    order = [F.col(order_col).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def dedup_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """PK-rejection dedup (bike_lambda.py:46): arbitrary-but-single row
    per key, as dropDuplicates."""
    return df.dropDuplicates(keys)


def merge_into_partitioned(spark, target_path: str, new: DataFrame,
                           keys: list[str], ts_col: str) -> None:
    """The 100 TB upsert: MERGE `new` into a dt-partitioned parquet
    table rewriting ONLY the date partitions `new` touches.

    1. the affected dates are computed from `new` (a tiny distinct);
    2. only those partitions of the target are read back (partition
       pruning — O(days touched), not O(table));
    3. upsert(old_slice, new) writes back with dynamic partition
       overwrite, so untouched partitions' files are never rewritten.

    This is the reference's idempotent 24h-window re-run
    (trips_lambda.py:186-206,218-221) at warehouse scale: a daily batch
    rewrites one or two partitions of an arbitrarily large fact table.
    Requires spark.sql.sources.partitionOverwriteMode=dynamic (set here
    per-write via the DataFrameWriter option).
    """
    from pyspark.sql import functions as F

    new_dt = new.withColumn("dt", F.to_date(F.col(ts_col)))
    dates = [r.dt for r in new_dt.select("dt").distinct().collect()]

    try:
        old = spark.read.parquet(target_path).filter(F.col("dt").isin(dates))
        merged = upsert(old, new_dt.select(*old.columns), keys=keys)
    except Exception:  # first load: target does not exist yet
        merged = new_dt

    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("dt").parquet(target_path))
