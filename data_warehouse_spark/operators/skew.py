"""Skew-handling operators for hot keys (SCALE.md: "skewed keys ->
salting or AQE skew-join").

AQE's skew-join splitting (on by default in session.py) covers joins.
What AQE does NOT cover is a skewed AGGREGATION whose per-key state is
itself expensive — e.g. exact COUNT(DISTINCT) or collect-style aggs
over a key that owns 30% of a 100 TB table. `salted_agg` implements the
classic two-phase rewrite:

  phase 1: group by (key, salt) — the hot key's rows spread over
           `salt_buckets` reducers, each holding partial state;
  phase 2: group by key — merge the `salt_buckets` partials.

The result is identical for any decomposable aggregate (sum/count/
min/max and their compositions); the second shuffle carries only
`salt_buckets` rows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, salt_buckets): a hash of the whole
    row would be ideal but any well-spread deterministic value works;
    monotonically_increasing_id covers rows with identical content."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)))


def salted_agg(df: DataFrame, keys: list[str],
               partial_aggs: dict[str, Column],
               merge_aggs: dict[str, Column],
               salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    partial_aggs: name -> aggregate over raw rows (phase 1).
    merge_aggs:   name -> aggregate over phase-1 partials (phase 2),
                  referencing the phase-1 output columns by name.

    Example — exact mean under skew:
        salted_agg(df, ["k"],
                   {"s": F.sum("v"), "n": F.count(F.lit(1))},
                   {"s": F.sum("s"), "n": F.sum("n")})
        .withColumn("avg", F.col("s") / F.col("n"))
    """
    salted = with_salt(df, salt_buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()])
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()])
