"""Shared helpers for oracle-parity queries (see parity_notes.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column, scale: int = 100) -> Column:
    """Fixed-decimal double -> exact scaled integer (Spark side).

    l_quantity/l_extendedprice/l_discount/l_tax etc. carry <=2 true
    decimals; x*100 is within 1e-10 of an integer, so a sign-matched
    half offset + truncation recovers it exactly — the same value as
    HALF_UP (half away from zero) ROUND in every engine, but it stays
    primitive double arithmetic in whole-stage codegen, where F.round
    on doubles drops into a per-value BigDecimal path (measured 25%
    off the whole a1 aggregate at 38M rows). The sign branch matters:
    account balances (c_acctbal) go negative.
    """
    c = F.col(col) if isinstance(col, str) else col
    scaled = c * scale
    return (scaled + F.when(scaled >= 0, F.lit(0.5))
            .otherwise(F.lit(-0.5))).cast("long")


def cents_sql(col: str, scale: int = 100) -> str:
    """DuckDB twin of :func:`cents`."""
    return f"CAST(ROUND(({col})*{scale}) AS BIGINT)"


def money_sum(col: str | Column, scale: int = 100) -> Column:
    """Exact SUM of a fixed-decimal column: integer-domain sum, one
    final division (order-independent, bit-identical across engines)."""
    return F.sum(cents(col, scale)) / F.lit(float(scale))


def money_sum_sql(col: str, scale: int = 100) -> str:
    return f"CAST(SUM({cents_sql(col, scale)}) AS BIGINT) / {float(scale)}"


def money_avg(col: str | Column, scale: int = 100) -> Column:
    """Exact-sum-based AVG: sum in integer domain, divide by scale then
    count (the same expression tree the SQL twin uses)."""
    return F.sum(cents(col, scale)).cast("double") / F.lit(float(scale)) / F.count(F.lit(1))


def money_avg_sql(col: str, scale: int = 100) -> str:
    return (f"CAST(CAST(SUM({cents_sql(col, scale)}) AS BIGINT) AS DOUBLE)"
            f" / {float(scale)} / COUNT(*)")


def scratch_dir(tag: str) -> str:
    """Process-scoped reusable scratch directory for sink/maintenance
    queries: one directory per (process, tag), WIPED on every call.

    Sink queries write a table copy per invocation; a fresh mkdtemp
    each time accretes unbounded /tmp in a long-lived driver (u5/u6
    rewrite the whole partitioned events table per call). Wiping a
    stable per-tag dir bounds that to one copy per query per process
    while still giving each invocation a clean slate (streaming
    checkpoint dirs included)."""
    import os
    import shutil

    from data_warehouse_spark.scratch import process_dir

    d = os.path.join(process_dir("dws_scratch"), tag)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def wide_sum(v, split: int = 1_000_000):
    """Overflow-safe exact SUM of large nonnegative integer products
    (cents^2/cents^3 operands), as a double: hi/lo split accumulation —
    two LONG sums (a manual 128-bit accumulator), recombined in double.

    A single LONG sum of cents^3 (~4e10/row) overflows at ~2.5e8 rows
    per group; DECIMAL(38,0) is safe but measured ~1.9x slower on the
    aggregate stage at 153M rows. Splitting v = hi*split + lo keeps
    both partial sums in LONG to ~1e16 rows per group at cents^3
    operands, at ~10% over the plain long sum.

    Exactness/parity requirements (both hold for every caller):
      - v must be NONNEGATIVE and < 2^53: then (v/split) rounds to a
        double whose truncation IS floor(v/split) — fractional parts
        are multiples of 1/split, far above the ulp — so Spark's
        truncating cast equals the oracle's integer // division.
        (DuckDB's CAST(double AS BIGINT) ROUNDS, so the SQL twin must
        use //, never a cast of the quotient.)
      - the hi/lo totals convert to double independently in both
        engines, so the recombined expression tree is IEEE-identical.
    """
    hi = (v / F.lit(float(split))).cast("long")
    lo = v - hi * split
    return (F.sum(hi).cast("double") * split + F.sum(lo).cast("double"))


def wide_sum_sql(expr: str, split: int = 1_000_000) -> str:
    """DuckDB twin of :func:`wide_sum` — integer // for the hi part
    (see wide_sum's cast-vs-round note)."""
    hi = f"(({expr}) // {split})"
    return (f"(CAST(SUM({hi}) AS DOUBLE) * {split} "
            f"+ CAST(SUM(({expr}) - {hi} * {split}) AS DOUBLE))")
