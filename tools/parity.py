"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle at a given
sf dir, then compares row count, column-name sets, and values
(order-insensitive, column-name-sorted — the driver's described hash
semantics). Floats are compared exactly after the queries' own
round(…, 6) discipline, with a tolerance fallback reported separately
so near-misses are visible before the real gate runs.

Usage:
    python tools/parity.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from data_warehouse_spark.io import TABLES  # noqa: E402
from data_warehouse_spark.queries.registry import load_all  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str,
                    pattern: str = "{dir}/{t}.parquet",
                    skip_missing: bool = False) -> duckdb.DuckDBPyConnection:
    """Register every fixture table as a DuckDB view. `pattern` adapts
    the path layout (single-file fixtures vs floorfree's multi-part
    directories) so this stays the one view-registration helper.
    `skip_missing` tolerates absent tables (floorfree's table-limited
    amplified builds): DuckDB binds read_parquet eagerly at CREATE
    VIEW, so a missing table would otherwise fail registration of the
    whole connection; a query touching a skipped table still fails
    loudly (unknown view)."""
    import os

    con = duckdb.connect()
    # Optional memory ceiling (e.g. "70GB"): under a limit DuckDB
    # spills to its temp dir instead of growing until the kernel
    # OOM-kills the WHOLE python process (harness + partial results).
    # Used by the floorfree value sweeps, where a big oracle runs
    # co-resident with a Spark JVM; unset = DuckDB's default.
    lim = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if lim:
        con.sql(f"SET memory_limit='{lim}'")
    for t in TABLES:
        path = pattern.format(dir=sf_dir, t=t)
        if skip_missing and not os.path.exists(
                os.path.join(sf_dir, f"{t}.parquet")):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sort cols by name,
    normalize dtypes, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.map(lambda v: float(v) if hasattr(v, "as_tuple") else v)  # Decimal
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")  # engines differ on int width (len(), rank())
        elif s.dtype == "float32":
            s = s.astype("float64")
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_df) != len(duck_df):
        return False, f"row count {len(spark_df)} != {len(duck_df)}"
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return False, f"columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    a, b = _canon(spark_df), _canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes rendered values, so int64 1234 vs float64
        # 1234.0 is a hash MISMATCH even though numerically equal.
        # DuckDB returns HUGEINT for uncast SUM(BIGINT), which pandas
        # renders float64 — exactly how s9/s10/x14/x14b sailed through
        # two rounds of local parity while failing the driver. Fail
        # here the way the driver would (round-6 verdict ask #2).
        int_a = pd.api.types.is_integer_dtype(av)
        int_b = pd.api.types.is_integer_dtype(bv)
        if int_a != int_b:
            return False, (f"col '{c}' dtype mismatch: spark={av.dtype} vs "
                           f"oracle={bv.dtype} — driver hash would fail "
                           "(uncast HUGEINT SUM in the oracle?)")
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            na_mismatch = (av.isna() != bv.isna()).any()
            diff = (av.fillna(0) - bv.fillna(0)).abs().max()
            if na_mismatch or (diff and diff > 0):
                # reaching here means some pair already differs, so the
                # only question left is HOW badly (near-miss vs real)
                rel_ok = not na_mismatch and bool(
                    ((av.fillna(0) - bv.fillna(0)).abs()
                     <= 1e-9 * (1 + bv.fillna(0).abs())).all())
                tag = "NEAR(<=1e-9 rel)" if rel_ok else f"maxdiff={diff}"
                return False, f"float col '{c}' not bit-equal: {tag}"
        else:
            if not av.equals(bv):
                neq = (av != bv) & ~(av.isna() & bv.isna())
                i = int(neq.idxmax()) if neq.any() else 0
                return False, f"col '{c}' differs, e.g. row {i}: {av[i]!r} != {bv[i]!r}"
    return True, "ok"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    names = args.queries or sorted(specs)
    spark = get_spark("parity")
    con = duck_connection(args.sf)

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS  {name:28s} rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, ddf)
        status = "PASS" if ok else "FAIL"
        print(f"{status}  {name:28s} rows={len(sdf)} {msg if not ok else ''} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
