"""Time a registry query's DuckDB oracle in a FRESH process — the
engine-symmetric leg of floorfree's --duck-subproc mode (round 16).

Why: floorfree times Spark while the DuckDB connection is idle
(negligible residency), but it timed DuckDB while the up-to-48g Spark
JVM stayed resident — after a heavily-spilling Spark cell (dq1@4096x:
3 x 47 s of shuffle spill) the JVM's heap + the spill files' page-cache
footprint inflate the interleaved DuckDB samples. The r16 refresh
measured the SAME oracle at 40.8 s interleaved vs 13.7 s standalone
(3x) — the asymmetry, not the engine. A fresh subprocess per timing
call levels the protocol: each engine is timed with the other one
cold. Startup (python + duckdb import + view registration) happens
BEFORE the clock starts, exactly like Spark's untimed warm run.

Usage: python tools/duck_time.py AMP_DIR QUERY_NAME RUNS
Prints one JSON line: {"duckdb_s": best, "duckdb_rows": n}
or {"duckdb_refusal": msg} for resource refusals (the u1-style
asymmetric-cell convention, tools/floorfree.py).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from tools.parity import duck_connection  # noqa: E402


def main() -> int:
    amp_dir, qname, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from data_warehouse_spark.queries.registry import load_all

    spec = load_all()[qname]
    con = duck_connection(amp_dir,
                          pattern="{dir}/{t}.parquet/*.parquet",
                          skip_missing=True)
    best = rows = None
    t0 = time.time()
    try:
        for _ in range(runs):
            t0 = time.time()
            df = con.execute(spec.oracle).df()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            rows = len(df)
            del df
    except (duckdb.OutOfMemoryException, duckdb.IOException,
            OSError, MemoryError) as e:
        # resource refusals only — same marker discipline as floorfree
        if isinstance(e, (duckdb.IOException, OSError)) and \
                not isinstance(e, (duckdb.OutOfMemoryException,
                                   MemoryError)):
            msg = str(e).lower()
            markers = ("no space", "enospc", "disk full",
                       "out of memory", "could not allocate",
                       "cannot allocate", "failed to allocate")
            if not any(t in msg for t in markers):
                raise
        print(json.dumps({"duckdb_refusal":
                          f"{type(e).__name__} after "
                          f"{time.time() - t0:.0f}s: "
                          + " ".join(str(e).split())[:500]}))
        return 0
    print(json.dumps({"duckdb_s": round(best, 3), "duckdb_rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
