"""Record the DuckDB oracle wall-clock at a given SF — the operative
performance baseline (BASELINE.md: the reference publishes no numbers,
so the target is DuckDB on identical SQL, same machine).

Usage: python tools/baseline.py [--sf /root/testdata/sf0.1] [query ...]
Prints a markdown table row per query plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402
from tools.parity import duck_connection  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    names = args.queries or sorted(n for n, s in specs.items() if s.oracle)
    con = duck_connection(args.sf)

    timings: dict[str, float] = {}
    for name in names:
        spec = specs[name]
        if spec.oracle is None:
            continue
        con.sql(spec.oracle).fetchall()  # warm (IO cache)
        t0 = time.time()
        con.sql(spec.oracle).fetchall()
        timings[name] = round(time.time() - t0, 3)
        print(f"| {name} | {timings[name]} |")
    print(json.dumps({"duckdb_sec": timings, "sf_dir": args.sf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
