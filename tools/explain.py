"""Dump the optimizer's formatted physical plan for any registry query.

Usage: python tools/explain.py [--sf DIR] QUERY_ID [QUERY_ID ...]
       python tools/explain.py --list

The fast way to answer "did the filter push down / did the dim
broadcast / how many exchanges" for any operator without writing a
test — the same properties tests/test_plans.py pins in CI.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    if args.list or not args.queries:
        for name in sorted(specs):
            print(name)
        return 0

    from data_warehouse_spark.session import get_spark  # noqa: E402
    spark = get_spark("explain")
    for name in args.queries:
        print(f"\n=== {name} ===")
        specs[name].fn(spark, args.sf).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
