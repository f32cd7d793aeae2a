"""Plan-shape sweep over the whole registry (optimization rounds).

Builds every registry query at --sf, captures the formatted physical
plan (pre-execution), and prints one summary row per query:
exchange count, join strategies, python-eval nodes, sort aggregates —
the guide §7.2 checklist mechanized over 150+ queries.

Usage: python tools/plan_sweep.py [--sf DIR] [--json OUT] [Q ...]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402

MARKS = [
    ("Exchange", r"^\s*(?:\:|\+)?[-\s:]*Exchange\b"),
    ("BroadcastExchange", r"BroadcastExchange"),
    ("SortMergeJoin", r"SortMergeJoin"),
    ("ShuffledHashJoin", r"ShuffledHashJoin"),
    ("BroadcastHashJoin", r"BroadcastHashJoin"),
    ("BroadcastNestedLoopJoin", r"BroadcastNestedLoopJoin"),
    ("CartesianProduct", r"CartesianProduct"),
    ("SortAggregate", r"SortAggregate"),
    ("ObjectHashAggregate", r"ObjectHashAggregate"),
    ("BatchEvalPython", r"BatchEvalPython"),
    ("ArrowEvalPython", r"ArrowEvalPython"),
    ("MapInArrow", r"(MapInArrow|PythonMapInArrow)"),
    ("MapInPandas", r"MapInPandas"),
    ("FlatMapGroupsInPandas", r"FlatMapGroupsInPandas"),
    ("Window", r"^\s*(?:\:|\+)?[-\s:]*Window\b"),
    ("Generate", r"Generate\b"),
    ("ExistingRDD", r"ExistingRDD"),
    ("InMemoryTableScan", r"InMemoryTableScan"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    names = args.queries or sorted(specs)

    from data_warehouse_spark.session import get_spark  # noqa: E402
    spark = get_spark("plan_sweep")
    out: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            df = specs[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df.queryExecution() if hasattr(df, "queryExecution")
                else df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — sweep must survive one bad query
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            traceback.print_exc(limit=2)
            continue
        tree = plan.split("\n\n")[0]
        counts = {}
        for label, pat in MARKS:
            n = len(re.findall(pat, tree, flags=re.M))
            if n:
                counts[label] = n
        counts["build_s"] = round(time.time() - t0, 2)
        out[name] = counts

    width = max(len(n) for n in out)
    for name, c in out.items():
        if "error" in c:
            print(f"{name:<{width}}  ERROR {c['error']}")
            continue
        parts = [f"{k}={v}" for k, v in c.items() if k != "build_s"]
        print(f"{name:<{width}}  {' '.join(parts)}  [{c['build_s']}s]")
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
