"""Scaling evidence: run representative operator pipelines over the
sf0.1 fixtures amplified Nx IN-PLAN (lazy union of N scans — no files
written, no fixtures synthesized) and report wall-clock per multiplier.

Purpose: at sf0.1 most Spark query time is the local-mode per-job floor
(BASELINE.md). This shows directly that the floor is CONSTANT in data
size — time grows far slower than data until compute dominates, i.e.
the plans are throughput-bound at scale, which is the property that
matters at 100 TB.

Usage: python tools/scalecheck.py [--sf /root/testdata/sf0.1]
                                  [--multipliers 1,4,16]
Prints a markdown table and one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators.dedup import exact_dedup  # noqa: E402
from data_warehouse_spark.operators.sessionize import sessionize  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402


def amplify(df: DataFrame, n: int, tag_col: str, key_col: str) -> DataFrame:
    """N logical copies via an in-task row explosion (one scan — the
    shape of one genuinely large table), with the duplicated key salted
    per copy so group/session/dedup cardinality scales with the data
    (a pure copy would just deepen each group)."""
    return (df.withColumn(tag_col, F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
            .withColumn(key_col, F.concat_ws(
                "#", F.col(key_col).cast("string"),
                F.col(tag_col).cast("string"))))


def pipelines(spark, sf_dir: str, n: int):
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    li = amplify(lineitem.withColumn("copy", F.lit(0)), n, "copy", "l_returnflag")
    ev = amplify(events.withColumn("copy", F.lit(0)), n, "copy", "user_id")
    dc = amplify(documents.withColumn("copy", F.lit(0)), n, "copy", "doc_id")

    return {
        "agg_q1": lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n")),
        "window_sessionize": lambda: sessionize(
            ev, key="user_id", ts="ts", gap_seconds=1800.0,
            value="value", order_tiebreak="event_id", min_events=2),
        "dedup_exact": lambda: exact_dedup(dc, "text", "doc_id"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--multipliers", default="1,4,16")
    args = ap.parse_args()
    mults = [int(x) for x in args.multipliers.split(",")]

    spark = get_spark("scalecheck")
    results: dict[str, dict[str, float]] = {}
    # warm-up at 1x: JVM/codegen init out of the measurement
    for name, build in pipelines(spark, args.sf, 1).items():
        build().write.format("noop").mode("overwrite").save()

    # best-of-2 per cell: shared hardware swings single-shot timings
    for _ in range(2):
        for n in mults:
            for name, build in pipelines(spark, args.sf, n).items():
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                prev = results.setdefault(name, {}).get(str(n), dt)
                results[name][str(n)] = min(prev, dt)

    print("| pipeline | " + " | ".join(f"{n}x" for n in mults) +
          " | t(max)/t(1x) vs data(max)/data(1x) |")
    print("|---|" + "---|" * (len(mults) + 1))
    for name, row in results.items():
        ratio = row[str(mults[-1])] / row[str(mults[0])]
        print(f"| {name} | " + " | ".join(f"{row[str(n)]}s" for n in mults)
              + f" | {ratio:.1f}x vs {mults[-1] // mults[0]}x |")
    print(json.dumps({"scalecheck": results, "sf_dir": args.sf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
