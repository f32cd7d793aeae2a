"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed as Spark would in production: full plan runs and
results are drained (count via noop write semantics), never collected
to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_warehouse_spark.queries.registry import load_all  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402

# Headline set: one representative per operator family. Parity covers
# exhaustiveness; bench covers speed.
HEADLINE = [
    "a1_q1_pricing_summary",   # multi-agg groupBy (TPC-H Q1 shape)
    "j2_broadcast_join",       # dim broadcast join + agg
    "j10_star_join",           # dimension-chain star query
    "j6_asof_join",            # as-of composite
    "w5_sessionize",           # window + session agg (flagship)
    "e1_trips",                # full reference ETL query
    "o2_topk_per_group",       # ranking window
    "u1_upsert",               # merge pattern
    "st4_session_window",      # session_window agg
    "x1_exact_dedup",          # hash dedup
    "x2_minhash_lsh",          # MinHash LSH near-dup
    "x3_cosine_topk",          # vector top-k
    "x7_tfidf",                # explode + join pipeline
    "mm2_image_resize",        # Arrow-batched multimodal decode+plan
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0  # cosmetic metadata only — never abort the bench on it
    spark = get_spark("bench")

    specs = load_all()
    names = [n for n in HEADLINE if n in specs]
    # Warm-up: run each query once at the smallest SF so JVM/codegen/
    # Arrow init isn't attributed to the measured run (steady-state
    # throughput is the metric; a real cluster amortizes startup).
    for name in names:
        try:
            specs[name].fn(spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # Best-of-N per query (N=3, override via SPARK_GRAFT_BENCH_RUNS):
    # the box shares hardware and single-shot timings swing 2-4x with
    # neighbor load; at the sf0.1 job floor, best-of-2 proved too
    # noise-fragile to distinguish a real 1.5x regression from a noisy
    # round. Runs interleave across queries so one load spike cannot
    # poison every sample of a single query.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in names:
            t0 = time.time()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    total = round(sum(timings.values()), 3)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
