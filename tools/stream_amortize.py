"""Quantify how much of the streaming queries' bench wall time is
per-RUN machinery vs per-BATCH marginal cost (round-8 VERDICT ask #4).

The bench's st5/st6/st9/st11 cells each pay, ONCE PER RUN: streaming
query planning, checkpoint-directory creation, state-store provider
init, and query start/stop — costs a real deployment pays once per
stream LIFETIME, not per micro-batch. This tool separates them with
real telemetry instead of argument: each shape streams the sf0.1
events log staged as K files under maxFilesPerTrigger=1 +
Trigger.AvailableNow (so one run = K micro-batches against ONE
checkpoint/state store), then reads per-batch durations from the
StreamingQuery progress feed. batch 0 carries first-touch state-store
costs; the batch 2..N median is the steady-state marginal cost a
long-running stream actually pays. `outside_batches` = wall - sum of
batch durations = start/stop + planning overhead.

Also runs every shape under BOTH state-store providers (default
HDFS-backed vs RocksDB) since the provider is the main state-cost
lever Spark exposes.

Usage: python tools/stream_amortize.py [--sf /root/testdata/sf0.1]
       [--files 8] [--out STREAM_AMORTIZE.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.queries.util import scratch_dir  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402
from data_warehouse_spark.streaming.jobs import (  # noqa: E402
    EVENTS_SCHEMA, attribution_join, dedup_retries_stream, dedup_stream,
)

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def _stream(spark, staged: str):
    return (spark.readStream.format("parquet").schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1).load(staged))


def build_shape(spark, staged: str, shape: str):
    """The streamed plan for each bench shape, built from the SAME
    operators the registry queries use (streaming/jobs.py)."""
    s = _stream(spark, staged)
    if shape == "st5_tumbling_agg":
        return (s.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))), "append"
    if shape == "st6_dedup":
        return (dedup_stream(s).groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))), "complete"
    if shape == "st11_retry_dedup":
        cols = ["event_id", "event_type", "ts", "value"]
        retries = (_stream(spark, staged).select(*cols)
                   .filter(F.col("event_id") % 4 == 0)
                   .withColumn("ts", F.col("ts")
                               + F.expr("INTERVAL 90 SECONDS")))
        merged = dedup_retries_stream(s.select(*cols).unionByName(retries),
                                      keys=["event_id"])
        return (merged.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))), "complete"
    if shape == "st9_stream_stream_join":
        clicks = s.filter(F.col("event_type") == "click")
        purchases = _stream(spark, staged).filter(
            F.col("event_type") == "purchase")
        return attribution_join(clicks, purchases), "append"
    raise ValueError(shape)


def run_shape(spark, staged: str, shape: str, provider: str) -> dict:
    tag = f"amort_{shape}_{provider}_{abs(hash(staged)) % 10**6}"
    ckpt = scratch_dir(tag) + "/ckpt"
    if provider == "rocksdb":
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       ROCKSDB)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    df, mode = build_shape(spark, staged, shape)
    t0 = time.time()
    q = (df.writeStream.format("memory").queryName(tag)
         .outputMode(mode).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    # batchDuration (ms) per progress event, in batch order
    prog = [p.asDict(True) if hasattr(p, "asDict") else p
            for p in q.recentProgress]
    timed = [(p.get("batchDuration") / 1000.0,
              p.get("numInputRows", 0) or 0)
             for p in prog if p.get("batchDuration") is not None]
    durs_s = [d for d, n in timed if n > 0]
    # The trailing empty availableNow batch (and any other 0-row
    # trigger) is real trigger machinery, not start/stop overhead —
    # subtract ALL batch time from wall for outside_batches_s and
    # report the empty-batch share separately, so the fixed start/stop
    # cost this tool isolates isn't overstated.
    empty_s = [d for d, n in timed if n == 0]
    tail = sorted(durs_s[1:])
    median_tail = tail[len(tail) // 2] if tail else None
    if len(durs_s) < 1:
        raise RuntimeError(f"{tag}: no progress telemetry captured")
    return {
        "wall_s": round(wall, 3),
        "n_batches": len(durs_s),
        "batch_s": [round(d, 3) for d in durs_s],
        "first_batch_s": round(durs_s[0], 3) if durs_s else None,
        "median_marginal_s": (round(median_tail, 3)
                              if median_tail is not None else None),
        "empty_batches_s": round(sum(empty_s), 3),
        "n_empty_batches": len(empty_s),
        "outside_batches_s": round(wall - sum(durs_s) - sum(empty_s), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--files", default="1,8",
                    help="comma-separated staged-file counts; 1 vs 8 "
                         "separates per-trigger cost from per-row cost")
    ap.add_argument("--out", default=str(REPO / "STREAM_AMORTIZE.json"))
    args = ap.parse_args()

    spark = get_spark("stream_amortize")
    file_counts = [int(x) for x in str(args.files).split(",")]
    # recentProgress is capped (default 100 entries); a --files beyond
    # it would silently evict early batches' telemetry and misattribute
    # their runtime to outside_batches_s — raise the cap to cover the
    # largest sweep (no-silent-caps rule)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                   str(max(file_counts) + 20))

    shapes = ["st5_tumbling_agg", "st6_dedup", "st11_retry_dedup",
              "st9_stream_stream_join"]
    results: dict[str, dict] = {}
    for nf in file_counts:
        staged = scratch_dir(f"amort_staging_{nf}") + "/in"
        load_table(spark, args.sf, "events").repartition(nf) \
            .write.mode("overwrite").parquet(staged)
        for shape in shapes:
            results.setdefault(shape, {})
            for provider in ("hdfs", "rocksdb"):
                try:
                    cell = run_shape(spark, staged, shape, provider)
                except Exception as e:  # rocksdb may be absent
                    cell = {"error": str(e)[:200]}
                results[shape][f"{provider}_x{nf}"] = cell
                print(f"{shape:26s} {provider:8s} files={nf} "
                      f"{json.dumps(cell)}", flush=True)

    payload = {"sf": args.sf, "files": args.files,
               "stream_amortize": results}
    Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
