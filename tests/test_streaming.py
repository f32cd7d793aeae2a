"""Structured Streaming jobs (SURVEY §2.10) driven synchronously with
AvailableNow triggers, asserting batch-equivalence where applicable."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.streaming.jobs import (
    dedup_stream, read_events_stream, run_foreach_batch_upsert,
    session_aggs, start_memory_sink, tumbling_counts,
)


def test_st1_st2_tumbling_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    q = start_memory_sink(tumbling_counts(stream), "t_tumbling", "complete")
    q.awaitTermination()
    streamed = {
        (r["win"]["start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r["win"]["start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in (ev.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("value").alias("sum_value"))).collect()
    }
    assert streamed == batch


def test_st4_session_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    q = start_memory_sink(session_aggs(stream), "t_sessions", "complete")
    q.awaitTermination()
    streamed = {(r["sess"]["start"], r["user_id"]): r["n_events"]
                for r in spark.sql("SELECT * FROM t_sessions").collect()}
    ev = load_table(spark, sf_dir, "events")
    batch = {(r["sess"]["start"], r["user_id"]): r["n_events"]
             for r in (ev.groupBy(F.session_window("ts", "4 hours").alias("sess"),
                                  "user_id")
                       .agg(F.count(F.lit(1)).alias("n_events"))).collect()}
    assert streamed == batch


def test_st6_streaming_dedup(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    q = start_memory_sink(dedup_stream(stream), "t_dedup", "append")
    q.awaitTermination()
    n_stream = spark.sql("SELECT COUNT(*) AS n FROM t_dedup").first()["n"]
    ev = load_table(spark, sf_dir, "events")
    assert n_stream == ev.dropDuplicates(["user_id", "ts"]).count()


def test_st7_foreach_batch_upsert(spark, sf_dir):
    target = tempfile.mkdtemp(prefix="dws_st7_")
    shutil.rmtree(target, ignore_errors=True)
    stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")
    q = run_foreach_batch_upsert(spark, stream, target + "/t", ["user_id", "ts"])
    q.awaitTermination()
    ev = load_table(spark, sf_dir, "events")
    written = spark.read.parquet(target + "/t")
    assert written.count() == ev.dropDuplicates(["user_id", "ts"]).count()
