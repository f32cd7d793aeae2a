"""w5/st4 floor-free stage attribution (VERDICT r16 ask #4).

Both are >1 s driver cells that were untouched-and-justified at sf0.1
(single-row-group scan floor). This script attributes their cost at
64x/256x amplification: scan-only vs window-chain-only vs full query,
plus (st4) a lag-chain form that computes the identical rows, to see
whether Spark's native session_window operator leaves anything on the
table. Interleaved best-of-N, noop sink, fresh plan per run.

Usage: python .r17/w5st4_split.py [MULT] [N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.operators.sessionize import (
    sessionize, with_session_id,
)
from data_warehouse_spark.queries.sessions import GAP_SECONDS
from data_warehouse_spark.queries.util import money_sum
from data_warehouse_spark.session import get_spark
from tools.floorfree import build_amplified

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("w5st4_split")
spark.sparkContext.setLogLevel("ERROR")
amp = build_amplified(spark, "/root/testdata/sf0.1",
                      f"/tmp/r17_w5st4_{MULT}", MULT, tables=["events"])


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def ev():
    return load_table(spark, amp, "events")


def scan_only():
    noop(ev().select("user_id", "ts", "value", "event_id"))


def w5_window_only():
    noop(with_session_id(ev(), key="user_id", ts="ts",
                         gap_seconds=GAP_SECONDS, order_tiebreak="event_id"))


def w5_full():
    noop(sessionize(ev(), key="user_id", ts="ts", gap_seconds=GAP_SECONDS,
                    value="value", order_tiebreak="event_id", min_events=2))


def st4_full():
    e = ev()
    noop(e.groupBy(F.session_window("ts", "4 hours").alias("sess"),
                   "user_id")
         .agg(F.count(F.lit(1)).alias("n_events"),
              money_sum("value").alias("sum_value"))
         .select(F.col("sess.start").alias("sess_start"),
                 F.col("sess.end").alias("sess_end"),
                 "user_id", "n_events", "sum_value"))


def st4_lag_chain():
    # identical rows via the manual chain: >= break at 4 h, session end
    # = last event + 4 h (session_window's exclusive-end definition)
    e = ev()
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    brk = (prev.isNull() | ((F.unix_micros("ts") - F.unix_micros(prev))
                            >= 14400 * 1_000_000)).cast("int")
    sid = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    noop(e.withColumn("sid", sid)
         .groupBy("user_id", "sid")
         .agg(F.min("ts").alias("sess_start"),
              (F.max("ts") + F.expr("INTERVAL 4 HOURS")).alias("sess_end"),
              F.count(F.lit(1)).alias("n_events"),
              money_sum("value").alias("sum_value"))
         .drop("sid"))


VARIANTS = [("scan_only", scan_only),
            ("w5_window_only", w5_window_only),
            ("w5_full", w5_full),
            ("st4_full", st4_full),
            ("st4_lag_chain", st4_lag_chain)]

best = {}
for name, fn in VARIANTS:  # warm
    fn()
for i in range(N):
    for name, fn in VARIANTS:
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best[name] = min(best.get(name, dt), dt)
print(f"MULT={MULT} best-of-{N}")
for name, _ in VARIANTS:
    print(f"  {name:18s} {best[name]:7.3f}s")
