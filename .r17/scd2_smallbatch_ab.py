"""scd2_apply split-vs-full-outer A/B on the split's TARGET shape:
a big dimension, a SMALL update batch (r17 ask #7 follow-up).

The u4-shaped A/B (.r17/u4_ab.py) showed the split LOSING at 64x
(3.41 vs 2.58 s) because u4's update batch is ~31% of the dimension —
each of the five split branches recomputes the update subtree, and
that costs more than the one dim exchange it saves. The warehouse-
normal scd2 shape is the opposite: a dimension of N rows and a daily
batch of n << N updates. This lane builds dim = salted MULTx customer
(~15k*MULT rows) and updates = a FRACTIONth sample of keys, then
times scd2_apply (split fires) against the inlined pre-r17 full-outer
body at the same default threshold.

Usage: python .r17/scd2_smallbatch_ab.py [MULT] [N] [FRACTION]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.operators.merge import dedup_latest, scd2_apply
from data_warehouse_spark.session import get_spark

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5
FRACTION = int(sys.argv[3]) if len(sys.argv) > 3 else 1000  # 1/F of keys

spark = get_spark("scd2_ab")
spark.sparkContext.setLogLevel("ERROR")
AMP = f"/tmp/r17_u4_{MULT}"  # reuse the u4_ab build if present
import os
if not os.path.exists(f"{AMP}/customer.parquet/_SUCCESS"):
    cust0 = load_table(spark, "/root/testdata/sf0.1", "customer")
    (cust0.repartition(32)
     .withColumn("__copy",
                 F.explode(F.sequence(F.lit(0), F.lit(MULT - 1))))
     .withColumn("c_custkey", F.col("c_custkey") * MULT + F.col("__copy"))
     .drop("__copy")
     .repartition(32).write.mode("overwrite")
     .parquet(f"{AMP}/customer.parquet"))


def dim_df():
    cust = load_table(spark, AMP, "customer")
    return cust.select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.lit("2023-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"))


def upd_df():
    cust = load_table(spark, AMP, "customer")
    eff = F.lit("2024-06-01").cast("timestamp")
    return cust.filter(F.col("c_custkey") % FRACTION == 0).select(
        "c_custkey", F.lit("MOVED").alias("c_mktsegment"),
        "c_nationkey", eff.alias("eff_ts"))


KEYS, ATTRS = ["c_custkey"], ["c_mktsegment", "c_nationkey"]


def run_split():
    return scd2_apply(dim_df(), upd_df(), keys=KEYS, attrs=ATTRS)


def run_fullouter():
    # pre-r17 scd2 body (merge.py@3417a47), inlined
    dim, updates = dim_df(), upd_df()
    updates = dedup_latest(updates.filter(F.col("eff_ts").isNotNull()),
                           KEYS, "eff_ts")
    history = dim.filter(~F.coalesce(F.col("is_current"), F.lit(False)))
    cur = dim.filter(F.col("is_current"))
    u = updates.select(
        F.col("c_custkey").alias("__u_c_custkey"),
        F.col("c_mktsegment").alias("__u_c_mktsegment"),
        F.col("c_nationkey").alias("__u_c_nationkey"),
        F.col("eff_ts").alias("__u_eff"))
    j = cur.join(u, F.col("c_custkey") == F.col("__u_c_custkey"),
                 "full_outer")
    matched = (F.col("__u_eff").isNotNull()
               & F.col("is_current").isNotNull())
    late = matched & (F.col("__u_eff") < F.col("valid_from"))
    ch = (~F.col("c_mktsegment").eqNullSafe(F.col("__u_c_mktsegment"))
          | ~F.col("c_nationkey").eqNullSafe(F.col("__u_c_nationkey")))
    applies = matched & ch & ~late
    dim_cols = [F.col(c) for c in dim.columns]
    kept = j.filter((matched & (~ch | late))
                    | F.col("__u_eff").isNull()).select(*dim_cols)
    closed = (j.filter(applies)
              .withColumn("valid_to", F.col("__u_eff"))
              .withColumn("is_current", F.lit(False)).select(*dim_cols))
    mk = [F.col("__u_c_custkey").alias("c_custkey"),
          F.col("__u_c_mktsegment").alias("c_mktsegment"),
          F.col("__u_c_nationkey").alias("c_nationkey"),
          F.col("__u_eff").alias("valid_from"),
          F.lit(None).cast("timestamp").alias("valid_to"),
          F.lit(True).alias("is_current")]
    new_version = j.filter(applies).select(*mk).select(*dim_cols)
    inserted = (j.filter(F.col("__u_eff").isNotNull()
                         & F.col("is_current").isNull())
                .select(*mk).select(*dim_cols))
    return history.unionByName(kept).unionByName(closed) \
        .unionByName(new_version).unionByName(inserted)


from data_warehouse_spark.plans import executed_plan  # noqa: E402
sp = executed_plan(run_split())
print(f"split fires (no SMJ): {'SortMergeJoin' not in sp}")
a = sorted(map(tuple, run_split().collect()))
b = sorted(map(tuple, run_fullouter().collect()))
assert a == b, (len(a), len(b))
print(f"rows match: {len(a)} (batch = 1/{FRACTION} of keys)")

best = {}
for name, fn in (("split", run_split), ("fullouter", run_fullouter)):
    fn().write.format("noop").mode("overwrite").save()  # warm
for _ in range(N):
    for name, fn in (("split", run_split), ("fullouter", run_fullouter)):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best[name] = min(best.get(name, dt), dt)
print(f"MULT={MULT} batch=1/{FRACTION} best-of-{N}")
print(f"  split (r17)          {best['split']:7.3f}s")
print(f"  full-outer (pre-r17) {best['fullouter']:7.3f}s")
