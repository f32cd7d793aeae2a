"""u4_scd2_dimension split-vs-full-outer A/B (r17 ask #7 follow-up:
a measured number behind the plan evidence).

Builds a salted MULTx customer (c_custkey*M+copy — u4's %7/%5/%97 mod
classes redistribute per copy, workload stays linear), then times two
arms at the SAME default autoBroadcastJoinThreshold:

  split — the registered u4 (scd2_apply's stats gate fires -> 3xBHJ
          inner + 2xBHJ anti, zero dim-side shuffle)
  fullouter — the exact pre-r17 scd2 body inlined (single full-outer
          join; Catalyst still auto-broadcasts the derived
          inner/right-outer branches as it did before r17, so this IS
          the pre-r17 plan, not a straw man)

Same rows both ways (asserted). The gate reads the session threshold
(default 10MB), which stops firing between 32x and 64x on this
dimension (the keys-only build estimate crosses 10MB) — so the A/B
runs where it fires; above that scale both arms are the same
full-outer plan by design (the gate is deliberately as conservative
as the planner's own broadcast bound).

Usage: python .r17/u4_ab.py [MULT] [N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.queries.registry import load_all
from data_warehouse_spark.session import get_spark

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark("u4_ab")
spark.sparkContext.setLogLevel("ERROR")
AMP = f"/tmp/r17_u4_{MULT}"

cust0 = load_table(spark, "/root/testdata/sf0.1", "customer")
(cust0.repartition(32)
 .withColumn("__copy", F.explode(F.sequence(F.lit(0), F.lit(MULT - 1))))
 .withColumn("c_custkey", F.col("c_custkey") * MULT + F.col("__copy"))
 .drop("__copy")
 .repartition(32).write.mode("overwrite")
 .parquet(f"{AMP}/customer.parquet"))

fn = load_all()["u4_scd2_dimension"].fn


def u4_fullouter():
    """u4 through the PRE-r17 scd2 shape (merge.py@3417a47), inlined:
    one full-outer join, four filter-derived branches."""
    cust = load_table(spark, AMP, "customer")
    dim = cust.select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.lit("2023-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"))
    eff = F.lit("2024-06-01").cast("timestamp")
    changed = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("MOVED").alias("c_mktsegment"),
        "c_nationkey", eff.alias("eff_ts"))
    noop = cust.filter((F.col("c_custkey") % 5 == 0)
                       & (F.col("c_custkey") % 7 != 0)).select(
        "c_custkey", "c_mktsegment", "c_nationkey", eff.alias("eff_ts"))
    fresh = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        "c_nationkey", eff.alias("eff_ts"))
    updates = changed.unionByName(noop).unionByName(fresh)

    keys, attrs = ["c_custkey"], ["c_mktsegment", "c_nationkey"]
    updates = updates.filter(F.col("eff_ts").isNotNull())
    from data_warehouse_spark.operators.merge import dedup_latest
    updates = dedup_latest(updates, keys, "eff_ts")
    history = dim.filter(~F.coalesce(F.col("is_current"), F.lit(False)))
    cur = dim.filter(F.col("is_current"))
    u = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col("eff_ts").alias("__u_eff"))
    join_cond = F.col("c_custkey") == F.col("__u_c_custkey")
    j = cur.join(u, join_cond, "full_outer")
    matched = F.col("__u_eff").isNotNull() & F.col("is_current").isNotNull()
    late = matched & (F.col("__u_eff") < F.col("valid_from"))
    changed_p = (~F.col("c_mktsegment").eqNullSafe(F.col("__u_c_mktsegment"))
                 | ~F.col("c_nationkey").eqNullSafe(F.col("__u_c_nationkey")))
    applies = matched & changed_p & ~late
    dim_cols = [F.col(c) for c in dim.columns]
    kept = j.filter((matched & (~changed_p | late))
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


def noop_run(df):
    df.write.format("noop").mode("overwrite").save()


from data_warehouse_spark.plans import executed_plan  # noqa: E402
split_plan = executed_plan(fn(spark, AMP))
fo_plan = executed_plan(u4_fullouter())
print(f"gate fires at {MULT}x: {'SortMergeJoin' not in split_plan}")
print(f"pre-r17 arm keeps its full outer: "
      f"{any('FullOuter' in ln for ln in fo_plan.splitlines())}")
a = sorted(map(tuple, fn(spark, AMP).collect()))
b = sorted(map(tuple, u4_fullouter().collect()))
assert a == b, (len(a), len(b))
print(f"rows match: {len(a)}")

best = {}
noop_run(fn(spark, AMP)); noop_run(u4_fullouter())  # warm
for _ in range(N):
    for key, mk_df in (("split", lambda: fn(spark, AMP)),
                       ("fullouter", u4_fullouter)):
        t0 = time.time()
        noop_run(mk_df())
        dt = time.time() - t0
        best[key] = min(best.get(key, dt), dt)
print(f"MULT={MULT} best-of-{N}")
print(f"  split (r17, gate on)   {best['split']:7.3f}s")
print(f"  full-outer (pre-r17)   {best['fullouter']:7.3f}s")
