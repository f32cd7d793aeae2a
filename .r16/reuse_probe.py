"""Why does AQE not reuse the signature shuffle across the banding
self-join? Minimal repro: self-join of an aggregated subtree, with and
without higher-order-function lambdas in the subtree.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.session import get_spark  # noqa: E402

spark = get_spark("reuse_probe")


def final_plan(df):
    df.write.format("noop").mode("overwrite").save()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


base = spark.range(0, 100000).select(
    (F.col("id") % 1000).alias("k"), F.col("id").alias("v"))

# case 1: plain aggregate subtree, self-join on derived key
agg1 = base.groupBy("k").agg(F.min("v").alias("m"))
l1 = agg1.withColumnRenamed("k", "ka")
r1 = agg1.withColumnRenamed("k", "kb")
j1 = l1.join(r1, l1.m == r1.m).select("ka", "kb")
p1 = final_plan(j1)
print("plain agg self-join: ReusedExchange:", p1.count("ReusedExchange"),
      "ReusedQueryStage:", p1.count("ReusedQueryStage"),
      "AQEShuffleRead:", p1.count("AQEShuffleRead"))

# case 2: subtree contains a transform() lambda before the aggregate
lam = base.select("k", F.transform(F.array("v"), lambda x: x + 1).alias("a"))
agg2 = lam.select("k", F.element_at("a", 1).alias("v")) \
    .groupBy("k").agg(F.min("v").alias("m"))
l2 = agg2.withColumnRenamed("k", "ka")
r2 = agg2.withColumnRenamed("k", "kb")
j2 = l2.join(r2, l2.m == r2.m).select("ka", "kb")
p2 = final_plan(j2)
print("lambda agg self-join: ReusedExchange:", p2.count("ReusedExchange"),
      "ReusedQueryStage:", p2.count("ReusedQueryStage"),
      "AQEShuffleRead:", p2.count("AQEShuffleRead"))

# case 3: broadcast-sized right side (mimics banding join at sf0.01):
# does the BROADCAST side reuse the left's shuffle stage?
j3 = l1.join(F.broadcast(r1), l1.m == r1.m).select("ka", "kb")
p3 = final_plan(j3)
print("bcast self-join:     ReusedExchange:", p3.count("ReusedExchange"),
      "ReusedQueryStage:", p3.count("ReusedQueryStage"))
