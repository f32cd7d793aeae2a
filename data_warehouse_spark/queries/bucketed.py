"""Bucketed-layout queries: the write-once/join-free answer to the
fact-to-fact shuffle (SURVEY §2.3 J11 at 100 TB).

Loads inside the driver's 50-query correctness window (see
registry._QUERY_MODULES) so j12 gets a driver-verified row; the
zero-exchange plan shape is additionally asserted by
tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.operators.bucketing import bucketed_view
from data_warehouse_spark.queries.registry import register
from data_warehouse_spark.queries.util import money_sum, money_sum_sql

# One scan task per bucket on the read side: match the local harness's
# core count (on a cluster this would be thousands — buckets should be
# sized so one bucket ~ one task's worth of data).
N_BUCKETS = 32


@register(
    "j12_bucketed_fact_join",
    oracle=f"""
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_items,
       {money_sum_sql('l.l_extendedprice')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY 1
""",
    doc="J12: J11's fact-to-fact join executed over bucketed layouts — "
        "lineitem and orders both hash-clustered into the same bucket "
        "count on the order key (operators/bucketing.py), so the join "
        "runs with NO Exchange and NO per-partition Sort on either "
        "side; the only shuffle left in the plan is the final "
        "5-group aggregate. Same answer as j11 (the oracle is "
        "identical); the plan is what a 100 TB warehouse should run "
        "when the join key is known at ingest time. The bucketed "
        "materialization is the one-off write a real warehouse does "
        "on load; here it is session-cached per sf_dir.",
    tags=("join", "agg", "bucketed"),
)
def j12_bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = bucketed_view(spark, sf_dir, "lineitem", load_table,
                       ["l_orderkey"], N_BUCKETS)
    orders = bucketed_view(spark, sf_dir, "orders", load_table,
                           ["o_orderkey"], N_BUCKETS).filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.col("l_shipdate") > F.col("o_orderdate"))
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 money_sum("l_extendedprice").alias("revenue")))
