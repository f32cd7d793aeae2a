"""Window-function operators (SURVEY §2.5 W1-W4, plus P4's lag-null
predicate). W5 (sessionization) lives in queries/sessions.py.

Each query partitions on its natural key (w1/w2 on user_id — the
reference's PARTITION BY bike_id, trips_lambda.py:102-104; w3/w4 on
o_custkey; w6 on c_mktsegment). One shuffle per distinct partitioning;
Catalyst collapses adjacent window functions over the same spec into a
single WindowExec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.queries.registry import register
from data_warehouse_spark.queries.util import cents


@register(
    "w1_lag",
    oracle="""
SELECT event_id, user_id, ts,
       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
FROM events
""",
    doc="W1: LAG over (PARTITION BY key ORDER BY ts) — the reference's "
        "previous-observation lookup (trips_lambda.py:102-104).",
    tags=("window",),
)
def w1_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lag("value").over(w).alias("prev_value"),
    )


@register(
    "p4_null_predicate",
    oracle="""
WITH lagged AS (
    SELECT event_id, user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
)
SELECT event_id, user_id, ts, prev_ts
FROM lagged WHERE prev_ts IS NOT NULL
""",
    doc="P4: IS NOT NULL on a lagged column — drops each partition's "
        "first row (trips_lambda.py:127).",
    tags=("filter", "window"),
)
def p4_null_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("event_id", "user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
        .filter(F.col("prev_ts").isNotNull())
    )


@register(
    "w2_lead_first_last",
    oracle="""
SELECT event_id, user_id, ts,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
       first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value_seen,
       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_type
FROM events
""",
    doc="W2: lead / first / last over a running frame ([cap], symmetric "
        "to the reference's LAG usage).",
    tags=("window",),
)
def w2_lead_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id", "user_id", "ts",
        F.lead("ts").over(w).alias("next_ts"),
        F.first("value").over(running).alias("first_value_seen"),
        F.last("event_type").over(running).alias("latest_type"),
    )


@register(
    "w3_ranking",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(rank()       OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
    doc="W3: ranking functions ([cap]; also the surrogate-key "
        "replacement for the reference's serial PK, SURVEY §1.2).",
    tags=("window",),
)
def w3_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "w6_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    doc="W6 [cap]: distribution window functions — ntile/percent_rank/"
        "cume_dist (quartile bucketing and percentile placement, the "
        "per-stratum score-normalization shape quality-filter "
        "pipelines use). Total order via the (value, key) tie-break "
        "makes every row its own peer group, so all three are "
        "deterministic and engine-portable. Same single-shuffle "
        "WindowExec shape as W3.",
    tags=("window",),
)
def w6_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@register(
    "w4_running_agg",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0
         AS running_spend,
       COUNT(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM orders
""",
    doc="W4: framed running aggregate ([cap]; cumulative spend per "
        "customer). Runs in exact integer cents — a running float sum "
        "would drift order-dependently (parity_notes rule 1).",
    tags=("window",),
)
def w4_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w) / F.lit(100.0)).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "o2_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
""",
    doc="O2b: top-k per group = ranking window + filter ([cap]). At "
        "scale this is the partial-sort-per-partition pattern; no "
        "global sort.",
    tags=("window", "sort"),
)
def o2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice",
                      F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
