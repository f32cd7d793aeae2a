"""Core relational operators: scans, predicates, aggregations, sorts,
set ops (SURVEY §2.1, §2.2, §2.4, §2.6, §2.7).

Each query is the Spark-idiomatic expression of a capability attested
in the reference (citations per query) or required category parity
([cap]). Filters/projections are written to push down to the parquet
scan; aggregations rely on Catalyst's partial+final hash aggregation
(map-side combine), so the shuffle carries pre-aggregated rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_spark.io import load_table
from data_warehouse_spark.queries.registry import register
from data_warehouse_spark.queries.util import (
    cents, cents_sql, money_avg, money_avg_sql, money_sum, money_sum_sql,
    wide_sum, wide_sum_sql,
)

# ---------------------------------------------------------------------------
# §2.1 scans


@register(
    "s1_scan_filter",
    oracle="""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
""",
    doc="S1: time-range scan of the observation log — the reference's "
        "incremental extract (trips_lambda.py:105-106). Uses "
        "io.scan_events_range so the predicate pushes down to the "
        "parquet scan in the raw ns domain (the ns->us conversion would "
        "otherwise defeat pushdown); on a date-partitioned production "
        "layout this composes with partition pruning.",
    tags=("scan",),
)
def s1_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_spark.io import scan_events_range
    ev = scan_events_range(spark, sf_dir,
                           "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    return ev.select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "s7_scan_full",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="S7: plain parquet table scan with column pruning (ReadSchema "
        "carries only the projected columns).",
    tags=("scan",),
)
def s7_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


# ---------------------------------------------------------------------------
# §2.2 projection / predicates


@register(
    "p1_project",
    oracle="""
SELECT l_orderkey AS okey, l_linenumber AS line_no, l_returnflag AS rflag,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
""",
    doc="P1: projection with rename + computed column (reference: "
        "`local_time as end_time` etc., trips_lambda.py:109-117). "
        "net_price is deterministic per-row IEEE math -> no rounding "
        "needed (parity_notes rule 2).",
    tags=("project",),
)
def p1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_returnflag").alias("rflag"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


@register(
    "p2_range_predicate",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
""",
    doc="P2: half-open timestamp range (trips_lambda.py:106,218-221).",
    tags=("filter",),
)
def p2_range_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")


@register(
    "p3_between_computed",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_extendedprice * (1 - l_discount) BETWEEN 1000 AND 2000
""",
    doc="P3: BETWEEN on a computed value (gap-seconds BETWEEN 60 AND "
        "3600, trips_lambda.py:128). Product of doubles is engine-"
        "identical, so the predicate boundary is stable.",
    tags=("filter",),
)
def p3_between_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(net.between(1000, 2000)).select(
        "l_orderkey", "l_linenumber", net.alias("net_price"))


@register(
    "p5_or_inequality",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderstatus != 'F' OR o_totalprice > 200000
""",
    doc="P5: disjunctive inequality predicate (movement filter "
        "`prev_lat != lat OR prev_lon != lon`, trips_lambda.py:129).",
    tags=("filter",),
)
def p5_or_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") != "F") | (F.col("o_totalprice") > 200000)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "p6_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders, {sum_price} AS sum_price
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
""".format(sum_price=money_sum_sql("o_totalprice")),
    doc="P6: post-aggregation filter (duration/distance/segment HAVING, "
        "trips_lambda.py:160-162).",
    tags=("filter", "agg"),
)
def p6_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             money_sum("o_totalprice").alias("sum_price"))
        .filter(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations


@register(
    "a1_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql('l_quantity')} AS sum_qty,
       {money_sum_sql('l_extendedprice')} AS sum_base_price,
       {wide_sum_sql(f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})")} / 10000.0 AS sum_disc_price,
       {wide_sum_sql(f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')}) * (100 + {cents_sql('l_tax')})")} / 1000000.0 AS sum_charge,
       {money_avg_sql('l_quantity')} AS avg_qty,
       {money_avg_sql('l_extendedprice')} AS avg_price,
       {money_avg_sql('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="A1+A2: the reference's multi-aggregate GROUP BY shape "
        "(trips_lambda.py:131-145) at TPC-H Q1 structure. All money "
        "aggregates run in exact integer domain (parity_notes rule 1): "
        "order-independent, and the shuffle carries partial aggregates "
        "only. Accumulator widths are sized to the operand: linear "
        "cents sums stay in LONG (price cents x 1e11-row groups still "
        "fit), but the cents^2/cents^3 products (sum_disc_price, "
        "sum_charge: ~4e8/~4e10 per row) overflow a LONG total at "
        "~9e9/~2.5e8 rows per group — well inside the 100 TB design "
        "point — so THOSE sums use wide_sum's hi/lo split accumulation "
        "(two LONG sums = a manual 128-bit accumulator, exact to ~1e16 "
        "rows per group, measured ~10% over the plain long sum where "
        "DECIMAL(38,0) cost ~1.9x; util.wide_sum documents the "
        "floor-vs-round cast parity constraint).",
    tags=("agg", "headline"),
)
def a1_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            (wide_sum(price_c * (100 - disc_c))
             / F.lit(10000.0)).alias("sum_disc_price"),
            (wide_sum(price_c * (100 - disc_c) * (100 + tax_c))
             / F.lit(1000000.0)).alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            money_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a2_count_by_key",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    doc="A2: COUNT(*) per group (segment_count, trips_lambda.py:143).",
    tags=("agg",),
)
def a2_count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "a3_global_agg",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
       {money_sum_sql('l_quantity')} AS total_qty,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
    doc="A3+A4: keyless global aggregate (row-count logging, "
        "trips_lambda.py:177) with exact COUNT DISTINCT.",
    tags=("agg",),
)
def a3_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        money_sum("l_quantity").alias("total_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "a4_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="A4: DISTINCT projection (dedup contract, trips_lambda.py:74).",
    tags=("agg",),
)
def a4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus").distinct()


@register(
    "a5_rollup",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {money_sum_sql('o_totalprice')} AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="A5: ROLLUP grouping sets ([cap]; city-by-day reporting implied "
        "by the reference's dashboards, README.md:81-83).",
    tags=("agg",),
)
def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("o_totalprice").alias("sum_price"),
    )


@register(
    "a11_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {money_sum_sql('o_totalprice')} AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="A11 [cap]: CUBE grouping sets — all 2^k dimension subsets in "
        "one pass (the dashboard cross-tab A5's ROLLUP only "
        "prefix-covers). Planned two-stage: a plain groupBy at the "
        "finest granularity first (COUNT and integer-cents SUM are "
        "mergeable monoids), then CUBE over the group-cardinality base "
        "table. The Expand's 2^k replication therefore hits tens of "
        "pre-aggregated rows, not the fact table — naive .cube() pushes "
        "4x the scan volume through the exchange (measured 5.3x DuckDB "
        "floor-free at 256x; this shape re-lands on plain-groupBy "
        "economics). Per-grouping-set results are identical: each set's "
        "groups are unions of base cells, and NULL data values form "
        "their own base cell exactly as they form their own group in "
        "the one-stage plan.",
    tags=("agg",),
)
def a11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(cents("o_totalprice")).alias("_sum_cents"),
    )
    return base.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum("_n").alias("n"),
        (F.sum("_sum_cents") / F.lit(100.0)).alias("sum_price"),
    )


@register(
    "a6_stats",
    oracle=f"""
SELECT c_mktsegment,
       {money_avg_sql('c_acctbal')} AS avg_bal,
       ROUND(CASE WHEN COUNT(*) > 1 THEN sqrt(
           ({wide_sum_sql(f"{cents_sql('c_acctbal')} * {cents_sql('c_acctbal')}")} / 10000.0
            - (CAST(SUM({cents_sql('c_acctbal')}) AS BIGINT) / 100.0)
              * (CAST(SUM({cents_sql('c_acctbal')}) AS BIGINT) / 100.0) / COUNT(*))
           / (COUNT(*) - 1)) END, 6) AS std_bal,
       ROUND(CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE), 6) AS median_bal,
       COUNT(*) AS n
FROM customer
GROUP BY c_mktsegment
""",
    doc="A6: avg/stddev/median stats ([cap]; notebook describe()-style "
        "exploration). stddev is spelled out over exact integer sums in "
        "both engines so internal algorithm differences (Welford vs "
        "naive) can't leak (parity_notes rule 5). The squared-cents "
        "sum (~1e12 per row) uses wide_sum's hi/lo split accumulation "
        "— a LONG total overflows at ~9e6 rows per segment, far below "
        "warehouse scale; the linear sum stays LONG (fits to ~1e15 "
        "rows per group).",
    tags=("agg",),
)
def a6_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal_c = cents("c_acctbal")
    n = F.count(F.lit(1))
    sum_c = F.sum(bal_c).cast("double")
    sumsq = wide_sum(bal_c * bal_c)
    var = (sumsq / 10000.0 - (sum_c / 100.0) * (sum_c / 100.0) / n) / (n - 1)
    return cust.groupBy("c_mktsegment").agg(
        money_avg("c_acctbal").alias("avg_bal"),
        F.round(F.when(n > 1, F.sqrt(var)), 6).alias("std_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("median_bal"),
        n.alias("n"),
    )


# ---------------------------------------------------------------------------
# §2.6 sort / limit


@register(
    "o1_global_sort",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate, o_orderkey
""",
    doc="O1: global sort (ORDER BY trip_start, trips_lambda.py:163). "
        "Spark plans a range-partitioned sort: sample -> range exchange "
        "-> per-partition sort, no single-node bottleneck.",
    tags=("sort",),
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    ).orderBy("o_orderdate", "o_orderkey")


@register(
    "o2_topk",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    doc="O2: top-k ([cap]). Spark executes as TakeOrderedAndProject "
        "(per-partition heap + driver merge of k rows), never a full "
        "sort. Tiebreak on o_orderkey keeps the result deterministic.",
    tags=("sort",),
)
def o2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(10)


# ---------------------------------------------------------------------------
# §2.7 set operations


@register(
    "set1_union_all",
    oracle="""
SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
""",
    doc="SET1: UNION ALL via unionByName (the reference's two-source "
        "merge J8 is the python analogue, weather_lambda.py:129-144).",
    tags=("set",),
)
def set1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal"))
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal"))
    return cust.unionByName(supp)


@register(
    "set2_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="SET2: distinct union.",
    tags=("set",),
)
def set2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@register(
    "set3_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="SET3: INTERSECT (distinct semantics).",
    tags=("set",),
)
def set3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "set4_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
""",
    doc="SET4: EXCEPT (distinct semantics) — high-balance customers "
        "without a large order.",
    tags=("set",),
)
def set4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer") \
        .filter(F.col("c_acctbal") > 9000) \
        .select(F.col("c_custkey").alias("custkey"))
    big = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_totalprice") > 250000) \
        .select(F.col("o_custkey").alias("custkey"))
    return cust.subtract(big)


@register(
    "a7_salted_agg",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value * 100 AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events GROUP BY event_type
""",
    doc="A7 [cap]: two-phase SALTED aggregation for hot keys "
        "(operators/skew.py) — events has only 5 event_type values, so "
        "every row of a 100 TB log lands on 5 reducers under a naive "
        "groupBy; salting spreads each key over 16 buckets and merges "
        "partials (identical result for decomposable aggregates, "
        "verified here by hash-matching the plain-GROUP BY oracle).",
    tags=("agg", "skew"),
)
def a7_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_spark.operators.skew import salted_agg
    from data_warehouse_spark.queries.util import cents
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev.withColumn("v_cents", cents("value")),
        keys=["event_type"],
        partial_aggs={"n": F.count(F.lit(1)), "s": F.sum("v_cents")},
        merge_aggs={"n": F.sum("n"), "s": F.sum("s")},
        salt_buckets=16,
    )
    return out.select("event_type", F.col("n").cast("long").alias("n"),
                      (F.col("s").cast("long") / 100.0).alias("sum_value"))


@register(
    "a8_approx_agg",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(*) AS n,
       TRUE AS users_within_4rsd,
       TRUE AS median_within_rank_bound
FROM events GROUP BY event_type
""",
    doc="A8: approximate aggregates for interactive 100 TB profiling — "
        "approx_count_distinct (HyperLogLog++, fixed-size sketch vs "
        "a4's exact shuffle of every distinct value) and approx_"
        "percentile (KLL-style, single pass vs a6's exact percentile "
        "sort). Sketches merge associatively, so the shuffle carries "
        "one sketch per partition per group regardless of cardinality; "
        "rsd/accuracy knobs trade sketch bytes for error. The raw "
        "estimates can't hash-match across engines (DuckDB's HLL "
        "differs bit-for-bit), but the CONTRACT is deterministic and "
        "is what this query emits: the exact answers plus boolean "
        "verdicts that the estimates land inside their certified "
        "bounds (|approx-exact| <= 4*rsd*exact for HLL — 4 rsd so a "
        "fixture REGENERATION can't fail the hash gate on a 3-4 rsd "
        "draw with no code defect; the tighter 3 rsd check lives in "
        "pytest — and the approx median inside a DISCRETE p45..p55 "
        "rank envelope). The "
        "envelope percentiles are nearest-rank (percentile_approx at "
        "10x the median's accuracy), NOT interpolated: an interpolated "
        "p45/p55 can exclude every actual data value in a small group "
        "(2 rows {0,100} -> p45=45, p55=55, median estimate 0), while "
        "rank-based bounds are data values ordered by rank, so the "
        "envelope holds for ANY group size — exactly when both "
        "sketches are exact (n <= accuracy) and by disjoint rank-error "
        "intervals (n/1e4 + n/1e5 < 0.05n) when not. The oracle "
        "replays the exact branch and literal TRUE, so the driver hash "
        "certifies the contract; tests/test_properties.py keeps the "
        "tighter numeric bounds.",
    tags=("agg", "approx"),
)
def a8_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # The sketch branch and the exact COUNT(DISTINCT) branch are
    # SEPARATE aggregations joined on the 5-row group key (second r10
    # review pass): countDistinct's Expand rewrite in the same
    # aggregate as percentile_approx's TypedImperativeAggregate
    # buffers forces the sort-based ObjectHashAggregate fallback,
    # which re-serializes the QuantileSummaries per row — measured
    # 14.0 s at sf0.1 for aggregates that cost 0.1-0.6 s apart (the
    # grid's worst cell); split + broadcast join reads ~0.9 s. Both
    # envelope bounds come from ONE accuracy-1e5 sketch (array-of-
    # percentiles form — same sketch, identical values). At 100 TB
    # the exact branch is the audit pass; the sketch branch is the
    # daily one, and keeping them in separate plans is also how the
    # warehouse would schedule them.
    sketches = (ev.groupBy("event_type")
                .agg(F.approx_count_distinct("user_id", rsd=0.02)
                     .alias("approx_users"),
                     F.percentile_approx("value", F.lit(0.5),
                                         F.lit(10000))
                     .alias("approx_median_value"),
                     F.percentile_approx(
                         "value", F.array(F.lit(0.45), F.lit(0.55)),
                         F.lit(100000)).alias("p_env"),
                     F.count(F.lit(1)).alias("n")))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_users")))
    agg = (sketches.alias("s")
           .join(exact.alias("x"),
                 F.col("s.event_type").eqNullSafe(F.col("x.event_type")))
           .select(F.col("s.event_type").alias("event_type"),
                   "approx_users", "exact_users",
                   "approx_median_value", "n",
                   F.col("p_env")[0].alias("p45"),
                   F.col("p_env")[1].alias("p55")))
    return agg.select(
        "event_type", "exact_users", "n",
        # 4 rsd certified (round-10 advice fix): the hash gate must
        # survive a fixture REGENERATION, and a redrawn fixture has a
        # small per-group chance of a 3-4 rsd HLL estimate with no code
        # defect; the tighter 3 rsd numeric check stays in pytest
        # (tests/test_properties.py) where a flake is diagnosable.
        (F.abs(F.col("approx_users") - F.col("exact_users"))
         <= 4 * 0.02 * F.col("exact_users")).alias("users_within_4rsd"),
        # coalesce TRUE: a group whose every value is NULL has no
        # estimate to bound (percentile_approx returns NULL on all
        # three), and the contract is trivially satisfied — without the
        # guard the NULL verdict would hash-mismatch the oracle's TRUE
        F.coalesce(
            F.col("approx_median_value").between(F.col("p45"), F.col("p55")),
            F.lit(True)).alias("median_within_rank_bound"))


@register(
    "a9_pivot",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS not_specified,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS low
FROM orders
GROUP BY 1
""",
    doc="A9: PIVOT — long-to-wide reshaping (revenue by year x "
        "priority), the reporting surface every warehouse exposes. "
        "df.groupBy().pivot(col, values) with the value list given "
        "explicitly: Catalyst then compiles it to ONE pass of "
        "conditional aggregates (exactly the CASE WHEN form the oracle "
        "spells out) instead of first running a distinct-values job; "
        "at 100 TB that both removes a scan and keeps the output "
        "schema statically known. Sums run in the exact integer-cents "
        "domain (util.money_sum pattern) so the pivot cells are "
        "bit-identical across engines and shuffle orders.",
    tags=("agg", "pivot"),
)
def a9_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pri = {"1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium",
           "4-NOT SPECIFIED": "not_specified", "5-LOW": "low"}
    orders = load_table(spark, sf_dir, "orders")
    wide = (orders
            .select(F.year("o_orderdate").alias("order_year"),
                    "o_orderpriority", "o_totalprice")
            .groupBy("order_year")
            .pivot("o_orderpriority", list(pri))
            .agg(money_sum("o_totalprice")))
    out = wide.select("order_year",
                      *[F.coalesce(F.col(f"`{v}`"), F.lit(0.0)).alias(alias)
                        for v, alias in pri.items()])
    return out


@register(
    "a10_unpivot",
    oracle="""
WITH src AS (
    SELECT c_nationkey,
           ROUND(CAST(CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 / COUNT(*), 6) AS avg_bal,
           ROUND(MAX(c_acctbal), 6) AS max_bal,
           ROUND(MIN(c_acctbal), 6) AS min_bal
    FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, 'avg_bal' AS metric, avg_bal AS value FROM src
UNION ALL
SELECT c_nationkey, 'max_bal', max_bal FROM src
UNION ALL
SELECT c_nationkey, 'min_bal', min_bal FROM src
""",
    doc="A10: UNPIVOT/melt — wide-to-long reshaping, the inverse of A9 "
        "and the shape metric stores and chart layers consume. Uses "
        "the native DataFrame.unpivot (Spark 3.4+): one Expand node "
        "emits the three (metric, value) rows per input row in a "
        "single pass — the plan never unions three scans the way the "
        "SQL spelling suggests. avg uses the exact integer-cents sum "
        "(util.money_avg) so the 6dp rounding is order-independent.",
    tags=("agg", "pivot"),
)
def a10_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    wide = cust.groupBy("c_nationkey").agg(
        F.round(money_avg("c_acctbal"), 6).alias("avg_bal"),
        F.round(F.max("c_acctbal"), 6).alias("max_bal"),
        F.round(F.min("c_acctbal"), 6).alias("min_bal"))
    return wide.unpivot(
        ids=["c_nationkey"], values=["avg_bal", "max_bal", "min_bal"],
        variableColumnName="metric", valueColumnName="value")
