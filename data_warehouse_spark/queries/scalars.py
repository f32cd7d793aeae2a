"""Scalar-function operators (SURVEY §2.8 F1-F12).

Everything stays in built-in column expressions (JVM codegen) — the
reference's only nontrivial scalar (haversine) was likewise in-engine
SQL math, not app code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_spark.functions.geo import haversine_km, haversine_km_sql
from data_warehouse_spark.functions.timeutils import to_local
from data_warehouse_spark.io import load_table
from data_warehouse_spark.queries.registry import register


@register(
    "f1_timezone",
    oracle="""
SELECT event_id, ts,
       CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Zurich' AS TIMESTAMP) AS local_ts
FROM events
WHERE event_id < 2000
""",
    doc="F1: UTC -> Europe/Zurich wall-clock conversion "
        "(trips_lambda.py:99,102). Spark: from_utc_timestamp with the "
        "session pinned to UTC.",
    tags=("scalar",),
)
def f1_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", "ts", to_local(F.col("ts")).alias("local_ts"))


@register(
    "f2_epoch_diff",
    oracle="""
SELECT event_id,
       (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) / 1000000.0 / 60.0
         AS minutes_since_epoch0
FROM events WHERE event_id < 2000
""",
    doc="F2: interval -> epoch seconds/minutes (EXTRACT(EPOCH FROM ...)"
        "/60.0, trips_lambda.py:118,128). Integer microseconds divided "
        "once -> engine-identical doubles.",
    tags=("scalar",),
)
def f2_epoch_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    return ev.select(
        "event_id",
        ((F.unix_micros("ts") - F.unix_micros(t0)) / 1_000_000.0 / 60.0)
        .alias("minutes_since_epoch0"),
    )


@register(
    "f3_haversine",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       ROUND({haversine_km_sql('(l_partkey % 180) - 90.0',
                               '(l_suppkey % 360) - 180.0',
                               '(l_orderkey % 180) - 90.0',
                               '((l_orderkey + l_partkey) % 360) - 180.0')}, 6) AS dist_km
FROM lineitem
WHERE l_orderkey < 5000
""",
    doc="F3+F4: haversine distance as pure column math "
        "(trips_lambda.py:119-125) on deterministic integer-derived "
        "coordinates; round(6) absorbs libm sin/cos ulp differences.",
    tags=("scalar",),
)
def f3_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    lat1 = (F.col("l_partkey") % 180) - 90.0
    lon1 = (F.col("l_suppkey") % 360) - 180.0
    lat2 = (F.col("l_orderkey") % 180) - 90.0
    lon2 = ((F.col("l_orderkey") + F.col("l_partkey")) % 360) - 180.0
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(haversine_km(lat1, lon1, lat2, lon2), 6).alias("dist_km"),
    )


@register(
    "f4_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
       l_quantity / 60.0 AS qty_per_min,
       l_quantity - l_quantity * l_discount AS kept_qty,
       l_orderkey // 3 AS key_div3,
       l_partkey % 7 AS part_mod7,
       -l_discount AS neg_disc
FROM lineitem WHERE l_orderkey < 5000
""",
    doc="F4: arithmetic / division column operators — the reference's "
        "`/60.0`, `*`, `-` class (trips_lambda.py:118-119, the "
        "duration_minutes math). Standalone gate row (r14 verdict ask "
        "#5): previously exercised only inside f2/f3. Double `*`/`-`"
        "/`/` with a pinned operand order is IEEE-exact cross-engine "
        "(no ROUND needed); integer `div`/`%` pin the truncating "
        "semantics both engines share on non-negative operands.",
    tags=("scalar",),
)
def f4_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
        .alias("net_price"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
         * (F.lit(1) + F.col("l_tax"))).alias("gross_price"),
        (F.col("l_quantity") / F.lit(60.0)).alias("qty_per_min"),
        (F.col("l_quantity") - F.col("l_quantity") * F.col("l_discount"))
        .alias("kept_qty"),
        F.expr("l_orderkey div 3").alias("key_div3"),
        (F.col("l_partkey") % 7).alias("part_mod7"),
        (-F.col("l_discount")).alias("neg_disc"),
    )


@register(
    "f5_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
       CAST('2020-05-05 01:02:03' AS TIMESTAMP) AS fixed_ts
FROM orders WHERE o_orderkey < 3000
""",
    doc="F5: casts (reference: %s::timestamp, trips_lambda.py:106).",
    tags=("scalar",),
)
def f5_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        # date rendered as ISO string: DateType round-trips differently
        # through Arrow/pandas in each engine, the string is unambiguous
        F.col("o_orderdate").cast("date").cast("string").alias("odate"),
        F.lit("2020-05-05 01:02:03").cast("timestamp").alias("fixed_ts"),
    )


@register(
    "f6_date_format",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M') AS ts_fmt, strftime(ts, '%Y-%m') AS ym
FROM events WHERE event_id < 2000
""",
    doc="F6: date formatting (notebook strftime('%Y-%m-%d %H:%M')).",
    tags=("scalar",),
)
def f6_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ts_fmt"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
    )


@register(
    "f7_current_timestamp",
    oracle="SELECT COUNT(*) AS n, TRUE AS stamped_within_job FROM events",
    doc="F7: ingest-time stamping (datetime.now() at ingest, "
        "bike_lambda.py:62; CURRENT_TIMESTAMP notebook cell 3). The "
        "raw stamp is nondeterministic by nature, so the certified "
        "output is the freeze-compare CONTRACT: current_timestamp() "
        "(fixed at query start) must land inside a wall-clock "
        "envelope read AT EXECUTION by a one-row mapInPandas stamp "
        "(OS clock on the executor; same host clock in local mode), "
        "emitted as a boolean the oracle replays as literal TRUE. "
        "Because BOTH clocks are read when the action runs — not at "
        "plan build — the envelope stays tight (start >= stamp - 1 h "
        "query-runtime allowance, start <= stamp + 5 min skew guard) "
        "without failing cached-plan consumers: r10's +24 h hi "
        "existed only to absorb a day-long build-then-execute gap "
        "and accepted a day-fast driver clock (r11 advice fix). "
        "Queries running longer than 1 h re-certify per stage in "
        "practice; a single gate query exceeding it is out of "
        "contract (documented here).",
    tags=("scalar",),
)
def f7_current_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _stamp(batches):
        import datetime as dt
        import pandas as pd
        # naive UTC: the session timeZone is pinned UTC (session.py),
        # so a naive pandas timestamp round-trips as UTC wall time
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        for _ in batches:
            pass  # drain the 1-row input; output is the stamp alone
        yield pd.DataFrame({"exec_now": [pd.Timestamp(now)]})

    # numPartitions=1: mapInPandas runs once per PARTITION (empty ones
    # included), so an unpinned range would stamp 32 rows
    stamp = (spark.range(0, 1, numPartitions=1)
             .mapInPandas(_stamp, "exec_now timestamp"))
    ev = load_table(spark, sf_dir, "events")
    return (ev.agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(stamp))  # 1x1, broadcast scalar
            .select(
                "n",
                F.current_timestamp().between(
                    F.col("exec_now") - F.expr("INTERVAL 1 HOUR"),
                    F.col("exec_now") + F.expr("INTERVAL 5 MINUTES"))
                .alias("stamped_within_job")))


@register(
    "f8_strings",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       lower(p_name) AS name_l,
       substring(p_type, 1, 5) AS type5,
       concat(p_brand, '#', p_type) AS brand_type,
       regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
       (p_type LIKE '%BRASS%') AS is_brass,
       CAST(length(p_name) AS INT) AS name_len,
       trim('  pad  ') AS trimmed
FROM part
""",
    doc="F8: string functions ([cap]; .strip() config parsing "
        "trips_lambda.py:17-21, city keys air_lambda.py:25-32).",
    tags=("scalar",),
)
def f8_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_name").alias("name_l"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.length("p_name").alias("name_len"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


@register(
    "f9_json",
    oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events WHERE event_type = 'purchase'
""",
    doc="F9: JSON field extraction — the engine-side equivalent of the "
        "reference's python parsing of nested API payloads "
        "(bike_lambda.py:58, air_lambda.py:57-60).",
    tags=("scalar",),
)
def f9_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "f10_null_handling",
    oracle="""
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
       (l_tax IS NULL) AS tax_missing
FROM lineitem WHERE l_orderkey < 5000
""",
    doc="F10: NULL defaults (.get(..., None) -> NULL columns, "
        "weather_lambda.py:91-94): coalesce / nullif.",
    tags=("scalar",),
)
def f10_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0))
        .alias("disc_or_flag"),
        F.isnull("l_tax").alias("tax_missing"),
    )


@register(
    "f11_arrays",
    oracle="""
SELECT vec_id, label,
       CAST(len(embedding) AS INT) AS dim,
       embedding[1] AS first_elem,
       CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
         + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head_sum
FROM embeddings
""",
    doc="F11 [ext]: array functions over the embedding column. head_sum "
        "is an explicit fixed-order float32->double chain so both "
        "engines add identically.",
    tags=("scalar", "ext"),
)
def f11_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    d = [F.element_at(e, i).cast("double") for i in (1, 2, 3, 4)]
    return emb.select(
        "vec_id", "label",
        F.size(e).alias("dim"),
        F.element_at(e, 1).alias("first_elem"),
        (d[0] + d[1] + d[2] + d[3]).alias("head_sum"),
    )


@register(
    "f12_case",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS band,
       COUNT(*) AS n
FROM orders GROUP BY 1
""",
    doc="F12: conditional CASE buckets ([cap]).",
    tags=("scalar",),
)
def f12_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = (F.when(F.col("o_totalprice") < 50000, "small")
             .when(F.col("o_totalprice") < 200000, "medium")
             .otherwise("large"))
    return orders.groupBy(band.alias("band")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "a13_histogram",
    oracle="""
WITH binned AS (
    SELECT o_orderpriority,
           CAST(LEAST(GREATEST(FLOOR((o_totalprice - 0.0) / 50000.0),
                               0), 11) AS INT) AS bucket,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
    FROM orders
)
SELECT o_orderpriority, bucket, COUNT(*) AS n,
       CAST(SUM(price_c) AS BIGINT) / 100.0 AS sum_price
FROM binned GROUP BY o_orderpriority, bucket
""",
    doc="A13 [cap]: equi-width histogram binning + per-bin rollup (the "
        "distribution-profiling pass any data-quality report runs). "
        "The bin id is explicit clamped floor arithmetic — IEEE double "
        "ops are bit-identical across engines, so the assignment "
        "itself is oracle-verified (Spark's width_bucket / DuckDB's "
        "missing twin would each hide engine-specific edge handling). "
        "Pure codegen projection + one group-sized aggregate: the same "
        "scan-shaped plan as a1 at any scale.",
    tags=("agg", "scalar"),
)
def a13_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_spark.queries.util import cents
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(F.floor((F.col("o_totalprice") - F.lit(0.0)) / F.lit(50000.0)),
                   F.lit(0)),
        F.lit(11)).cast("int")
    return (orders.select(
        "o_orderpriority", bucket.alias("bucket"),
        cents("o_totalprice").alias("price_c"))
        .groupBy("o_orderpriority", "bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum("price_c") / F.lit(100.0)).alias("sum_price")))


@register(
    "f13_url_parse",
    oracle="""
WITH urls AS (
    SELECT c_custkey,
           'https://' || lower(replace(c_mktsegment, ' ', '')) ||
           '.example.com/cust/' || CAST(c_custkey AS VARCHAR) ||
           '?seg=' || lower(c_mktsegment) AS url
    FROM customer
)
SELECT c_custkey,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, 'seg=([^&#]*)', 1) AS seg
FROM urls
""",
    doc="F13 [cap]: URL parsing — host/path/query-param extraction, the "
        "first shredding pass over any web-crawl corpus. URLs are "
        "synthesized deterministically from customer columns (the "
        "fixtures carry none), then parsed with Spark's parse_url "
        "(java.net.URI under codegen); the oracle re-derives the same "
        "components with anchored regexes, so the parse itself is "
        "cross-checked rather than assumed. Map-only: no shuffle at "
        "any scale.",
    tags=("scalar", "text"),
)
def f13_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit(""))),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?seg="), F.lower(F.col("c_mktsegment")))
    with_url = cust.select("c_custkey", url.alias("url"))
    return with_url.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("seg")).alias("seg"),
    )
