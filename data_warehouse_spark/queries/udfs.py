"""UDF/UDAF/UDTF surface (SURVEY §2.11 UDF1-UDF4) + spatial join J9.

Policy (SURVEY §2.11): built-in expressions first — every UDF here
demonstrates the escape hatch on a computation whose oracle twin is
still expressible, so the plumbing itself is hash-verified.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_warehouse_spark.io import load_table
from data_warehouse_spark.queries.registry import register
from data_warehouse_spark.queries.util import money_sum_sql


@register(
    "udf1_row_scalar",
    oracle="""
SELECT o_orderkey, 'key=' || CAST(o_orderkey AS VARCHAR) AS tagged
FROM orders WHERE o_orderkey < 2000
""",
    doc="UDF1: row-at-a-time Python UDF — the documented escape hatch "
        "(and why it's last resort: per-row serde, no codegen). Kept "
        "tiny and filtered.",
    tags=("udf",),
)
def udf1_row_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = F.udf(lambda k: f"key={k}", "string")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return orders.select("o_orderkey", tag("o_orderkey").alias("tagged"))


@register(
    "udf2_pandas_scalar",
    oracle="""
SELECT p_partkey, reverse(p_name) AS name_rev, length(p_name) * 2 AS dlen
FROM part
""",
    doc="UDF2: vectorized pandas_udf (Arrow batches) — the preferred "
        "Python path, ~10-100x over UDF1.",
    tags=("udf",),
)
def udf2_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("string")
    def rev(s: pd.Series) -> pd.Series:
        return s.map(lambda x: x[::-1])

    @pandas_udf("int")
    def dlen(s: pd.Series) -> pd.Series:
        return (s.str.len() * 2).astype("int32")

    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", rev("p_name").alias("name_rev"),
                       dlen("p_name").alias("dlen"))


@register(
    "udf3_grouped_pandas",
    oracle=f"""
SELECT l_returnflag, {money_sum_sql('l_quantity')} AS qty_total, COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    doc="UDF3: applyInPandas grouped-map (UDAF-equivalent). The group "
        "sum runs in integer cents inside pandas, matching the exact-"
        "integer oracle (parity_notes rule 1).",
    tags=("udf",),
)
def udf3_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["l_quantity"] * 100).round().astype("int64")
        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "qty_total": [cents.sum() / 100.0],
            "n": [len(pdf)],
        })

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return li.groupBy("l_returnflag").applyInPandas(
        agg, schema="l_returnflag string, qty_total double, n long")


@register(
    "udf4_udtf_words",
    oracle="""
SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
FROM documents WHERE doc_id < 50
""",
    doc="UDF4: table-function surface — one input row to many output "
        "rows via mapInPandas (the engine's UDTF path; explode covers "
        "the built-in case).",
    tags=("udf",),
)
def udf4_udtf_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)

    def split_words(batches):
        import re
        for pdf in batches:
            out_ids, out_words = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # mirror the oracle's trim/\s semantics exactly: SQL
                # trim strips SPACES only and RE2/Java \s is the ASCII
                # class — Python's .strip() / unicode-aware \s would
                # diverge on edge tabs/newlines/NBSP
                for w in re.split(r"[ \t\n\x0b\f\r]+",
                                  text.strip(" ").lower()):
                    out_ids.append(doc_id)
                    out_words.append(w)
            yield pd.DataFrame({"doc_id": out_ids, "word": out_words})

    return docs.select("doc_id", "text").mapInPandas(
        split_words, schema="doc_id long, word string")


# Five deterministic test regions as true polygon rings (lon, lat):
# four diamonds (non-axis-aligned edges) and one concave chevron
# (region 2 — a rectangle with a V-notch cut into its top edge), so the
# exact test cannot be faked by a bbox check. The SQL oracle's edge
# table is generated from THIS literal, so the two sides cannot drift.
_POLYGONS: list[tuple[int, list[tuple[float, float]]]] = [
    (0, [(-140.0, 29.0), (-126.0, 15.0), (-140.0, 1.0), (-154.0, 15.0)]),
    (1, [(-70.0, 51.0), (-54.0, 35.0), (-70.0, 19.0), (-86.0, 35.0)]),
    (2, [(-16.0, 70.0), (0.0, 54.0), (16.0, 70.0), (16.0, 40.0), (-16.0, 40.0)]),
    (3, [(60.0, 43.0), (78.0, 25.0), (60.0, 7.0), (42.0, 25.0)]),
    (4, [(120.0, 82.0), (132.0, 74.0), (127.0, 58.0), (113.0, 58.0), (108.0, 74.0)]),
]


def _polygon_edges_sql() -> str:
    rows = []
    for rid, ring in _POLYGONS:
        for i, (x1, y1) in enumerate(ring):
            x2, y2 = ring[(i + 1) % len(ring)]
            rows.append(f"({rid}, {x1}, {y1}, {x2}, {y2})")
    return ",\n  ".join(rows)


@register(
    "j9_spatial_join",
    oracle=f"""
WITH pts AS (
    SELECT event_id, value % 90 AS lat,
           ((event_id * 97) % 36000) / 100.0 - 180.0 AS lon
    FROM events
), edges(region_id, x1, y1, x2, y2) AS (VALUES
  {_polygon_edges_sql()}
)
SELECT p.event_id, CAST(e.region_id AS BIGINT) AS region_id
FROM pts p JOIN edges e
  ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
 AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
GROUP BY p.event_id, e.region_id
HAVING COUNT(*) % 2 = 1
""",
    doc="J9: exact point-in-polygon spatial join ([declared] "
        "README.md:12,16; enrichment columns trips_lambda.py:65-66). "
        "Grid-cell bucketing + bbox equi-join prefilter, then an "
        "even-odd ray cast in an Arrow-batched pandas UDF "
        "(operators/spatial.py) — never a nested loop over all "
        "(point, region) pairs. Regions include a concave chevron; the "
        "oracle ray-casts in pure SQL (crossing parity over an edge "
        "table), so containment is hash-verified edge for edge.",
    tags=("join", "spatial", "udf"),
)
def j9_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_warehouse_spark.operators.spatial import point_in_polygon_exact

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        (F.col("value") % 90).alias("lat"),
        # the *97 spread makes small-id tiers (sf0.001: event_id < 1000)
        # cover the full longitude range — a bare (id % 36000) confined
        # smoke-tier points to [-180, -170], west of every polygon, so
        # the smoke gate exercised zero containment candidates
        (((F.col("event_id") * 97) % 36000) / 100.0 - 180.0).alias("lon"))
    polys = spark.createDataFrame(
        [(rid, ring) for rid, ring in _POLYGONS],
        "region_id long, ring array<struct<lon: double, lat: double>>")
    out = point_in_polygon_exact(pts, polys, cell_deg=5.0)
    return out.select("event_id", "region_id")
