"""U7 honest history>>delta lane (round-14, VERDICT r13 ask #1).

The design claim under test: incremental_rollup exists to beat the
full recompute when history >> delta — the maintained rollup is the
persisted artifact, the nightly delta is small, and merge cost must be
FLAT in history size while rebuild grows with it. The old FLOORFREE
lane amplified history and delta TOGETHER (the r13 verdict's worst
recorded cell, 15.2x@64x), which let DuckDB's full recompute stay
trivially cheap while Spark paid fixed merge machinery — the lane, not
the operator, was wrong.

Protocol, per history multiplier m (16, 64, 256, 1024 of sf0.1's
100k-row events => 1.6M..102.4M history rows):

  1. history = the amplified events table (floorfree's build_amplified,
     events only — the same salted artifact class the correctness gate
     checks);
  2. delta = the FIXED 1x sf0.1 events table, ids offset to a disjoint
     space, written once — identical bytes read by both engines at
     every multiplier;
  3. the maintained STATE = roll(history) written to parquet UNTIMED
     (that write was last night's run; group-cardinality-sized — 5
     rows here);
  4. timed per engine, best-of-3:
       merge   = agg(delta) full-outer-merged into the state read from
                 parquet (Spark: operators/merge.incremental_rollup;
                 DuckDB: the equivalent COALESCE/least/greatest
                 full-outer SQL) — must be FLAT in m;
       rebuild = the full recompute GROUP BY over history UNION ALL
                 delta — must grow ~linearly in m;
  5. values: all four result sets (spark/duck x merge/rebuild) are
     pulled (group cardinality = 5 rows) and compared exactly — the
     merge-equals-rebuild contract, cross-engine, at every multiplier.

Output: one JSON line per multiplier -> .r14/u7_lane.json and a
SCALE.md table.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_spark.io import load_table  # noqa: E402
from data_warehouse_spark.operators.merge import incremental_rollup  # noqa: E402
from data_warehouse_spark.queries.util import cents  # noqa: E402
from data_warehouse_spark.session import get_spark  # noqa: E402
from tools.floorfree import build_amplified  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/floorfree"
LANE = "/tmp/u7_lane"
MULTS = [int(m) for m in (sys.argv[1].split(",") if len(sys.argv) > 1
                          else ["16", "64", "256", "1024"])]

spark = get_spark("u7lane")


def roll(df):
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("value")).alias("sum_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"))


def present(df):
    return df.select(
        "event_type", "n", "sum_cents",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"))


def rows_of(df):
    return sorted((r.event_type, r.n, r.sum_cents, r.min_value,
                   r.max_value) for r in df.collect())


def rows_of_duck(con, sql):
    return sorted(tuple(t) for t in con.execute(sql).fetchall())


# --- fixed 1x delta, written once, read by both engines everywhere ---
delta_path = f"{LANE}/delta.parquet"
if not Path(delta_path, "_SUCCESS").exists():
    (load_table(spark, SRC, "events")
     .select((F.col("event_id") + F.lit(10 ** 15)).alias("event_id"),
             "event_type", "value")
     .repartition(8).write.mode("overwrite").parquet(delta_path))
delta = spark.read.parquet(delta_path)

DUCK_AGG = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM {src} GROUP BY event_type
"""
DUCK_PRESENT = """
SELECT event_type, n, sum_cents,
       ROUND(min_value, 6) AS min_value, ROUND(max_value, 6) AS max_value
FROM ({inner}) AS __p
"""

results = []
for m in MULTS:
    amp = build_amplified(spark, SRC, OUT, m, tables=["events"])
    hist_raw = f"{amp}/events.parquet"
    state_path = f"{LANE}/state_{m}.parquet"
    if not Path(state_path, "_SUCCESS").exists():
        # last night's state: group-cardinality-sized, written untimed
        roll(spark.read.parquet(hist_raw)
             .select("event_id", "event_type", "value")) \
            .coalesce(1).write.mode("overwrite").parquet(state_path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW hist AS SELECT * FROM "
                f"read_parquet('{hist_raw}/*.parquet')")
    con.execute(f"CREATE VIEW delta AS SELECT * FROM "
                f"read_parquet('{delta_path}/*.parquet')")
    con.execute(f"CREATE VIEW state AS SELECT * FROM "
                f"read_parquet('{state_path}/*.parquet')")

    # --- Spark: merge (state + delta agg, full-outer monoid merge) ---
    def spark_merge():
        return present(incremental_rollup(
            spark.read.parquet(state_path), roll(delta),
            keys=["event_type"],
            merges={"n": "sum", "sum_cents": "sum",
                    "min_value": "min", "max_value": "max"}))

    # --- Spark: rebuild (full recompute over history + delta) ---
    def spark_rebuild():
        ev = (spark.read.parquet(hist_raw)
              .select("event_type", "value")
              .unionByName(delta.select("event_type", "value")))
        return present(roll(ev))

    sm = sr = None
    for _ in range(3):
        t0 = time.time()
        spark_merge().write.format("noop").mode("overwrite").save()
        sm = min(sm or 1e9, time.time() - t0)
        t0 = time.time()
        spark_rebuild().write.format("noop").mode("overwrite").save()
        sr = min(sr or 1e9, time.time() - t0)

    # --- DuckDB: merge (same state artifact + delta agg) ---
    duck_merge_sql = DUCK_PRESENT.format(inner=f"""
WITH d AS ({DUCK_AGG.format(src='delta')})
SELECT COALESCE(h.event_type, d.event_type) AS event_type,
       COALESCE(h.n, 0) + COALESCE(d.n, 0) AS n,
       COALESCE(h.sum_cents, 0) + COALESCE(d.sum_cents, 0) AS sum_cents,
       LEAST(h.min_value, d.min_value) AS min_value,
       GREATEST(h.max_value, d.max_value) AS max_value
FROM state h FULL OUTER JOIN d ON h.event_type = d.event_type
""")
    duck_rebuild_sql = DUCK_PRESENT.format(inner=DUCK_AGG.format(
        src="(SELECT event_type, value FROM hist UNION ALL "
            "SELECT event_type, value FROM delta) AS __u"))

    dm = dr = None
    for _ in range(3):
        t0 = time.time()
        con.execute(duck_merge_sql).df()
        dm = min(dm or 1e9, time.time() - t0)
        t0 = time.time()
        con.execute(duck_rebuild_sql).df()
        dr = min(dr or 1e9, time.time() - t0)

    # --- merge-equals-rebuild, cross-engine, every multiplier ---
    a = rows_of(spark_merge())
    b = rows_of(spark_rebuild())
    c = rows_of_duck(con, duck_merge_sql)
    d = rows_of_duck(con, duck_rebuild_sql)
    values_match = (a == b == c == d) and len(a) == 5

    row = {"mult": m, "history_rows": m * 100_000, "delta_rows": 100_000,
           "spark_merge_s": round(sm, 3), "spark_rebuild_s": round(sr, 3),
           "duckdb_merge_s": round(dm, 3), "duckdb_rebuild_s": round(dr, 3),
           "merge_ratio": round(sm / dm, 2),
           "rebuild_ratio": round(sr / dr, 2),
           "spark_merge_speedup_vs_rebuild": round(sr / sm, 2),
           "duckdb_merge_speedup_vs_rebuild": round(dr / dm, 2),
           "values_match": values_match}
    results.append(row)
    print(json.dumps(row), flush=True)
    con.close()

(REPO / ".r14" / "u7_lane.json").write_text(
    json.dumps(results, indent=2) + "\n")
assert all(r["values_match"] for r in results), "merge != rebuild"
# the lane's claim: merge wall is FLAT in history size (allow 2x noise
# band over the 64x span) while rebuild grows with it on both engines
flat = results[-1]["spark_merge_s"] <= 2 * results[0]["spark_merge_s"]
print("spark merge flat across history sizes:", flat)
