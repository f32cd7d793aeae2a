"""Property tests (SURVEY §5): invariants over randomized-but-seeded
inputs, batched into single DataFrames so each property costs one Spark
job, not one per example."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from data_warehouse_spark.functions.geo import haversine_km
from data_warehouse_spark.operators.merge import upsert
from data_warehouse_spark.operators.sessionize import with_session_id


def test_haversine_properties(spark):
    rng = random.Random(42)
    rows = [(i, rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9),
             rng.uniform(-89.9, 89.9), rng.uniform(-179.9, 179.9))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, lat1 double, lon1 double, "
                                     "lat2 double, lon2 double")
    checked = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat2"), F.col("lon2")).alias("d"),
        haversine_km(F.col("lat2"), F.col("lon2"),
                     F.col("lat1"), F.col("lon1")).alias("d_rev"),
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat1"), F.col("lon1")).alias("d_self"),
    )
    bad = checked.filter(
        (F.col("d") < 0) | (F.col("d") > 20015.1)          # half circumference
        | (F.abs(F.col("d") - F.col("d_rev")) > 1e-9)      # symmetry
        | (F.col("d_self") > 1e-9)).count()                # identity
    assert bad == 0


def test_upsert_algebraic_properties(spark):
    rng = random.Random(7)
    old = spark.createDataFrame(
        [(k, rng.randint(0, 100), "old") for k in range(200)],
        "k long, v long, src string")
    new = spark.createDataFrame(
        [(k, rng.randint(0, 100), "new") for k in range(100, 300)],
        "k long, v long, src string")

    once = upsert(old, new, keys=["k"])
    twice = upsert(once, new, keys=["k"])
    # idempotency: applying the same batch again changes nothing
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0
    # key coverage: result keys = old ∪ new, with new winning overlaps
    got = {r.k: r.src for r in once.collect()}
    assert set(got) == set(range(300))
    assert all(src == "new" for k, src in got.items() if k >= 100)
    assert all(src == "old" for k, src in got.items() if k < 100)


def test_sessionize_partition_invariance(spark):
    """Session assignment must not depend on physical partitioning —
    the property that guarantees identical results on any cluster
    layout (and under AQE re-planning)."""
    rng = random.Random(13)
    base_ts = 1_700_000_000
    rows = []
    for uid in range(20):
        t = base_ts + rng.randint(0, 3600)
        for i in range(50):
            t += rng.choice([30, 120, 4000])  # within-gap / new-session mix
            rows.append((uid, t, float(i)))
    df = spark.createDataFrame(rows, "user_id long, epoch long, value double") \
        .withColumn("ts", F.timestamp_seconds("epoch"))

    def sessions(d):
        out = with_session_id(d, key="user_id", ts="ts",
                              gap_seconds=1800.0, order_tiebreak="epoch")
        return {(r.user_id, r.epoch): r.session_id for r in out.collect()}

    a = sessions(df.repartition(1))
    b = sessions(df.repartition(17, "value"))  # adversarial layout
    assert a == b


def test_a8_approx_within_bounds(spark, sf_dir):
    """approx_count_distinct at rsd=0.02 and approx_percentile at
    accuracy=10000 must land near the exact answers."""
    from data_warehouse_spark.io import load_table
    from data_warehouse_spark.queries.registry import load_all

    approx = {r.event_type: r for r in
              load_all()["a8_approx_agg"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {r.event_type: r for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("users"),
                 F.expr("percentile(value, 0.5)").alias("median")).collect()}
    assert approx.keys() == exact.keys() and approx
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(2, 0.1 * e.users), et
        spread = abs(e.median) + 1e-9
        assert abs(a.approx_median_value - e.median) <= 0.05 * spread + 0.01, et
