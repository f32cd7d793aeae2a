"""REST/JSON ingestion sources (SURVEY §2.1 S2/S3).

The reference ingests from three HTTP APIs: a GBFS bike-status snapshot
(bike_lambda.py:20,54-58), OpenWeatherMap (weather_lambda.py), and WAQI
per-city air quality fanned out over ThreadPool(3) (air_lambda.py:37-60,
79-88). Spark-first, the network fetch runs INSIDE executor tasks —
parallelism is task parallelism, capped by partition count rather than a
client thread pool — and all JSON shredding is `from_json` with explicit
schemas (JVM-side, codegen), never driver-side dict walking.

This container has no network, so the fetch callable defaults to a
deterministic stub; production passes a `requests`-based fetcher with
the same signature. The partitioning, Arrow batching, schema handling,
and nested-field extraction are the real, tested engine surface.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# GBFS free_bike_status payload shape (bike_lambda.py:58 `data.bikes[]`).
GBFS_SCHEMA = T.StructType([
    T.StructField("data", T.StructType([
        T.StructField("bikes", T.ArrayType(T.StructType([
            T.StructField("bike_id", T.StringType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("lon", T.DoubleType()),
            T.StructField("is_reserved", T.BooleanType()),
            T.StructField("is_disabled", T.BooleanType()),
            T.StructField("provider_id", T.StringType()),
        ]))),
    ])),
    T.StructField("last_updated", T.LongType()),
])

GBFS_SAMPLE = {
    "data": {"bikes": [
        {"bike_id": "b1", "lat": 47.37, "lon": 8.54, "is_reserved": False,
         "is_disabled": False, "provider_id": "p1"},
        {"bike_id": "b2", "lat": 46.95, "lon": 7.45, "is_reserved": True,
         "is_disabled": False, "provider_id": "p1"},
        {"bike_id": "b3", "lat": 46.20, "lon": 6.14, "is_reserved": False,
         "is_disabled": True, "provider_id": "p2"},
    ]},
    "last_updated": 1700000000,
}


def parse_gbfs(raw: DataFrame, body_col: str = "body") -> DataFrame:
    """Shred raw GBFS JSON payloads into one row per bike observation.

    raw: DataFrame with a string column of JSON bodies (one per fetch).
    All extraction is from_json + explode — a scan-local, codegen'd
    projection; a 100 TB payload log shreds at full task parallelism.
    """
    parsed = raw.select(F.from_json(body_col, GBFS_SCHEMA).alias("j"))
    bikes = parsed.select(
        F.explode("j.data.bikes").alias("b"),
        F.timestamp_seconds(F.col("j.last_updated")).alias("observed_at"),
    )
    return bikes.select(
        F.col("b.bike_id").alias("bike_id"),
        F.col("b.provider_id").alias("provider_id"),
        F.col("b.lat").alias("lat"), F.col("b.lon").alias("lon"),
        F.col("b.is_reserved").alias("is_reserved"),
        F.col("b.is_disabled").alias("is_disabled"),
        "observed_at",
    )


def gbfs_sample_frame(spark: SparkSession) -> DataFrame:
    """One embedded sample payload as a raw-body DataFrame (network
    stand-in for bike_lambda.py:54's GET)."""
    return spark.createDataFrame([(json.dumps(GBFS_SAMPLE),)], ["body"])


def _stub_city_fetch(city: str) -> dict:
    """Deterministic stand-in for the WAQI GET (air_lambda.py:37-60):
    same nested shape (`iaqi.t.v` etc.), values derived from the key."""
    return {"aqi": len(city) * 7,
            "iaqi": {"t": {"v": len(city) * 1.5},
                     "h": {"v": 50},
                     "pm25": {"v": len(city) * 3}}}


AIR_QUALITY_SCHEMA = ("city string, aqi int, temperature double, "
                      "humidity int, pm25 int")


def fetch_air_quality(keys: DataFrame,
                      fetch: Callable[[str], dict] = _stub_city_fetch,
                      parallelism: int | None = None) -> DataFrame:
    """S3: fan-out per-key REST fetch as a mapInPandas source.

    The reference caps client-side concurrency with ThreadPool(3)
    (air_lambda.py:79) — a single-client constant. Here the fan-out
    defaults to min(n_keys, defaultParallelism): one fetch task per key
    up to the cluster's task slots, so a 1000-executor cluster fans a
    large key list across every core instead of inheriting a laptop's
    thread-pool cap. Pass ``parallelism=3`` explicitly for
    reference-compatible pacing (e.g. a rate-limited API). Per-unit
    error isolation (weather_lambda.py:147-149: one failed city never
    kills the batch) maps to the try/except inside the batch loop.
    """
    import pandas as pd

    if parallelism is None:
        n_keys = keys.count()  # key lists are small (city dims, shard ids)
        parallelism = max(1, min(
            n_keys, keys.sparkSession.sparkContext.defaultParallelism))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for city in pdf["city"]:
                try:
                    payload = fetch(city)
                    # coerce INSIDE the try: WAQI really returns "-"
                    # for stations with no data, and an uncoerced
                    # string would pass this loop only to fail the
                    # whole batch's Arrow conversion afterwards —
                    # exactly the task kill the isolation exists to
                    # prevent
                    rows.append({
                        "city": city,
                        "aqi": int(payload["aqi"]),
                        "temperature": float(payload["iaqi"]["t"]["v"]),
                        "humidity": int(payload["iaqi"]["h"]["v"]),
                        "pm25": int(payload["iaqi"]["pm25"]["v"]),
                    })
                except Exception:
                    # per-unit isolation: skip the failed key, keep batch
                    continue
            yield pd.DataFrame(rows, columns=["city", "aqi", "temperature",
                                              "humidity", "pm25"])

    return keys.repartition(parallelism).mapInPandas(
        run, schema=AIR_QUALITY_SCHEMA)
