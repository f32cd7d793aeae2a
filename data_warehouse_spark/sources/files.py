"""File-format sources/sinks (SURVEY §2.1 S4/S5/S7).

The reference's file surface is a header'd CSV export (notebook cells
0-1) and append-only table loads; the engine generalizes to the formats
a Spark warehouse actually serves: parquet (canonical storage), CSV
with explicit schema (never inferSchema on the hot path — schema
inference is an extra full scan), and JSON lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str, header: bool = True,
              mode: str = "overwrite") -> None:
    """CSV sink with header row (notebook cells 0-1's
    swiss_weather_data.csv writer)."""
    df.write.mode(mode).option("header", header).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True) -> DataFrame:
    """CSV source with an explicit schema string. inferSchema is
    deliberately not exposed: at 100 TB it doubles the scan."""
    return spark.read.option("header", header).schema(schema).csv(path)


def append_parquet(df: DataFrame, path: str) -> None:
    """Append-only observation-log sink (bike_lambda.py:75-80's batched
    INSERT). Parquet appends are task-atomic file adds under the same
    directory — concurrent batches never corrupt previous ones."""
    df.write.mode("append").parquet(path)


def read_json_lines(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with explicit schema (the raw-payload log an
    ingest pipeline lands before shredding; see sources.rest_json)."""
    return spark.read.schema(schema).json(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
