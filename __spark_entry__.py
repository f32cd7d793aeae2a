"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``data_warehouse_spark``; this module only
adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from data_warehouse_spark.queries.registry import load_all  # noqa: E402


def _ensure_confs(spark: SparkSession) -> None:
    """Pin the confs correctness depends on (driver may own the session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Reset the Arrow batch tier between queries: vector/blob queries
    # pin their own tier at build time (session.set_arrow_batch), and
    # a leaked 262144-row vector tier would oversize the next query's
    # Arrow batches (hazardous for blob payloads).
    from data_warehouse_spark.session import (
        ARROW_BATCH_DEFAULT, set_arrow_batch,
    )
    set_arrow_batch(spark, ARROW_BATCH_DEFAULT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (W5 sessionization) on /root/testdata/sf0.001."""
    _ensure_confs(spark)
    specs = load_all()
    return specs["w5_sessionize"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    specs = load_all()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(spec.fn) for name, spec in specs.items()}


def oracle_sql() -> dict[str, str]:
    specs = load_all()
    return {name: spec.oracle for name, spec in specs.items()
            if spec.oracle is not None}
