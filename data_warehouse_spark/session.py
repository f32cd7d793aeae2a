"""SparkSession factory tuned for both local testing and cluster scale.

Local mode runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); on a real
cluster the same settings hold except parallelism-related ones, which
scale with the cluster (see ``cluster_notes`` below).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized for the local[32] test harness; on a 1000-executor cluster,
# shuffle.partitions should be ~2-3x total cores (AQE coalesces down),
# e.g. spark.sql.shuffle.partitions=8000 with adaptive enabled.
LOCAL_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

# Arrow batch sizing (spark.sql.execution.arrow.maxRecordsPerBatch).
# One knob governs EVERY JVM<->Python Arrow exchange, and the right
# value is payload-width-dependent, so each Arrow-kernel query pins the
# tier it needs at build time (set_arrow_batch below) instead of one
# session-wide bump:
#   - DEFAULT (64k): narrow rows (scalars, token lists, point structs)
#     — tens of MB per batch worst case, and 6x the stock 10k so
#     per-batch Python overhead stays amortized.
#   - VECTOR (256k): fixed-width embedding rows (64 float32 ~ 256 B)
#     => ~64 MB per in-flight batch; measured 1.165 -> 1.032 s on x3's
#     33.6M x 64 brute scan vs 64k batches (round 7).
#   - BLOB (1k): opaque media payloads. Sizing rule: keep
#     rows_per_batch * expected_blob_bytes ~ low hundreds of MB; at
#     1024 rows that tolerates ~256 KB blobs, and MB-scale media should
#     drop to ~256. The round-7 session-wide 256k default was sized for
#     vector rows only — KB-scale blobs would have built multi-GB Arrow
#     batches per task (round-8 advice fix).
ARROW_BATCH_DEFAULT = 65_536
ARROW_BATCH_VECTOR = 262_144
ARROW_BATCH_BLOB = 1_024


def set_arrow_batch(spark: SparkSession, rows: int) -> None:
    """Pin the Arrow exchange batch size for the NEXT action on this
    session. Spark reads the conf when the physical plan executes (not
    when the DataFrame is built), so query builders that ship wide or
    narrow payloads through mapInArrow/mapInPandas call this right
    before returning their DataFrame; the driver/bench executes it
    immediately after. Harness entry points reset to
    ARROW_BATCH_DEFAULT between queries so a tier never leaks into an
    unrelated query's execution."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(rows))


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def default_driver_mem() -> str:
    """Driver heap default: min(48g, ~40% of MemTotal), floor 2g.

    local[N] runs every task in the one driver JVM, so the heap is the
    whole executor budget: at 8g a 614M-row bucketed write (32 parallel
    sorters) OOMs before spill kicks in, hence 48g on this 128 GiB box
    (leaves room for the OS page cache and a DuckDB peer; ~1.5g per
    task slot — a real cluster expresses the same budget per executor).
    Capping at 40% of physical RAM keeps smaller hosts from being
    OOM-killed by the OS at a hard-coded Xmx they can't back; override
    with SPARK_GRAFT_DRIVER_MEM."""
    try:
        with open("/proc/meminfo") as fh:
            kb = int(next(l for l in fh if l.startswith("MemTotal")).split()[1])
        frac_g = int(kb * 0.4 / 1024 / 1024)
    except (OSError, StopIteration, ValueError):
        frac_g = 48  # no /proc (non-Linux): keep the documented default
    return f"{max(2, min(48, frac_g))}g"


def get_spark(app_name: str = "data_warehouse_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    Design choices (all hold at 100 TB):
      - AQE on: runtime coalescing of shuffle partitions, skew-join
        splitting, and dynamic join-strategy demotion replace manual
        partition-count tuning per query.
      - Session timezone pinned UTC: the reference stores UTC and
        converts at the edge (trips_lambda.py:99,102); pinning avoids
        engine-dependent local-time drift and matches the DuckDB oracle.
      - Arrow enabled: every pandas_udf / toPandas crosses the
        JVM<->Python boundary in columnar batches.
      - nanosAsLong: the events fixture carries parquet TIMESTAMP(NANOS)
        which Spark has no native type for; we scan it as long and
        convert to microsecond timestamps in the loader (lossless here,
        and the conversion is a cheap codegen'd projection).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or default_master())
        .config("spark.sql.shuffle.partitions", str(LOCAL_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Session default is the narrow-row tier; vector/blob queries
        # pin their own tier per action via set_arrow_batch (see the
        # ARROW_BATCH_* sizing notes above).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_DEFAULT))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Bucketed-sorted tables (operators/bucketing.py) are written
        # with exactly one file per bucket, the regime where trusting
        # the write-time sort is safe — lets the planner drop the
        # per-partition Sort under sort-merge joins on the bucket key
        # (off by default since SPARK-28595 because multi-file buckets
        # would need a merge-sort read).
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                               default_driver_mem()))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Cluster-scale notes (100 TB design):
#  - fact/log tables are written partitioned by date (see io.write_table):
#    incremental 24h re-scans (reference trips_lambda.py:106,221) become
#    partition pruning instead of index scans.
#  - spark.sql.shuffle.partitions scales with cores; AQE coalesces.
#  - broadcast threshold left at default 10 MB; dimension tables (region,
#    nation, supplier at TPC-H shape) stay broadcastable at any SF since
#    dims grow ~log of fact size; explicit broadcast() hints are used in
#    the query layer where dimension-ness is known statically.
#  - no collect()-based logic anywhere in the engine: every operator is a
#    DataFrame -> DataFrame transform.
