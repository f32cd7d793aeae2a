"""JDBC source/sink configuration (SURVEY §2.1 S1/S5 production path).

The reference reads and writes PostgreSQL directly (trips_lambda.py:
35-47 connects source + warehouse; 105-106 range-scans bike_status;
199-206 batch-upserts all_trips). In Spark the same access is
`spark.read.jdbc` / `df.write.jdbc`; what matters at scale is HOW the
read is split: a naive JDBC read is ONE task pulling the whole table
through one connection. `partitioned_read_options` reproduces the
reference's indexed range scan as N parallel range-predicate queries.

No SERVER database exists in this container, but Spark ships embedded
Apache Derby in its own jars/ (derby*.jar, present for the Hive
metastore), so the builders are exercised END TO END against a real
in-process database — create + batched append + whole read +
partitioned parallel range read — in tests/test_sources.py
(test_jdbc_roundtrip_embedded_derby). The PostgreSQL option dict keeps
its unit tests; the fixture-parquet path (io.load_table) remains the
benchmarked data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def connection_options(host: str, db: str, user: str, password: str,
                       port: int = 5432,
                       connect_timeout_s: int = 300) -> dict[str, str]:
    """PostgreSQL JDBC options mirroring the reference's connection
    contract (trips_lambda.py:22,32: 300 s connect timeout)."""
    return {
        "url": f"jdbc:postgresql://{host}:{port}/{db}"
               f"?connectTimeout={connect_timeout_s}",
        "user": user,
        "password": password,
        "driver": "org.postgresql.Driver",
    }


def derby_embedded_options(db_path: str, create: bool = True) -> dict[str, str]:
    """Embedded Apache Derby connection options — the in-process
    database Spark itself ships (jars/derby*.jar), which makes a REAL
    end-to-end JDBC roundtrip testable in this container even with no
    database server. Same option SHAPE as connection_options'
    PostgreSQL dict, so read_jdbc / append_jdbc /
    partitioned_read_options run unchanged against it; swapping the
    dict swaps the database."""
    return {
        "url": f"jdbc:derby:{db_path}" + (";create=true" if create else ""),
        "driver": "org.apache.derby.jdbc.EmbeddedDriver",
    }


def partitioned_read_options(opts: dict[str, str], table: str,
                             partition_col: str, lower: str, upper: str,
                             num_partitions: int = 32,
                             fetch_size: int = 10_000) -> dict[str, str]:
    """Split a JDBC scan into `num_partitions` parallel range queries on
    `partition_col` — the Spark equivalent of leaning on the reference's
    B-tree index (trips_lambda.py:81-84) for a bounded scan. Each task
    issues `WHERE col >= x AND col < y`; the DB's index serves each
    range; no single-connection bottleneck."""
    return {
        **opts,
        "dbtable": table,
        "partitionColumn": partition_col,
        "lowerBound": lower,
        "upperBound": upper,
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def append_jdbc(df: DataFrame, opts: dict[str, str], table: str,
                batch_size: int = 1000) -> None:
    """Batched append (execute_batch equivalent, bike_lambda.py:75-80).
    Upsert (ON CONFLICT, trips_lambda.py:199-206) has no vanilla JDBC
    writer mode — run operators.merge.upsert against a snapshot and
    overwrite, or stage to a temp table + server-side MERGE."""
    (df.write.format("jdbc")
     .options(**opts)
     .option("dbtable", table)
     .option("batchsize", str(batch_size))
     .mode("append")
     .save())
