"""data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
warehouse (``jahua/data_warehouse``: GBFS bike / weather / air-quality
ingestion into a PostgreSQL star schema, with a gap-based trip
sessionization as the flagship computation) as an idiomatic Spark
engine: declarative DataFrame/SQL plans optimized by Catalyst, columnar
parquet storage with partition pruning instead of B-tree indexes, and
Structured Streaming for the periodic-ingest cadence.

Layout:
    session    — tuned SparkSession builder (AQE, UTC, shuffle sizing)
    io         — fixture/table loaders and view registration
    functions  — pure column-expression libraries (geo, time, text, vector)
    operators  — composite operators (sessionize, merge/upsert, dedup,
                 as-of/range/spatial joins, similarity search, multimodal)
    queries    — the registry mapping SURVEY.md §2 operator IDs to
                 runnable (spark_fn, oracle_sql) pairs
    streaming  — Structured Streaming equivalents of the batch operators
    etl        — end-to-end pipelines (trip reconstruction)
"""

__version__ = "0.1.0"
