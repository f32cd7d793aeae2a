from data_warehouse_spark.queries.registry import QUERIES, QuerySpec, register  # noqa: F401
