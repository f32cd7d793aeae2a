from data_warehouse_spark.plans.inspect import (  # noqa: F401
    assert_no_cartesian, codegen_text, count_exchanges, executed_plan,
    has_broadcast_join, has_partial_aggregation, pushed_filters,
    read_schema, uses_take_ordered,
)
