"""Physical-plan inspection utilities — the engine's scale guardrails.

SURVEY §4: no custom Catalyst rule is required for any attested
capability; what the engine owns instead is VERIFICATION that Catalyst
produced the plan the 100 TB design depends on. These helpers read the
optimizer's actual output so tests (tests/test_plans.py) can assert:

  - range/equality predicates reach the parquet scan (pushed_filters)
  - only referenced columns are read (read_schema)
  - dimension joins broadcast instead of shuffling the fact side
  - aggregates are partial+final (map-side combine before shuffle)
  - top-k compiles to TakeOrderedAndProject, never a global sort
  - hot expressions compile into whole-stage codegen
  - no plan regresses to CartesianProduct / BroadcastNestedLoopJoin

Used in CI; also handy interactively:
    from data_warehouse_spark.plans import executed_plan
    print(executed_plan(df))
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (pre-execution; AQE shows the initial
    plan with isFinalPlan=false — structural properties like exchange
    counts and join strategies are already decided)."""
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_text(df: DataFrame) -> str:
    """Whole-stage-codegen explain output (works under AQE, where the
    plain plan string hides the '*(n)' stage markers)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen")


def _scan_lines(df: DataFrame, token: str) -> list[str]:
    return [ln for ln in executed_plan(df).splitlines() if token in ln]


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of every scan in the plan."""
    return " ".join(_scan_lines(df, "PushedFilters"))


def read_schema(df: DataFrame) -> str:
    """Concatenated ReadSchema sections — what the scans actually read."""
    return " ".join(_scan_lines(df, "ReadSchema"))


def count_exchanges(df: DataFrame) -> int:
    """Number of hash-partitioning shuffles in the plan (before AQE
    coalescing; an upper bound on real shuffles)."""
    return executed_plan(df).count("Exchange hashpartitioning")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Partial+final HashAggregate pair => map-side combine: the shuffle
    carries one row per (task, group), not one per input row."""
    plan = executed_plan(df)
    return plan.count("HashAggregate") >= 2 and "partial_" in plan


def uses_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT compiled to TakeOrderedAndProject: per-partition
    heaps and a k-row driver merge instead of a global sort."""
    return "TakeOrderedAndProject" in executed_plan(df)


def assert_no_cartesian(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, "plan degenerated to a cross product"
    assert "BroadcastNestedLoopJoin" not in plan, "plan degenerated to BNL join"
