"""Query registry: SURVEY.md §2 operator IDs -> (spark_fn, oracle_sql).

Every implemented operator registers here; ``__spark_entry__.py``
exposes the registry to the driver. Invariants enforced by design:

  - spark_fn(spark, sf_dir) -> DataFrame, built only from fixture
    parquet under sf_dir.
  - oracle is DuckDB-runnable ANSI SQL over the same tables (views are
    pre-registered by the driver), or None for rows-only checks.
  - Column names and float rounding match exactly between the two
    (drivers compare order-insensitive value hashes per column name).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str                      # SURVEY §2 ID, lowercase (e.g. "w5_sessionize")
    fn: SparkFn
    oracle: str | None = None      # DuckDB SQL; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

# Modules that register queries on import (appended to as coverage grows).
# Load order no longer matters for verification — DRIVER_WINDOW below
# pins the first-50 composition explicitly.
_QUERY_MODULES = [
    "data_warehouse_spark.queries.warehouse",
    "data_warehouse_spark.queries.streaming_batch",
    "data_warehouse_spark.queries.udfs",
    "data_warehouse_spark.queries.llm_text",
    "data_warehouse_spark.queries.llm_vector",
    "data_warehouse_spark.queries.sessions",
    "data_warehouse_spark.queries.bucketed",
    "data_warehouse_spark.queries.dedup_pipeline",
    "data_warehouse_spark.queries.joins",
    "data_warehouse_spark.queries.relational",
    "data_warehouse_spark.queries.windows",
    "data_warehouse_spark.queries.scalars",
]

# The driver's correctness gate checks the FIRST 50 registry entries per
# round, so window composition is a per-round verification deliverable.
# This list IS the round's window, in order; load_all() puts these names
# first and everything else after, in registration order.
#
# Round-4 rotation: rounds 1-2 verified the relational/window/scalar
# core, round 3 verified the warehouse/streaming/UDF/LLM/multimodal set
# — but the driver regenerated fixtures at round-3 start, so the r1/r2
# rows are stale, and a8/a9/a10 have never been in any window. This
# window re-verifies, on the current fixture generation:
#   - the 44 r1/r2-only queries (relational 23 incl. a8/a9/a10,
#     windows 6, scalars 11, joins j4/j5/j7/j8/j10/j11),
#   - e2_carbon_savings (new this round),
#   - x3_cosine_topk and mm2_image_resize (code touched this round —
#     r3 green rows predate the change).
# Everything outside was hash-green in CORRECTNESS_r03 on the current
# fixtures with unchanged code.
#
# Round-5 rotation TODO: x3c_multi_topk (added r4, oracle wired, local
# parity green) has no driver row yet — swap it into the next window
# along with anything this round's code changes touch.
DRIVER_WINDOW = [
    # relational core (incl. never-driver-checked a8/a9/a10)
    "s1_scan_filter", "s7_scan_full",
    "p1_project", "p2_range_predicate", "p3_between_computed",
    "p5_or_inequality", "p6_having",
    "a1_q1_pricing_summary", "a2_count_by_key", "a3_global_agg",
    "a4_distinct", "a5_rollup", "a6_stats",
    "o1_global_sort", "o2_topk",
    "set1_union_all", "set2_union_distinct", "set3_intersect",
    "set4_except",
    "a7_salted_agg", "a8_approx_agg", "a9_pivot", "a10_unpivot",
    # window functions
    "w1_lag", "p4_null_predicate", "w2_lead_first_last", "w3_ranking",
    "w4_running_agg", "o2_topk_per_group",
    # scalar functions
    "f1_timezone", "f2_epoch_diff", "f3_haversine", "f5_cast",
    "f6_date_format", "f7_current_timestamp", "f8_strings", "f9_json",
    "f10_null_handling", "f11_arrays", "f12_case",
    # new this round
    "e2_carbon_savings",
    # joins last driver-checked in r1/r2
    "j4_semi_join", "j4_anti_join", "j5_range_join", "j7_cross_join",
    "j8_two_source_merge", "j10_star_join", "j11_fact_fact_join",
    # code changed this round -> r3 rows predate the change
    "x3_cosine_topk", "mm2_image_resize",
]


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry,
    ordered DRIVER_WINDOW-first (the driver checks the first 50)."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Allow partial builds while modules are still being written,
            # but only swallow the module-itself-missing case.
            if mod not in str(e):
                raise
    windowed = [n for n in DRIVER_WINDOW if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(windowed)]
    return {n: QUERIES[n] for n in (*windowed, *rest)}
