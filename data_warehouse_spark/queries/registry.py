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
# Round-7 rotation (per VERDICT.md round-6 asks #1/#3):
#   (a) the four round-6 driver hash-FAILs stay in for re-certification
#       — their oracles gained the repo's CAST(SUM AS BIGINT) convention
#       (DuckDB HUGEINT reached the driver hash as float64);
#   (b) queries whose CODE changed in round 6 but that had no round-6
#       driver row: j12 (shuffle-hash probe + derived predicate), x3
#       (heap prefilter), the sessions.py-refactor dependents
#       (w5/e1/e1b/e2/e3), u1/u4 (merge.py first-load dedup), x2d —
#       all were parity-verified locally in r6, now get driver rows;
#   (c) backfill with the OLDEST remaining driver rows (r4/r5 vintage,
#       code unchanged since): set1-4, the scalar f-battery, o1/o2,
#       w4, p3/p5, a3/a9, s2-s6/s8, u2/u5/u6, j6;
#   (d) dq1 and j11 re-certify pre-emptively: both are round-7 perf
#       targets, so any code change they take this round lands inside
#       the window. Queries added or changed during round 7 displace
#       backfill (c) entries — never blocks (a)/(b).
DRIVER_WINDOW = [
    # (a) re-certify the four fixed oracles
    "s9_jsonl_roundtrip", "s10_orc_roundtrip",
    "x14_token_budget_sample", "x14b_token_budget_scalable",
    # (b) round-6 code changes without a round-6 driver row
    "j12_bucketed_fact_join", "x3_cosine_topk",
    "w5_sessionize", "e1_trips", "e1b_bucketed_trips",
    "e2_carbon_savings", "e3_enriched_trips",
    "u1_upsert", "u4_scd2_dimension", "x2d_cosine_lsh",
    # (d) round-7 perf targets (re-certify alongside any change)
    "dq1_validation_report", "j11_fact_fact_join",
    # (c) backfill: oldest remaining rows, code unchanged since r4/r5
    "set1_union_all", "set2_union_distinct", "set3_intersect",
    "set4_except",
    "f1_timezone", "f2_epoch_diff", "f3_haversine",
    "f8_strings", "f9_json", "f10_null_handling", "f11_arrays",
    "o1_global_sort", "o2_topk", "o2_topk_per_group",
    "w4_running_agg", "p3_between_computed", "p5_or_inequality",
    "a3_global_agg", "a9_pivot",
    "s2_rest_json_source", "s3_parallel_fetch", "s4_csv_roundtrip",
    "s5_append_sink", "s6_ddl_table", "s8_partition_pruned_scan",
    "u2_dedup_latest", "u5_delete_keys", "u6_compaction",
    "j6_asof_join",
    # first-ever ORACLE rows (round-7 additions, displacing backfill):
    # x2b ran rows-only until now — its md5-60 hash family makes the
    # full fingerprint pipeline DuckDB-replayable (code changed, so it
    # must be windowed regardless); x3b's IVF pipeline is replayed end
    # to end in SQL (deterministic seeded quantizer, margins pinned in
    # tests), its first value-level row
    "x2b_simhash", "x3b_ivf_topk",
    # round-7 code changes displacing backfill (f5/f6/f12 rotate out —
    # r4-green stock Catalyst casts, code unchanged): u9/u9b sit on the
    # snapshot store whose stale-lock steal gained the TOCTOU identity
    # check; x4 sits on cosine_pairs_blocked whose oversized route uses
    # the rewritten map-only assign_cells
    "u9_time_travel", "u9b_snapshot_diff", "x4_pairwise_sim",
]
# a12_sketch_rollup / f7 / a8 are rows-only by design. Queries added or
# code-changed DURING round 7 must displace backfill (c) entries so the
# "every changed query is windowed" claim stays true against the
# CORRECTNESS_r07 keys (round-6 lesson: j12/x3 changed in r6 without a
# row and the coverage text overclaimed it).


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
