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
# Round-6 rotation (per the round-5 TODO): the 20 queries added late in
# round 5 — local parity green, independently re-verified by the
# round-5 judge (20/20), but with NO driver CORRECTNESS rows yet —
# rotate IN for their first-ever driver rows. Everything that was green
# in CORRECTNESS_r05 on current code rotates OUT. Backfill: the 30
# oldest remaining rows (r3/r4 vintage, code unchanged since) —
# refreshing the relational/join/window core on the current fixture
# generation. set1-4 + the scalar f-battery stay outside: r4-green,
# stock Catalyst expressions, code unchanged.
DRIVER_WINDOW = [
    # first-ever driver rows: late-round-5 additions (parity-green)
    "s9_jsonl_roundtrip", "s10_orc_roundtrip", "s11_schema_evolution",
    "u7_incremental_rollup", "u8_zorder_scan",
    "u9_time_travel", "u9b_snapshot_diff",
    "a11_cube", "a13_histogram",
    "dq1_validation_report", "f13_url_parse", "w6_distribution",
    "st10_stream_static_join", "st11_dedup_retries",
    "x11_pii_redaction", "x12_dedup_corpus", "x13_decontaminate",
    "x14_token_budget_sample", "x14b_token_budget_scalable",
    "x2e_incremental_dedup",
    # backfill: oldest current rows (r3/r4), joins + scan + relational
    "j1_inner_join", "j2_broadcast_join", "j3_left_join",
    "j4_semi_join", "j4_anti_join", "j5_range_join",
    "j7_cross_join", "j8_two_source_merge",
    "s1_scan_filter", "s7_scan_full",
    "p1_project", "p2_range_predicate",
    "p4_null_predicate", "p6_having",
    "a1_q1_pricing_summary", "a2_count_by_key",
    "a4_distinct", "a5_rollup", "a6_stats", "a10_unpivot",
    "w1_lag", "w2_lead_first_last", "w3_ranking",
    # round-6 additions displace backfill slots (o1/o2/w4/p3/p5/a3/a9:
    # r4-green, stock Catalyst, code unchanged): e1c and x15 are new,
    # x2 carries its FIRST oracle (exact-Jaccard, valid on the bimodal
    # fixture — see its registration doc), and x2c/x4/x8 re-certify
    # because their code changed mid-round (NULL-safe struct block
    # keys in the dedup joins + matching oracle spelling).
    "e1c_trips_localtime", "x2_minhash_lsh", "x15_sequence_packing",
    "x2c_ngram_jaccard", "x4_pairwise_sim", "x8_dup_components",
    "j11_fact_fact_join",
]
# a12_sketch_rollup is rows-only by design (sketch estimates are
# library-specific). Queries added DURING round 6 should displace
# backfill entries (never the first-ever-row block above).
# TODO(round 7): every query with round-6 code changes is in THIS
# window (j11 included — derived predicate); rotate next from the
# oldest remaining rows (set1-4, f-battery, o1/o2, w4, p3/p5/a3/a9,
# s-battery leftovers, u-family r5 rows) plus anything round 7 touches.


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
