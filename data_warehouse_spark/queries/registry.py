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
# Round-15 rotation (standing stale-first rule + VERDICT.md round-14
# ask #2): the 13 r11-dated rows re-enter FIRST, then every query
# whose CODE changed in round 15, then r12-cohort backfill.
#   (a) the 13 r11-dated rows (displaced by the r14 budget; their
#       compensating evidence — real Structured Streaming runs +
#       SIGKILL torture for the ST family, pytest batteries for
#       udf1/udf2/f12 — is noted in the r14 comment history, but the
#       gate now owns the evidence again): st1-st6, st8-st11,
#       udf1_row_scalar, udf2_pandas_scalar, f12_case.
#   (b) round-15 code changes (8): x3d/x3e/x3f (the PQ validity gates
#       now require FINITE elements — r14 ADVICE #1: an inf element
#       previously produced a finite garbage ADC score that could
#       displace the true rank-1 after rerank; plus half-up ADC
#       rounding in the Arrow kernel, r14 ADVICE #2), x3g (NEW: the
#       Lloyd-trained codebook + ADC bias-correction probe, r14
#       verdict ask #3 — the oracle replays train/energy/probe end to
#       end), f4_arithmetic (NEW: the standalone arithmetic gate row,
#       r14 verdict ask #5 — closes SURVEY §2 to 131/131 standalone),
#       mm3/mm4/mm4b (attach_blob's payload is now CAST(text AS
#       BINARY) instead of encode(text,'UTF-8') — byte-identical,
#       fixture-verified, 0.25 s cheaper at 1024x; r14 verdict ask #4
#       decomposition, .r15/mm4_decomp.py), s8b (NEW: dynamic
#       partition pruning — the runtime-day-list backfill shape,
#       plan-asserted dynamicpruningexpression) and s8 (its
#       partitioned-copy cache refactored into the shared
#       _s8_partitioned_events helper), x3h (NEW: incremental IVF
#       index maintenance — extend_ivf_index assigns a batch against
#       the existing centroids, O(|batch| * n_cells), corpus never
#       re-scanned; the x2e/x2g pattern applied to ANN).
#   (c) r12-cohort backfill: 26 of the 41 r12-dated rows.
# 13 + 11 + 26 = 50. The 15 r12 queries displaced by the budget (lead
# the r16 window per the standing rule), chosen battery-first —
# trivial expression/scan/agg classes with per-round pytest coverage,
# plus the two streaming forms whose REAL streaming execution
# (including st7's SIGKILL+replay torture) runs in
# tests/test_streaming.py every round: s1_scan_filter, s7_scan_full,
# p1_project, p2_range_predicate, p4_null_predicate, a2_count_by_key,
# a4_distinct, a5_rollup, a6_stats, a10_unpivot, j7_cross_join,
# j8_two_source_merge, w2_lead_first_last, st7_foreach_upsert,
# st12_stream_incremental_dedup.
# tests/test_window_integrity.py machine-checks (b): any registry
# query whose fingerprint changed since the last round boundary must
# be in this list (r14 verdict ask #8).
DRIVER_WINDOW = [
    # (a) the 13 r11-dated rows — re-enter first per the standing rule
    "st1_stream_source", "st2_tumbling_window", "st3_sliding_window",
    "st4_session_window", "st5_watermark_late_drop",
    "st6_stream_dedup", "st8_custom_stateful",
    "st9_stream_stream_join", "st10_stream_static_join",
    "st11_dedup_retries", "udf1_row_scalar", "udf2_pandas_scalar",
    "f12_case",
    # (b) round-15 code changes / additions
    "x3d_pq_adc", "x3e_ivfpq_topk", "x3f_ivfpq_arrow256",
    "x3g_ivfpq_trained", "f4_arithmetic", "mm3_frame_sample",
    "mm4_feature_ann", "mm4b_feature_ann_seam",
    "s8_partition_pruned_scan", "s8b_dpp_scan",
    "x3h_ivf_incremental",
    # (c) r12-cohort backfill (41 minus the 15 displaced above)
    "j1_inner_join", "j2_broadcast_join", "j3_left_join",
    "j4_semi_join", "j4_anti_join", "j5_range_join",
    "s11_schema_evolution", "u2_dedup_latest",
    "u4_scd2_dimension", "u7_incremental_rollup", "u8_zorder_scan",
    "w1_lag", "w3_ranking", "w6_distribution",
    "x12_dedup_corpus", "x12b_dedup_corpus_sparse", "x16_span_dedup",
    "x16b_span_removal", "x16c_span_dedup_sparse", "x18_corpus_prep",
    "x19_quality_gate", "x2b_simhash", "x5d_fingerprint",
    "x8_dup_components", "x8b_components_sparse",
    "x8d_components_auto",
]
# As of round 9 EVERY registry query carries a DuckDB value oracle.
# Queries added or code-changed DURING round 15 must be appended to
# (b) — displacing (c) backfill only past 50 — so the "every changed
# query is windowed" claim stays true against the CORRECTNESS_r15 keys
# (now machine-checked by tests/test_window_integrity.py).


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
