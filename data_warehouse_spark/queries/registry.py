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
# Round-5 rotation: round 4 re-verified the relational/window/scalar/
# join core on the current fixture generation (CORRECTNESS_r04, all
# green) — those rows are current and their code is unchanged, so they
# rotate OUT. This window certifies, on current code:
#   - every query whose implementation changed in round 4 AFTER its r3
#     row was recorded: u4 (merge.py SCD2 late-update), x2c + x8
#     (dedup.py candidate prefilter/checkpoints), st1-st9 (jobs.py/
#     io.py NTZ guards), mm1/mm3/mm4 (multimodal plumbing);
#   - x3c_multi_topk (added r4 after the window was pinned — first
#     driver row ever);
#   - everything round 5 added or touched: e3_enriched_trips + the
#     e1b bucketed variant (new), e1/e2 (sessions.py sort fix +
#     micro-km sums), mm2 (side-table scan), st6/st7 (new oracles),
#     x3/x4 (similarity kernel routing + NaN consistency);
#   - u5/u6 (maintenance ops, new r5) — first driver rows;
#   - backfill: the oldest remaining rows (r3) — sources, UDFs, u1/u2,
#     the LLM text battery, w5/j12/j9/j6/j3 (j1/j2 stay outside:
#     r3-green, stock Catalyst, code unchanged).
# Everything outside was hash-green in CORRECTNESS_r04 on the current
# fixtures with code unchanged since.
DRIVER_WINDOW = [
    # round-4/5 code changes + first-ever rows
    "e1_trips", "e1b_bucketed_trips", "e2_carbon_savings",
    "e3_enriched_trips",
    "u4_scd2_dimension", "x2c_ngram_jaccard", "x8_dup_components",
    "x3_cosine_topk", "x3c_multi_topk", "x4_pairwise_sim",
    "st1_stream_source", "st2_tumbling_window", "st3_sliding_window",
    "st4_session_window", "st5_watermark_late_drop", "st6_stream_dedup",
    "st7_foreach_upsert", "st8_custom_stateful", "st9_stream_stream_join",
    "mm1_multimodal_stub", "mm2_image_resize", "mm3_frame_sample",
    "mm4_feature_ann",
    # backfill: oldest current rows (r3), sources/UDFs/warehouse first
    "u1_upsert", "u2_dedup_latest",
    "s2_rest_json_source", "s3_parallel_fetch", "s4_csv_roundtrip",
    "s5_append_sink", "s6_ddl_table", "s8_partition_pruned_scan",
    "udf1_row_scalar", "udf2_pandas_scalar", "udf3_grouped_pandas",
    "udf4_udtf_words",
    "j9_spatial_join", "j6_asof_join",
    # new this round (maintenance + cosine-LSH dedup) — first driver
    # rows. x2d takes the slot j3_left_join held: j3 joins j1/j2
    # outside (r3-green, stock Catalyst, code unchanged) while x2d has
    # never been driver-checked.
    "u5_delete_keys", "u6_compaction", "x2d_cosine_lsh",
    "x1_exact_dedup", "x5_text_stats", "x5b_lang_id", "x5c_quality_score",
    "x6_token_freq", "x7_tfidf", "x10_repetition_filter",
    "x9_stratified_split",
    "w5_sessionize", "j12_bucketed_fact_join",
]
# TODO(round 6): rotate in s9_jsonl_roundtrip, s10_orc_roundtrip,
# u7_incremental_rollup, a11_cube, x11_pii_redaction,
# st10_stream_static_join, x12_dedup_corpus, u8_zorder_scan,
# x2e_incremental_dedup, x13_decontaminate, x14_token_budget_sample,
# w6_distribution, a13_histogram, f13_url_parse, st11_dedup_retries,
# dq1_validation_report, x14b_token_budget_scalable,
# s11_schema_evolution, u9_time_travel, u9b_snapshot_diff (all added
# after this round's window was pinned; local parity green, no driver
# rows yet).
# a12_sketch_rollup is rows-only by design (sketch estimates are
# library-specific).


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
