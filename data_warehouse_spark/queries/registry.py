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
# Round-11 rotation (VERDICT.md round-10 ask #2): window = every query
# whose CODE changed in round 11 + the r8 cohort, the oldest third of
# the archive (40 queries whose latest driver row is CORRECTNESS_r08 —
# computed from the archive files, matching the verdict's enumeration).
# After this round no query's driver row predates r9.
#   (a) the r8 cohort: streaming block st1-st11 (+u3, its foreachBatch
#       sibling), udf1-4, mm1-mm4, x1/x2c/x2d/x2e/x3/x3b/x3c/x4/
#       x5/x5b/x5c/x6/x7/x8/x9/x10/x12, a7, j10, f6, f12 — all green
#       in the r10 judge's full parity re-run; hygiene, not risk;
#   (b) round-11 code changes: x16/x16b/x16c (shared_spans grew the
#       large-cap keep-join routing — the grouped-pairs task-memory
#       bound is now enforced, not documented), dq1b (oracle mirrors
#       the NULL-is-one-key struct wrap via ROW(event_id)), f7 (the
#       envelope is read at EXECUTION by a 1-row mapInPandas stamp —
#       tight again without failing cached plans), u9/u9b (lock
#       release takes identity + body off one fd via fstat), x8b/x12b
#       (new: connected components / end-to-end dedup on the planted-
#       diameter sparse lane — amplification grows propagation ROUND
#       COUNT, the scale dimension x8/x12's sf0.1 readings don't
#       probe), x8c (new: FIXED diameter 256 via the alternating
#       large/small-star algorithm — Kiveris et al. 2014 — where
#       min-label's rounds = diameter makes it the wrong tool).
#       mm3/mm4 gained floor-free cells without code changes, so
#       they ride their r11 window slots in the (a) cohort.
# Changed queries displace r8-cohort backfill only if the count
# exceeds 50 — it does not this round (40 + 10 = 50).
DRIVER_WINDOW = [
    # (a) r8 cohort
    "st1_stream_source", "st2_tumbling_window", "st3_sliding_window",
    "st4_session_window", "st5_watermark_late_drop", "st6_stream_dedup",
    "st8_custom_stateful", "st9_stream_stream_join",
    "st10_stream_static_join", "st11_dedup_retries",
    "u3_microbatch_write",
    "udf1_row_scalar", "udf2_pandas_scalar", "udf3_grouped_pandas",
    "udf4_udtf_words",
    "mm1_multimodal_stub", "mm2_image_resize", "mm3_frame_sample",
    "mm4_feature_ann",
    "x1_exact_dedup", "x2c_ngram_jaccard", "x2d_cosine_lsh",
    "x2e_incremental_dedup",
    "x3_cosine_topk", "x3b_ivf_topk", "x3c_multi_topk",
    "x4_pairwise_sim",
    "x5_text_stats", "x5b_lang_id", "x5c_quality_score",
    "x6_token_freq", "x7_tfidf", "x8_dup_components",
    "x9_stratified_split", "x10_repetition_filter", "x12_dedup_corpus",
    "a7_salted_agg", "j10_star_join", "f6_date_format", "f12_case",
    # (b) round-11 code changes
    "x16_span_dedup", "x16b_span_removal", "x16c_span_dedup_sparse",
    "dq1b_validation_sketch", "f7_current_timestamp",
    "u9_time_travel", "u9b_snapshot_diff",
    "x8b_components_sparse", "x12b_dedup_corpus_sparse",
    "x8c_components_highdiam",
]
# As of round 9 EVERY registry query carries a DuckDB value oracle.
# Queries added or code-changed DURING round 11 must be appended to
# (b) — displacing (a) backfill only past 50 — so the "every changed
# query is windowed" claim stays true against the CORRECTNESS_r11 keys.


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
