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
# Round-8 rotation (VERDICT.md round-7 ask #1): the board is green, so
# this round's window is CERTIFICATION HYGIENE — rotate the stalest
# driver rows back through the gate so no query's last driver record
# predates the round-6 fixture regeneration:
#   (a) the r4 cohort (last driver row r4: a7, f5, f6, f12, j10) and
#       the r5 cohort (udf1-4, st1-st9, mm1-mm4, x1, x3c, x5/b/c,
#       x6, x7, x9, x10, j9) — all re-verified green by the round-7
#       judge's full parity run, but their driver archive rows predate
#       the current fixtures;
#   (b) a12_sketch_rollup — registry slot 53 every prior round, so it
#       has NEVER had a driver row; rows-only by design (mergeable HLL
#       sketch), the driver records its row count;
#   (c) every query whose CODE (or execution conf) changed in round 8:
#       x5d (md5-60 hash family + first value oracle), u3 (new
#       registry entry: micro-batched append sink), x3b/x4 (the
#       assign_cells fallback + dtype fix), u9/u9b (snapshot lock
#       restore via link), x3/x2d (vector Arrow-tier pinning; x3c/mm*
#       likewise but already in cohort (a));
#   (d) backfill with the oldest remaining rows (r6 vintage, code
#       unchanged since): st10/st11 complete the streaming family,
#       plus the dedup/graph family x2/x2c/x2e/x8/x12 whose operators
#       are the repo's most complex, and f13/a13.
# Queries added or changed during round 8 displace (d) — never (a)-(c).
DRIVER_WINDOW = [
    # (a) r4 cohort
    "a7_salted_agg", "f5_cast", "f6_date_format", "f12_case",
    "j10_star_join",
    # (a) r5 cohort
    "udf1_row_scalar", "udf2_pandas_scalar", "udf3_grouped_pandas",
    "udf4_udtf_words",
    "st1_stream_source", "st2_tumbling_window", "st3_sliding_window",
    "st4_session_window", "st5_watermark_late_drop", "st6_stream_dedup",
    "st7_foreach_upsert", "st8_custom_stateful", "st9_stream_stream_join",
    "mm1_multimodal_stub", "mm2_image_resize", "mm3_frame_sample",
    "mm4_feature_ann",
    "x1_exact_dedup", "x3c_multi_topk",
    "x5_text_stats", "x5b_lang_id", "x5c_quality_score",
    "x6_token_freq", "x7_tfidf", "x9_stratified_split",
    "x10_repetition_filter", "j9_spatial_join",
    # (b) first-ever driver row
    "a12_sketch_rollup",
    # (c) round-8 code/conf changes
    "x5d_fingerprint", "u3_microbatch_write",
    "x3b_ivf_topk", "x4_pairwise_sim",
    "u9_time_travel", "u9b_snapshot_diff",
    "x3_cosine_topk", "x2d_cosine_lsh",
    # (d) backfill: oldest remaining (r6) rows, code unchanged since
    "st10_stream_static_join", "st11_dedup_retries",
    "x2_minhash_lsh", "x2c_ngram_jaccard", "x2e_incremental_dedup",
    "x8_dup_components", "x12_dedup_corpus",
    "f13_url_parse", "a13_histogram",
]
# f7 / a8 / a12 are rows-only by design (a12 is windowed this round for
# its first driver ROW-COUNT record). Queries added or code-changed
# DURING round 8 must displace backfill (d) entries so the "every
# changed query is windowed" claim stays true against the
# CORRECTNESS_r08 keys.


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
