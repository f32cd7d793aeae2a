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
# Round-16 rotation (standing stale-first rule + VERDICT.md round-15
# ask #3). The cohort lists are now GENERATED, not hand-written:
# `python tools/rotation.py` derives each query's last-green round
# from the CORRECTNESS_r*.json archive and prints the stale-first
# order plus the displaced list (the r15 hand-written displaced list
# missed w2_lead_first_last — r15 "what's wrong" #1).
#   (a) the 15 r12-dated rows displaced by the r15 budget re-enter
#       FIRST (incl. w2_lead_first_last): after this round no archive
#       row is older than r13.
#   (b) round-16 code changes / additions, per the fingerprint
#       machine-check (tests/test_window_integrity.py): u9c (NEW:
#       snapshot retention expire_versions + gc_orphans, r15 ask #1),
#       u5b (NEW: erase_keys_all_versions — erasure composed with
#       time travel, r15 ask #2), x3i (NEW: IVF drift monitor
#       ivf_cell_stats, r15 ask #5), u9/u9b/e4 (read_snapshot now
#       applies the manifest schema so an all-rows-erased version
#       reads back as a typed empty frame; e4's composition touches
#       the snapshot closure), x3h (extend_ivf_index gained the
#       check_ids id-disjointness guard, r15 ADVICE #2), and
#       x2c/x8/x12 (minhash_lsh_pairs' exact verify gained the
#       "array" path — array_intersect per candidate pair instead of
#       the per-shingle row explosion through join+groupBy; -18% on
#       the whole x2 plan at 256x, .r16/x2_decomp.py — and these
#       three route through it transitively; x2/x2f, also flagged,
#       were already in (c)).
#   (c) r13-cohort backfill, stale-first per tools/rotation.py: 24 of
#       the 47 r13-dated rows (e3_enriched_trips slid to the r17
#       window when the optimization phase's mm2 change claimed its
#       (b) slot — the standing changed-query-first rule).
# 15 + 11 + 24 = 50. The 23 r13 rows displaced by the budget (lead
# the r17 window per the standing rule) are expression/agg/set
# battery classes with per-round pytest coverage (p5, p6, a1, a3,
# a8, a9, a11, o1, o2_topk, o2_topk_per_group, set1-set4, f2, f3,
# f8, f9, f10, f11) plus e2/e2b/p3/e3 — regenerate the authoritative
# list with tools/rotation.py after the round lands.
DRIVER_WINDOW = [
    # (a) the 15 r12-dated rows — re-enter first per the standing rule
    "s1_scan_filter", "s7_scan_full", "p1_project",
    "p2_range_predicate", "p4_null_predicate", "a2_count_by_key",
    "a4_distinct", "a5_rollup", "a6_stats", "a10_unpivot",
    "j7_cross_join", "j8_two_source_merge", "w2_lead_first_last",
    "st7_foreach_upsert", "st12_stream_incremental_dedup",
    # (b) round-16 code changes / additions (incl. the optimization
    # phase: minhash_lsh_pairs broadcast semi -> x2/x2c/x8/x12/x2f,
    # upsert new_unique -> u1/e4/st7, decode_images prefix+mapInArrow
    # -> mm2)
    "u9c_version_expiry", "u5b_erase_versions", "x3i_ivf_drift",
    "u9_time_travel", "u9b_snapshot_diff", "e4_daily_run",
    "x3h_ivf_incremental", "x2c_ngram_jaccard", "x8_dup_components",
    "x12_dedup_corpus", "mm2_image_resize",
    # (b') round-17 code changes (scd2_apply stats-gated full-outer
    # split -> u4; the r17 broadcast size-gates / mm2 hdr pruning
    # touch only queries already windowed above or in (c) below —
    # machine-checked by tests/test_window_integrity.py). u4 claimed
    # the slot of e1b_bucketed_trips (r16-green, newest (c) row),
    # which leads the next window per the standing displaced rule.
    "u4_scd2_dimension",
    # (c) r13-cohort backfill (stale-first; 28 of 47)
    "u1_upsert", "s2_rest_json_source", "s3_parallel_fetch",
    "s4_csv_roundtrip", "s5_append_sink", "a12_sketch_rollup",
    "s9_jsonl_roundtrip", "s10_orc_roundtrip", "s6_ddl_table",
    "u5_delete_keys", "x2_minhash_lsh", "x2g_incremental_minhash",
    "x13_decontaminate", "x15_sequence_packing", "x2f_minhash_sparse",
    "x11_pii_redaction", "x20_chunk_overlap", "x2d_cosine_lsh",
    "x17_semdedup", "x17b_semdedup_sparse", "w5_sessionize",
    "e1_trips", "e1c_trips_localtime",
]
# As of round 9 EVERY registry query carries a DuckDB value oracle.
# Queries added or code-changed DURING round 16 must be appended to
# (b) — displacing (c) backfill only past 50 — so the "every changed
# query is windowed" claim stays true against the CORRECTNESS_r16 keys
# (machine-checked by tests/test_window_integrity.py).


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
