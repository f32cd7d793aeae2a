"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import DRIVER_WINDOW, load_all

# Round-15 window (standing stale-first rule + VERDICT.md round-14
# ask #2): the 13 r11-dated rows first, then every round-15 code
# change, then r12-cohort backfill. Composition rationale (incl. the
# 9 displaced r12 queries and their compensating evidence) lives next
# to DRIVER_WINDOW in queries/registry.py; the "every changed query
# is windowed" half is machine-checked by
# tests/test_window_integrity.py.
MUST_BE_WINDOWED = {
    # (a) the 13 r11-dated rows
    "st1_stream_source", "st2_tumbling_window", "st3_sliding_window",
    "st4_session_window", "st5_watermark_late_drop",
    "st6_stream_dedup", "st8_custom_stateful",
    "st9_stream_stream_join", "st10_stream_static_join",
    "st11_dedup_retries", "udf1_row_scalar", "udf2_pandas_scalar",
    "f12_case",
    # (b) round-15 code changes (PQ finiteness gates + half-up Arrow
    # ADC rounding -> x3d/x3e/x3f; new x3g trained-book probe; new
    # f4 standalone arithmetic row; attach_blob cast-payload ->
    # mm3/mm4/mm4b; new s8b DPP row + the s8 helper refactor; new
    # x3h incremental-IVF row)
    "x3d_pq_adc", "x3e_ivfpq_topk", "x3f_ivfpq_arrow256",
    "x3g_ivfpq_trained", "f4_arithmetic", "mm3_frame_sample",
    "mm4_feature_ann", "mm4b_feature_ann_seam",
    "s8_partition_pruned_scan", "s8b_dpp_scan",
    "x3h_ivf_incremental",
    # (c) r12-cohort backfill
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
}


def test_driver_window_is_exactly_the_round15_set():
    # DRIVER_WINDOW is the explicit first-50 contract; it must hold
    # every query that needs (re-)verification this round and fit the
    # driver's 50-entry budget.
    assert len(DRIVER_WINDOW) <= 50
    assert set(DRIVER_WINDOW) == MUST_BE_WINDOWED


def test_window_names_resolve_and_lead_the_registry():
    names = list(load_all())
    unknown = set(DRIVER_WINDOW) - set(names)
    assert not unknown, f"DRIVER_WINDOW names not registered: {unknown}"
    window = set(names[:50])
    missing = MUST_BE_WINDOWED - window
    assert not missing, (
        f"queries pushed out of the driver's 50-entry window: {missing}; "
        "check DRIVER_WINDOW in queries/registry.py")


def test_every_query_has_fn_and_all_have_oracles():
    specs = load_all()
    assert len(specs) >= 88
    no_oracle = {n for n, s in specs.items() if s.oracle is None}
    # Round 9: the former rows-only trio (f7/a8/a12) is contract-
    # certified — nondeterministic outputs replaced by deterministic
    # verdict booleans + exact branches the DuckDB oracle replays — so
    # EVERY registered query now carries a value oracle. Equality (not
    # <=) so a query silently losing its oracle fails loudly.
    assert no_oracle == set()


def test_arrow_batch_tiers_are_pinned_per_query(spark):
    """Round-8 advice closure: the Arrow exchange batch size is a
    per-query tier, not a session-wide bump. Building a vector query
    must pin the VECTOR tier (262144) for its execution; building a
    multimodal blob query must pin the BLOB tier (1024 — KB-scale
    payloads at the vector tier would be multi-GB Arrow batches); the
    harness reset (__spark_entry__._ensure_confs) must restore the
    narrow-row default so tiers never leak across queries."""
    import __spark_entry__ as entry_mod
    from data_warehouse_spark.session import (
        ARROW_BATCH_BLOB, ARROW_BATCH_DEFAULT, ARROW_BATCH_VECTOR,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    specs = load_all()
    sf = "/root/testdata/sf0.001"

    specs["x3_cosine_topk"].fn(spark, sf)
    assert spark.conf.get(key) == str(ARROW_BATCH_VECTOR)

    specs["mm1_multimodal_stub"].fn(spark, sf)
    assert spark.conf.get(key) == str(ARROW_BATCH_BLOB)

    entry_mod._ensure_confs(spark)
    assert spark.conf.get(key) == str(ARROW_BATCH_DEFAULT)
