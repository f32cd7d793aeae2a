"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import DRIVER_WINDOW, load_all

# Round-11 window (VERDICT.md round-10 ask #2): the r8 cohort — the
# oldest third of the archive, 40 queries whose latest driver row is
# CORRECTNESS_r08 — plus every round-11 code change. Composition
# rationale lives next to DRIVER_WINDOW in queries/registry.py.
MUST_BE_WINDOWED = {
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
}


def test_driver_window_is_exactly_the_round11_set():
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
