"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import DRIVER_WINDOW, load_all

# Round-14 window (VERDICT.md round-13 ask #3): the 16 r10-dated rows
# first, then every round-14 code change, then r11-cohort backfill.
# Composition rationale (incl. the 13 displaced r11 queries and their
# compensating evidence) lives next to DRIVER_WINDOW in
# queries/registry.py.
MUST_BE_WINDOWED = {
    # (a) the 16 r10-dated rows
    "a13_histogram", "dq1_validation_report", "f13_url_parse",
    "f1_timezone", "f5_cast", "j11_fact_fact_join",
    "j12_bucketed_fact_join", "j6_asof_join", "j9_spatial_join",
    "o2_topk", "s8_partition_pruned_scan", "set1_union_all",
    "u6_compaction", "w4_running_agg", "x14_token_budget_sample",
    "x14b_token_budget_scalable",
    # (b) round-14 code changes (pq sentinel hardening + index
    # contract asserts -> x3d/x3e; mixture weight validation -> x21;
    # mm4 JVM fast path; new mm4b seam-attribution twin; new x3f
    # 256-codeword probe gate-verifying the Arrow encode kernel)
    "x3d_pq_adc", "x3e_ivfpq_topk", "x21_mixture_schedule",
    "mm4_feature_ann", "mm4b_feature_ann_seam", "x3f_ivfpq_arrow256",
    # (c) r11-cohort backfill
    "a7_salted_agg", "dq1b_validation_sketch",
    "f6_date_format", "f7_current_timestamp", "j10_star_join",
    "mm1_multimodal_stub", "mm2_image_resize", "mm3_frame_sample",
    "u3_microbatch_write", "u9_time_travel", "u9b_snapshot_diff",
    "udf3_grouped_pandas", "udf4_udtf_words", "x10_repetition_filter",
    "x1_exact_dedup", "x2c_ngram_jaccard", "x2e_incremental_dedup",
    "x3_cosine_topk", "x3b_ivf_topk", "x3c_multi_topk",
    "x4_pairwise_sim", "x5_text_stats", "x5b_lang_id",
    "x5c_quality_score", "x6_token_freq", "x7_tfidf",
    "x8c_components_highdiam", "x9_stratified_split",
}


def test_driver_window_is_exactly_the_round14_set():
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
