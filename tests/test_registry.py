"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import DRIVER_WINDOW, load_all

# Round-10 window (VERDICT.md round-9 ask #1): complete the rotation —
# the r7 cohort (the last driver rows predating r8), every round-10
# code change, r8-vintage backfill. Composition rationale lives next
# to DRIVER_WINDOW in queries/registry.py.
MUST_BE_WINDOWED = {
    # (a) r7 cohort
    "s2_rest_json_source", "s3_parallel_fetch", "s4_csv_roundtrip",
    "s5_append_sink", "s6_ddl_table", "s8_partition_pruned_scan",
    "s9_jsonl_roundtrip", "s10_orc_roundtrip",
    "u5_delete_keys", "u6_compaction",
    "j6_asof_join", "j11_fact_fact_join", "j12_bucketed_fact_join",
    "e3_enriched_trips",
    "p3_between_computed", "p5_or_inequality",
    "a3_global_agg", "a9_pivot",
    "o1_global_sort", "o2_topk", "o2_topk_per_group",
    "set1_union_all", "set2_union_distinct", "set3_intersect",
    "set4_except",
    "w4_running_agg",
    "f1_timezone", "f2_epoch_diff", "f3_haversine", "f8_strings",
    "f9_json", "f10_null_handling", "f11_arrays",
    "x14_token_budget_sample", "x14b_token_budget_scalable",
    # (b) round-10 code changes
    "x16b_span_removal", "dq1b_validation_sketch",
    "x16c_span_dedup_sparse", "x2f_minhash_sparse",
    "x2_minhash_lsh",
    "dq1_validation_report",
    "a8_approx_agg", "a12_sketch_rollup", "f7_current_timestamp",
    "u9_time_travel", "u9b_snapshot_diff",
    # (c) backfill (r8 vintage; udf2/f6/f12 displaced by x16c/x2f/x2)
    "j9_spatial_join", "a13_histogram", "f5_cast", "f13_url_parse",
}


def test_driver_window_is_exactly_the_round10_set():
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
