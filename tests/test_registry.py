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
    # (a) r9 cohort minus the 8 displaced (w5/u1/p6 at rotation time,
    # a1/x13/x11/a11/x15 when the mid-round additions landed — the registry
    # comment records why each)
    "a2_count_by_key", "a4_distinct",
    "a5_rollup", "a6_stats", "a10_unpivot",
    "e1_trips", "e1b_bucketed_trips", "e1c_trips_localtime",
    "e2_carbon_savings", "e2b_carbon_bucketed",
    "j1_inner_join", "j2_broadcast_join", "j3_left_join",
    "j4_anti_join", "j4_semi_join", "j5_range_join", "j7_cross_join",
    "j8_two_source_merge",
    "p1_project", "p2_range_predicate", "p4_null_predicate",
    "s1_scan_filter", "s7_scan_full", "s11_schema_evolution",
    "st7_foreach_upsert",
    "u2_dedup_latest", "u4_scd2_dimension", "u7_incremental_rollup",
    "u8_zorder_scan",
    "w1_lag", "w2_lead_first_last", "w3_ranking", "w6_distribution",
    "x2b_simhash", "x5d_fingerprint",
    # (b) round-12 code changes (incl. the mid-round additions
    # x2g/x17/x18/x19/st12 — new queries must land in the round's window)
    "e3_enriched_trips", "e4_daily_run",
    "x8_dup_components", "x8b_components_sparse", "x8d_components_auto",
    "x12_dedup_corpus", "x12b_dedup_corpus_sparse",
    "x16_span_dedup", "x16b_span_removal", "x16c_span_dedup_sparse",
    "x2g_incremental_minhash", "x17_semdedup", "x18_corpus_prep",
    "x19_quality_gate", "st12_stream_incremental_dedup",
}


def test_driver_window_is_exactly_the_round12_set():
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
