"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import DRIVER_WINDOW, load_all

# Round-6 window: the 20 late-round-5 queries with no driver rows yet
# (first-ever rows), queries added or re-oracled in round 6
# (e1c / x2), and backfill with the 30 oldest (r3/r4) rows — the
# relational/join/window core re-verified on current fixtures.
MUST_BE_WINDOWED = {
    # first-ever driver rows (late round-5 additions)
    "s9_jsonl_roundtrip", "s10_orc_roundtrip", "s11_schema_evolution",
    "u7_incremental_rollup", "u8_zorder_scan",
    "u9_time_travel", "u9b_snapshot_diff",
    "a11_cube", "a13_histogram",
    "dq1_validation_report", "f13_url_parse", "w6_distribution",
    "st10_stream_static_join", "st11_dedup_retries",
    "x11_pii_redaction", "x12_dedup_corpus", "x13_decontaminate",
    "x14_token_budget_sample", "x14b_token_budget_scalable",
    "x2e_incremental_dedup",
    # round-6 additions: new queries, first-ever oracle, and mid-round
    # code changes (NULL-safe block keys) re-certifying
    "e1c_trips_localtime", "x2_minhash_lsh", "x15_sequence_packing",
    "x2c_ngram_jaccard", "x4_pairwise_sim", "x8_dup_components",
    "j11_fact_fact_join",
    # backfill — oldest current rows (r3/r4)
    "j1_inner_join", "j2_broadcast_join", "j3_left_join",
    "j4_semi_join", "j4_anti_join", "j5_range_join",
    "j7_cross_join", "j8_two_source_merge",
    "s1_scan_filter", "s7_scan_full",
    "p1_project", "p2_range_predicate",
    "p4_null_predicate", "p6_having",
    "a1_q1_pricing_summary", "a2_count_by_key",
    "a4_distinct", "a5_rollup", "a6_stats", "a10_unpivot",
    "w1_lag", "w2_lead_first_last", "w3_ranking",
}


def test_driver_window_is_exactly_the_round6_set():
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


def test_every_query_has_fn_and_most_have_oracles():
    specs = load_all()
    assert len(specs) >= 88
    no_oracle = {n for n, s in specs.items() if s.oracle is None}
    # rows-only is reserved for genuinely non-SQL-expressible ops
    assert no_oracle <= {"f7_current_timestamp", "st6_stream_dedup",
                         "st7_foreach_upsert", "x2_minhash_lsh",
                         "x2b_simhash", "x3b_ivf_topk", "x5d_fingerprint",
                         "a8_approx_agg", "a12_sketch_rollup"}
