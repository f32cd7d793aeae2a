"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import DRIVER_WINDOW, load_all

# Round-4 window: queries whose only driver rows are r1/r2 (stale — the
# driver regenerated fixtures at round-3 start), never-checked
# a8/a9/a10, the new carbon query, and the two queries whose code was
# touched this round (their r3 green rows predate the change).
MUST_BE_WINDOWED = {
    # relational / windows / scalars / sets — last checked r1/r2
    "s1_scan_filter", "s7_scan_full",
    "p1_project", "p2_range_predicate", "p3_between_computed",
    "p4_null_predicate", "p5_or_inequality", "p6_having",
    "a1_q1_pricing_summary", "a2_count_by_key", "a3_global_agg",
    "a4_distinct", "a5_rollup", "a6_stats", "a7_salted_agg",
    "o1_global_sort", "o2_topk", "o2_topk_per_group",
    "set1_union_all", "set2_union_distinct", "set3_intersect",
    "set4_except",
    "w1_lag", "w2_lead_first_last", "w3_ranking", "w4_running_agg",
    "f1_timezone", "f2_epoch_diff", "f3_haversine", "f5_cast",
    "f6_date_format", "f7_current_timestamp", "f8_strings", "f9_json",
    "f10_null_handling", "f11_arrays", "f12_case",
    "j4_semi_join", "j4_anti_join", "j5_range_join", "j7_cross_join",
    "j8_two_source_merge", "j10_star_join", "j11_fact_fact_join",
    # never in any driver window before round 4
    "a8_approx_agg", "a9_pivot", "a10_unpivot",
    # new in round 4
    "e2_carbon_savings",
    # code changed in round 4 — must be driver re-verified
    "x3_cosine_topk", "mm2_image_resize",
}


def test_driver_window_is_exactly_the_round4_set():
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
                         "a8_approx_agg"}
