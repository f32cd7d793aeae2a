"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import DRIVER_WINDOW, load_all

# Round-7 window (VERDICT.md round-6 asks #1/#3): the four re-cast
# oracles re-certifying, every round-6 code change that lacked a
# round-6 driver row, the round-7 perf targets pre-emptively, and
# backfill with the oldest remaining (r4/r5) rows.
MUST_BE_WINDOWED = {
    # (a) re-certify the four fixed HUGEINT oracles
    "s9_jsonl_roundtrip", "s10_orc_roundtrip",
    "x14_token_budget_sample", "x14b_token_budget_scalable",
    # (b) round-6 code changes without a round-6 driver row
    "j12_bucketed_fact_join", "x3_cosine_topk",
    "w5_sessionize", "e1_trips", "e1b_bucketed_trips",
    "e2_carbon_savings", "e3_enriched_trips",
    "u1_upsert", "u4_scd2_dimension", "x2d_cosine_lsh",
    # (d) round-7 perf targets
    "dq1_validation_report", "j11_fact_fact_join",
    # (c) backfill — oldest remaining rows (r4/r5)
    "set1_union_all", "set2_union_distinct", "set3_intersect",
    "set4_except",
    "f1_timezone", "f2_epoch_diff", "f3_haversine",
    "f8_strings", "f9_json", "f10_null_handling", "f11_arrays",
    "o1_global_sort", "o2_topk", "o2_topk_per_group",
    "w4_running_agg", "p3_between_computed", "p5_or_inequality",
    "a3_global_agg", "a9_pivot",
    "s2_rest_json_source", "s3_parallel_fetch", "s4_csv_roundtrip",
    "s5_append_sink", "s6_ddl_table", "s8_partition_pruned_scan",
    "u2_dedup_latest", "u5_delete_keys", "u6_compaction",
    "j6_asof_join", "x2b_simhash", "x3b_ivf_topk",
    "u9_time_travel", "u9b_snapshot_diff", "x4_pairwise_sim",
}


def test_driver_window_is_exactly_the_round7_set():
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
                         "x5d_fingerprint",
                         "a8_approx_agg", "a12_sketch_rollup"}
