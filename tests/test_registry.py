"""Registry-order invariants: the external correctness gate checks the
FIRST 50 registered queries, so window composition is a deliverable,
not an accident of import order. These tests pin it."""

from __future__ import annotations

from data_warehouse_spark.queries.registry import load_all

# The modules whose queries had no driver-verified correctness row in
# rounds 1-2 — they must all sit inside the 50-entry window.
MUST_BE_WINDOWED = {
    "u1_upsert", "u2_dedup_latest",
    "s2_rest_json_source", "s3_parallel_fetch", "s4_csv_roundtrip",
    "s5_append_sink", "s6_ddl_table",
    "st1_stream_source", "st2_tumbling_window", "st3_sliding_window",
    "st4_session_window", "st5_watermark_late_drop", "st6_stream_dedup",
    "st7_foreach_upsert", "st8_custom_stateful",
    "udf1_row_scalar", "udf2_pandas_scalar", "udf3_grouped_pandas",
    "udf4_udtf_words",
    "j9_spatial_join",
    "x1_exact_dedup", "x2_minhash_lsh", "x2b_simhash", "x2c_ngram_jaccard",
    "x3_cosine_topk", "x3b_ivf_topk", "x4_pairwise_sim",
    "x5_text_stats", "x5b_lang_id", "x5c_quality_score", "x5d_fingerprint",
    "x6_token_freq", "x7_tfidf",
    "mm1_multimodal_stub", "mm2_image_resize", "mm3_frame_sample",
    "mm4_feature_ann",
    # round-3 additions — new queries start inside the window too:
    "j12_bucketed_fact_join", "x8_dup_components",
    "st9_stream_stream_join", "s8_partition_pruned_scan",
    "x9_stratified_split",
    # changed in round 3 (tie-break fix) — must be driver re-verified:
    "j6_asof_join",
}


def test_never_checked_queries_sit_inside_driver_window():
    names = list(load_all())
    window = set(names[:50])
    missing = MUST_BE_WINDOWED - window
    assert not missing, (
        f"queries pushed out of the driver's 50-entry window: {missing}; "
        "check _QUERY_MODULES order / new registrations in early modules")


def test_every_query_has_fn_and_most_have_oracles():
    specs = load_all()
    assert len(specs) >= 87
    no_oracle = {n for n, s in specs.items() if s.oracle is None}
    # rows-only is reserved for genuinely non-SQL-expressible ops
    assert no_oracle <= {"f7_current_timestamp", "st6_stream_dedup",
                         "st7_foreach_upsert", "x2_minhash_lsh",
                         "x2b_simhash", "x3b_ivf_topk", "x5d_fingerprint",
                         "a8_approx_agg"}
