"""Registry-order invariant: the external checker verifies only the
FIRST 50 registered queries per round, so every query without a prior
driver-green correctness row must sit inside that window. This test
encodes the evidence ledger (updated each round from CORRECTNESS_r*)
and fails if a registry edit accidentally rotates an unverified query
out of the window.
"""

from __future__ import annotations

from target_iceberg_spark.plans.registry import _HOIST, all_specs

WINDOW = 50

# Queries WITH a driver-green row from round 1 (CORRECTNESS_r01.json);
# their rows remain valid while the implementation is unchanged.
ROUND1_GREEN = {
    "scan_parquet", "scan_json_props", "project_filter", "sort_limit",
    "set_union_except", "join_broadcast", "join_sortmerge",
    "join_left_outer", "join_full_outer", "join_semi", "join_anti",
    "join_range", "join_asof", "agg_group", "agg_distinct", "agg_salted",
    "agg_percentile", "agg_stats", "agg_rollup", "agg_cube", "agg_pivot",
    "agg_approx_distinct", "subquery_scalar", "q3_shipping_priority",
    "q5_local_supplier_volume", "q10_returned_items", "win_range_frame",
    "win_distribution", "fn_string", "fn_date", "fn_math", "fn_array",
    "fn_json", "fn_conditional", "fn_timestamp", "fn_explode",
    "dedup_exact", "dedup_keyed", "dedup_minhash", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_clusters", "dedup_embedding",
    "sim_cosine_topk", "sim_cosine_topk_batch", "sim_ann_ivf",
    "multimodal_meta", "multimodal_decode", "udtf_tokens",
}

# Driver-green rows from round 2 (CORRECTNESS_r02.json: 47 hash-green
# plus the rows-only-by-design trio recorded the same round).
ROUND2_GREEN = {
    "agg_approx_quantile", "agg_collect", "agg_filter_clause",
    "agg_grouping_sets", "agg_histogram", "agg_mode",
    "curation_domain_mix", "curation_mix_temperature",
    "curation_pack_sequences", "curation_pipeline", "dedup_editdist",
    "events_anomaly", "events_funnel", "events_retention",
    "fn_array_setops", "fn_regexp", "join_salted",
    "multimodal_framesample", "q18_large_orders", "rollup_hypertable",
    "sample_stratified", "sim_ann_rp", "stream_dedup_first",
    "stream_join_interval", "stream_session", "stream_sliding",
    "stream_tumbling", "subquery_exists", "subquery_in",
    "subquery_not_in", "text_decontaminate", "text_fingerprint",
    "text_langid", "text_ngram_topk", "text_perplexity", "text_quality",
    "text_repetition", "text_tfidf", "text_tokens", "text_tokens_regex",
    "udf_grouped_agg", "udf_scalar", "win_count_distinct",
    "win_first_last", "win_lag", "win_rank", "win_running_sum",
    # rows-only by design (no SQL-expressible oracle; driver records a
    # rows-only row + dedicated bound/recall pytest coverage)
    "stream_late_data", "sim_ann_lsh",
}

# Queries whose OUTPUT changed in round 3 after their last driver row —
# the stale row no longer reflects the code, so they must re-enter the
# window regardless of ledger membership.
STALE_IN_R3 = {"stream_late_data", "curation_mix_temperature"}

# Brand-new in round 3 (no driver row yet).
NEW_IN_R3 = {
    "q7_volume_shipping", "q8_market_share", "q14_promo_revenue",
    "emb_centroid_classify", "text_vocab_coverage", "text_scrub",
    "events_transitions", "curation_quality_resample", "stream_join_left",
    "sim_ann_pq", "q13_customer_distribution", "q15_top_supplier",
    "q17_small_quantity", "q19_disjunctive", "text_hashing_vectorizer",
    "scan_jsonl", "scan_csv",
}

GREEN = (ROUND1_GREEN | ROUND2_GREEN) - STALE_IN_R3


def test_unverified_queries_inside_checker_window():
    names = list(all_specs())
    assert len(names) >= WINDOW
    outside = [n for n in names[WINDOW:] if n not in GREEN]
    assert not outside, (
        f"queries without current driver-green evidence rotated out of "
        f"the {WINDOW}-entry checker window: {outside}"
    )


def test_unevidenced_queries_are_hoisted():
    assert STALE_IN_R3 | NEW_IN_R3 == set(_HOIST)
    names = list(all_specs())[:WINDOW]
    missing = (STALE_IN_R3 | NEW_IN_R3) - set(names)
    assert not missing, f"unevidenced queries outside the window: {missing}"
