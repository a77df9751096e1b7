"""Registry-order invariant: the external checker verifies only the
FIRST 50 registered queries per round, so every query without a prior
driver-green correctness row must sit inside that window. This test
encodes the evidence ledger (updated each round from CORRECTNESS_r*)
and fails if a registry edit accidentally rotates an unverified query
out of the window.
"""

from __future__ import annotations

from target_iceberg_spark.plans.registry import all_specs

WINDOW = 50

# Queries WITH a driver-green row from round 1 (CORRECTNESS_r01.json);
# everything else registered must stay inside the window until its
# green row lands.
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


def test_unverified_queries_inside_checker_window():
    names = list(all_specs())
    assert len(names) >= WINDOW
    outside = [n for n in names[WINDOW:] if n not in ROUND1_GREEN]
    assert not outside, (
        f"queries without driver-green evidence rotated out of the "
        f"{WINDOW}-entry checker window: {outside}"
    )
