"""Physical-plan shape assertions — the 100 TB design contract.

Correctness says the right rows come back; these tests pin HOW:
filters reach the parquet scan, projections prune columns, dimension
joins broadcast, fact joins sort-merge, top-k avoids a global sort, and
no pipeline ever degenerates into a cartesian/BNL join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from target_iceberg_spark.plans import all_specs

SPECS = all_specs()


def plan_of(spark, sf_oracle, name: str) -> str:
    df = SPECS[name].builder(spark, sf_oracle)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "scan_parquet")
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,1500)" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_project_filter_pushdown(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "project_filter")
    assert "PushedFilters:" in plan and "l_shipdate" in plan.split("PushedFilters:")[1]


def test_dimension_joins_broadcast(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "join_broadcast")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_fact_join_is_sort_merge(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "join_sortmerge")
    assert "SortMergeJoin" in plan


def test_topk_avoids_global_sort(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "sort_limit")
    assert "TakeOrderedAndProject" in plan


def test_agg_has_partial_phase(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "agg_group")
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "partial_sum" in plan  # map-side combine before the shuffle


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_cartesian_products(spark, sf_oracle, name):
    """NO query may plan a cartesian/BNL join — except the deliberate
    broadcast of a literal one-row probe (similarity) or one-row
    corpus-count aggregate (tf-idf)."""
    plan = plan_of(spark, sf_oracle, name)
    assert "CartesianProduct" not in plan, name
    if "BroadcastNestedLoopJoin" in plan:
        # only acceptable as a broadcast of a tiny probe/scalar set
        assert name in (
            "sim_cosine_topk",
            "sim_cosine_topk_batch",
            "sim_ann_rp",  # same broadcast one-row probe as sim_cosine_topk
            "text_tfidf",
            "text_pmi_bigrams",  # cross of the one-row token/bigram totals
            "events_funnel",  # cross of three one-row stage counts
            "emb_centroid_classify",  # cross of the <=labels-row centroid table
            "sim_ann_pq",  # broadcast one-row probe for the exact re-rank
            "text_perplexity",  # cross of the one-row corpus-token total
            "text_vocab_coverage",  # cross of the one-row corpus-token total
            "q11_important_parts",  # cross of the one-row value threshold
            "q22_global_sales_opportunity",  # cross of the one-row avg balance
            "emb_kmeans",  # cross of the bounded K-row centroid tables
            "events_active_rolling",  # cross of the one-row date bounds
            "profile_fk_integrity",  # cross of two one-row audit counts
            "emb_pca",  # cross of the one-row projection-variance audit
            "sim_trajectory_users",  # cross of the one-row probe-size count
            "sim_range_search",  # same broadcast one-row probe as sim_cosine_topk
            "sim_recall_audit",  # composes both probe arms' one-row crosses
            "text_bm25",  # cross of the one-row N/avgdl corpus stats
            "sim_hybrid_rrf",  # inherits text_bm25's one-row stats cross
            "events_rfm",  # cross of the one-row percentile-bounds row
            "profile_drift_psi",  # cross of the one-row totals aggregate
            "sim_ann_quality",  # composes the probe arms' one-row crosses
            "sim_topk_incremental",  # cross of the one-row τ threshold
            "sim_knn_classify",  # broadcast KNN_PROBES-row probe set,
            # same class as sim_cosine_topk_batch
            "sim_tfidf_pairs",  # cross of the one-row corpus doc count,
            # same class as text_tfidf
            "text_keywords_tfidf",  # same one-row corpus count cross
            "sim_binary_hamming",  # broadcast one-row packed probe,
            # same class as sim_cosine_topk
            "events_acf",  # broadcast 24-row lag table crossed with the
            # calendar-bounded hourly aggregate (bounded fanout)
            "dedup_semantic",  # broadcast SEM_K-row centroid table for
            # assignment, same class as emb_centroid_classify/emb_kmeans
            "text_jsd_sources",  # #sources x #vocab grid built from two
            # tiny aggregates + the one-row total (bounded crosses)
            "graph_kcore",  # per-round cross of two ONE-ROW stats
            # aggregates (node count x edge count)
            "agg_chi_square",  # r x c category grid built from the two
            # tiny marginal aggregates + the one-row total (bounded
            # crosses, same class as text_jsd_sources)
            "text_ngram_novelty",  # cross of the one-row max-doc-id
            # aggregate (decile bucketing), same class as text_tfidf
            "text_zipf_skewed",  # crosses of the one-row token/vocab
            # totals onto the one-row slope fit
            "profile_bloom_fpr",  # crosses of the one-row audit /
            # key-count / word-count aggregates (three one-row frames)
            "profile_kmv_jaccard",  # cross of the two one-row
            # sketch/exact aggregates
            "text_bigram_lm",  # cross of the one-row |V| aggregate,
            # same class as text_perplexity
            "sim_hard_negatives",  # broadcast HN_PROBES-row anchor
            # set, same class as sim_cosine_topk_batch
            "curation_semantic_decontam",  # broadcast eval-split set
            # (the fixed external-benchmark stand-in; small by
            # construction), same class as sim_knn_classify's probe set
            "graph_modularity",  # crosses of the one-row edge-count /
            # node-count aggregates
            "profile_zorder_clustering",  # cross of the one-row
            # key-bounds aggregate, same class as events_active_rolling
            "curation_ipf_raking",  # cross of the one-row targets
            # aggregate onto the grid-sized cell table
            "sim_ndcg_audit",  # broadcast NDCG_PROBES-row anchor set +
            # k-row discount fanout, same class as sim_cosine_topk_batch
            "sim_hamming_fidelity",  # composes both arms' broadcast
            # one-row probe crosses, same class as sim_recall_audit
            "events_decay_features",  # cross of the one-row watermark
            # (max ts) aggregate, same class as events_active_rolling
            "graph_hits",  # cross of the one-row L1-normalizing total
            "mining_association_rules",  # cross of the one-row
            # order-count aggregate (lift's N)
            "curation_filter_sweep",  # cross of the one-row corpus
            # totals (the retention denominators)
            "curation_upsample_weights",  # cross of the one-row corpus
            # totals (target-share denominator)
            "emb_silhouette",  # cross of the bounded K-row centroid
            # tables, same class as emb_kmeans
            "dedup_lsh_band_sweep",  # cross of the one-row pair-count
            # aggregate per config onto its one-row occupancy stats
            "curation_filter_overlap",  # cross of the one-row total
            # (Venn-cell share denominator)
            "agg_cuped",  # cross of the one-row theta/mean_x fit,
            # same class as profile_drift_psi
            "agg_decile_lift",  # crosses of the one-row user-count and
            # base-rate aggregates
            "text_bm25_zipf",  # cross of the one-row N/avgdl corpus
            # stats, same class as text_bm25
            "sim_tfidf_pairs_zipf",  # cross of the one-row corpus doc
            # count, same class as sim_tfidf_pairs
            "profile_key_gaps",  # cross of the two one-row audit
            # aggregates, same class as profile_fk_integrity
            "text_idf_drift",  # crosses of the one-row median-id and
            # cohort-size aggregates, same class as text_ngram_novelty
            "dedup_bloom_incremental",  # cross of the two one-row
            # count aggregates, same class as profile_key_gaps
            "sim_matryoshka_curve",  # broadcast MC_PROBES-row probe
            # panel, same class as sim_cosine_topk_batch
            "text_winnowing_zipf",  # cross of the one-row pair-count
            # aggregate onto the one-row fingerprint census
            "text_dup_ngram_zipf",  # cross of the one-row boilerplate
            # kill count onto the per-source rollup
            "curation_kanonymity",  # broadcast |K|-row k-threshold
            # list crossed onto the tiny QI group-size tables
            "events_markov_stationary",  # cross of the one-row total
            # onto the k-row type table (share denominator)
            "agg_bayes_ab",  # broadcast 2-row arm counts crossed onto
            # the fixed-size posterior grid + one-row result crosses
            "profile_ndv_growth",  # cross of the one-row id-bounds
            # aggregate, same class as events_active_rolling
            "agg_runs_test",  # cross of the one-row global-median
            # aggregate, same class as events_rfm
            "sim_ivf_recall_curve",  # broadcast probe panel +
            # |depths|-row nprobe grid, same class as
            # sim_cosine_topk_batch / sim_matryoshka_curve
            "agg_sprt_ab",  # cross of the one-row MAX(user_id) cohort
            # denominator onto the user frame, same class as
            # events_active_rolling
            "agg_fisher_exact",  # crosses of the one-row 2x2 cells /
            # observed-pmf frames onto the <= PANEL_K support grid
            "agg_theil_sen",  # day-pair theta self-join + one-row
            # estimate crosses, all on the calendar-bounded (~30-row)
            # daily frame — same class as events_slo_burn
            "agg_eb_shrinkage",  # cross of the one-row Beta-prior
            # moment fit onto the user frame, same class as
            # events_rfm / agg_sprt_ab
            "events_xcorr",  # broadcast 7-row lag literal crossed
            # with the calendar-bounded hourly series, same class as
            # events_acf's 24-row lag table
            "profile_selectivity_audit",  # crosses of the one-row
            # min/width aggregate and the 4-row threshold literal
            # onto the 16-row histogram / the scan, same class as
            # events_active_rolling
            "events_seasonal_strength",  # cross of the one-row hour
            # span onto the |types|-row frame (grid = types x span),
            # same class as events_acf's calendar-bounded grid
            "text_keyness_g2",  # cross of the one-row corpus token
            # total onto the df-capped (source, word) counts, same
            # class as text_tfidf's one-row corpus count
            "text_burrows_delta",  # cross of the DELTA_WORDS (30)
            # marker panel onto the |sources|-row totals — the
            # bounded stylometry grid, same class as emb_kmeans's
            # centroid cross
            "sim_prf_rocchio",  # broadcast PRF_TOP (10)-row result
            # crossed back for the threshold-count ranks, same class
            # as sim_topk_incremental's one-row tau cross
            "curation_dsir",  # cross of the two one-row corpus-size
            # totals (T and R) onto the bucket models — the Laplace
            # denominators, same class as text_bm25's one-row stats
            "text_kneser_ney",  # cross of the one-row bigram-type
            # total (the continuation denominator N1+(..))
            "text_kn_perplexity",  # inherits text_kneser_ney's shared
            # scoring stage and its one-row type-total cross
            "text_lm_contrast",  # same inherited one-row type-total
            # cross plus the one-row unigram-total cross
            "text_nb_langid",  # cross of the <= |classes|-row class
            # list onto the vocab (the smoothing grid) + the one-row
            # vocab size — same class as emb_centroid_classify
            "emb_whitening",  # cross of the one-row variance audit
            # onto the K-row axis list, same class as emb_pca
            "agg_kendall_tau",  # broadcast inequality self-join of
            # the CONSTANT 400-row md5 sample (~80k pairs at any SF)
            "agg_countmin_sketch",  # cross of the one-row corpus
            # count N (the eps*N bound denominator)
            "agg_levene_bf",  # cross of the one-row grand-total
            # sufficient stats onto the k-row group table
            "agg_welch_anova",  # same one-row weighted-totals cross
            # as agg_levene_bf
            "profile_equidepth_histogram",  # cross of the ONE-row
            # quantile-boundary array onto the scan (the bucket
            # classifier), same class as text_bm25's one-row stats
            "agg_calibration_ece",  # cross of the one-row (mu, sd)
            # moment fit onto the scan, same class as agg_cuped
            "agg_hll_intersection",  # crosses of four ONE-row
            # aggregates (three exact audience counts + the sketch
            # row), same class as profile_kmv_jaccard
            "agg_gmm_em",  # per-EM-iteration cross of the ONE-row
            # parameter table onto the scan (the E-step broadcast),
            # same class as agg_calibration_ece's (mu, sd) cross
            "text_quality_trained",  # per-IRLS-step cross of the
            # ONE-row beta table onto the feature scan, same class as
            # agg_gmm_em's E-step broadcast
            "lakehouse_snapshot_gc",  # crosses of the one-row
            # newest/oldest-kept policy bounds onto the metadata-sized
            # snapshot and file-inventory tables
            "lakehouse_partition_evolution",  # crosses of one-row
            # per-arm/per-spec aggregates over the checkpointed
            # calendar-bounded day inventory, same class as
            # lakehouse_snapshot_gc's policy-bound crosses
            "curation_repetition_schedule",  # cross of the one-row
            # budget-share constant onto the <= #sources-row schedule
            "eval_macro_f1",  # inherits text_nb_langid's smoothing-grid
            # crosses (vocab x |classes| + the one-row vocab size)
            "sim_filtered_topk",  # broadcast one-row probe cross, same
            # class as sim_cosine_topk
            "curation_mix_anneal",  # cross of the one-row normalizer
            # totals onto the <= #sources-row mix table
            "curation_domain_reweight",  # per-EG-step cross of the
            # one-row normalizer onto the checkpointed |sources|-row
            # table, same class as curation_mix_anneal
            "events_shapley_attribution",  # literal-bounded coalition
            # algebra: 2^k-subset x mask containment join, the
            # coalition-pair join, and the one-row bounds/total crosses
            "curation_rho_loss",  # cross of the one-row two-model
            # token totals (n_h/n_p/|V|) onto the scoring join, same
            # class as text_bm25's one-row corpus stats
            "cdc_incremental_agg",  # crosses of the three one-row
            # audit aggregates (delta fan-out, surviving totals,
            # retired-group count), same class as profile_fk_integrity
        ), f"unexpected BNLJ in {name}"


def test_asof_is_single_shuffle(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "join_asof")
    # one exchange per union branch feeding ONE window sort — no join
    # operator at all in the as-of implementation
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Window" in plan


def test_cosine_topk_broadcasts_probe(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "sim_cosine_topk")
    assert "TakeOrderedAndProject" in plan


def test_q18_having_subquery_is_semi_join(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q18_large_orders")
    assert "LeftSemi" in plan  # big-orderkey list joined back, not collected
    assert "partial_sum" in plan  # the HAVING aggregate map-side combines


def test_subquery_exists_decorrelates_to_anti_join(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "subquery_exists")
    assert "LeftAnti" in plan


def test_subquery_in_decorrelates_to_semi_join(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "subquery_in")
    assert "LeftSemi" in plan


def test_salted_join_carries_salt_into_join_key(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "join_salted")
    assert "_salt" in plan  # salt survives optimization into the join


def pushed_filter_lists(plan: str) -> list[str]:
    """The bracketed list after each 'PushedFilters:' — and ONLY the
    bracketed list. Asserting on the whole post-split chunk is vacuous:
    it also contains the scan's ReadSchema (which names every read
    column whether or not its filter pushed) and the rest of the plan
    text."""
    out = []
    for chunk in plan.split("PushedFilters: [")[1:]:
        out.append(chunk.split("]")[0])
    return out


def test_q13_left_join_survives_to_physical_plan(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q13_customer_distribution")
    assert "LeftOuter" in plan  # join-condition filter didn't turn it inner
    assert any("o_orderpriority" in f for f in pushed_filter_lists(plan))


def test_q17_decorrelates_to_two_scans_no_bnlj(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q17_small_quantity")
    # >= 2 (not == 3): AQE reused-exchange/subquery-reuse or a Spark
    # version bump can legitimately collapse scans; the contract is
    # "decorrelated aggregate-then-join, no per-row re-aggregation"
    assert plan.count("Scan parquet") >= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_q19_disjunctive_filters_push_into_both_scans(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q19_disjunctive")
    filters = pushed_filter_lists(plan)
    assert any("p_brand" in f for f in filters)  # part side
    assert any("l_quantity" in f for f in filters)  # fact side


def test_q8_broadcasts_all_dims(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 4  # part, region, both nation roles
    assert "CartesianProduct" not in plan


def test_centroid_classify_broadcasts_centroids(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "emb_centroid_classify")
    # the centroid table reaches the probe side as a broadcast, and the
    # argmin is a grouped min_by — a combinable aggregate, NOT a window
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan
    assert "min_by" in plan or "partial_min_by" in plan


def test_vocab_coverage_topk_is_take_ordered(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "text_vocab_coverage")
    # vocabulary top-K must plan as TakeOrderedAndProject (parallel
    # per-partition heaps), never a vocabulary-wide unpartitioned window
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition(_w" in plan  # K-row window is partitioned


def test_perplexity_total_has_no_window(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "text_perplexity")
    assert "Window" not in plan  # corpus total is a 1-row broadcast agg


def test_scd2_single_shuffle_two_windows(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "events_scd2")
    # lag-filter-lead shares ONE user_id exchange; both windows reuse it
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 2
    assert "Join" not in plan


def test_unpivot_is_expand_no_shuffle(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "fn_unpivot")
    assert "Expand" in plan  # one fan-out node...
    assert "Exchange hashpartitioning" not in plan  # ...zero shuffle
    assert "Join" not in plan


def test_quality_resample_has_no_join_or_window(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "curation_quality_resample")
    assert "Join" not in plan and "Window" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine


def test_partitioned_scan_prunes_directories(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "scan_partitioned")
    # the o_year predicate resolves against the hive directory listing
    # (PartitionFilters), never as a row-level parquet filter
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_year" in pf and "1997" in pf
    assert "o_year" not in plan.split("PushedFilters:")[1].splitlines()[0]


def test_sessionize_gap_single_shuffle_two_windows(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "events_sessionize_gap")
    # lag + running-sum share ONE user_id exchange; the session rollup
    # adds its own partial/final aggregate pair on (user_id, session_idx)
    assert plan.count("Window [") == 2
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan


def test_path_topk_is_window_then_take_ordered(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "events_path_topk")
    assert "TakeOrderedAndProject" in plan  # top-k without a global sort
    assert plan.count("Window [") == 1  # both leads fused in one window


def test_active_rolling_has_no_range_join(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "events_active_rolling")
    # the sliding distinct is an explode + equi-GROUP BY; the only join
    # is the broadcast of the 1-row date bounds
    assert "Generate explode" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row bounds cross


def test_heavy_hitters_broadcasts_candidates(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "agg_heavy_hitters")
    # candidate recount: broadcast semi/inner join on the tiny MG
    # candidate set, combinable count, top-k without a global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_argmax_is_single_aggregate_no_window(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "agg_argmax")
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan


def test_cumulative_share_one_exchange_both_frames(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "win_cumulative_share")
    # running frame + whole-partition total: two Window ops but ONE
    # hashpartitioning exchange (same partitioning reused), no join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_lateral_decorrelates_to_join_not_per_row_rescan(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "subquery_lateral")
    # the per-customer LIMIT 1 subquery becomes a per-key window limit
    # feeding ONE join — orders is scanned once, not once per customer
    assert "Join" in plan
    assert plan.count("Scan parquet") == 2
    assert "Window" in plan


def test_quantize_broadcasts_dim_stats(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "emb_quantize_int8")
    # the 64-row per-dim min/max table joins back as a broadcast —
    # never a shuffled join against the exploded values — and no
    # window appears anywhere
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_neardup_pipeline_drops_via_anti_join(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "curation_neardup_pipeline")
    # the drop-dominated rule is ONE LeftAnti against the candidate
    # id_b side; the survivors' rollup keeps map-side combine
    assert "LeftAnti" in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Window" not in plan


# Whole-registry sweep: the vocabulary-window class of scale killer
# (an unpartitioned ordered/whole-frame window over unbounded input)
# must never reappear. The only unpartitioned windows allowed are the
# AGGREGATE-BOUNDED frames: inputs already collapsed to <= #sources /
# #months rows by a combinable groupBy, where a single-task window is
# O(groups) by construction.
UNPARTITIONED_WINDOW_OK = {
    "curation_mix_knapsack",  # greedy cumulative-budget sweep over
    # the <= #sources-row aggregate, same class as curation_domain_mix
    "curation_semantic_order",  # final rank over the 40-row
    # TakeOrdered head, same class as sim_hybrid_rrf's k-row ranks
    "events_changepoint",  # cumulative-SSE scan over the daily series
    # (calendar-bounded rows), same class as agg_mom_growth
    "agg_chi2_independence",  # margin windows over the <= |types|x2
    # contingency cells, same class as agg_cramers_v
    "curation_domain_mix",  # per-source share frame (<= #sources rows)
    "curation_mix_temperature",  # same bounded per-source frame
    "agg_mom_growth",  # monthly series (<= months-of-history rows)
    "sim_hybrid_rrf",  # two rank windows over the arms' k-row top-k lists
    "text_zipf",  # rank window over the top-k-bounded 100-row input
    "agg_gini_binned",  # Lorenz sweep over <= max_spend/bin_width
    # (~150) fixed-width bins — aggregate-bounded by construction
    "agg_benford",  # total-over-9-digit-rows frame
    "agg_survival_km",  # K-M sweeps over the distinct-duration table,
    # bounded by the calendar span of the study window
    "agg_mutual_info",  # marginals over the <= |X|x|Y| contingency cells
    "text_zipf_skewed",  # rank window over the <= ZIPF_V-row (1000)
    # synthetic rank-frequency aggregate — vocabulary-bounded by
    # construction, same class as text_zipf
    "agg_cramers_v",  # margins over the <= |types|x7 = 35 contingency
    # cells, same class as agg_mutual_info
    "graph_degree_histogram",  # CCDF windows over the
    # <= log2(max_degree) binned rows, same class as agg_gini_binned
    "events_slo_burn",  # burn windows over the calendar-bounded
    # hourly series (<= hours-of-history rows), same class as
    # agg_mom_growth/events_acf
    "events_entropy_rate",  # stationary-weight total over the
    # <= |types| = 5 per-type entropy rows
    "agg_decile_lift",  # partition-offset cumsum over <= #shuffle-
    # partitions (32) size rows — the distributed-rank prefix table,
    # NOT a window over users
    "curation_upsample_weights",  # normalizing sum over the
    # <= #sources-row weight frame, same class as curation_domain_mix
    "profile_ndv_growth",  # Heaps-curve cumulative over the
    # NDV_BUCKETS (10) decile rows — aggregate-bounded by
    # construction, same class as agg_mom_growth
    "agg_sprt_ab",  # LLR cumulative over the SPRT_CHECKPOINTS (20)
    # interim-look rows — a plan literal, same class as
    # profile_ndv_growth
    "agg_fisher_exact",  # row_number + ln-factorial cumsum over the
    # <= PANEL_K (512) md5-ordered panel rows — a design constant,
    # same class as sample_fixed_k
    "agg_holm_bonferroni",  # |z| rank + step-down cumulative MIN over
    # exactly HOLM_M (5) metric rows — a plan literal, same class as
    # agg_sprt_ab
    "agg_benjamini_hochberg",  # |z| rank + step-up suffix MAX over
    # exactly BH_M (5) metric rows — the Holm query's window dual
    "sim_prf_rocchio",  # rank_new row_number over the PRF_TOP (10)
    # already-TakeOrdered result rows — never over the corpus (the
    # corpus-wide ranks are broadcast threshold-counts)
    "lakehouse_snapshot_gc",  # age-rank row_number over the
    # distinct-months snapshot aggregate (calendar-bounded), same
    # class as agg_mom_growth
}


def _unpartitioned_window_specs(plan: str) -> list[str]:
    # Balanced-paren scan, NOT a regex: the first argument of
    # windowspecdefinition may itself contain parens/commas (e.g.
    # coalesce(month#5, 2024-01-01) ASC NULLS FIRST), which a
    # [^,)]+ capture would truncate at the inner '(' — hiding the
    # ASC/DESC marker and letting an unpartitioned compound-ordered
    # window slip through the sweep.
    hits = []
    marker = "windowspecdefinition("
    pos = 0
    while True:
        j = plan.find(marker, pos)
        if j < 0:
            break
        p = j + len(marker)
        depth = 1
        first_end = None
        while p < len(plan) and depth > 0:
            c = plan[p]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1 and first_end is None:
                first_end = p
            p += 1
        first = plan[j + len(marker) : first_end if first_end is not None else p - 1]
        first = first.strip()
        # partitioned specs lead with a bare partition expression; an
        # unpartitioned spec leads with the frame itself (whole-frame)
        # or an ordering expression (expr ASC/DESC NULLS ...)
        if (
            first.startswith("specifiedwindowframe")
            or " ASC" in first
            or " DESC" in first
        ):
            hits.append(first[:60])
        pos = p
    return hits


def test_window_sweep_parser_handles_compound_ordering():
    # Guard the guard: a compound (function-call) unpartitioned
    # ordering expression must be flagged, a compound PARTITION
    # expression must not.
    unpart = "Window [windowspecdefinition(coalesce(month#5, x#6) ASC NULLS FIRST, specifiedwindowframe(RangeFrame, unboundedpreceding$(), currentrow$()))]"
    part = "Window [windowspecdefinition(coalesce(month#5, x#6), ts#7 ASC NULLS FIRST, specifiedwindowframe(RangeFrame, unboundedpreceding$(), currentrow$()))]"
    whole = "Window [windowspecdefinition(specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$()))]"
    assert _unpartitioned_window_specs(unpart)
    assert not _unpartitioned_window_specs(part)
    assert _unpartitioned_window_specs(whole)


@pytest.mark.parametrize("name", sorted(n for n, s in SPECS.items() if s.bench))
def test_no_unpartitioned_windows_outside_bounded_whitelist(
    spark, sf_oracle, name
):
    plan = plan_of(spark, sf_oracle, name)
    hits = _unpartitioned_window_specs(plan)
    if name in UNPARTITIONED_WINDOW_OK:
        return  # bounded-frame class, adjudicated safe
    assert not hits, (
        f"{name} plans an unpartitioned window ({hits[:2]}) — either "
        f"partition it, collapse the input through an aggregate first, "
        f"or whitelist it with a boundedness argument"
    )


# --- Structural boundedness proof for the whitelist itself ----------
# The whitelist above records a human adjudication ("this window's
# input is aggregate/limit-bounded"). These checks turn that contract
# into a machine-verified plan property (VERDICT r10 task 3): every
# unpartitioned logical Window must sit above a subtree that provably
# collapses cardinality — an Aggregate, a Limit, a literal relation, or
# a small Range — before any unbounded scan is reached. Residual risk
# (documented): an Aggregate's group count is trusted as bounded, so an
# unpartitioned window over groupBy(doc_id) would pass structurally;
# the whitelist's per-case comments remain the guard for group-key
# cardinality.

_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation"}
_COLLAPSING = {"Aggregate", "GlobalLimit", "LocalLimit"}


def _subtree_is_bounded(node) -> bool:
    """True if every root-to-leaf path through ``node`` crosses a
    cardinality-collapsing operator before reaching an unbounded
    source. Pass-through operators (Project/Filter/Join/Window/Sort/
    Union/...) are bounded iff ALL their children are — conservative
    for joins (bounded x unbounded is treated unbounded)."""
    name = node.getClass().getSimpleName()
    if name in _COLLAPSING or name in _BOUNDED_LEAVES:
        return True
    if name == "Range":
        n = node.numElements()  # BigInt or plain int depending on py4j
        return (n.longValue() if hasattr(n, "longValue") else int(n)) <= 100_000
    children = node.children()
    if children.size() == 0:
        return False  # parquet relation, LogicalRDD, stream source, ...
    return all(
        _subtree_is_bounded(children.apply(i)) for i in range(children.size())
    )


def _unbounded_unpartitioned_windows(df) -> list[str]:
    """argStrings of unpartitioned logical Window nodes whose input
    subtree is NOT provably bounded."""
    bad: list[str] = []

    def walk(node):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and not _subtree_is_bounded(node.children().apply(0))
        ):
            bad.append(node.argString(120))
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def test_bounded_window_prover_rejects_window_over_scan(spark, sf_oracle):
    # Guard the guard: a deliberately-bad unpartitioned window straight
    # over a parquet scan must be flagged; the same window above an
    # aggregate or a limit must pass.
    from pyspark.sql import Window as W

    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    bad = li.withColumn("r", F.row_number().over(W.orderBy("l_orderkey")))
    assert _unbounded_unpartitioned_windows(bad)
    over_agg = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
        .withColumn("r", F.row_number().over(W.orderBy("s")))
    )
    assert not _unbounded_unpartitioned_windows(over_agg)
    over_limit = li.limit(10).withColumn(
        "r", F.row_number().over(W.orderBy("l_orderkey"))
    )
    assert not _unbounded_unpartitioned_windows(over_limit)
    # join of a bounded side with an unbounded side stays unbounded
    joined = li.join(li.limit(5).select("l_orderkey"), "l_orderkey").withColumn(
        "r", F.row_number().over(W.orderBy("l_partkey"))
    )
    assert _unbounded_unpartitioned_windows(joined)


@pytest.mark.parametrize("name", sorted(UNPARTITIONED_WINDOW_OK))
def test_whitelisted_unpartitioned_windows_are_structurally_bounded(
    spark, sf_oracle, name
):
    df = SPECS[name].builder(spark, sf_oracle)
    bad = _unbounded_unpartitioned_windows(df)
    assert not bad, (
        f"{name} is whitelisted as bounded but its unpartitioned window "
        f"input is not structurally provable (no Aggregate/Limit/literal "
        f"between window and scan): {bad[:2]}"
    )


@pytest.mark.parametrize(
    "name", ["sample_stratified", "sample_fixed_k", "profile_topk_values"]
)
def test_group_topk_plans_window_group_limit(spark, sf_oracle, name):
    """rank-filtered per-group top-k must keep Spark's WindowGroupLimit
    (per input partition top-k BEFORE the shuffle) — the optimization
    only fires for rank filters at or under
    spark.sql.optimizer.windowGroupLimitThreshold (1000), so a
    constant bump past it would silently reintroduce the full
    per-group sort this test exists to prevent."""
    plan = plan_of(spark, sf_oracle, name)
    assert "WindowGroupLimit" in plan, name


def test_join_bucketed_has_no_exchange_on_either_side(spark, sf_oracle):
    """The bucketed-layout fact-fact join must consume the files' own
    partitioning: SMJ with zero Exchange on the join keys (the
    aggregate after it may still exchange; a within-partition Sort
    remains because Spark does not trust file order on read)."""
    plan = plan_of(spark, sf_oracle, "join_bucketed")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_join_shuffle_hash_plans_shj(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "join_shuffle_hash")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- round-5 additions ---------------------------------------------------


def test_text_zipf_topk_is_take_ordered(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "text_zipf")
    # vocab top-K must be TakeOrderedAndProject (parallel partial
    # heaps), never a global Sort; the rank window then runs over that
    # bounded K-row output (whitelisted above with that argument)
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # token counting keeps map-side combine


def test_neardup_keepbest_survivor_choice_is_aggregate_not_window(
    spark, sf_oracle
):
    plan = plan_of(spark, sf_oracle, "curation_neardup_keepbest")
    # survivor selection is a combinable per-cluster max_by and the
    # drop is a LEFT ANTI join — the oracle's ROW_NUMBER is mirror-only
    assert "LeftAnti" in plan
    assert "max_by" in plan
    assert "Window" not in plan


def test_cdc_apply_compaction_is_aggregate_not_window(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "cdc_apply_changelog")
    assert "max_by" in plan
    assert "Window" not in plan


def test_events_rfm_has_no_window_and_broadcasts_bounds(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "events_rfm")
    # boundaries-then-compare, not ntile-over-all-users: percentile is
    # a combinable aggregate and its 1-row result broadcasts back
    assert "Window" not in plan
    assert "percentile" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_profile_drift_psi_single_fact_scan(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "profile_drift_psi")
    # one pass over orders into the bucket aggregate; the totals join
    # is a broadcast of one row, and counting keeps map-side combine
    assert plan.count("Scan parquet") <= 2  # bucket agg + reused/total side
    assert "partial_count" in plan


def test_dedup_url_multi_distinct_expands_with_partial_agg(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "dedup_url")
    assert "Expand" in plan  # multi-count-distinct rewrite
    assert "Window" not in plan


def test_window_topk_rank_is_partitioned_by_window(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "events_window_topk")
    # rank runs per time-window partition over the pre-aggregated
    # (window, key) counts — the sweep above would flag it if global
    assert "Window" in plan
    assert "partial_count" in plan


def test_bitmap_distinct_is_two_combinable_phases(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "agg_bitmap_distinct")
    # both the bitmap OR-merge and the count-sum keep partial phases;
    # no Expand (that's agg_distinct's exact-distinct rewrite, whose
    # shuffle carries distinct values instead of fixed-size bitmaps)
    assert "partial_bitmap_construct_agg" in plan or "bitmap_construct_agg" in plan
    assert "partial_sum" in plan
    assert "Expand" not in plan


def test_copurchase_pairs_via_equi_join_topk(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "agg_copurchase")
    # pair generation must be an equi-join on the basket key (the
    # part_a < part_b predicate rides along), never cartesian, and the
    # final cut a TakeOrderedAndProject
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_quality_logistic_is_shuffle_free_until_rollup(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "text_quality_logistic")
    # features are in-row codegen (no explode): exactly one exchange —
    # the final per-source aggregate's
    assert plan.count("Exchange") <= 2  # partial->final agg + result sort
    assert "Generate" not in plan  # no explode in the feature pass


def test_dup_ngram_grams_shuffle_as_digests(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "text_dup_ngram_fraction")
    # grams leave the row as md5 digests and rejoin through an
    # equi-join; the gram-frequency side keeps a partial phase
    assert "md5" in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_also_bought_broadcasts_probe_parts(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "graph_also_bought")
    # the probe's part set is filter-pushed and broadcast into hop 2;
    # the cut is a TakeOrderedAndProject
    assert any("custkey" in f for f in pushed_filter_lists(plan))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_scan_dpp_injects_dynamic_pruning_subquery(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "scan_dpp")
    # the year set comes from the broadcast dim at RUNTIME: the fact
    # scan's PartitionFilters must carry a dynamicpruning subquery,
    # not a static literal list
    assert "dynamicpruning" in plan.lower()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_year" in pf
    assert "BroadcastHashJoin" in plan or "SubqueryAdaptiveBroadcast" in plan


def test_sample_weighted_two_phase_topk(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "sample_weighted")
    # salted local cut then final per-segment cut: two windows, both
    # partitioned (the salt bounds the first; k x salts bounds the
    # second), never one global sort per segment over the whole table
    assert plan.count("Window [") == 2
    assert "Join" not in plan


def test_graph_triangles_joins_are_equi_only(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "graph_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # support threshold applied via a partial-phase aggregate before
    # any triangle join
    assert "partial_count" in plan


def test_boilerplate_strip_shuffles_digests_no_window(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "text_boilerplate_strip")
    # segments rejoin their verdicts through an md5-digest equi-join;
    # reconstruction is collect_list-per-doc (aggregate), not a window
    assert "md5" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_graph_triangles_reuses_edge_shuffle_at_runtime(spark, sf_oracle):
    """The edge subtree appears 3x in the logical plan (e1/e2/e3) but
    must execute once: AQE serves the arms from the same materialized
    shuffle stage (ReusedExchange in the FINAL adaptive plan)."""
    df = SPECS["graph_triangles"].builder(spark, sf_oracle)
    df.collect()  # AQE reuse is a runtime decision — run it
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final


def test_incremental_topk_band_plans_take_ordered_no_shuffle(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "sim_topk_incremental")
    # one corpus fold -> 1-row tau broadcast -> pushable band filter ->
    # exact re-score -> top-k; no hash-partitioned shuffle anywhere
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
