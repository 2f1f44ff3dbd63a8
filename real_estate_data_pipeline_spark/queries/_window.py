"""Driver evidence window: rotation bookkeeping + catalog reorder.

Split from queries.py lines 40071-40356 (mechanical move, round 13);
runs LAST on package import — see queries/__init__.py.
"""

from __future__ import annotations

from ._registry import CATALOG


# This block rotates the window: the 50 entries below are all
# oracle-backed and (as of round 5) never driver-sampled, so one driver
# run converts them to hard cross-engine evidence. Rows-only entries
# (minhash/simhash fast paths, multimodal pixel ops) stay OUT of the
# window; their oracle-exact portable twins are in it. Every consumer
# (driver queries()/oracle_sql(), bench, parity tests) iterates CATALOG,
# so reordering here is the single source of truth.

# Every query name that has EVER appeared in a driver CORRECTNESS_r*.json
# sample (rounds 1-7: r1-r4 shared one window; r5, r6 and r7 each
# rotated a fresh 50).  The rotation
# exists to convert never-sampled queries into driver evidence — this
# frozen set plus the disjointness assert below make it impossible for a
# refactor to silently re-burn evidence slots on already-green names.
_PREVIOUSLY_SAMPLED = frozenset({
    # rounds 1-4 window
    "a1_pricing_summary", "a1b_grouped_median_stddev", "a2_priority_counts",
    "a3_global_stats", "a4_distinct_customers", "a5_quality_singlepass",
    "a6_completeness", "a7_summary_stats", "d7_freshness",
    "d_calendar_rollup", "d_epoch_and_format", "dedup_exact_docs",
    "doc_chunk_windows", "doc_fingerprint_dedup", "doc_lang_id",
    "doc_pack_sequences", "doc_pii_redact", "doc_quality_score",
    "doc_repetition_stats", "doc_token_stats", "docs_dedup_representatives",
    "dup_clusters_ngram", "emb_dup_pairs", "evt_sessionization",
    "evt_sliding_halfhour", "evt_tumbling_hourly", "f14_ansi_safe_parse",
    "f_customer_normalize", "f_segment_recode_bucket", "j1_dim_join_rollup",
    "j2_stats_backjoin", "j3_anti_orphans", "m1_log_features",
    "m2_zscore_outliers", "m3_order_price_spread", "m6_completeness_score",
    "m9_impute_cascade", "minhash_dup_pairs", "mm_binary_meta",
    "n12_variant_extract", "n9_json_extract", "n_array_access",
    "ngram_jaccard_pairs", "o1_topk_customers", "p1_filter_project",
    "p2_validation_split", "p3_range_filter", "p4_null_dispatch",
    "q3_top_revenue_orders", "q5_nation_revenue", "q6_banded_revenue",
    "sample_docs_stratified", "sample_orders_split", "sim_bruteforce_topk",
    "sim_ivf_topk", "sim_knn_join", "sim_lsh_topk", "simhash_dup_pairs",
    "u1_union_by_name", "w1_dedup_keep_latest",
    # round-5 rotated window
    "sim_ivf_knn_join", "sim_knn_query_corpus", "minhash_dup_pairs_portable",
    "simhash_dup_pairs_portable", "dup_clusters_minhash",
    "decon_eval_overlap", "decon_reuse_gram_index", "scd2_two_run_versions",
    "scd2_stream_upsert", "scd2_cdf_rollup", "io_partitioned_roundtrip",
    "io_jsonl_corrupt_scan", "io_compact_roundtrip", "io_targeted_delete",
    "io_zorder_roundtrip", "evt_stream_tumbling_now",
    "evt_stream_sliding_now", "evt_stream_sessions_now",
    "evt_stream_sessions_append", "evt_stream_stateful_totals",
    "evt_stream_join_now", "evt_stream_dedup_watermark_now",
    "doc_stream_dedup_now", "doc_hash_embedding", "doc_hash_embed_knn",
    "doc_bigram_logprob", "sample_docs_weighted", "export_shuffled_shards",
    "corpus_curation_pipeline", "doc_token_entropy", "skew_salted_agg",
    "skew_salted_join", "skew_salted_top_n", "incr_rollup_events",
    "table_diff_customer", "dq_observed_singlepass", "dq_referential_audit",
    "evt_error_rate_hourly", "quarantine_report_customer",
    "m2b_sequential_outlier_filter", "dedup_incremental_new_docs",
    "doc_source_cap", "sketch_cardinality_profile",
    "sketch_hll_mergeable_daily", "sketch_kll_price_quantiles",
    "asof_latest_event", "range_join_day_window", "doc_tfidf_top3",
    "f_parse_bundle", "f_html_clean",
    # round-6 rotated window
    "sim_pq_adc_topk", "sim_pq_recall_report", "sim_hard_negatives",
    "sim_quantized_topk", "doc_segment_dedup_rewrite",
    "doc_boilerplate_strip", "doc_span_corruption", "doc_bpe_merge_pairs",
    "doc_vocab_coverage", "doc_source_overlap_matrix",
    "doc_temperature_mix", "export_shard_manifest",
    "export_range_partition_stats", "io_bucketed_join_gate",
    "io_multiformat_scan", "sql_interface_q3", "incr_join_maintenance",
    "io_python_datasource_scan", "io_python_stream_scan",
    "dq_psi_drift_report", "evt_stream_psi_drift_now",
    "ml_group_linear_trend", "asof_next_event_tolerance",
    "ngram_containment_pairs", "fuzzy_part_name_pairs",
    "dedup_incremental_minhash", "doc_bpe_train_rounds",
    "doc_temperature_mix_tokens", "q2_min_cost_supplier",
    "q4_semi_join_priority", "q7_nation_trade_volume", "q8_market_share",
    "q9_nation_year_profit", "q10_returned_items",
    "q11_revenue_concentration", "q12_late_priority_mix",
    "q13_order_count_distribution", "q14_conditional_ratio",
    "q15_top_supplier", "q16_supplier_variety", "q17_small_qty_revenue",
    "q18_having_large_orders", "q19_bracketed_revenue",
    "q20_dominant_share_suppliers", "q21_sole_late_supplier",
    "q22_idle_wealthy_customers", "w2_running_totals", "w3_order_gaps",
    "w4_rank_family", "a9_rollup_sales",
    # round-7 rotated window
    "graph_pagerank_dup_nodes", "evt_markov_transition_matrix",
    "emb_pca_top_component", "doc_pmi_collocations",
    "ml_naive_bayes_lang_eval", "doc_trigram_backoff_logprob",
    "ml_group_ols_outliers", "doc_token_zipf_fit",
    "d8_iso_week_rollup", "evt_dau_wau_stickiness",
    "evt_change_point_hourly", "evt_cohort_retention",
    "evt_funnel_ordered_conversion", "evt_anomaly_mad",
    "evt_interpolate_linear_hourly", "evt_resample_ffill_hourly",
    "evt_error_burst_islands", "asof_nearest_event",
    "evt_stream_topk_now", "evt_stream_minmax_now",
    "doc_stream_incremental_minhash_now",
    "sample_balanced_class_downsample", "m10_minmax_scaler",
    "mm_wav_feature_oracle",
    "scd2_point_in_time", "io_version_history_report",
    "io_schema_evolution_scan", "dq_schema_profile_diff",
    "sim_ivf_cell_stats", "sim_knn_graph_degree_stats",
    "minhash_threshold_sweep", "doc_bpe_apply_merges",
    "doc_lang_confusion_matrix", "doc_quality_filter_funnel",
    "emb_norm_percentiles",
    "a8_fillna_defaults", "a10_pivot_status", "a11_grouping_sets",
    "a12_moving_avg_hourly", "a9b_cube_grouping_id",
    "d1_multiformat_roundtrip", "u2_intersect_except",
    "u3_except_all_priorities", "w5_value_range_frame",
    "w6_rank_distribution_family", "j4_null_safe_join",
    "j5_full_outer_reconcile", "n_nested_bundle", "m_unit_ratio_bundle",
    "q1_pricing_summary_tpch",
    # round-8 rotated window
    "scd2_asof_feature_join",
    "ml_chi_square_mktseg_priority", "ml_anova_price_by_segment",
    "ml_ab_conversion_ztest", "ml_corr_matrix_lineitem",
    "cust_revenue_gini", "evt_theil_sen_daily_trend",
    "basket_brand_pair_lift", "dq_outlier_iqr_fences",
    "lineitem_return_rate_wilson", "ml_bootstrap_mean_se",
    "evt_conversion_attribution", "evt_cusum_drift_per_user",
    "graph_triangle_count", "graph_local_clustering_topk",
    "graph_label_propagation_communities", "graph_neighbor_jaccard_topk",
    "graph_degree_assortativity", "graph_kcore_peel_rounds",
    "graph_rich_club",
    "doc_good_turing_counts", "doc_kneser_ney_bigram_logprob",
    "doc_heaps_law_fit", "doc_textrank_keywords",
    "doc_idf_weighted_jaccard_pairs", "doc_winnowing_fingerprint_overlap",
    "doc_dsir_importance_weights", "doc_dsir_topk_per_source",
    "doc_cluster_source_purity", "doc_ttr_hapax_by_lang",
    "doc_bigram_entropy_rate_by_lang", "doc_dedup_token_loss_by_source",
    "doc_source_perplexity_rank",
    "sim_ivf_recall_nprobe_sweep", "sim_mips_topk",
    "sim_range_search_count", "emb_quantization_error_report",
    "ml_knn_classifier_eval", "emb_class_margin_audit",
    "emb_centroid_separation_report", "sim_mmr_diverse_topk",
    "evt_survival_km_weekly", "orders_open_by_day_sweepline",
    "evt_session_path_trigrams", "evt_bounce_rate_daily",
    "evt_ewma_hourly",
    "dq_benford_first_digit", "dq_quantile_normalized_features",
    "cust_rfm_segmentation", "cust_nation_revenue_entropy",
    # round-9 rotated window
    "doc_bm25_topk", "doc_source_kl_divergence",
    "graph_hits_rounds", "dedup_minhash_pr_vs_exact",
    "sim_lsh_recall_vs_bits", "er_part_golden_records",
    "graph_link_prediction_cn_eval",
    "ml_nb_margin_calibration", "ml_lift_curve_deciles",
    "evt_markov_next_event_accuracy", "ml_permutation_test_ab",
    "ml_winsorized_segment_stats", "dq_fd_auto_histogram",
    "sketch_cms_user_counts", "evt_stream_cms_now",
    "sketch_bloom_fpr_report",
    "evt_brown_double_ewma_hourly", "evt_sliding_median_hourly",
    "lineitem_seasonality_index", "orders_new_vs_returning_revenue",
    "cust_cohort_ltv_curve", "part_skyline_by_brand",
    "cust_value_quartile_migration",
    "doc_source_near_dup_matrix", "minhash_jaccard_calibration",
    "doc_dedup_cluster_size_histogram", "doc_self_overlap_sample",
    "simhash_hamming_histogram", "doc_sentence_dedup_ratio",
    "doc_ngram_novelty_curve", "doc_token_burstiness",
    "emb_dim_variance_topk", "emb_cosine_histogram",
    "evt_user_activity_percentiles", "evt_dow_seasonal_profile",
    "evt_autocorr_lags", "evt_seasonal_decompose_weekly",
    "evt_gap_percentiles_by_type", "evt_peak_detection_hourly",
    "evt_funnel_time_to_convert", "evt_user_ltv_deciles",
    "evt_transition_entropy_by_src", "evt_hourly_dispersion_by_type",
    "export_token_budget_shards", "dq_profile_timeline_weekly",
    "io_partition_rows_skew_report", "supplier_pareto_report",
    "orders_priority_mix_shift", "lineitem_discount_effectiveness",
    "orders_fill_rate_sla",
    # round-10 window (rotated out at the seventh rotation, r11)
    # round-9 retrieval-eval family
    "doc_dirichlet_query_likelihood", "doc_ranker_rrf_fusion",
    "doc_ranker_kendall_tau", "doc_ranker_average_overlap",
    "doc_boolean_retrieval_and", "doc_retrieval_mrr_eval",
    # round-9 sketch / diversity family
    "sketch_cms_merge_equivalence", "doc_vocab_chao1_richness",
    "doc_token_simpson_diversity",
    # round-9 rank-statistics / inference family
    "ml_mann_whitney_u_quantity", "ml_spearman_qty_discount",
    "evt_runs_test_daily", "ml_kruskal_wallis_quantity",
    "ml_ks_two_sample_quantity", "evt_poisson_dispersion_daily",
    "ml_cohens_kappa_lang", "emb_silhouette_by_label",
    "ml_isotonic_urgent_rate", "ml_irls_huber_price_qty",
    "evt_page_hinkley_hourly", "ml_gini_split_ranking",
    # round-9 16th streaming run
    "evt_stream_kll_now",
    # pre-round-7 leftovers (the last never-sampled old guard)
    "doc_top_tokens", "doc_bpe_tokenize", "doc_token_doc_freq",
    "sketch_topk_priorities", "heavy_hitters_event_types",
    "n_array_sort_top3", "pipeline_docs_cleanse",
    "doc_len_quantile_band", "f_stable_bucket_histogram",
    "evt_funnel_counts", "ml_group_corr_segment",
    "dq_duplicate_key_audit", "cust_order_gap_stats",
    "w7_positional_window_bundle",
    # round-10 additions: effect sizes / ANOVA-on-medians / robust slope
    "ml_auc_price_urgent", "ml_cliffs_delta_quantity",
    "ml_cvm_two_sample_quantity", "ml_brown_forsythe_quantity",
    "ml_friedman_priority_month", "ml_theil_sen_qty_price",
    "ml_mcnemar_lang", "ml_cramers_v_pairs",
    # round-10 additions: concentration / resampling / divergence / monitors
    "orders_abc_classification", "supplier_hhi_by_nation",
    "doc_token_gini_concentration", "ml_jackknife_ratio_se",
    "doc_js_divergence_sources", "evt_mase_seasonal_naive",
    # round-11 window (sampled in CORRECTNESS_r11.json)
    "graph_personalized_pagerank", "graph_adamic_adar_link_pred", "graph_khop_reachability",
    "emb_cosine_components", "doc_boolean_retrieval_or_not", "doc_rake_keyword_scores",
    "doc_ranker_kendalls_w", "doc_lm_interpolation_grid", "doc_vocab_overlap_sources",
    "doc_stopword_density_by_lang", "doc_token_shape_profile", "doc_token_length_entropy",
    "doc_length_lognormal_moments", "dedup_capture_recapture", "emb_twonn_intrinsic_dim",
    "emb_farthest_point_seeds", "sim_hdbscan_core_edges", "evt_type_profile_similarity",
    "sketch_cms_inner_product", "sketch_hll_rsd_sweep", "sketch_kll_merge_agg_daily",
    "evt_stream_page_hinkley_now", "evt_stream_hll_now", "ml_fleiss_kappa_lang",
    "ml_weighted_kappa_quartiles", "ml_wilcoxon_signed_rank_monthly", "ml_tukey_pairwise_quantity",
    "ml_cohens_d_quantity", "ml_odds_ratio_2x2", "ml_pr_curve_price_urgent",
    "ml_quantile_irls_price_qty", "ml_block_bootstrap_se_daily", "dq_cochran_q_filters",
    "part_name_brand_mi", "cust_lorenz_deciles", "cust_balance_quintile_revenue",
    "orders_gini_by_segment", "orders_pareto_cut_point", "orders_aging_buckets",
    "part_brand_price_dispersion", "evt_mann_kendall_trend", "evt_theil_u_forecast",
    "evt_spc_individuals_chart", "evt_burstiness_index", "evt_peak_to_mean_ratio",
    "evt_weekend_weekday_lift", "evt_churn_by_first_week", "evt_session_duration_histogram",
    "evt_markov_stationary_power", "sql_interface_window",
    # round-12 rotated window
    "ml_bh_fdr_permutation", "ml_cuped_adjusted_effect",
    "ml_delta_method_ratio_se", "ml_james_stein_shrinkage",
    "evt_absorbing_chain_expected_steps", "graph_modularity_components",
    "evt_stl_decomposition_hourly", "evt_ljung_box_acf_pacf",
    "evt_seasonal_mann_kendall", "evt_grubbs_outlier_daily",
    "sketch_hll_set_operations", "evt_stream_kmeans_now",
    "sketch_kll_drift_gate", "sketch_bloom_join_prefilter",
    "doc_keyness_g2_by_source", "ml_info_gain_ratio_features",
    "doc_pii_density_by_source", "doc_readability_ari_by_source",
    "orders_simpsons_paradox_scan", "lineitem_price_elasticity_loglog",
    "cust_negative_binomial_orders_fit", "ml_cooks_distance_topk",
    "part_brand_size_chi2_residuals", "ml_sprt_conversion_monitor",
    "ml_g_test_brand_size", "ml_rank_biserial_quantity",
    "ml_welch_t_quantity", "ml_levene_brown_forsythe",
    "ml_jarque_bera_quantity", "ml_bartlett_variance_test",
    "ml_breusch_pagan_hetero", "ml_durbin_watson_daily",
    "ml_chow_structural_break", "evt_changepoint_single_split",
    "evt_ewma_control_chart", "evt_hampel_outliers_daily",
    "ml_logrank_test_segments", "evt_weibull_interevent_fit",
    "evt_stream_benford_now", "sketch_bloom_sizing_sweep",
    "sketch_kmv_distinct_estimate", "dedup_edit_distance_audit",
    "er_fellegi_sunter_scores", "ml_reliability_diagram_bands",
    "ml_brier_decomposition_bands", "ml_bca_bootstrap_components",
    "cust_theil_inequality_index", "emb_jl_distortion_audit",
    "doc_burrows_delta_sources", "evt_stream_moments_now",
    # round-13 rotated window
    "ml_cronbach_alpha_quality", "lineitem_did_discount_returns",
    "lineitem_weighted_median_price", "dedup_prefix_fingerprint_audit",
    "doc_yule_k_richness", "ml_hosmer_lemeshow_bands",
    "ml_two_proportion_ztest", "graph_avg_neighbor_degree_curve",
    "graph_preferential_attachment_pred", "ml_kendall_tau_b_daily",
    "ml_poisson_two_rate_test", "lineitem_quantity_mode_entropy",
    "doc_trigram_compressibility_proxy", "dq_props_json_profile",
    "evt_tod_entropy_by_type", "ml_anova_two_way_interaction",
    "ml_gtest_weekday_uniformity", "ml_sign_test_daily_orders",
    "ml_mood_median_test", "ml_cochran_armitage_trend",
    "ml_anderson_darling_quantity", "ml_watson_u2_quantity",
    "ml_wasserstein_quantity_flags", "ml_hellinger_bhattacharyya_flags",
    "ml_energy_distance_quantity", "evt_km_greenwood_bands",
    "evt_gumbel_block_maxima", "evt_gumbel_return_levels",
    "evt_mean_residual_life", "ml_gini_mean_difference",
    "evt_pages_trend_test", "evt_cusum_squares_variance",
    "evt_pettitt_changepoint", "evt_seasonal_theil_sen_slope",
    "evt_von_neumann_ratio", "ml_partial_tau_b_qdt",
    "ml_stuart_tau_c_qty_discount", "ml_brunner_munzel_quantity",
    "ml_ansari_bradley_dispersion", "ml_cucconi_location_scale",
    "cust_dissimilarity_index_segments", "ml_tschuprow_t_brand_size",
    "doc_good_turing_coverage_by_source", "evt_circular_stats_hourly",
    "ml_quartile_coef_dispersion", "ml_spearman_footrule_rankers",
    "evt_bartels_rank_test", "ml_quade_test",
    "ml_dagostino_skewness_z", "evt_spearman_lag1_autocorr",
    # round-14 rotated window
    "ml_phi_coefficient_2x2", "ml_goodman_kruskal_gamma",
    "ml_jonckheere_terpstra_trend", "ml_somers_d_qty_discount",
    "ml_scotts_pi_lang", "ml_krippendorff_alpha_lang",
    "ml_youden_j_price", "ml_matthews_corr_price_urgent",
    "ml_log_loss_price_urgent", "evt_variance_ratio_value",
    "evt_cox_stuart_daily", "orders_turning_points_daily",
    "evt_hurst_rs_daily", "orders_periodogram_weekly",
    "lineitem_price_index_laspeyres", "graph_resource_allocation_pred",
    "graph_jaccard_link_pred", "emb_ams_f2_sketch",
    "emb_simpson_diversity_labels", "doc_coleman_liau_by_source",
    "doc_flesch_kincaid_by_source", "doc_smog_by_source",
    "doc_brunet_sichel_by_lang", "doc_honore_r_by_lang",
    "doc_punctuation_profile_sources", "cust_atkinson_index",
    "cust_palma_hoover_index", "orders_clv_discounted",
    "ml_winsorized_trimmed_mean", "ml_mad_robust_outliers",
    "ml_f_test_two_variances", "ml_chisq_variance_test",
    "graph_degree_gini", "evt_markov_entropy_rate",
    "ml_vif_collinearity", "ml_partial_correlation_qdt",
    "ml_dixon_q_daily", "ml_cohens_h_segments",
    "ml_tost_equivalence", "ml_bowker_symmetry_lang",
    "doc_gunning_fog_by_source", "cust_zipf_rank_size_orders",
    "orders_priority_transition_matrix", "part_xyz_classification",
    "dq_benford_second_digit", "ml_ks_uniformity_dates",
    "evt_type_cooccurrence_lift", "part_brand_share_drift",
    "ml_pythagorean_means", "evt_peak_hour_mode",
    # round-15 rotated window (44 oracled + the one-time mm_* rows-only
    # evidence slots — see the _WINDOW_ROWS_ONLY note below)
    "evt_nelson_aalen_weekly", "emb_norm_shell_audit",
    "evt_hill_tail_index", "ml_total_variation_flags",
    "ml_kuiper_test_quantity", "evt_eta_squared_weekday",
    "ml_relative_risk_2x2", "ml_gwet_ac1_lang",
    "ml_hodges_lehmann_shift", "ml_qn_scale_quantity",
    "cust_lorenz_asymmetry", "cust_theil_l_mld",
    "evt_repeated_median_slope", "ml_mmd_rbf_quantity",
    "ml_gk_lambda_brand_size", "doc_pielou_evenness_by_lang",
    "evt_runs_up_down_daily", "cust_percentile_ratio_spread",
    "ml_freeman_theta_flag_quantity", "evt_moran_i_lag1",
    "cust_zenga_index", "ml_sarle_bimodality_quantity",
    "ml_dagostino_k2_omnibus", "ml_lepage_location_scale",
    "evt_kpss_level_stat", "cust_theil_decomposition_segments",
    "evt_sen_slope_ci", "ml_cmh_stratified_2x2",
    "ml_siegel_tukey_dispersion", "ml_conover_squared_ranks",
    "ml_fligner_policello_ustat", "ml_ad_two_sample_stat",
    "ml_watson_u2_two_sample", "ml_adjusted_rand_lang_source",
    "ml_fowlkes_mallows_lang_source", "ml_nmi_lang_source",
    "ml_v_measure_lang_source", "ml_purity_fmeasure_lang_source",
    "doc_ranker_ndcg_at_k", "doc_ranker_err_pow2",
    "doc_ranker_rbo_bm25_ql", "doc_ranker_map_at_20",
    "doc_ranker_rprec_sweep", "evt_lindley_virtual_wait",
    "mm_embed_dup_pairs", "mm_ppm_ahash_groups",
    "mm_png_ahash_groups", "mm_jpeg_ahash_groups",
    "mm_video_frame_dedup", "mm_gif_ahash_groups",
})

_DRIVER_WINDOW = [
    # r16 window (thirteenth rotation): the 50 OLDEST never-driver-
    # sampled ORACLED names (catalog order = registration age).
    # Rows-only entries are PERMANENTLY INELIGIBLE from r16 on
    # (VERDICT r15 item 3 / next-round #5): the r15 window carried the
    # six mm_* rows-only entries as a deliberate one-time exception so
    # the multimodal family gained driver evidence (CORRECTNESS_r15
    # records them as spark_rows + err='no_oracle' — rows returned, no
    # oracle to compare, by documented design), but those entries read
    # as failures in the driver's n_correct tally, so every future
    # window slot must be oracle-backed: the driver sample then always
    # hash-verifies 50/50.  205 oracled names remained pooled when this
    # rotation was cut.
    "evt_peak_concurrency_hours", "evt_busy_periods_by_type_day",
    "evt_pk_load_report_by_type", "evt_erlang_b_sweep",
    "evt_crps_empirical_window", "evt_pinball_quantile_window",
    "evt_winkler_interval_score", "evt_smape_bundle_seasonal",
    "evt_diebold_mariano_naive", "cust_kish_ess_revenue_weights",
    "ml_horvitz_thompson_total", "ml_neyman_allocation",
    "ml_poststratification_estimate", "ml_cluster_deff_icc",
    "basket_ptype_rule_measures", "ml_theil_u_brand_type",
    "ml_gk_tau_brand_type", "ml_mcc_macro_f1_lang",
    "ml_breslow_day_homogeneity", "evt_stream_interval_join_now",
    "evt_records_foster_stuart", "evt_max_drawdown_daily",
    "evt_longest_run_above_median", "evt_parkinson_volatility_daily",
    "doc_lexical_richness_by_lang", "doc_msttr_segmental_ttr",
    "cust_order_cohort_triangle", "lineitem_bullwhip_variance_ratio",
    "lineitem_fisher_index_decomposition", "graph_closeness_ecc_hubs",
    "emb_matryoshka_recall_sweep", "ml_iv_2sls_discount_qty",
    "ml_oaxaca_blinder_rn", "ml_deming_regression_dq",
    "evt_granger_clicks_to_purchases", "evt_cross_correlation_lags",
    "evt_transfer_entropy_binary", "ml_lin_ccc_seasonal_forecast",
    "evt_newey_west_variance", "ml_white_test_hetero",
    "ml_ramsey_reset_quadratic", "ml_sobel_mediation_dmq",
    "ml_box_cox_grid", "ml_hausman_iv_vs_ols",
    "ml_gamma_fit_order_totals", "ml_beta_fit_return_share",
    "lineitem_abc_xyz_matrix", "ml_dffits_topk",
    "ml_press_predicted_r2", "ml_partial_f_add_quadratic",
]

# Rows-only window exception: EMPTY from r16 on.  The six mm_* entries
# (no DuckDB oracle by documented decision — no codec surface in DuckDB
# to reproduce pixel decode / aHash) got their one-time driver rows-only
# evidence in the r15 window and now live in _PREVIOUSLY_SAMPLED; every
# window slot must be oracle-backed so CORRECTNESS_r* carries no
# 'no_oracle' rows (VERDICT r15 next-round #5).
_WINDOW_ROWS_ONLY = frozenset()


def _reorder_catalog() -> None:
    # ValueError (not assert) so the window invariants survive `python -O`,
    # matching the _assert_rank_mass convention — silently re-burning driver
    # evidence slots in optimized runs would be unrecoverable.
    if len(_DRIVER_WINDOW) != 50:
        raise ValueError(f"driver window must be exactly 50, got {len(_DRIVER_WINDOW)}")
    reburned = set(_DRIVER_WINDOW) & _PREVIOUSLY_SAMPLED
    if reburned:
        raise ValueError(f"window re-burns already-sampled slots: {sorted(reburned)}")
    if len(set(_DRIVER_WINDOW)) != len(_DRIVER_WINDOW):
        dupes = sorted({n for n in _DRIVER_WINDOW if _DRIVER_WINDOW.count(n) > 1})
        raise ValueError(f"window contains duplicate names: {dupes}")
    missing = [n for n in _DRIVER_WINDOW if n not in CATALOG]
    if missing:
        raise ValueError(f"window names not in CATALOG: {missing}")
    unoracled = [
        n
        for n in _DRIVER_WINDOW
        if CATALOG[n].oracle is None and n not in _WINDOW_ROWS_ONLY
    ]
    if unoracled:
        raise ValueError(f"window names without oracles: {unoracled}")
    misdeclared = [
        n for n in _WINDOW_ROWS_ONLY if n in CATALOG and CATALOG[n].oracle is not None
    ]
    if misdeclared:
        raise ValueError(
            f"rows-only window exception covers oracled names: {misdeclared}"
        )
    ordered = {n: CATALOG[n] for n in _DRIVER_WINDOW}
    for n, q in list(CATALOG.items()):
        if n not in ordered:
            ordered[n] = q
    CATALOG.clear()
    CATALOG.update(ordered)


_reorder_catalog()
