#!/usr/bin/env python
"""Scale probe: derive a 10x dataset from sf0.1 (into /tmp, the driver
testdata is read-only) and measure how the heaviest operators' wall
time grows. The derived corpus is deliberately duplicate-heavy (10
shards of the same documents with remapped ids; embeddings perturbed
per shard) — the hostile shape for pair-expanding dedup operators,
since every LSH bucket gets ~10x denser.

Usage: python tools_scale_probe.py  (prints one line per op with the
1x->10x wall ratio; anything near or below ~5 at 10x data means the
operator is scan/shuffle-bound, not pair-bound).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from real_estate_data_pipeline_spark.queries import CATALOG  # noqa: E402
from real_estate_data_pipeline_spark.session import get_session  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1x10"

HEAVY = [
    "minhash_dup_pairs",
    "simhash_dup_pairs",
    "decon_eval_overlap",
    "decon_reuse_query",
    "sim_knn_join",
    "q5_nation_revenue",
    "skew_salted_agg",
    # round-5 token-level rewrite/census family: all O(tokens) scans
    # with keyed shuffles — expect ~linear growth, never pair blow-up
    "doc_segment_dedup_rewrite",
    "doc_boilerplate_strip",
    "doc_span_corruption",
    "doc_source_overlap_matrix",
    "doc_bpe_merge_pairs",
    "sim_pq_adc_topk",
    # round-6: persisted-LSH incremental probe + iterative BPE training,
    # held-out trigram LM scoring, iterative PageRank over the dup graph
    "dedup_incremental_minhash",
    "doc_bpe_train_rounds",
    "doc_trigram_backoff_logprob",
    "graph_pagerank_dup_nodes",
    "emb_pca_top_component",
    "doc_pmi_collocations",
    # round-7: NB train/eval ((class, token) shuffles), DAU/WAU bounded
    # 7-day fan-out over a 10x-user event stream, triangle join on the
    # 10x-denser dup graph, winnowing char-gram windows, banded-LSH kNN
    # classification, TextRank rounds over the word graph
    "ml_naive_bayes_lang_eval",
    "evt_dau_wau_stickiness",
    "graph_triangle_count",
    "doc_winnowing_fingerprint_overlap",
    "ml_knn_classifier_eval",
    "doc_textrank_keywords",
    # round-7 wave 3: DSIR weighting (token-keyed log-ratio joins over a
    # 10x token stream), per-lang bigram entropy (type-table products),
    # basket pair lift (order-key self-join — baskets bound the pair
    # space), and 3-round k-core peeling on the 10x-denser dup graph
    "doc_dsir_importance_weights",
    "doc_bigram_entropy_rate_by_lang",
    "basket_brand_pair_lift",
    "graph_kcore_peel_rounds",
    # CUSUM identity: two stacked windows over 10x users, one shuffle
    "evt_cusum_drift_per_user",
    # round-8: source-pair KL (token-keyed count map x pair grid — the
    # token shuffle is the only corpus-sized stage), 2 HITS rounds on
    # the 10x-denser dup graph, the MinHash PR scorecard (band + block
    # candidate joins, exact Jaccard only inside the universe), BM25
    # (one tokenize pass, term-filtered tf shuffle)
    "doc_source_kl_divergence",
    "graph_hits_rounds",
    "dedup_minhash_pr_vs_exact",
    "doc_bm25_topk",
    # round-8 wave 5-7: link prediction (pair x degree CN joins on the
    # 10x-denser dup graph), NB margin calibration (the shared NB chain
    # at 10x docs), sliding median (one partitioned window at 10x
    # events). er_part_golden_records is deliberately NOT probed: part
    # is the one dim this harness holds fixed (remapping part ids would
    # change the fuzzy-blocking behavior itself), so a "10x" ratio for
    # it would be a no-op measurement, not evidence.
    "graph_link_prediction_cn_eval",
    "ml_nb_margin_calibration",
    "evt_sliding_median_hourly",
    # round-9: orders now shards 10x in the derived corpus (aligned to
    # the lineitem stride so the o_orderkey join stays consistent),
    # which makes the orders-volume dimension probeable — including the
    # two r8 stragglers the verdict flagged (quartile migration: two
    # per-customer NTILEs + a full outer; permutation test: 32 relabel
    # passes) and the r8 CMS/Brown entries (fixed-width sketch aggregate
    # should be ~flat; two stacked hourly windows ~linear)
    "evt_brown_double_ewma_hourly",
    "sketch_cms_user_counts",
    "cust_value_quartile_migration",
    "ml_permutation_test_ab",
    # round-9 newcomers: QL (|docs| x 3 score frame), RRF (both scorer
    # chains end-to-end), Huber IRLS (3 passes over 10x lineitem),
    # isotonic (decile agg over 10x orders), the rank statistics
    # (value-domain histograms at 10x rows), runs test (daily agg),
    # CMS merge (3 sketch builds off one scan), and the two
    # vocabulary-richness rollups over the 10x duplicate-heavy corpus
    "doc_dirichlet_query_likelihood",
    "doc_ranker_rrf_fusion",
    "ml_irls_huber_price_qty",
    "ml_isotonic_urgent_rate",
    "ml_mann_whitney_u_quantity",
    "ml_spearman_qty_discount",
    "evt_runs_test_daily",
    "sketch_cms_merge_equivalence",
    "doc_vocab_chao1_richness",
    "doc_token_simpson_diversity",
    # round-9 wave 2: the 10x run of ml_kruskal_wallis caught a REAL
    # at-scale bug (n^3 - n overflowed BIGINT at 6M rows), after which
    # the whole rank-stat family moved its cubic terms/sums to exact
    # HUGEINT/decimal(38,0) accumulation with one double cast — keep
    # probing these so the fix stays proven
    "ml_kruskal_wallis_quantity",
    "ml_ks_two_sample_quantity",
    "evt_poisson_dispersion_daily",
    "ml_cohens_kappa_lang",
    "emb_silhouette_by_label",
    # round-9 wave 3: Page-Hinkley (three windows over one partitioned
    # sort — ~flat) and Gini split ranking (one melt + low-cardinality
    # count shuffle — ~flat)
    "evt_page_hinkley_hourly",
    "ml_gini_split_ranking",
    # round-10 wave 1: effect sizes / ANOVA-on-medians / robust slope —
    # all value-domain-histogram or single-agg shapes, expect ~flat to
    # ~linear (the melt/cells shapes shuffle on low-cardinality keys)
    "ml_auc_price_urgent",
    "ml_cliffs_delta_quantity",
    "ml_cvm_two_sample_quantity",
    "ml_brown_forsythe_quantity",
    "ml_friedman_priority_month",
    "ml_theil_sen_qty_price",
    "ml_mcnemar_lang",
    "ml_cramers_v_pairs",
    # round-10 waves 2-4: concentration/resampling/divergence, graph
    # scoring, stationary power iteration, quantile IRLS, monitors
    "orders_abc_classification",
    "supplier_hhi_by_nation",
    "doc_token_gini_concentration",
    "ml_jackknife_ratio_se",
    "ml_block_bootstrap_se_daily",
    "doc_js_divergence_sources",
    "graph_adamic_adar_link_pred",
    "graph_personalized_pagerank",
    "evt_markov_stationary_power",
    "emb_farthest_point_seeds",
    "sketch_hll_rsd_sweep",
    "ml_quantile_irls_price_qty",
    "evt_mase_seasonal_naive",
    "evt_spc_individuals_chart",
    "cust_lorenz_deciles",
    "doc_boolean_retrieval_or_not",
    "doc_rake_keyword_scores",
    # round-10 waves 5-8: density/concordance/agreement, LM mixture
    # grid, TwoNN, components, CMS inner product, monitors
    "sim_hdbscan_core_edges",
    "doc_ranker_kendalls_w",
    "ml_odds_ratio_2x2",
    "sketch_kll_merge_agg_daily",
    "evt_mann_kendall_trend",
    "dedup_capture_recapture",
    "evt_burstiness_index",
    "orders_aging_buckets",
    "ml_wilcoxon_signed_rank_monthly",
    "doc_length_lognormal_moments",
    "part_name_brand_mi",
    "doc_lm_interpolation_grid",
    "emb_twonn_intrinsic_dim",
    "emb_cosine_components",
    "sketch_cms_inner_product",
    "ml_weighted_kappa_quartiles",
    "dq_cochran_q_filters",
    "evt_theil_u_forecast",
    "doc_token_length_entropy",
    # round-10 wave 9: multi-rater agreement, vocab overlap, PR curve,
    # profile similarity, churn cohorts, SQL-surface window
    "ml_fleiss_kappa_lang",
    "doc_vocab_overlap_sources",
    "ml_pr_curve_price_urgent",
    "evt_type_profile_similarity",
    "evt_churn_by_first_week",
    "sql_interface_window",
    # round-10 wave 10: BFS over the LSH dup graph (the pair-expanding
    # shape the probe exists for), Pareto cut, Tukey contrasts,
    # quintile lift, session durations
    "graph_khop_reachability",
    "orders_pareto_cut_point",
    "ml_tukey_pairwise_quantity",
    "cust_balance_quintile_revenue",
    "evt_session_duration_histogram",
    # round-10 wave 11: fast exact wins (single-aggregate shapes)
    "ml_cohens_d_quantity",
    "orders_gini_by_segment",
    "evt_peak_to_mean_ratio",
    "doc_stopword_density_by_lang",
    "part_brand_price_dispersion",
    "doc_token_shape_profile",
    "evt_weekend_weekday_lift",
    # round-11 wave 1: experimentation tier (probed ad-hoc in r11,
    # now pinned here) + the duplicate-heavy CC-class modularity
    "ml_bh_fdr_permutation",
    "ml_cuped_adjusted_effect",
    "ml_delta_method_ratio_se",
    "ml_james_stein_shrinkage",
    "evt_absorbing_chain_expected_steps",
    "graph_modularity_components",
    # round-11 waves 2-5 (unprobed in r11 — closing the gap): hour/day-
    # bucket time-series diagnostics (expect ~flat), sketch composition,
    # curation analytics (token-shuffle-bound), econometrics single-pass
    # moment aggregates. Streaming runs are excluded from HEAVY by
    # convention (the probe materializes batch plans; stream gates poll
    # their own sinks).
    "evt_stl_decomposition_hourly",
    "evt_ljung_box_acf_pacf",
    "evt_seasonal_mann_kendall",
    "evt_grubbs_outlier_daily",
    "sketch_hll_set_operations",
    "sketch_kll_drift_gate",
    "sketch_bloom_join_prefilter",
    "doc_keyness_g2_by_source",
    "ml_info_gain_ratio_features",
    "doc_pii_density_by_source",
    "doc_readability_ari_by_source",
    "orders_simpsons_paradox_scan",
    "lineitem_price_elasticity_loglog",
    "cust_negative_binomial_orders_fit",
    "ml_cooks_distance_topk",
    "part_brand_size_chi2_residuals",
    "ml_sprt_conversion_monitor",
    # round-12 wave 1: classical-test twins (histogram/moment shapes)
    "ml_g_test_brand_size",
    "ml_rank_biserial_quantity",
    "ml_welch_t_quantity",
    "ml_levene_brown_forsythe",
    "ml_jarque_bera_quantity",
    "ml_bartlett_variance_test",
    # round-12 wave 2: regression diagnostics on the shared order line
    "ml_breusch_pagan_hetero",
    "ml_durbin_watson_daily",
    "ml_chow_structural_break",
    "evt_changepoint_single_split",
    "ml_cronbach_alpha_quality",
    "lineitem_did_discount_returns",
    # round-12 wave 3: monitoring / survival
    "evt_ewma_control_chart",
    "evt_hampel_outliers_daily",
    "ml_logrank_test_segments",
    "evt_weibull_interevent_fit",
    "lineitem_weighted_median_price",
    # round-12 wave 4: sketch sizing / dedup / ER
    "sketch_bloom_sizing_sweep",
    "sketch_kmv_distinct_estimate",
    "dedup_edit_distance_audit",
    "dedup_prefix_fingerprint_audit",
    "er_fellegi_sunter_scores",
    "doc_yule_k_richness",
    # round-12 wave 5: calibration / inequality
    "ml_reliability_diagram_bands",
    "ml_brier_decomposition_bands",
    "ml_hosmer_lemeshow_bands",
    "ml_bca_bootstrap_components",
    "cust_theil_inequality_index",
    "ml_two_proportion_ztest",
    # round-12 wave 6: graph curves, JL audit, rank/rate stats
    "graph_avg_neighbor_degree_curve",
    "graph_preferential_attachment_pred",
    "emb_jl_distortion_audit",
    "ml_kendall_tau_b_daily",
    "ml_poisson_two_rate_test",
    "lineitem_quantity_mode_entropy",
    # round-12 wave 7: stylometry / DQ / factorial ANOVA
    "doc_burrows_delta_sources",
    "doc_trigram_compressibility_proxy",
    "dq_props_json_profile",
    "evt_tod_entropy_by_type",
    "ml_anova_two_way_interaction",
    "ml_gtest_weekday_uniformity",
    # round-12 waves 8-13 (the additions-first block before the ninth
    # rotation): classical association/trend tests (histogram / bounded
    # cell-grid shapes), agreement + classifier eval (shared NB / band
    # machinery), time-series diagnostics (calendar-day frames), the
    # link-pred protocol family (LSH pair machinery — the duplicate-
    # heavy class), vocabulary-richness / readability scans (token
    # shuffles), inequality / robust-stats (per-customer frames and
    # value histograms)
    "ml_sign_test_daily_orders",
    "ml_mood_median_test",
    "ml_cochran_armitage_trend",
    "ml_phi_coefficient_2x2",
    "ml_goodman_kruskal_gamma",
    "ml_jonckheere_terpstra_trend",
    "ml_somers_d_qty_discount",
    "ml_scotts_pi_lang",
    "ml_krippendorff_alpha_lang",
    "ml_youden_j_price",
    "ml_matthews_corr_price_urgent",
    "ml_log_loss_price_urgent",
    "evt_variance_ratio_value",
    "evt_cox_stuart_daily",
    "orders_turning_points_daily",
    "evt_hurst_rs_daily",
    "orders_periodogram_weekly",
    "lineitem_price_index_laspeyres",
    "graph_resource_allocation_pred",
    "graph_jaccard_link_pred",
    "emb_ams_f2_sketch",
    "emb_simpson_diversity_labels",
    "doc_coleman_liau_by_source",
    "doc_flesch_kincaid_by_source",
    "doc_smog_by_source",
    "doc_brunet_sichel_by_lang",
    "doc_honore_r_by_lang",
    "doc_punctuation_profile_sources",
    "cust_atkinson_index",
    "cust_palma_hoover_index",
    "orders_clv_discounted",
    "ml_winsorized_trimmed_mean",
    "ml_mad_robust_outliers",
    # round-12 wave 14 (closing): moment F/chi2 twins, degree Gini
    # (rides the LSH pair machinery — the duplicate-heavy class),
    # Markov entropy rate (bounded transition frame)
    "ml_f_test_two_variances",
    "ml_chisq_variance_test",
    "graph_degree_gini",
    "evt_markov_entropy_rate",
    # round-12 wave 15 (collinearity panel + extreme diagnostics):
    # single-aggregate moment shapes and the bounded day histogram
    "ml_vif_collinearity",
    "ml_partial_correlation_qdt",
    "ml_dixon_q_daily",
    "ml_cohens_h_segments",
    # round-12 wave 16: equivalence/symmetry/readability/rank-size —
    # moment aggregates, the shared NB verdict frame, and one
    # per-customer rank window
    "ml_tost_equivalence",
    "ml_bowker_symmetry_lang",
    "doc_gunning_fog_by_source",
    "cust_zipf_rank_size_orders",
    # round-12 wave 17: transition matrix (user-partitioned lag), XYZ
    # (per-part monthly moment rollup), Benford second digit
    "orders_priority_transition_matrix",
    "part_xyz_classification",
    "dq_benford_second_digit",
    # round-12 wave 18: KS date uniformity (day frame), type
    # co-occurrence lift (user-keyed pair join), brand share drift
    "ml_ks_uniformity_dates",
    "evt_type_cooccurrence_lift",
    "part_brand_share_drift",
    # round-12 wave 19: Pythagorean means (histogram), peak-hour mode
    "ml_pythagorean_means",
    "evt_peak_hour_mode",
    # round-12 wave 20: survival hazard (shared life table), norm
    # concentration (one fold per vector), Hill tail index (TakeOrdered)
    "evt_nelson_aalen_weekly",
    "emb_norm_shell_audit",
    "evt_hill_tail_index",
    # round-13 wave 1: GOF / distribution-distance family — everything
    # reduces to the 50-value quantity histogram (probes 1.0-1.2x)
    "ml_anderson_darling_quantity",
    "ml_watson_u2_quantity",
    "ml_wasserstein_quantity_flags",
    "ml_hellinger_bhattacharyya_flags",
    "ml_energy_distance_quantity",
    # round-13 wave 2: survival bands / extremes — life-table and
    # calendar-bounded frames (probes 1.1-1.4x)
    "evt_km_greenwood_bands",
    "evt_gumbel_block_maxima",
    "evt_gumbel_return_levels",
    "evt_mean_residual_life",
    "ml_gini_mean_difference",
    # round-13 wave 3: trend / changepoint — all on the shared
    # calendar-day frame (probes 1.1-1.5x)
    "evt_pages_trend_test",
    "evt_cusum_squares_variance",
    "evt_pettitt_changepoint",
    "evt_seasonal_theil_sen_slope",
    "evt_von_neumann_ratio",
    # round-13 wave 4: rank tests from value-domain histograms
    # (probes 1.0-1.2x; partial tau-b carries three bounded grids)
    "ml_partial_tau_b_qdt",
    "ml_stuart_tau_c_qty_discount",
    "ml_brunner_munzel_quantity",
    "ml_ansari_bradley_dispersion",
    "ml_cucconi_location_scale",
    # round-13 wave 5: categorical/diversity. cust_dissimilarity_index_
    # segments and ml_tschuprow_t_brand_size are deliberately NOT
    # probed: customer and part are the dims this harness holds fixed
    # (as er_part_golden_records), so a "10x" ratio for them would be a
    # no-op measurement, not evidence.
    "doc_good_turing_coverage_by_source",
    "evt_circular_stats_hourly",
    "ml_quartile_coef_dispersion",
    # round-13 wave 6: ranker distances / daily-series rank tests /
    # exact-moment skewness (probes 1.0-1.3x)
    "ml_spearman_footrule_rankers",
    "evt_bartels_rank_test",
    "ml_quade_test",
    "ml_dagostino_skewness_z",
    "evt_spearman_lag1_autocorr",
    # round-13 wave 7: TV/Kuiper/eta^2/RR/AC1 (probes 1.3-2.3x; the
    # 2.3x on relative-risk is the exact-median pass over 10x orders,
    # the same documented percentile class as ml_odds_ratio_2x2)
    "ml_total_variation_flags",
    "ml_kuiper_test_quantity",
    "evt_eta_squared_weekday",
    "ml_relative_risk_2x2",
    "ml_gwet_ac1_lang",
    # round-13 wave 8: robust estimators off difference histograms /
    # per-customer frames (probes 1.0-1.4x)
    "ml_hodges_lehmann_shift",
    "ml_qn_scale_quantity",
    "cust_lorenz_asymmetry",
    "cust_theil_l_mld",
    "evt_repeated_median_slope",
    # round-13 wave 9: MMD / evenness / runs / spread. ml_gk_lambda_
    # brand_size rides the fixed part dim (not probeable, as
    # er_part_golden_records) but is pinned for regression anyway since
    # its frame is 1250 cells at any scale.
    "ml_mmd_rbf_quantity",
    "doc_pielou_evenness_by_lang",
    "evt_runs_up_down_daily",
    "cust_percentile_ratio_spread",
    # round-13 wave 10: theta/Moran/Zenga/shape (probes 1.1-1.2x)
    "ml_freeman_theta_flag_quantity",
    "evt_moran_i_lag1",
    "cust_zenga_index",
    "ml_sarle_bimodality_quantity",
    "ml_dagostino_k2_omnibus",
    # round-13 wave 11: Lepage/KPSS/Theil-decomp/Sen-CI/CMH (probes
    # 1.0-1.9x; the 1.9x is the exact-median class on 10x orders).
    # The Lepage 10x probe caught a REAL overflow: sum c*rc2^2
    # exceeded BIGINT at 6M rows -> kept in decimal(38,0)/HUGEINT.
    "ml_lepage_location_scale",
    "evt_kpss_level_stat",
    "cust_theil_decomposition_segments",
    "evt_sen_slope_ci",
    "ml_cmh_stratified_2x2",
    # round-14 wave 1: two-sample rank tests off the 50-value histogram
    # (probed 1.0-1.1x — pure scan-bound)
    "ml_siegel_tukey_dispersion",
    "ml_conover_squared_ranks",
    "ml_fligner_policello_ustat",
    "ml_ad_two_sample_stat",
    "ml_watson_u2_two_sample",
    # round-14 wave 2: partition agreement over the lang x source
    # contingency (probed 1.0-1.1x)
    "ml_adjusted_rand_lang_source",
    "ml_fowlkes_mallows_lang_source",
    "ml_nmi_lang_source",
    "ml_v_measure_lang_source",
    "ml_purity_fmeasure_lang_source",
    # round-14 wave 3: ranker-eval metrics over the shared retrieval
    # chains (probed 1.3-1.6x — the tokenize scan dominates)
    "doc_ranker_ndcg_at_k",
    "doc_ranker_err_pow2",
    "doc_ranker_rbo_bm25_ql",
    "doc_ranker_map_at_20",
    "doc_ranker_rprec_sweep",
    # round-14 wave 4: queueing/operational family (probed 1.4-1.7x —
    # event-scan bound; partitioned windows only)
    "evt_lindley_virtual_wait",
    "evt_peak_concurrency_hours",
    "evt_busy_periods_by_type_day",
    "evt_pk_load_report_by_type",
    "evt_erlang_b_sweep",
    # round-14 wave 5: forecast scores over the daily aggregate
    # (probed 1.2-1.5x — the daily groupBy dominates)
    "evt_crps_empirical_window",
    "evt_pinball_quantile_window",
    "evt_winkler_interval_score",
    "evt_smape_bundle_seasonal",
    "evt_diebold_mariano_naive",
    # round-14 wave 6: survey sampling/estimation over orders
    # (probed 1.0-1.8x — orders-scan bound; sha2 sample filters)
    "cust_kish_ess_revenue_weights",
    "ml_horvitz_thompson_total",
    "ml_neyman_allocation",
    "ml_poststratification_estimate",
    "ml_cluster_deff_icc",
    # round-14 wave 7: association/rule measures (probed 0.9-2.2x —
    # the basket pair join is order-bounded, 2.2x on 10x-dense baskets)
    "basket_ptype_rule_measures",
    "ml_theil_u_brand_type",
    "ml_gk_tau_brand_type",
    "ml_mcc_macro_f1_lang",
    "ml_breslow_day_homogeneity",
    # round-14 wave 8: streaming interval join (1.0x — state-bounded
    # join, startup-dominated) + daily-series statistics (1.1-1.6x)
    "evt_stream_interval_join_now",
    "evt_records_foster_stuart",
    "evt_max_drawdown_daily",
    "evt_longest_run_above_median",
    "evt_parkinson_volatility_daily",
    # round-14 wave 9: richness/BI (probed 1.0-2.1x — the 2.1x is the
    # per-doc posexplode on the 10x duplicate-heavy corpus)
    "doc_lexical_richness_by_lang",
    "doc_msttr_segmental_ttr",
    "cust_order_cohort_triangle",
    "lineitem_bullwhip_variance_ratio",
    "lineitem_fisher_index_decomposition",
    # round-14 wave 10: hub BFS on the 10x-denser dup graph (3.2x —
    # frontier growth tracks density, far below the pair blow-up),
    # prefix-cosine sweep (1.1x) and cleared-moment estimators
    "graph_closeness_ecc_hubs",
    "emb_matryoshka_recall_sweep",
    "ml_iv_2sls_discount_qty",
    "ml_oaxaca_blinder_rn",
    "ml_deming_regression_dq",
    # round-14 wave 11 (post-rotation): bivariate daily analytics
    # (probed 1.1-1.6x — events-scan bound)
    "evt_granger_clicks_to_purchases",
    "evt_cross_correlation_lags",
    "evt_transfer_entropy_binary",
    "ml_lin_ccc_seasonal_forecast",
    "evt_newey_west_variance",
    # round-14 wave 12 (post-rotation): regression diagnostics II
    # (probed 1.3-2.2x — the White/RESET pair rides the shared
    # correlated-subquery residual frame)
    "ml_white_test_hetero",
    "ml_ramsey_reset_quadratic",
    "ml_sobel_mediation_dmq",
    "ml_box_cox_grid",
    "ml_hausman_iv_vs_ols",
    # round-14 wave 13 (post-rotation): fits + LOO influence
    # (probed 1.3-2.2x — orders/lineitem scan bound)
    "ml_gamma_fit_order_totals",
    "ml_beta_fit_return_share",
    "lineitem_abc_xyz_matrix",
    "ml_dffits_topk",
    "ml_press_predicted_r2",
    # r15 wave 1 (model selection, probed 1.1-2.1x)
    "ml_partial_f_add_quadratic",
    "ml_mallows_cp_models",
    "ml_aic_bic_order_models",
    "ml_std_betas_quadratic",
    "ml_bonferroni_outlier_max_t",
    # r15 wave 2 (streaming pipeline + stateful sessionizer; 0.8x /
    # 3.2x — the scd2 pipeline is dominated by its fixed write cycles,
    # the sessionizer rides the deliberately denser per-user event
    # streams of the derived corpus)
    "pipe_stream_silver_scd2_now",
    "evt_stream_stateful_sessions_now",
    # r15 wave 3 (operations analytics, probed 1.2-2.1x)
    "orders_newsvendor_levels",
    "evt_little_law_audit",
    "evt_tracking_signal_seasonal",
    "orders_process_capability_daily",
    "evt_nelson_rules_scan",
    # r15 wave 4 (categorical association II, probed 0.7-2.2x)
    "ml_yule_q_y_2x2",
    "ml_contingency_coef_brand_size",
    "ml_stuart_maxwell_marginal",
    "ml_woolf_or_homogeneity",
    "ml_lambda_symmetric_brand_size",
    # r15 wave 5 (ecology diversity, probed 1.0-1.5x)
    "doc_vocab_ace_richness",
    "doc_miller_madow_entropy_sources",
    "doc_hill_numbers_sources",
    "doc_morisita_horn_sources",
    "doc_bray_curtis_sources",
    # r15 wave 6 (classifier eval II, probed 1.0-2.0x)
    "ml_partial_auc_price_urgent",
    "ml_ks_separation_price_urgent",
    "ml_fbeta_threshold_sweep",
    "ml_spiegelhalter_z_calibration",
    "ml_brier_skill_score",
    # r15 wave 7 (cluster validity + Hopkins, probed 1.0-2.2x)
    "emb_davies_bouldin_labels",
    "emb_calinski_harabasz_labels",
    "emb_dunn_centroid_index",
    "emb_hopkins_clusterability",
    # r15 wave 8 (time-series econometrics II, probed 1.0-1.3x)
    "evt_pacf_durbin_levinson",
    "evt_yule_walker_ar2",
    "ml_breusch_godfrey_lag1",
    "ml_goldfeld_quandt_daily",
    "ml_cochrane_orcutt_onestep",
    # r15 wave 9 (BI concentration + fits, probed 1.1-2.0x)
    "part_bcg_growth_share_matrix",
    "lineitem_rosenbluth_hti",
    "cust_concentration_index_discount",
    "ml_gpd_mom_excesses",
    "ml_ztp_fit_order_items",
    # r15 wave 10 (text II + forecast decomposition, probed 1.2-2.0x)
    "doc_lix_rix_by_source",
    "doc_flesch_reading_ease_by_source",
    "doc_char_entropy_by_source",
    "ml_theil_u_decomposition",
    "evt_spectral_entropy_daily",
    # r15 wave 11 (graph centralities II, probed 3.0-3.9x on the
    # deliberately 10x-denser dup graph — per-round edge joins are
    # linear in the densified edge set; harmonic/path stats are
    # seed-bounded to the top-20 hubs, the q77 multi-seed BFS shape)
    "graph_katz_centrality_rounds",
    "graph_eigenvector_power_rounds",
    "graph_harmonic_centrality_bounded",
    "graph_bounded_path_stats",
    "graph_degree_heterogeneity",
    # r15 wave 12 (robust estimators II, probed 0.8-1.3x)
    "ml_sn_scale_quantity",
    "ml_biweight_midvariance_quantity",
    "ml_trimean_midhinge_quantity",
    "ml_gastwirth_estimator_quantity",
    "ml_shorth_lms_quantity",
    # r15 wave 13 (mixed frontier, probed 1.0-1.4x)
    "lineitem_kakwani_discount_progressivity",
    "lineitem_suits_index_discount",
    "ml_fisher_z_corr_ci",
    "sql_interface_grouping_sets",
    "evt_pot_cluster_count",
    # r15 wave 14 (reliability / recurrent events, probed 1.3-1.8x)
    "evt_mean_cumulative_function_daily",
    "evt_ttt_transform_deciles",
    "evt_discrete_hazard_days",
    "evt_duane_growth_daily",
    "evt_inspection_paradox_census",
    # r15 wave 15 (post-close): competing risks + epidemiology
    "evt_cif_competing_hours",
    "evt_person_time_rates",
    "ml_mantel_haenszel_or",
    "ml_gehan_wilcoxon_segments",
    "cust_urgent_rate_direct_std",
    # r15 wave 16 (post-close): actuarial + index numbers II
    "orders_chain_ladder_factors",
    "orders_chain_ladder_ultimates",
    "lineitem_tornqvist_index",
    "lineitem_walsh_me_indexes",
    "cust_theil_inequality_decomp",
    # r15 wave 17 (post-close): multi-scale point-process statistics
    "evt_allan_variance_hours",
    "evt_fano_factor_scales",
    "evt_ripley_k_minutes",
    "evt_thinning_invariance_cv2",
    "evt_permutation_entropy_hours",
    # r15 wave 18 (post-close): ranking + social choice
    "lineitem_bradley_terry_brands",
    "lineitem_borda_condorcet_brands",
    "orders_kendall_w_years",
    "orders_footrule_yearly_rankings",
    "cust_shapley_channel_attribution",
    # r15 wave 19 (post-close): dependence + copula measures
    "ml_empirical_copula_grid",
    "ml_tail_dependence_customer",
    "ml_blomqvist_beta_customer",
    "ml_hoeffding_d_daily",
    "ml_chatterjee_xi_daily",
    # r15 wave 20 (post-close): robust + quantile regression lines
    "ml_lad_regression_daily",
    "ml_quantile_regression_daily_q75",
    "ml_lms_regression_daily",
    "ml_lta_regression_daily",
    "ml_siegel_repeated_medians_daily",
    # r15 wave 21 (post-close): queueing II + survey estimation
    "evt_kingman_vut_by_type",
    "evt_erlang_c_staffing",
    "evt_mgc_wait_approx",
    "evt_workload_hourly_offered",
    "cust_ratio_greg_estimators",
    # r15 wave 22 (post-close): causal inference + serial estimation
    "ml_diff_in_diff_segments",
    "ml_its_segmented_daily",
    "ml_rdd_sharp_median_price",
    "ml_propensity_strat_ate",
    "cust_german_tank_estimate",
    # r15 wave 23 (post-close): financial risk analytics
    "orders_var_cvar_daily",
    "orders_sharpe_sortino_daily",
    "orders_ulcer_martin_daily",
    "orders_omega_kappa_daily",
    "orders_kelly_growth_daily",
    # r15 wave 24 (post-close): extreme-value tail diagnostics
    "evt_hill_estimator_gaps",
    "evt_pickands_dedh_estimators",
    "evt_mean_excess_thresholds",
    "evt_max_to_sum_ratios",
    "evt_hill_plot_stability",
    # r15 wave 25 (post-close): SQL-interface gate II + embedding geometry
    "sql_interface_lateral_explode",
    "sql_interface_range_interval_window",
    "sql_interface_unpivot",
    "emb_participation_ratio_dim",
    "emb_anisotropy_dot_stats",
    # r15 wave 26 (post-close): higher-order Markov diagnostics
    "evt_markov_memory_g2",
    "evt_markov_ck_check",
    "evt_markov_stationarity_halves",
    "evt_markov_reversibility",
    "evt_sequence_holdout_perplexity",
    # r15 wave 27 (post-close): compositional data analysis
    "orders_clr_total_variance_priority",
    "orders_aitchison_distance_years",
    "orders_variation_matrix_priority",
    "orders_comp_center_distances",
    "orders_alr_trend_priority",
    # r15 wave 28 (post-close): monitoring + anomaly III
    "cust_hbos_outlier_scores",
    "orders_seasonal_strength_weekday",
    "orders_cochran_hartley_variance",
    "evt_sample_entropy_hourly",
    "orders_calendar_edge_effects",
    # r15 wave 29 (post-close): ML-engineering machinery
    "ml_kfold_cv_order_model",
    "ml_learning_curve_order_model",
    "ml_drop_column_importance",
    "ml_target_encoding_loo",
    "ml_feature_drift_ks_banded",
    # r15 wave 30 (post-close): panel + agreement + audit sampling
    "cust_panel_fixed_effects",
    "ml_bland_altman_token_methods",
    "ml_delong_auc_variance",
    "orders_pps_poisson_estimate",
    "evt_rosner_esd_outliers",
    # r15 wave 31 (post-close): final mixed frontier
    "doc_juilland_d_dispersion",
    "evt_entropy_production_rate",
    "evt_effective_sample_size_daily",
    "ml_cohen_d_effect_sizes",
    "orders_month_uniformity_chi2",
    # r15 wave 32 (post-close): count laws + calendar structure
    "cust_lotka_law_fit",
    "evt_taylor_power_law",
    "lineitem_price_ending_digits",
    "cust_interpurchase_regularity",
    "evt_weekday_hour_independence",
]


def _stride(con, table: str, id_col: str) -> int:
    """Shard stride = MAX(id)+1 of the source table, so shard id ranges
    can never collide regardless of the source sf (hardcoded strides
    silently corrupted the duplicate-heavy corpus once ids outgrew
    them)."""
    (mx,) = con.execute(
        f"SELECT MAX({id_col}) FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()
    return int(mx) + 1


# Version sentinel: round 9 changed the derivation (orders now shards
# 10x with the lineitem-aligned stride). A pre-round-9 /tmp/sf1x10 has
# orders.parquet too (a verbatim 1x copy), so an existence check on the
# files alone would silently reuse a referentially BROKEN corpus
# (10x lineitem shards joined to 1x orders). The marker names the
# derivation version; bump it whenever build_derived changes shape.
_DERIVED_MARK = "_derived_v2_orders_sharded"
# same discipline for the 30x docs corpus: its own version marker, so a
# change to build_derived_docs30 can never silently reuse a stale corpus
_DERIVED30_MARK = "_derived_v1_docs30"


def build_derived() -> None:
    import shutil

    shutil.rmtree(DST, ignore_errors=True)  # never mix derivation versions
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    doc_stride = _stride(con, "documents", "doc_id")
    vec_stride = _stride(con, "embeddings", "vec_id")
    ord_stride = _stride(con, "lineitem", "l_orderkey")
    con.execute(f"""
    COPY (
      SELECT doc_id + s * {doc_stride} AS doc_id, text, lang, source, n_chars
      FROM read_parquet('{SRC}/documents.parquet'),
           (SELECT unnest(range(10)) AS s)
    ) TO '{DST}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)
    """)
    con.execute(f"""
    COPY (
      SELECT vec_id + s * {vec_stride} AS vec_id,
             list_transform(embedding, x -> CAST(x + s * 0.001 AS FLOAT)) AS embedding,
             label
      FROM read_parquet('{SRC}/embeddings.parquet'),
           (SELECT unnest(range(10)) AS s)
    ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)
    """)
    con.execute(f"""
    COPY (
      SELECT * REPLACE (l_orderkey + s * {ord_stride} AS l_orderkey)
      FROM read_parquet('{SRC}/lineitem.parquet'),
           (SELECT unnest(range(10)) AS s)
    ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 500000)
    """)
    # events scale 10x by remapping BOTH ids: 10x users on the same
    # timeline — the per-user window/fan-out ops (DAU/WAU, sessions)
    # then carry 10x state, which is the dimension that matters
    ev_stride = _stride(con, "events", "event_id")
    usr_stride = _stride(con, "events", "user_id")
    con.execute(f"""
    COPY (
      SELECT event_id + s * {ev_stride} AS event_id, ts,
             user_id + s * {usr_stride} AS user_id, event_type, value, props
      FROM read_parquet('{SRC}/events.parquet'),
           (SELECT unnest(range(10)) AS s)
    ) TO '{DST}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)
    """)
    # orders shards with the SAME stride as lineitem (their key domains
    # coincide), so shard s of lineitem joins shard s of orders and the
    # o_orderkey relation stays referentially intact; custkeys are kept
    # as-is (10x orders per customer — the orders-volume dimension).
    con.execute(f"""
    COPY (
      SELECT * REPLACE (o_orderkey + s * {ord_stride} AS o_orderkey)
      FROM read_parquet('{SRC}/orders.parquet'),
           (SELECT unnest(range(10)) AS s)
    ) TO '{DST}/orders.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)
    """)
    for tbl in ("customer", "nation", "region", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) "
            f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )


def _decon_reuse_query(spark, sf_dir):
    """The REPEAT cost of decontamination with a precomputed gram index:
    the index build (amortized across eval sets in production) happens
    untimed in main(); this measures only the prefiltered overlap query.
    NOTE the 1x->10x ratio of this entry tracks EVAL volume (both sides
    of the split scale together in the derived corpus) — the linear
    lower bound. The train-side amortization itself is isolated by
    decon_amortization(), which holds the eval set fixed while train
    grows 10x."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.ops.sampling import hash_uniform01
    from real_estate_data_pipeline_spark.queries import t

    d = t(spark, sf_dir, "documents")
    ev = d.filter(hash_uniform01(F.col("doc_id"), "decon") >= 0.8)
    grams = spark.read.parquet(f"/tmp/redp_gram_index{sf_dir.replace('/', '_')}")
    return dedup.contamination_report(
        None, ev, "doc_id", "text", 3, train_grams=grams, prefilter_mod=1 << 22
    )


def decon_amortization(spark) -> None:
    """Fixed 1x eval slice vs a 10x training corpus: full recompute
    (shingle + distinct the 10x train every run) vs the precomputed
    gram index (read back from parquet). The delta is exactly the cost
    train_gram_set amortizes across eval sets at production scale."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.ops.sampling import hash_uniform01
    from real_estate_data_pipeline_spark.queries import t

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # same train slice the prebuilt index covers (the u<0.8 split)
    train10 = t(spark, DST, "documents").filter(
        hash_uniform01(F.col("doc_id"), "decon") < 0.8
    )
    ev1 = t(spark, SRC, "documents").filter(
        hash_uniform01(F.col("doc_id"), "decon") >= 0.8
    )
    grams10 = spark.read.parquet(f"/tmp/redp_gram_index{DST.replace('/', '_')}")
    # warm both paths once, then time
    for _ in range(1):
        mat(dedup.contamination_report(train10, ev1, "doc_id", "text", 3))
        mat(dedup.contamination_report(
            None, ev1, "doc_id", "text", 3, train_grams=grams10,
            prefilter_mod=1 << 22,
        ))
    t0 = time.perf_counter()
    mat(dedup.contamination_report(train10, ev1, "doc_id", "text", 3))
    rebuild = time.perf_counter() - t0
    t0 = time.perf_counter()
    mat(dedup.contamination_report(
        None, ev1, "doc_id", "text", 3, train_grams=grams10, prefilter_mod=1 << 22
    ))
    reuse = time.perf_counter() - t0
    print(
        f"decon fixed-eval, 10x train: rebuild={rebuild:6.2f}s "
        f"reuse={reuse:6.2f}s amortized={rebuild / max(reuse, 1e-9):4.1f}x"
    )


DST30 = "/tmp/sf1x30docs"


def build_derived_docs30() -> None:
    """30x documents-only derivation for the amortization probe: the
    round-8 verdict flagged the 10x measurement as inside run noise
    (~2 s deltas), so the corpus grows until the rebuild-vs-reuse gap
    can't be noise."""
    import shutil

    shutil.rmtree(DST30, ignore_errors=True)  # never mix derivation versions
    os.makedirs(DST30, exist_ok=True)
    con = duckdb.connect()
    doc_stride = _stride(con, "documents", "doc_id")
    con.execute(f"""
    COPY (
      SELECT doc_id + s * {doc_stride} AS doc_id, text, lang, source, n_chars
      FROM read_parquet('{SRC}/documents.parquet'),
           (SELECT unnest(range(30)) AS s)
    ) TO '{DST30}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 100000)
    """)


def minhash_amortization(spark, corpus_dir: str, label: str) -> None:
    """Fixed 1x ingest batch vs a {label} corpus LSH index: full
    recompute (shingle + minhash the whole corpus on every ingest) vs
    the PERSISTED band-bucket index read back from parquet
    (ops/dedup.minhash_band_buckets — the production fast xxhash64
    family). The delta is the cost the persisted index amortizes across
    ingest batches: at 100 TB the corpus side is never re-shingled.
    Median of 3 timed runs per path (the round-8 verdict's requirement:
    a single ~2 s measurement cannot support the claim)."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.ops.sampling import hash_uniform01
    from real_estate_data_pipeline_spark.queries import t

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    corpus = (
        t(spark, corpus_dir, "documents")
        .filter(hash_uniform01(F.col("doc_id"), "incrmh") < 0.7)
        .select("doc_id", "text")
    )
    new1 = (
        t(spark, SRC, "documents")
        .filter(hash_uniform01(F.col("doc_id"), "incrmh") >= 0.7)
        .select("doc_id", "text")
    )
    idx = spark.read.parquet(f"/tmp/redp_mh_index{corpus_dir.replace('/', '_')}")

    def _rebuild():
        mat(dedup.incremental_minhash_dup_pairs(
            dedup.minhash_band_buckets(corpus, "doc_id", "text"),
            new1, "doc_id", "text",
        ))

    def _reuse():
        mat(dedup.incremental_minhash_dup_pairs(idx, new1, "doc_id", "text"))

    _rebuild()  # warm both paths once, then take the median of 3
    _reuse()
    rebuilds, reuses = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        _rebuild()
        rebuilds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _reuse()
        reuses.append(time.perf_counter() - t0)
    rebuild = sorted(rebuilds)[1]
    reuse = sorted(reuses)[1]
    print(
        f"minhash fixed-batch, {label} corpus: rebuild={rebuild:6.2f}s "
        f"reuse={reuse:6.2f}s amortized={rebuild / max(reuse, 1e-9):4.1f}x "
        f"(medians of {[round(x, 2) for x in rebuilds]} / "
        f"{[round(x, 2) for x in reuses]})"
    )


def _prebuild_mh_index(spark, sf_dir) -> None:
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.ops.sampling import hash_uniform01
    from real_estate_data_pipeline_spark.queries import t

    corpus = (
        t(spark, sf_dir, "documents")
        .filter(hash_uniform01(F.col("doc_id"), "incrmh") < 0.7)
        .select("doc_id", "text")
    )
    dedup.minhash_band_buckets(corpus, "doc_id", "text").write.mode(
        "overwrite"
    ).parquet(f"/tmp/redp_mh_index{sf_dir.replace('/', '_')}")


def _prebuild_gram_index(spark, sf_dir) -> None:
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops import dedup
    from real_estate_data_pipeline_spark.ops.sampling import hash_uniform01
    from real_estate_data_pipeline_spark.queries import t

    d = t(spark, sf_dir, "documents")
    train = d.filter(hash_uniform01(F.col("doc_id"), "decon") < 0.8)
    dedup.train_gram_set(train, "text", 3).write.mode("overwrite").parquet(
        f"/tmp/redp_gram_index{sf_dir.replace('/', '_')}"
    )


def _fn(name):
    return _decon_reuse_query if name == "decon_reuse_query" else CATALOG[name].fn


def main() -> None:
    if not os.path.exists(f"{DST}/{_DERIVED_MARK}"):
        build_derived()
        with open(f"{DST}/{_DERIVED_MARK}", "w") as fh:
            fh.write("orders sharded 10x, lineitem-aligned o_orderkey stride\n")
    if not os.path.exists(f"{DST30}/{_DERIVED30_MARK}"):
        build_derived_docs30()
        with open(f"{DST30}/{_DERIVED30_MARK}", "w") as fh:
            fh.write("documents sharded 30x, doc_id stride\n")
    spark = get_session("scale-probe")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for d in ("/root/testdata/sf0.01", SRC, DST):
        _prebuild_gram_index(spark, d)
    _prebuild_mh_index(spark, DST)
    _prebuild_mh_index(spark, DST30)
    for n in HEAVY:  # warm codegen at the small sf
        mat(_fn(n)(spark, "/root/testdata/sf0.01"))
    res: dict[str, dict[str, float]] = {}
    for sf, label in ((SRC, "1x"), (DST, "10x")):
        for n in HEAVY:
            t0 = time.perf_counter()
            mat(_fn(n)(spark, sf))
            res.setdefault(n, {})[label] = time.perf_counter() - t0
    for n, v in res.items():
        print(
            f"{n:22s} 1x={v['1x']:6.2f}s 10x={v['10x']:7.2f}s "
            f"ratio={v['10x'] / v['1x']:5.1f}"
        )
    decon_amortization(spark)
    minhash_amortization(spark, DST, "10x")
    minhash_amortization(spark, DST30, "30x")


if __name__ == "__main__":
    main()
