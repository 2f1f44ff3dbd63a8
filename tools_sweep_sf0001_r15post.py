#!/usr/bin/env python
"""Degenerate-scale sweep for the round-15 POST-CLOSE waves (15-21):
run every post-close oracled newcomer through the FULL parity compare
(rows + dtype kinds + exact values) at sf0.001, where tiny groups /
empty coalitions / odd-count medians surface what sf0.01 misses."""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.session import get_session
from test_oracle_parity import TABLES, assert_dtype_kinds, assert_frames_exact

R15_POST = [
    # w15 (competing risks + epidemiology)
    "evt_cif_competing_hours", "evt_person_time_rates",
    "ml_mantel_haenszel_or", "ml_gehan_wilcoxon_segments",
    "cust_urgent_rate_direct_std",
    # w16 (actuarial + index numbers II)
    "orders_chain_ladder_factors", "orders_chain_ladder_ultimates",
    "lineitem_tornqvist_index", "lineitem_walsh_me_indexes",
    "cust_theil_inequality_decomp",
    # w17 (point-process multi-scale)
    "evt_allan_variance_hours", "evt_fano_factor_scales",
    "evt_ripley_k_minutes", "evt_thinning_invariance_cv2",
    "evt_permutation_entropy_hours",
    # w18 (ranking + social choice)
    "lineitem_bradley_terry_brands", "lineitem_borda_condorcet_brands",
    "orders_kendall_w_years", "orders_footrule_yearly_rankings",
    "cust_shapley_channel_attribution",
    # w19 (dependence + copulas)
    "ml_empirical_copula_grid", "ml_tail_dependence_customer",
    "ml_blomqvist_beta_customer", "ml_hoeffding_d_daily",
    "ml_chatterjee_xi_daily",
    # w20 (robust + quantile lines)
    "ml_lad_regression_daily", "ml_quantile_regression_daily_q75",
    "ml_lms_regression_daily", "ml_lta_regression_daily",
    "ml_siegel_repeated_medians_daily",
    # w21 (queueing II + survey)
    "evt_kingman_vut_by_type", "evt_erlang_c_staffing",
    "evt_mgc_wait_approx", "evt_workload_hourly_offered",
    "cust_ratio_greg_estimators",
    # w22 (causal inference + serial estimation)
    "ml_diff_in_diff_segments", "ml_its_segmented_daily",
    "ml_rdd_sharp_median_price", "ml_propensity_strat_ate",
    "cust_german_tank_estimate",
    # w23 (financial risk)
    "orders_var_cvar_daily", "orders_sharpe_sortino_daily",
    "orders_ulcer_martin_daily", "orders_omega_kappa_daily",
    "orders_kelly_growth_daily",
    # w24 (extreme-value tails)
    "evt_hill_estimator_gaps", "evt_pickands_dedh_estimators",
    "evt_mean_excess_thresholds", "evt_max_to_sum_ratios",
    "evt_hill_plot_stability",
    # w25 (SQL-interface II + embedding geometry)
    "sql_interface_lateral_explode", "sql_interface_range_interval_window",
    "sql_interface_unpivot", "emb_participation_ratio_dim",
    "emb_anisotropy_dot_stats",
    # w26 (higher-order Markov)
    "evt_markov_memory_g2", "evt_markov_ck_check",
    "evt_markov_stationarity_halves", "evt_markov_reversibility",
    "evt_sequence_holdout_perplexity",
    # w27 (compositional / Aitchison)
    "orders_clr_total_variance_priority", "orders_aitchison_distance_years",
    "orders_variation_matrix_priority", "orders_comp_center_distances",
    "orders_alr_trend_priority",
    # w28 (monitoring + anomaly III)
    "cust_hbos_outlier_scores", "orders_seasonal_strength_weekday",
    "orders_cochran_hartley_variance", "evt_sample_entropy_hourly",
    "orders_calendar_edge_effects",
    # w29 (ML engineering)
    "ml_kfold_cv_order_model", "ml_learning_curve_order_model",
    "ml_drop_column_importance", "ml_target_encoding_loo",
    "ml_feature_drift_ks_banded",
    # w30 (panel + agreement + audit)
    "cust_panel_fixed_effects", "ml_bland_altman_token_methods",
    "ml_delong_auc_variance", "orders_pps_poisson_estimate",
    "evt_rosner_esd_outliers",
    # w31 (final mixed frontier)
    "doc_juilland_d_dispersion", "evt_entropy_production_rate",
    "evt_effective_sample_size_daily", "ml_cohen_d_effect_sizes",
    "orders_month_uniformity_chi2",
    # w32 (count laws + calendar structure)
    "cust_lotka_law_fit", "evt_taylor_power_law",
    "lineitem_price_ending_digits", "cust_interpurchase_regularity",
    "evt_weekday_hour_independence",
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("sweep-sf0001-post")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf}/{tbl}.parquet')"
        )
    failed = []
    for name in R15_POST:
        try:
            spdf = CATALOG[name].fn(spark, sf).toPandas()
            dddf = con.execute(CATALOG[name].oracle).df()
            assert_dtype_kinds(name, spdf, dddf)
            assert_frames_exact(name, spdf, dddf)
            print(f"{name:40s} OK ({len(spdf)} rows)")
        except Exception as e:
            failed.append(name)
            print(f"{name:40s} FAIL {str(e)[:160]}")
    print(f"\n{len(R15_POST) - len(failed)}/{len(R15_POST)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
