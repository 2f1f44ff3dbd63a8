#!/usr/bin/env python
"""Closing-ritual degenerate-scale sweep: run the round's new oracled
queries through the FULL parity compare (rows + dtype kinds + exact
values) at sf0.001, where tiny groups / empty segments / single-record
edges surface that sf0.01 misses."""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.session import get_session
from test_oracle_parity import TABLES, assert_dtype_kinds, assert_frames_exact

R14_NEW = [
    # w1
    "ml_siegel_tukey_dispersion", "ml_conover_squared_ranks",
    "ml_fligner_policello_ustat", "ml_ad_two_sample_stat",
    "ml_watson_u2_two_sample",
    # w2
    "ml_adjusted_rand_lang_source", "ml_fowlkes_mallows_lang_source",
    "ml_nmi_lang_source", "ml_v_measure_lang_source",
    "ml_purity_fmeasure_lang_source",
    # w3
    "doc_ranker_ndcg_at_k", "doc_ranker_err_pow2", "doc_ranker_rbo_bm25_ql",
    "doc_ranker_map_at_20", "doc_ranker_rprec_sweep",
    # w4
    "evt_lindley_virtual_wait", "evt_peak_concurrency_hours",
    "evt_busy_periods_by_type_day", "evt_pk_load_report_by_type",
    "evt_erlang_b_sweep",
    # w5
    "evt_crps_empirical_window", "evt_pinball_quantile_window",
    "evt_winkler_interval_score", "evt_smape_bundle_seasonal",
    "evt_diebold_mariano_naive",
    # w6
    "cust_kish_ess_revenue_weights", "ml_horvitz_thompson_total",
    "ml_neyman_allocation", "ml_poststratification_estimate",
    "ml_cluster_deff_icc",
    # w7
    "basket_ptype_rule_measures", "ml_theil_u_brand_type",
    "ml_gk_tau_brand_type", "ml_mcc_macro_f1_lang",
    "ml_breslow_day_homogeneity",
    # w8
    "evt_stream_interval_join_now", "evt_records_foster_stuart",
    "evt_max_drawdown_daily", "evt_longest_run_above_median",
    "evt_parkinson_volatility_daily",
    # w9
    "doc_lexical_richness_by_lang", "doc_msttr_segmental_ttr",
    "cust_order_cohort_triangle", "lineitem_bullwhip_variance_ratio",
    "lineitem_fisher_index_decomposition",
    # w10
    "graph_closeness_ecc_hubs", "emb_matryoshka_recall_sweep",
    "ml_iv_2sls_discount_qty", "ml_oaxaca_blinder_rn",
    "ml_deming_regression_dq",
    # w11 (post-rotation)
    "evt_granger_clicks_to_purchases", "evt_cross_correlation_lags",
    "evt_transfer_entropy_binary", "ml_lin_ccc_seasonal_forecast",
    "evt_newey_west_variance",
    # w12 (post-rotation)
    "ml_white_test_hetero", "ml_ramsey_reset_quadratic",
    "ml_sobel_mediation_dmq", "ml_box_cox_grid", "ml_hausman_iv_vs_ols",
    # w13 (post-rotation)
    "ml_gamma_fit_order_totals", "ml_beta_fit_return_share",
    "lineitem_abc_xyz_matrix", "ml_dffits_topk", "ml_press_predicted_r2",
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("sweep-sf0001")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf}/{tbl}.parquet')"
        )
    failed = []
    for name in R14_NEW:
        try:
            spdf = CATALOG[name].fn(spark, sf).toPandas()
            dddf = con.execute(CATALOG[name].oracle).df()
            assert_dtype_kinds(name, spdf, dddf)
            assert_frames_exact(name, spdf, dddf)
            print(f"{name:40s} OK ({len(spdf)} rows)")
        except Exception as e:
            failed.append(name)
            print(f"{name:40s} FAIL {str(e)[:160]}")
    print(f"\n{len(R14_NEW) - len(failed)}/{len(R14_NEW)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
