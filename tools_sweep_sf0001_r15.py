#!/usr/bin/env python
"""Closing-ritual degenerate-scale sweep (round 15): run the round's
new oracled queries through the FULL parity compare (rows + dtype
kinds + exact values) at sf0.001, where tiny groups / empty segments
/ odd-count medians surface what sf0.01 misses."""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.session import get_session
from test_oracle_parity import TABLES, assert_dtype_kinds, assert_frames_exact

R15_NEW = [
    # w1 (pre-rotation)
    "ml_partial_f_add_quadratic", "ml_mallows_cp_models",
    "ml_aic_bic_order_models", "ml_std_betas_quadratic",
    "ml_bonferroni_outlier_max_t",
    # w2 (streaming)
    "pipe_stream_silver_scd2_now", "evt_stream_stateful_sessions_now",
    # w3
    "orders_newsvendor_levels", "evt_little_law_audit",
    "evt_tracking_signal_seasonal", "orders_process_capability_daily",
    "evt_nelson_rules_scan",
    # w4
    "ml_yule_q_y_2x2", "ml_contingency_coef_brand_size",
    "ml_stuart_maxwell_marginal", "ml_woolf_or_homogeneity",
    "ml_lambda_symmetric_brand_size",
    # w5
    "doc_vocab_ace_richness", "doc_miller_madow_entropy_sources",
    "doc_hill_numbers_sources", "doc_morisita_horn_sources",
    "doc_bray_curtis_sources",
    # w6
    "ml_partial_auc_price_urgent", "ml_ks_separation_price_urgent",
    "ml_fbeta_threshold_sweep", "ml_spiegelhalter_z_calibration",
    "ml_brier_skill_score",
    # w7
    "emb_davies_bouldin_labels", "emb_calinski_harabasz_labels",
    "emb_dunn_centroid_index", "emb_hopkins_clusterability",
    # w8
    "evt_pacf_durbin_levinson", "evt_yule_walker_ar2",
    "ml_breusch_godfrey_lag1", "ml_goldfeld_quandt_daily",
    "ml_cochrane_orcutt_onestep",
    # w9
    "part_bcg_growth_share_matrix", "lineitem_rosenbluth_hti",
    "cust_concentration_index_discount", "ml_gpd_mom_excesses",
    "ml_ztp_fit_order_items",
    # w10
    "doc_lix_rix_by_source", "doc_flesch_reading_ease_by_source",
    "doc_char_entropy_by_source", "ml_theil_u_decomposition",
    "evt_spectral_entropy_daily",
    # w11
    "graph_katz_centrality_rounds", "graph_eigenvector_power_rounds",
    "graph_harmonic_centrality_bounded", "graph_bounded_path_stats",
    "graph_degree_heterogeneity",
    # w12
    "ml_sn_scale_quantity", "ml_biweight_midvariance_quantity",
    "ml_trimean_midhinge_quantity", "ml_gastwirth_estimator_quantity",
    "ml_shorth_lms_quantity",
    # w13
    "lineitem_kakwani_discount_progressivity", "lineitem_suits_index_discount",
    "ml_fisher_z_corr_ci", "sql_interface_grouping_sets",
    "evt_pot_cluster_count",
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
    for name in R15_NEW:
        try:
            spdf = CATALOG[name].fn(spark, sf).toPandas()
            dddf = con.execute(CATALOG[name].oracle).df()
            assert_dtype_kinds(name, spdf, dddf)
            assert_frames_exact(name, spdf, dddf)
            print(f"{name:40s} OK ({len(spdf)} rows)")
        except Exception as e:
            failed.append(name)
            print(f"{name:40s} FAIL {str(e)[:160]}")
    print(f"\n{len(R15_NEW) - len(failed)}/{len(R15_NEW)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
