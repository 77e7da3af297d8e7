"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line with per-query seconds.

Each query is materialized with a count-style action that still evaluates
every output column (``df.foreach`` would skip codegen paths; we collect the
row count after a full evaluation via ``_force``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anomaly_detection_in_time_series_data_spark.session import get_spark
from anomaly_detection_in_time_series_data_spark import queries as q

HEADLINE = [
    "flagship_anomaly_zscore",
    "flagship_anomaly_zscore_chunked",
    "agg_pricing_summary",
    "join_star_revenue",
    "region_supplier_volume",
    "shipping_priority_top10",
    "window_rank_orders",
    "window_running_sum",
    "asof_join_last_order",
    "nation_volume_shipping",
    "supplier_cnt_by_type",
    "large_volume_customers",
    "promo_revenue",
    "session_windows_user",
    "tumbling_event_stats",
    "topk_orders",
    "dedup_exact_groups",
    "text_term_frequency",
    "similarity_topk",
    "minhash_lsh_pairs",
    "market_share_asia",
    "sole_latest_supplier",
    "returned_item_revenue",
    "customer_order_distribution",
    "latest_event_per_user",
    "sliding_event_stats",
    "mad_robust_anomaly",
    "cusum_drift_scaled",
    "char_ngram_profile",
    "binned_range_join_events",
    # round-2 additions
    "forecast_revenue_change",
    "important_part_value",
    "eval_contamination_ngrams",
    "sequence_pack_assignments",
    "doc_segment_containment",
    "semantic_dedup_keep",
    # round-3 additions
    "iqr_outlier_anomaly",
    "histogram_rarity_anomaly",
    "data_quality_report",
    "event_funnel_counts",
    "cohort_retention_counts",
    "changepoint_mean_shift",
    "twap_daily",
    "blocked_name_linkage",
    "heavy_hitter_bigrams",
    "rollup_cascade_daily",
    "holt_forecast_anomaly",
    "cep_click_click_purchase",
    "weekly_shape_discords",
    "cms_event_type_counts",
    "rrf_hybrid_retrieval",
    "length_bucket_padding_stats",
    "incremental_dedup_report",
    "unigram_logprob_quality",
    "hampel_filter_anomaly",
    "near_dup_pagerank",
    # round-4 additions (the three round-3 headliners the round-3 bench
    # missed; VERDICT r3 item 8)
    "global_shape_discords",
    "streaming_rollup_cascade",
    "near_dup_bfs_hops",
    # round-4 new operators
    "quantized_ann_topk",
    "bpe_merge_candidates",
    "vocab_coverage_by_source",
    "source_shingle_overlap",
    "minhash_estimate_error",
    "scd2_event_type_history",
    "psi_value_drift",
    "ks_value_drift",
    "streaming_psi_drift",
    "pit_dimension_join",
    "kmeans_micro_lloyd",
    "anomaly_ensemble_votes",
    "event_rate_changepoint",
    "bm25_retrieval",
    "bloom_prejoin_fpr",
    "weighted_median_price",
    "theil_sen_trend",
    "mann_whitney_drift",
    "lead_lag_correlation",
    "session_running_value",
    # round-5 additions
    "ivf_ann_topk",
    "bigram_pmi_collocations",
    "grid_density_clusters",
    "leakage_safe_folds",
    "stl_lite_decomposition",
    "weekly_shape_motifs",
    "mase_forecast_eval",
    "skyline_parts_pareto",
    "interval_union_coverage",
    "fuzzy_name_linkage",
    "bitmap_segment_overlap",
    "inverted_posting_lists",
    "linear_interp_gap_fill",
    "prefix_filter_jaccard_join",
    "streaming_bitmap_distinct",
    "rolling_wau_bitmap",
    # round-6 additions: the streaming capability wave + the two MLlib-seam
    # graduations (micro-Lloyd kmeans / hard-EM gmm)
    "streaming_minhash_candidates",
    "streaming_scd2_upsert",
    "streaming_closed_sessions",
    "streaming_interval_join_pairs",
    "streaming_chained_windows",
    "kmeans_anomaly_scores",
    "gmm_anomaly_scores",
    # round-6 additions: the late-round backlog wave (SPC / concentration /
    # burstiness / records / ANN recall audit / layout / privacy / drift)
    "spc_control_chart_rules",
    "herfindahl_daily_concentration",
    "fano_burstiness_hourly",
    "record_breaking_days",
    "ann_graph_link_prediction",
    "zone_map_skipping_audit",
    "t_closeness_audit",
    "wasserstein_value_drift",
    "incremental_join_maintenance",
    "report_restatement_audit",
    "column_stats_drift",
    "ltv_cohort_curve",
    "knn_kdistance_outliers",
    # round-7 additions: theta-NN graph analytics, integer eigen-methods,
    # CDC algebra closure, exact Shapley, Kadane burst windows
    "reciprocal_best_match_pairs",
    "clustering_coefficient_local",
    "lpa_communities_modularity",
    "hits_micro",
    "pca_top_component_micro",
    "cdc_apply_changeset",
    "shapley_attribution_components",
    "best_burst_window",
    "dataset_card_stats",
    "streaming_streak_maintenance",
    "copurchase_brand_pairs",
    "business_days_to_ship",
    "median_polish_micro",
    # round 8 additions
    "event_sequence_pattern_match",
    "bom_explosion_rollup",
    "ams_f2_sketch_estimate",
    "isotonic_calibration_pav",
    "kcenter_coreset_micro",
    "ols_leverage_influence",
    "woe_iv_binning",
    "point_in_polygon_counts",
    "fiscal_445_calendar_rollup",
    "functional_dependency_audit",
    "inclusion_dependency_audit",
    "lttb_downsample_lite",
    "table_fingerprint_checksum",
    "venn3_source_overlap",
    "schema_evolution_union_audit",
    "dfa_conformance_audit",
    "borda_rank_aggregation",
    "percentile_cont_exact_rationals",
    "rolling_ols_slope",
    "streaming_fingerprint_maintenance",
    "packing_loss_mask_spans",
    # round 9 additions
    "chi_square_independence_components",
    "anova_oneway_components",
    "lorenz_gini_deciles",
    "twap_event_value",
    "roc_auc_exact",
    "cumulative_gains_deciles",
    "crossval_fold_audit",
    "poisson_bootstrap_means",
    "unpivot_stack_metrics",
    "table_diff_audit",
    "k_anonymity_class_histogram",
    "range_frame_hourly_sum",
    "autocorr_lag_profile",
    "streaming_hll_maintenance",
    "multimodal_image_features",
    "multimodal_av_features",
    "seasonal_naive_backtest",
    "zipf_rank_frequency",
    "null_safe_join_counts",
    "id_continuity_audit",
    "rounding_drift_audit",
    "l_diversity_histogram",
    "last_touch_attribution",
    "kaplan_meier_components",
    "boxplot_components",
    "declared_fk_orphan_audit",
    "session_duration_log2_histogram",
    "median_imputation_audit",
    "record_breaking_events",
    "seasonal_difference_variance",
    "quadratic_trend_components",
    "pinball_loss_quantile_eval",
    "rfm_segmentation_counts",
    "goodman_kruskal_gamma_ordinal",
    "mcnemar_detector_pairs",
    "retrieval_precision_at_k",
    "class_weight_allocation",
    "epoch_shuffle_balance_audit",
    "tokenizer_fertility_stats",
    "streaming_cms_maintenance",
    "cross_modal_brightness_text",
    "kruskal_wallis_value_ranks",
    "friedman_type_rank_blocks",
    "cochran_q_detectors",
    "somers_d_priority_band",
    "brown_forsythe_components",
    "jonckheere_ordered_trend",
    "wilcoxon_signed_rank_pairs",
    "unseen_bigram_mass_estimates",
    "streaming_mg_topk_maintenance",
    "multimodal_motion_energy",
    "distributed_keyed_rank",
]


def _force(df) -> None:
    """Evaluate every column of every row. A bare count() would let
    Catalyst prune the output projections we want to measure; the noop
    writer evaluates the full plan without driver-side transfer."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("adts-bench")
    # Warm the JVM/codegen once so per-query numbers measure the plan.
    spark.range(1_000).selectExpr("sum(id)").collect()
    # Host-speed calibration: a fixed data-independent CPU+shuffle probe,
    # reported as calib_sec so cross-round comparisons can normalize for
    # noisy-neighbor / throttling variance of the host VM (observed >1.4x
    # wall swings on identical code between round-3 and round-4 runs).
    spark.range(20_000_000).selectExpr("sum(id * 2 + 1)").collect()  # JIT
    t0 = time.time()
    (
        spark.range(20_000_000)
        .selectExpr("id % 97 AS k", "id * 2 + 1 AS v")
        .groupBy("k")
        .sum("v")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    calib = round(time.time() - t0, 3)
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = q.QUERIES[name]
        # Warmup run (JIT/codegen compile), then the measured run — standard
        # steady-state benchmarking; plans/shuffles still execute fully both
        # times (noop sink, no result caching).
        _force(fn(spark, sf_dir))
        t0 = time.time()
        df = fn(spark, sf_dir)
        _force(df)
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
    summary = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "calib_sec": calib,
        # Host-speed-normalized total (VERDICT r4 item 7): divide
        # by the calibration probe so round-over-round deltas are
        # separable from noisy-neighbor variance of the host VM.
        "value_per_calib": round(total / calib, 3) if calib else None,
        "n_queries": len(timings),
        "sf": sf,
    }
    # The driver captures only a ~2.2 KB TAIL of stdout (BENCH_r4/r5
    # "parsed" came back null because the single full-map line overflowed
    # it, truncating mid-line).  Emit the full per-query map on its own
    # line FIRST (for logs / the committed bench artifacts), then a
    # guaranteed-small final line: summary + the slowest 20 queries.  The
    # full map is also written next to this script as bench_full.json so
    # the judge can diff every query regardless of capture limits.
    full = dict(summary, queries=timings)
    print(json.dumps(full))
    # Round-stamped archive (VERDICT r7 task 5): bench_full.json is
    # overwritten each run, which already cost the r6 per-query map.
    # Also write bench_full_r{N}.json, N = 1 + the highest recorded
    # BENCH_r* round, so every round's full map survives for diffing.
    repo = os.path.dirname(os.path.abspath(__file__))
    import glob as _glob
    import re as _re

    rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := _re.search(r"BENCH_r0*(\d+)\.json$", p))
    ]
    stamp = f"bench_full_r{max(rounds, default=0) + 1:02d}.json"
    for fname in ("bench_full.json", stamp):
        try:
            with open(os.path.join(repo, fname), "w") as f:
                json.dump(full, f, indent=1, sort_keys=True)
        except OSError:
            pass  # read-only checkout: the printed lines still carry everything
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:20]
    )
    print(json.dumps(dict(summary, queries=slowest,
                          queries_note="slowest 20 of "
                          f"{len(timings)}; full map in bench_full.json",
                          queries_full_path=os.path.join(
                              os.path.dirname(os.path.abspath(__file__)),
                              "bench_full.json"))))


if __name__ == "__main__":
    main()
