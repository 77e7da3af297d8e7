"""Generate PLANS.md: formatted physical plans for representative queries,
with the scale property each plan demonstrates. Run from the repo root:

    python tools/plan_report.py > PLANS.md
"""

from __future__ import annotations

import os
import sys
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detection_in_time_series_data_spark import plans  # noqa: E402
from anomaly_detection_in_time_series_data_spark import queries as q  # noqa: E402
from anomaly_detection_in_time_series_data_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, the scale property to read off the plan)
SHOWCASE = [
    ("scan_filter_project", "PushedFilters + pruned ReadSchema at the parquet scan"),
    ("join_star_revenue", "dims broadcast; single fact shuffle for the group-by"),
    ("market_share_asia", "6-table star: 5 BroadcastHashJoins, one exchange"),
    ("topk_orders", "TakeOrderedAndProject — heap top-k, no global sort"),
    ("sole_latest_supplier", "single windowed lineitem scan (vs 3-scan subquery form); orders semi-join, supplier broadcast"),
    ("avg_yearly_small_qty", "correlated scalar subquery decorrelated to agg+join"),
    ("flagship_anomaly_zscore", "single window exchange; partial aggregation"),
    ("binned_range_join_events", "range join as equi hash join on epoch bins (no NLJ)"),
    ("latest_event_per_user", "ranked-window dedup: one shuffle, in-partition topN"),
    ("cusum_drift_scaled", "grouped pass + broadcast stats + prefix-sum window"),
    ("semantic_dedup_pairs", "adaptive bucket cap: oversized-set BroadcastHashJoins feed a hash equi join on bucket id — no cartesian, no NLJ"),
    ("eval_contamination_ngrams", "train/eval n-gram overlap as bucketed equi join on 64-bit hashes"),
    ("heavy_hitter_bigrams", "two-pass heavy hitters: bounded-state candidate pass, broadcast semi-join recount — shuffle never carries the full key space"),
    ("rollup_cascade_daily", "continuous-aggregate cascade: one raw scan into minute partials, hour/day are partial-only merges"),
    ("weekly_shape_discords", "join-free matrix profile: pinned (key, week) repartition feeds one cache-tiled kernel call per group — no pair-row shuffle, AQE coalescing defeated"),
    ("cep_click_click_purchase", "CEP pattern as lead-window predicate: one shuffle, zero joins"),
    ("cms_event_type_counts", "count-min sketch: map-side combine collapses each partition to <= depth x width rows; probe side broadcast"),
    ("rrf_hybrid_retrieval", "both retrieval sides end in TakeOrderedAndProject(20); fusion joins two 20-row lists"),
    ("incremental_dedup_report", "digest-only shuffle: md5 keys, existing-corpus distinct side joined once"),
    ("weighted_sample_topk", "A-ES weighted sample ends in TakeOrderedAndProject(25) — per-partition heap top-k, never a global sort"),
    ("minhash_dedup_keep", "end-to-end dedup verdict: banded equi-joins + count-verify + label propagation, all hashed-key equi joins, no Python in the row path"),
    ("adaptive_quality_threshold", "per-source quantile gate: one source-hash shuffle reused by rank window, count window, and the final group-by"),
    ("quantized_ann_topk", "int8 codes as arrays; 20-row probe side broadcast — corpus scanned once, never shuffled; integer zip_with fold scores"),
    ("vocab_coverage_by_source", "top-100 vocab joins back broadcast; corpus token stream aggregated without a word shuffle"),
    ("source_shingle_overlap", "source-pair overlap via one shingle equi-join on the distinct-collapsed vocab — linear in co-occurrences, no doc pairs"),
    ("bloom_prejoin_fpr", "bloom pre-join screen: bit-set frame broadcast to the probe scan; probe side never shuffles for membership"),
    ("bm25_retrieval", "BM25: query terms broadcast-filter the token stream; doc-length join + TakeOrderedAndProject(10) top-k"),
    ("weighted_median_price", "exact weighted median via cumulative-weight window: one group-key shuffle, spill-safe in-partition sort"),
    ("theil_sen_trend", "Theil-Sen on the pre-aggregated hourly series: pair join is T^2 in series length, never in raw rows"),
    ("skyline_parts_pareto", "linear 2-D skyline: running max over the distinct-price frontier table, broadcast join back — no all-pairs dominance join"),
    ("interval_union_coverage", "sweep-line interval union: windows + both aggregates share ONE hashpartitioning(user_id) exchange"),
    ("fuzzy_name_linkage", "deletion-neighborhood blocking: candidates from an equi join on (position, mask) — O(names x length), never all-pairs levenshtein"),
    ("grid_hotspot_stencil", "sparse 3x3 stencil: cell counts exploded to neighbor coords and re-aggregated — one equi shuffle, no spatial self-join"),
    ("bitmap_segment_overlap", "bitmap distinct-intersection: idempotent partial_bit_or off the scan (no distinct pass); the shuffle carries 8-byte words, 62 users each"),
    ("prefix_filter_jaccard_join", "exact ppjoin: checkpointed shingle table (explosion runs once), candidates from an equi join on rare-prefix shingles"),
    ("max_drawdown_per_type", "running-extreme drawdown: cumsum, running max, and argmax rank share ONE (type, ts) exchange; one fact scan"),
    ("exact_percent_rank_extremes", "exact rational rank statistics: asc rank, count, desc top-5 windows on one event_type exchange"),
    ("delivery_completeness_audit", "SLA audit off the checkpointed daily grain: 0 fact re-scans; every exchange moves (types x days) rows"),
    ("kmeans_anomaly_scores", "micro-Lloyd scoring: k x 64 centroid table broadcast, zip_with integer folds; corpus never shuffles for assignment"),
    ("incremental_agg_maintenance", "IVM merge: base and delta aggs pre-partitioned on the view grain; the full-outer merge reuses their partitioning"),
    ("spc_control_chart_rules", "SPC rules on the (type, day) pre-aggregate: one fact shuffle, per-type stats broadcast back, run windows on days-sized state"),
    ("wasserstein_value_drift", "W1 drift: domain-bounded cent grid broadcast to types, per-type CDF windows over metadata-sized rows; raw events touched once"),
    ("t_closeness_audit", "privacy TV-distance: language marginal + corpus total broadcast; dense grid = groups x langs, never a fact re-scan"),
    ("gini_split_gain_deciles", "decision-stump scan: 9-row threshold grid broadcast, ALL contingency tables from one conditional-agg pass"),
    ("ann_graph_link_prediction", "ANN recall audit: orthant-bucketed edge join, degree-bounded wedge enumeration, TakeOrderedAndProject(20) — never all-pairs"),
    ("haar_wavelet_energy", "Haar ladder: log2(T) pairwise GROUP BYs over the daily pre-aggregate — a parallel wavelet transform, no sequential fold"),
    ("ams_f2_sketch_estimate", "AMS sketch: ONE aggregate pass folding 16 map-side-combinable sums; exact-F2 twin rides a 1-row broadcast into the combine"),
    ("point_in_polygon_counts", "winding-number geofence: 4-edge polygon broadcast, per-point integer predicates folded in one aggregate, nation-sized output"),
    ("event_sequence_pattern_match", "MATCH_RECOGNIZE-lite: one user shuffle, per-user collect+encode, JVM regexp scan — no joins, no Python eval"),
    ("lttb_downsample_lite", "LTTB-lite decimation: hour-grain pre-aggregate, 2-row-per-bucket centroid broadcast join, per-bucket top-1 window"),
    ("cumulative_gains_deciles", "two-phase exact rank (range shuffle + broadcast offsets via operators/ranks.py) feeds arithmetic ntile deciles — no single-task window anywhere"),
    ("roc_auc_exact", "tie-aware Mann-Whitney AUC on the score-grain contingency table: one map-side-combined groupBy, bounded cumulative window, 1-row fold"),
    ("poisson_bootstrap_means", "one-pass deterministic bootstrap: 16-row replicate spine broadcast, hash-CDF weights, map-side-combined per-replicate sums"),
    ("table_diff_audit", "keyed version diff: ONE full-outer sort-merge join on the table key; all classification counts fold map-side"),
    ("streaming_hll_maintenance", "idempotent HLL register IVM: per-trigger map-side max to <=256 rows, register-sized store merge, no fence needed"),
    ("rfm_segmentation_counts", "three global quintiles over the customer grain, every one a two-phase exact rank — zero single-task windows; final cell count is <=125 rows"),
    ("abc_inventory_classification", "cumulative revenue share over the SF-scaling part dimension rides global_prefix_sum: range shuffle + Arrow local cumsums + partitions-sized offset window (round-10 audit rewrite)"),
    ("goodman_kruskal_gamma_ordinal", "ordinal association folded on the 5x10 contingency grid — the pair 'join' is grid x grid, never row x row"),
    ("retrieval_precision_at_k", "per-source top-10 by exact term frequency with total-order tie-break; relevance totals fold on the same scan's grain"),
]


# Round-10 audit mode (VERDICT r9 item 6): one-line cardinality
# justifications for every partition-less Window that is bounded by a
# GROUPED Aggregate — the hard gate's documented blind spot
# (plans/inspect.py:unbounded_global_windows treats any Aggregate as
# collapsing, even when its grouping keys scale with the data).  The
# audit sweep below (grouped_global_windows over the full registry)
# surfaces every such site; a site with no entry here is printed as
# UNREVIEWED, which the round sweep treats as a to-do.  Keys are query
# names; values must state why the bounding Aggregate's GROUP COUNT is
# scale-bounded (grain arithmetic, not vibes).
WINDOW_AUDIT_JUSTIFICATIONS: dict[str, str] = {
    # Fixed-cardinality grains (constant regardless of SF):
    "hits_micro": "event_type grain — 5 values; the hub/authority iteration frame is node-count-sized",
    "benford_first_digit_audit": "digit grain — exactly 9 rows enter the window",
    "orthant_balance_audit": "orthant grain — 2^sign_bits buckets, a fixed sketch parameter",
    "source_mixture_plan": "lang grain — 5 language classes",
    "snake_sharding_plan": "shard grain — the shard count is a fixed plan parameter",
    "isotonic_calibration_pav": "score-bin grain — fixed bin count from the binning step",
    "vocab_growth_curve": "decile grain — 10 rows enter the window",
    "lorenz_gini_deciles": "decile grain — 10 rows",
    "cumulative_gains_deciles": "decile grain — 10 rows",
    "qini_uplift_deciles": "decile grain — 10 rows (user-grain ntile itself rides global_exact_rank since r10)",
    # Calendar/time grains (grow with timespan, not data volume):
    "topk_membership_churn": "week grain — one row per calendar week; state O(weeks), not O(rows)",
    "hourly_acf_lags": "hour-of-day grain — <=24 groups",
    "slo_burn_rate_alerts": "alert-window time buckets — calendar-bounded",
    "kaplan_meier_components": "duration-day grain — bounded by the corpus horizon in days",
    # Domain-bounded value grains (bounded by the value domain, not rows):
    "roc_auc_exact": "score grain — distinct cent values bounded by the value domain, constant wrt SF",
    "wasserstein_value_drift": "domain-bounded cent grid (PLANS showcase documents the bound)",
    "skyline_parts_pareto": "distinct-price frontier — bounded by the price domain in cents, constant wrt SF",
    # Construction-bounded grains:
    "recs_coverage_popularity": "recommended-item grain — at most probes x k (= 250) rows by construction",
}


# Round-12 audit mode (VERDICT r11 item 3): one-line justifications for
# every PARTITIONED Window whose partition keys are a proper subset of
# the bounding grain (plans/inspect.py:partitioned_subgrain_windows) —
# the second blind spot: a tiny-domain partition key over a wide
# residual frame concentrates the sort in a handful of tasks (the
# jonckheere dense-grid shape).  Keys are query names; values must state
# either why the residual grain is scale-bounded or why the partition
# key parallelizes adequately.  The sweep sees THROUGH localCheckpoint
# (lineage is transparently kept during audit), so sites hidden behind
# checkpointed frames are surfaced too.
#
# The round-12 sweep surfaced 49 sites; three genuinely-weak shapes were
# REWRITTEN instead of justified (user_activity_gini -> count-grid
# closed form; borda_rank_aggregation + gmm_anomaly_scores ->
# operators/ranks.py:keyed_exact_rank, the keyed two-phase rank this
# audit motivated).
SUBGRAIN_WINDOW_AUDIT_JUSTIFICATIONS: dict[str, str] = {
    # Calendar residual (frame grows with timespan, not data volume):
    "best_burst_window": "event_type grain (5) x day residual — calendar-bounded frame",
    "delivery_completeness_audit": "(event_type, missing-flag) x day residual — calendar-bounded",
    "detector_pr_vs_ensemble": "event_type (5) x day residual — calendar-bounded",
    "detector_threshold_sweep": "event_type (5) x day residual — calendar-bounded",
    "event_rate_changepoint": "event_type (5) x hour residual — calendar-bounded",
    "haar_wavelet_energy": "event_type (5) x day residual — calendar-bounded (ladder halves it further)",
    "linear_interp_gap_fill": "event_type (5) x hour residual — calendar-bounded",
    "mase_forecast_eval": "event_type (5) x hour residual — calendar-bounded",
    "newsvendor_quantile_order": "event_type (5) x day residual — calendar-bounded",
    "ols_leverage_influence": "event_type (5) x hour residual — calendar-bounded",
    "record_breaking_days": "event_type (5) x day residual — calendar-bounded",
    "resample_gap_fill": "event_type (5) x time-bucket residual — calendar-bounded",
    "rolling_ols_slope": "event_type (5) x hour residual — calendar-bounded",
    "runs_test_randomness": "event_type (5) x day residual — calendar-bounded",
    "seasonal_dow_profile": "event_type (5) x day residual — calendar-bounded",
    "stl_lite_decomposition": "event_type (5) x day residual — calendar-bounded",
    "spc_control_chart_rules": "event_type (x side/run flags) x day residual — calendar-bounded",
    "lttb_downsample_lite": "time-bucket partition (calendar-bounded) x hour sub-grain residual",
    "ltv_cohort_curve": "cohort_week x age_week — both calendar grains",
    "rolling_wau_bitmap": "fixed user-hash bucket partition x day residual — days-sized frame per bucket",
    # Domain-bounded value-grid residual (cents/count quantization):
    "boxplot_components": "event_type (5) x cents grid — domain-bounded by value quantization",
    "brown_forsythe_components": "event_type (5) x doubled-median cents grid — domain-bounded",
    "median_imputation_audit": "event_type (5) x cents grid — domain-bounded",
    "ks_value_drift": "event_type (5) x value grid — domain-bounded",
    "mann_whitney_drift": "event_type (5) x value grid — domain-bounded",
    "wasserstein_value_drift": "event_type (5) x cent grid — domain-bounded (PLANS showcase documents the bound)",
    "jonckheere_ordered_trend": "5 ordered priority groups x domain-bounded cents grid (the roc_auc_exact class; VERDICT r11 watch item closed)",
    "user_activity_gini": "event_type (5) x per-user activity-count grid — r12 count-grid rewrite; grid bounded by the count domain, not user count",
    # Enum residual (k x k constant grids):
    "lang_confusion_matrix": "label/pred partitions over the 5x5 language confusion grid — constant frame",
    "lead_lag_correlation": "type-pair partitions (25) x bounded lag grid",
    "markov_backtest_accuracy": "event_type x next-type enum — k x k frame",
    "next_event_entropy": "event_type x next-type enum — k x k frame",
    "modal_priority_by_status": "order status (3) x priority (5) constant grid; top-1 filter also rides WindowGroupLimit",
    # Top-k rank filters (WindowGroupLimit prunes map-side to k rows per
    # key before the sort — pinned in test_plans.py):
    "gaussian_nll_anomalies": "top-N-per-label rank filter rides WindowGroupLimit — map-side partial top-k, per-label frame never materializes",
    "topk_membership_churn": "weekly top-10 filter rides WindowGroupLimit — 10-row state per week per mapper",
}

# Partition keys that are id-grain / arbitrary-cardinality: the window
# parallelizes across keys natively, so a subgrain residual is the
# NORMAL per-entity frame (terms per doc, days per user), not a
# concentration hazard.  Sites whose every partition key is in this set
# are auto-annotated.
WIDE_PARTITION_KEYS = {
    "doc_id",
    "user_id",
    "probe_id",
    "canon",
    "node",
    "l_orderkey",
}


@contextmanager
def _transparent_checkpoints():
    """Make localCheckpoint a lineage-preserving no-op for the duration
    of the audit sweep, so windows BEHIND a checkpoint (which the
    optimizer reports as an opaque LogicalRDD leaf) stay visible to the
    plan predicates.  Audit-only: execution paths keep real
    checkpoints."""
    import pyspark.sql.classic.dataframe as _cd

    orig = _cd.DataFrame.localCheckpoint
    _cd.DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        yield
    finally:
        _cd.DataFrame.localCheckpoint = orig


def audit_grouped_windows(spark) -> list[tuple[str, str, list[str], str]]:
    """Sweep the full registry (batch queries; streaming_* skipped — their
    returned frame comes from a bounded memory-sink table) and return
    (query, window, grouping keys, justification|UNREVIEWED) rows."""
    rows = []
    for name, fn in q.QUERIES.items():
        if name.startswith("streaming_"):
            continue
        try:
            df = fn(spark, SF_DIR)
            sites = plans.grouped_global_windows(df)
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"PLAN ERROR: {type(e).__name__}: {e}", [], ""))
            continue
        for win, keys in sites:
            rows.append(
                (
                    name,
                    win,
                    keys,
                    WINDOW_AUDIT_JUSTIFICATIONS.get(name, "UNREVIEWED"),
                )
            )
    return rows


def audit_subgrain_windows(
    spark,
) -> list[tuple[str, str, list[str], list[str], str]]:
    """Round-12 sweep: (query, window, partition keys, residual grain,
    justification|UNREVIEWED) rows for every partitioned-window-over-
    subgrain site, with checkpoints transparent so hidden sites
    surface."""
    rows = []
    with _transparent_checkpoints():
        for name, fn in q.QUERIES.items():
            if name.startswith("streaming_"):
                continue
            try:
                df = fn(spark, SF_DIR)
                sites = plans.partitioned_subgrain_windows(df)
            except Exception as e:  # noqa: BLE001
                rows.append(
                    (name, f"PLAN ERROR: {type(e).__name__}: {e}", [], [], "")
                )
                continue
            for win, pkeys, residual in sites:
                just = SUBGRAIN_WINDOW_AUDIT_JUSTIFICATIONS.get(name)
                if just is None and pkeys and all(
                    k in WIDE_PARTITION_KEYS for k in pkeys
                ):
                    just = (
                        "partition key parallelizes (id-grain: "
                        + ", ".join(pkeys)
                        + ") — residual is the normal per-entity frame"
                    )
                rows.append(
                    (name, win, pkeys, residual, just or "UNREVIEWED")
                )
    return rows


def main() -> None:
    spark = get_spark("adts-plan-report")
    print("# PLANS — physical plans of representative queries")
    print()
    print(
        "Generated by `tools/plan_report.py` (Spark `explain('formatted')`,\n"
        f"post-Catalyst, pre-AQE) at `{SF_DIR}`. Each section names the\n"
        "scale property the plan is asserted to have (see\n"
        "`tests/test_plans.py` for the CI-pinned versions).\n"
    )
    print("## Grouped-global-window audit (round 10)")
    print()
    print(
        "Partition-less Windows bounded by a GROUPED Aggregate — the hard\n"
        "gate's blind spot (`plans/inspect.py:grouped_global_windows`).\n"
        "Each site carries a reviewed one-line justification of why the\n"
        "bounding Aggregate's group count is scale-bounded; UNREVIEWED\n"
        "entries are round to-dos. Swept over the full batch registry.\n"
    )
    audit = audit_grouped_windows(spark)
    if not audit:
        print("_No grouped-global-window sites in the registry._")
        print()
    else:
        print("| query | grouping keys | justification |")
        print("|---|---|---|")
        for name, _win, keys, just in audit:
            print(f"| `{name}` | `{', '.join(keys) or '-'}` | {just} |")
        print()
    print("## Partitioned-subgrain-window audit (round 12)")
    print()
    print(
        "PARTITIONED Windows whose partition keys are a proper subset of\n"
        "the bounding grain (`plans/inspect.py:partitioned_subgrain_windows`)\n"
        "— the second blind spot (VERDICT r11): a tiny-domain partition key\n"
        "over a wide residual frame concentrates the sort in a handful of\n"
        "tasks.  Swept with localCheckpoint transparent, so sites hidden\n"
        "behind checkpointed frames surface.  UNREVIEWED = round to-do.\n"
    )
    sub = audit_subgrain_windows(spark)
    if not sub:
        print("_No partitioned-subgrain-window sites in the registry._")
        print()
    else:
        print("| query | partition keys | residual grain | justification |")
        print("|---|---|---|---|")
        for name, _win, pkeys, residual, just in sub:
            print(
                f"| `{name}` | `{', '.join(pkeys) or '-'}` | "
                f"`{', '.join(residual) or '-'}` | {just} |"
            )
        print()
    for name, prop in SHOWCASE:
        df = q.QUERIES[name](spark, SF_DIR)
        print(f"## {name}")
        print()
        print(f"**Scale property:** {prop}")
        print()
        print("```")
        print(plans.formatted_plan(df).strip())
        print("```")
        print()


if __name__ == "__main__":
    main()
