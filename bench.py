#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines: a detailed one carrying the per-query map
{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "construct": {...}, "sf": ...} (also written to
BENCH_local_latest[_c{N}].json — the committed per-query channel), then
a short FINAL line {"metric", "value", "unit", "n_queries", "sf"} sized
for the driver's 2 000-char tail capture (a 346-entry map overflows it
and parses as null — round-2 postmortem).

Each query is executed to completion with a count() action (results are
not collected to the driver — we measure engine throughput, not driver
serialization). A warmup query first amortizes session/JIT startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: reference-parity exports + analytics + scale extensions.
BENCH_QUERIES = [
    "node_export_customer",
    "node_export_orders",
    "rel_export_customer_placed_order",
    "rel_export_order_contains_part",
    "rel_export_order_supplied_by_supplier",
    "pattern_discovery",
    "identifier_detection",
    "q1_pricing_summary",
    "q5_revenue_by_segment_nation",
    "q3_top_orders_by_revenue",
    "q6_forecast_revenue",
    "supplier_part_volume",
    "motif_customer_order_part",
    "window_tumbling_events",
    "window_sliding_events",
    "window_session_events",
    "asof_latest_high_value",
    "events_json_props",
    "events_gap_stats",
    "events_funnel_view_purchase",
    "events_hourly_daily_rollup",
    "signup_purchases_24h",
    "kmv_distinct_users_per_type",
    "rollup_revenue_by_flag_status",
    "cube_orders_by_priority_status",
    "orders_running_total",
    "customer_balance_deciles",
    "part_brand_families",
    "q17_small_quantity_revenue",
    "lineitem_price_quantiles",
    "orders_without_lineitems",
    "skewed_join_hot_suppliers",
    "q13_customer_order_distribution",
    "top_parts_per_nation",
    "q2_min_cost_supplier",
    "grouping_sets_revenue",
    "pivot_orders_priority_status",
    "q22_rich_inactive_customers",
    "corpus_hash_sample",
    "events_stratified_sample",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash_signatures",
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprints",
    "text_repetition_stats",
    "corpus_clean_pipeline",
    "corpus_split_stats",
    "domain_cap_sample",
    "lang_mixture_stats",
    "rolling_user_activity",
    "events_zscore_outliers",
    "bigram_next_token_topk",
    "embedding_topk",
    "embedding_ivf_topk",
    "embedding_lsh_pairs",
    "graph_degrees",
    "graph_connected_components",
    "graph_triangle_counts",
    "dedup_span_stats",
    # round-2 TPC-H shapes
    "q4_order_priority",
    "q7_nation_volume_shipping",
    "q9_product_type_profit",
    "q12_shipping_delay_class",
    "q14_promo_revenue_share",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q21_sole_late_supplier",
    # round-2 training-data pipeline
    "doc_chunk_plan",
    "sequence_pack_stats",
    "pii_scrub_stats",
    "embedding_quantize_stats",
    "heavy_hitter_terms",
    "events_group_sample",
    "contamination_check",
    "unigram_logprob_score",
    "lineitem_price_histogram_quantiles",
    "q16_supplier_counts_by_part",
    "q20_heavy_shippers_of_small_parts",
    # round-3: previously gate-only operators, now timed
    "graph_k_core",
    "dedup_near_dup_clusters",
    "embedding_near_dup_clusters",
    "streaming_session_events",
    # round-3 additions
    "corpus_shard_manifest",
    "quality_survival_curve",
    "embedding_label_stats",
    "doc_novelty_profile",
    "schema_union_sampled",
    "lineitem_column_profile",
    "corpus_snapshot_diff",
    "bpe_merge_candidates",
    # round-4: full coverage — every registered query is timed (VERDICT
    # r03 #6), including the iterative and O(n²)-baseline ones that were
    # previously excluded; their cost is visible per-query rather than
    # hidden.
    "node_export_part",
    "schema_union",
    "uniqueness_profile_customer",
    "rel_export_nation_in_region",
    "type_inference_samples",
    "dedup_minhash_signatures",
    "dedup_simhash_pairs",
    "embedding_cosine_pairs",
    "graph_pagerank",
    "graph_bfs_hops",
    "graph_shortest_hops",
    "multimodal_features",
    "multimodal_frame_plan",
    "multimodal_resize_plan",
    "streaming_tumbling_events",
    "streaming_running_totals",
    "streaming_dedup_user_type",
    "streaming_kmv_distinct_users",
    "streaming_signup_purchase_pairs",
    "customers_with_open_orders",
    "tfidf_top_terms",
    "bm25_rank_spark_hash_join",
    "vocabulary_oov_rate",
    "q8_market_share",
    "q10_returned_revenue_by_nation",
    "q11_part_volume_concentration",
    "q15_top_supplier",
    "embedding_kmeans_step",
    "dedup_incremental_batch",
    # round-4 additions
    "bpe_apply_merge_stats",
    "vocab_growth_curve",
    "domain_quality_percentiles",
    "part_copurchase_topk",
    "graph_label_propagation",
    "streaming_moment_stats",
    "dedup_incremental_near_dup",
    "domain_mixture_weights",
    "embedding_ivf_cell_stats",
    "ann_recall_at_k",
    "cms_term_estimates",
    "events_retention_cohorts",
    "customer_rfm_segments",
    "bigram_perplexity_heldout",
    "basket_association_rules",
    "embedding_pq_audit",
    "embedding_dim_stats",
    "embedding_norm_outliers",
    "weighted_corpus_sample",
    "doc_length_buckets",
    "part_name_linkage",
    "events_scd2_state",
    "events_mad_outliers",
    "graph_hits_scores",
    "pmi_collocations",
    "quality_classifier_score",
    "embedding_centroid_outliers",
    "dedup_prefix_survivorship",
    "dedup_minhash_calibration",
    "language_confusion_matrix",
    "split_leakage_check",
    "streaming_sliding_events",
    "streaming_topk_users",
    "hybrid_rrf_retrieval",
    "streaming_funnel_state",
    "epoch_mixture_plan",
    "length_drift_psi",
    "graph_personalized_pagerank",
    "quality_signal_ensemble",
    "events_hourly_profile",
    # round-5 additions
    "model_v3_table_schemas",
    "term_zipf_fit",
    "language_script_stats",
    "domain_term_entropy",
    "events_cusum_drift",
    "curriculum_order_plan",
    "cross_domain_neardup_matrix",
    "embedding_dim_quantiles",
    "dataset_card_stats",
    "graph_closeness_sampled",
    "bpe_train_merges",
    "embedding_ivf_pq_topk",
    "copurchase_recommendations",
    "events_markov_transitions",
    "events_first_touch_attribution",
    "streaming_cusum_drift",
    "data_quality_checks",
    "user_sequence_anomaly",
    "embedding_matryoshka_audit",
    "embedding_pca_power_iteration",
    "vocab_coverage_curve",
    "graph_walk_corpus",
    "brand_price_qty_regression",
    "embedding_cluster_purity",
    "graph_assortativity",
    "graph_clustering_coefficients",
    "events_active_user_curves",
    "dedup_containment_pairs",
    # round-6 additions
    "graph_walk_corpus_multi",
    "graph_modularity_lpa",
    "graph_bridge_edges",
    "source_gini_concentration",
    "events_winsorized_stats",
    "doc_length_ks_drift",
    "source_lang_chi2",
    "source_lang_mutual_information",
    "doc_length_bootstrap_ci",
    "embedding_semdedup_prune",
    "embedding_knn_label_agreement",
    "dedup_tfidf_cosine_pairs",
    "events_ewma_daily",
    "orders_pareto_skyline",
    "customer_top_percentile_share",
    "events_seasonal_anomalies",
    "events_session_conversion",
    "dedup_rate_by_source",
    "streaming_ewma_trend",
    "events_linear_attribution",
    "orders_monthly_seasonality",
    "events_burst_days",
    "events_churn_hazard",
    "source_length_bootstrap_ci",
    "events_benford_audit",
    "embedding_centroid_split_drift",
    "graph_degree_powerlaw_fit",
    "quality_calibration_bins",
    "kmv_audience_overlap",
    "tokenizer_fertility_by_lang",
    "dedup_cluster_size_histogram",
    "events_transition_entropy",
    "doc_length_lang_anova",
    "doc_char_entropy",
    "graph_rich_club",
    "embedding_intrinsic_dimension",
    "events_weekly_autocorrelation",
    "lang_token_budget_plan",
    "events_funnel_steps",
    "source_js_divergence",
    "ann_recall_curve",
    "streaming_zscore_extremes",
    "events_fd_violations",
    "graph_edge_triangle_support",
    "lexical_diversity_by_source",
    "doc_length_rank_test",
    "events_top_paths",
    "join_key_skew_profile",
    "embedding_silhouette",
    "embedding_davies_bouldin",
    "retrieval_ndcg_eval",
    "order_total_reconciliation",
    "nation_revenue_hhi",
    "streaming_silent_keys",
    "events_gap_exponential_gof",
    "embedding_jl_distortion",
    "customer_k_anonymity",
    "graph_neighbor_jaccard",
    "doc_readability_by_source",
    "embedding_fisher_dims",
    "orders_changepoint_day",
    "customer_l_diversity",
    "bloom_filter_fp_audit",
    "embedding_pair_cosine_histogram",
    "orders_daily_backlog",
    "nation_customer_median_ltv",
    "supplier_delay_trend",
    "brand_return_wilson",
    "source_boilerplate_grams",
    "orders_theil_sen_trend",
    "customer_t_closeness",
    "graph_adamic_adar",
    "returnflag_qty_discount_spearman",
    "retrieval_mrr_eval",
    "posting_list_stats",
    "events_mann_kendall",
    "returnflag_qty_discount_kendall",
    "embedding_hubness_histogram",
    "term_burstiness",
    "doc_heaps_law_fit",
    "lineitem_correlation_matrix",
    "part_brand_type_cramers_v",
    "events_dominant_transition_scc",
    "events_position_attribution",
    "doc_length_levene",
    "events_holt_forecast",
    "orders_weekday_index",
    "corpus_filter_funnel",
    "events_bot_score_histogram",
    "events_out_of_order",
    "customer_cohort_ltv",
    "events_transition_reciprocity",
    "multimodal_ahash_near_dup",
    "customer_value_tier_migration",
    "language_id_margin",
    "events_dwell_by_transition",
    "events_conversion_latency",
    "part_revenue_abc",
    "streaming_conversion_latency",
    "quality_threshold_sweep",
    "embedding_centrality_length_corr",
    "bm25_tfidf_rank_agreement",
    "nation_quarter_yoy",
    "graph_type_mixing_matrix",
    "customer_reorder_intervals",
    "token_length_histogram",
    "supplier_share_shift",
    "events_session_bounce",
    "ccnet_perplexity_buckets",
    "dsir_importance_weights",
    "graph_katz_centrality",
    "orders_cumulative_distinct_customers",
    "embedding_mmr_topk",
    "events_ab_variant_lift",
    "kneser_ney_bigram_score",
    "graph_link_prediction_eval",
    "customer_mahalanobis_outliers",
    "corpus_token_budget_packing",
    "corpus_bigram_entropy_rate",
    "events_dispersion_index",
    "graph_spectral_radius",
    "multimodal_audio_energy_windows",
    "part_recs_coverage_diversity",
    "text_rake_keywords",
    "customer_kaplan_meier",
    "bm25_prf_expansion",
    "lineitem_two_way_anova",
    "events_daily_entropy_trend",
    "streaming_dispersion_index",
    "graph_effective_diameter",
    "quality_margin_sample",
    "events_cuped_lift",
    "events_markov_stationary",
    "source_rollup_ivm_check",
    "embedding_ood_histogram",
    "graph_node2vec_weights",
    "dedup_cluster_representatives",
    "text_chargram_lang_confusion",
    "events_funnel_ab_significance",
    "supplier_dual_sourcing_overlap",
    "orders_seasonal_naive_backtest",
    "embedding_triplet_margin",
    "events_lead_lag_correlation",
    "dedup_rate_projection",
    "streaming_value_quantiles",
    # eviction harness runs mid-list, NOT last: its stop path is quiesced
    # and logger-silenced now, but keeping it away from the final summary
    # line is cheap insurance for the driver's tail capture (VERDICT r07
    # What's-wrong #1 / directive #1).
    "streaming_daily_rollup_evicted",
    "embedding_binary_recall",
    "orders_gini_by_year",
    "events_gap_burstiness",
    "events_circular_hour_stats",
    "source_burrows_delta",
    "orders_hill_tail_index",
    "graph_percolation_robustness",
    "model_v24_table_schemas",
    "model_v01_file_schemas",
]


_PKG = "neo4j_database_to_data_importer_package_spark"


def _pkg_modules() -> dict:
    return {
        k: v for k, v in sys.modules.items()
        if k == _PKG or k.startswith(_PKG + ".")
    }


def _swap_in(modules: dict) -> None:
    """Install one tree's module set as the live package. This must
    bracket every baseline CALL, not just the import: the registry
    wrappers import their operators function-locally, and a relative
    import at call time resolves through sys.modules — with HEAD's
    modules live, a baseline closure would silently execute HEAD
    operator code and the comparison would be head-vs-head."""
    for k in list(sys.modules):
        if k == _PKG or k.startswith(_PKG + "."):
            del sys.modules[k]
    sys.modules.update(modules)


def _load_tree_registry(tree_path: str) -> tuple[dict, dict]:
    """Import a baseline git-worktree's registry IN THIS PROCESS so both
    trees share one Spark session (the ABAB requirement — separate
    sessions would reintroduce the cross-session offset the comparison
    exists to cancel). Returns (QUERIES, module_set); run each baseline
    query inside ``_swap_in(module_set)`` and restore the HEAD set
    after (see ``_swap_in``). Lazily-imported submodules load from the
    worktree via the package's ``__path__`` while its set is live."""
    import importlib

    head = _pkg_modules()
    for k in head:
        del sys.modules[k]
    sys.path.insert(0, tree_path)
    try:
        reg = importlib.import_module(_PKG + ".registry")
        pkg_file = sys.modules[_PKG].__file__ or ""
        if not pkg_file.startswith(os.path.abspath(tree_path) + os.sep):
            # import fell through to another sys.path entry (package
            # missing in the tree / path typo) — that would silently
            # bench HEAD against itself
            raise ImportError(
                f"baseline package resolved to {pkg_file!r}, not the "
                f"worktree {tree_path!r}"
            )
        queries = dict(reg.QUERIES)
        base_mods = _pkg_modules()
    finally:
        sys.path.remove(tree_path)
        _swap_in(head)
    return queries, base_mods


def _baseline_runner(head_mods: dict, base_mods: dict):
    """The swap bracket for one baseline call: returns ``in_baseline``
    such that ``in_baseline(call)`` executes ``call`` with the baseline
    module set live and HEAD restored after.

    BOTH snapshots are refreshed with lazily-imported submodules —
    head's BEFORE the swap discards them, baseline's after its call.
    The head half is the round-11 fix: without it, any head submodule
    first imported inside a query function was deleted by the next swap
    and re-imported from disk (compile + top-level exec + lost
    module-global memos) inside head's next timed window — a stable ~2×
    phantom "regression" on construction-heavy sub-second queries even
    for byte-identical trees (SCALING.md round-11 postmortem). Pinned by
    ``test_lazy_head_submodule_survives_baseline_call``."""

    def in_baseline(call):
        head_mods.update(_pkg_modules())
        _swap_in(base_mods)
        try:
            return call()
        finally:
            base_mods.update(_pkg_modules())
            _swap_in(head_mods)

    return in_baseline


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="spark-graft bench harness")
    ap.add_argument(
        "--repeats", type=int, default=2,
        help="timed runs per query; the per-query MIN is reported",
    )
    ap.add_argument(
        "--interleaved", action="store_true",
        help="ABAB protocol (SCALING.md LSH postmortem): run the whole "
        "query list --repeats times and take per-query min ACROSS "
        "rounds, so a slow patch of the session (GC, JIT tiering, "
        "thermal) cannot bias any one query — round-over-round deltas "
        "under ~1.4x become readable. Default (consecutive repeats) is "
        "cheaper and what the driver's unattended run uses.",
    )
    ap.add_argument(
        "--baseline-tree", default=None, metavar="COMMIT",
        help="ALSO bench this commit (a temporary git worktree) "
        "interleaved with HEAD in the SAME Spark session, and emit "
        "per-query head/baseline ratios in the artifact (VERDICT r06 "
        "#5): the regression-vs-noise verdict ships with the numbers "
        "instead of needing a separate postmortem. Implies the ABAB "
        "protocol for both trees.",
    )
    ap.add_argument(
        "--queries", nargs="*", default=None, metavar="NAME",
        help="bench only this subset of the headline list (diagnostics)",
    )
    args = ap.parse_args(argv)

    global BENCH_QUERIES
    if args.queries:
        keep = set(args.queries)
        unknown = keep - set(BENCH_QUERIES)
        if unknown:
            ap.error(f"--queries names not in the headline list: {sorted(unknown)}")
        BENCH_QUERIES = [q for q in BENCH_QUERIES if q in keep]

    from neo4j_database_to_data_importer_package_spark.session import get_spark
    from neo4j_database_to_data_importer_package_spark import registry

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Per-query warmup at the smallest SF immediately before its timed
    # run, so whole-stage-codegen JIT + parquet footer caches are hot and
    # the timed pass measures data-plane throughput, not compiler
    # latency. Interleaved (not two passes) because Spark's codegen class
    # cache is bounded — a separate warmup pass gets evicted by the other
    # queries before the timed run. (Cold-start JIT was measured at 5x
    # the steady-state cost for the LSH DAG.)
    warmup_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warmup_dir):
        warmup_dir = SF_DIR

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0

    def timed_split(fn) -> tuple[float, float]:
        """Same total window as ``timed`` with one inner split point:
        (total, construction) where construction is the driver-side
        plan-build time (the Python query function returning its
        DataFrame) and total-construction is the Spark action. Built for
        the round-12 driver-drift attribution (VERDICT r11 #1): the ABAB
        postmortem showed construction-heavy sub-second queries are
        where session state (import caches, JIT, GC) shows up first, so
        the single-tree artifact now records which component moved."""
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.count()
        return time.perf_counter() - t0, t1 - t0

    timings: dict[str, float] = {}
    construct: dict[str, float] = {}
    baseline_meta = None
    if args.baseline_tree:
        import subprocess
        import tempfile

        repo = os.path.dirname(os.path.abspath(__file__))
        wt = tempfile.mkdtemp(prefix="bench_baseline_")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.baseline_tree],
            check=True, cwd=repo, capture_output=True,
        )
        try:
            base_queries, base_mods = _load_tree_registry(wt)
            head_mods = _pkg_modules()
            base_timings: dict[str, float] = {}

            in_baseline = _baseline_runner(head_mods, base_mods)

            for rnd in range(args.repeats):
                for name in BENCH_QUERIES:
                    fn = registry.QUERIES[name]
                    bfn = base_queries.get(name)
                    if rnd == 0:
                        fn(spark, warmup_dir).count()
                        if bfn is not None:
                            in_baseline(lambda: bfn(spark, warmup_dir).count())
                    # Alternate AB / BA per round: running second is
                    # slightly warmer (page cache, JIT), so a fixed
                    # order would bias identical code toward one tree.
                    def run_head():
                        dt = timed(fn)
                        timings[name] = min(timings.get(name, float("inf")), dt)
                        spark.catalog.clearCache()

                    def run_base():
                        if bfn is None:
                            return
                        # Time ONLY the query inside the swap — the
                        # module-swap overhead (two sys.modules sweeps)
                        # was previously inside the perf_counter window,
                        # a small systematic bias making HEAD look
                        # faster on sub-second queries (ADVICE r07).
                        dtb_box = [float("inf")]

                        def _timed_base():
                            t0 = time.perf_counter()
                            bfn(spark, SF_DIR).count()
                            dtb_box[0] = time.perf_counter() - t0

                        in_baseline(_timed_base)
                        base_timings[name] = min(
                            base_timings.get(name, float("inf")), dtb_box[0]
                        )
                        spark.catalog.clearCache()

                    for step in ((run_head, run_base) if rnd % 2 == 0
                                 else (run_base, run_head)):
                        step()
            timings = {n: round(v, 3) for n, v in timings.items()}
            base_timings = {n: round(v, 3) for n, v in base_timings.items()}
            common = sorted(base_timings)
            head_common = sum(timings[n] for n in common)
            base_common = sum(base_timings[n] for n in common)
            baseline_meta = {
                "tree": args.baseline_tree,
                "protocol": f"ABAB interleaved, min of {args.repeats}, one Spark session",
                "n_common": len(common),
                "head_total_common_sec": round(head_common, 3),
                "baseline_total_common_sec": round(base_common, 3),
                "ratio_total": round(head_common / base_common, 3)
                if base_common else None,
                "queries": base_timings,
                "ratio": {
                    n: round(timings[n] / base_timings[n], 2)
                    for n in common if base_timings[n] > 0
                },
            }
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=repo, capture_output=True,
            )
    elif args.interleaved:
        # Round 1 carries the per-query warmup; rounds 2..N are straight
        # timed passes over the same list, min taken across rounds.
        for rnd in range(args.repeats):
            for name in BENCH_QUERIES:
                fn = registry.QUERIES[name]
                if rnd == 0:
                    fn(spark, warmup_dir).count()
                dt, dc = timed_split(fn)
                if dt < timings.get(name, float("inf")):
                    timings[name] = dt
                    construct[name] = dc
                spark.catalog.clearCache()
        timings = {n: round(v, 3) for n, v in timings.items()}
    else:
        for name in BENCH_QUERIES:
            fn = registry.QUERIES[name]
            fn(spark, warmup_dir).count()
            best = float("inf")
            for _ in range(args.repeats):  # min-of-N: damps GC/JIT noise
                dt, dc = timed_split(fn)
                if dt < best:
                    best = dt
                    construct[name] = dc
            timings[name] = round(best, 3)
            # Operators that persist() intermediates (LSH candidate
            # tables, iterative frontiers) must not leak storage memory
            # into the next query's execution budget — 80+ queries of
            # accumulated cache was the round-2 bench regression.
            spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline query wall-clock (engine actions, no driver collect)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if baseline_meta is not None:
        detail["baseline"] = baseline_meta
    if construct:
        # Construction component of each reported (min-total) run —
        # same perf_counter window as the total, split at the point the
        # query function returns its DataFrame. Round-12 drift
        # attribution reads this against prior rounds' totals.
        detail["construct"] = {n: round(v, 4) for n, v in construct.items()}
    print(json.dumps(detail))
    # Durable per-query detail (VERDICT r04 missing #3): the driver's
    # tail-capture window truncates the detailed stdout line, so the
    # round-over-round regression comparison needs a committed file.
    # Each round's copy is committed as BENCH_local_rNN.json. A
    # --queries diagnostic subset does NOT overwrite the default file —
    # a single-query profiling run once clobbered the round artifact
    # minutes after the full run built it (round 9); subsets only write
    # when SPARK_GRAFT_BENCH_OUT names an explicit destination.
    # Core-count-suffixed default so a lower-core re-run (the driver
    # benches both local[32] and local[8]) can never clobber the 32-core
    # per-query record — round 14's c8 re-run overwrote the 32-core
    # detail and the round's per-query ground truth was lost (VERDICT
    # r14 What's-wrong #2).
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path is None and not args.queries:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        suffix = "" if cpus == "32" else f"_c{cpus}"
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"BENCH_local_latest{suffix}.json",
        )
    if out_path is not None:
        try:
            with open(out_path, "w") as f:
                json.dump(detail, f, indent=1, sort_keys=True)
                f.write("\n")
        except OSError:
            pass  # read-only checkout: stdout still carries the summary
    # The detailed line above can exceed the driver's tail-capture window
    # (round 2's 83-query line lost its head and parsed as null) — the
    # LAST line is a short, always-parseable summary.
    print(json.dumps({
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
