#!/usr/bin/env python
"""8x scale-up sweep for the round-6 operator batch (SCALING.md).

Same replication methodology as tools/scaling_r05.py, extended to the
fact tables: documents / events / embeddings / customer / supplier /
part / orders / lineitem replicated 8x with disjoint, mutually
CONSISTENT keys (lineitem's order/part/supp keys shift with their
parents, so the one-ship-year co-occurrence graph becomes 8 disjoint
copies — the honest 8x point for the graph operators); region/nation
stay 1:1 (dimensions).

Expectations at 8x:
- graph_modularity_lpa / graph_bridge_edges: 8 disjoint graph copies —
  supersteps/wedges per copy unchanged, volume 8x, wall sub-8x.
- orders_pareto_skyline: the frontier stays tiny; the screen is a scan.
- dedup_tfidf_cosine_pairs / source_gini / chi2 / MI / KS / bootstrap:
  aggregate- or capped-join-bound, near-linear.
- events_ewma_daily / seasonal / sessions / winsorized: per-key or
  per-day state unchanged in CARDINALITY; only scan volume grows.
- streaming_ewma_trend: dominated by fixed stream-harness startup
  (SCALING.md round-5 streaming split).

Run: ``python tools/scaling_r06.py`` (exclusive — no concurrent Spark).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
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
    "embedding_binary_recall",
    "orders_gini_by_year",
    "events_gap_burstiness",
    "events_circular_hour_stats",
    "source_burrows_delta",
    "orders_hill_tail_index",
    "graph_percolation_robustness",
]

# Optional subset: ``python tools/scaling_r06.py <name> [<name> ...]``
if len(sys.argv) > 1:
    QUERIES = [q for q in QUERIES if q in set(sys.argv[1:])]

_OFF = 100000000


def build_8x(out_dir: str) -> None:
    import duckdb

    con = duckdb.connect()
    reps = {
        "documents": (
            "SELECT d.* REPLACE (doc_id + c.i * {o} AS doc_id, "
            "'copy' || c.i || ' ' || text AS text) FROM t d, range(0, 8) c(i)"
        ),
        "events": (
            "SELECT e.* REPLACE (event_id + c.i * {o} AS event_id, "
            "user_id + c.i * {o} AS user_id) FROM t e, range(0, 8) c(i)"
        ),
        "embeddings": (
            "SELECT v.* REPLACE (vec_id + c.i * {o} AS vec_id) "
            "FROM t v, range(0, 8) c(i)"
        ),
        "customer": (
            "SELECT cu.* REPLACE (c_custkey + c.i * {o} AS c_custkey) "
            "FROM t cu, range(0, 8) c(i)"
        ),
        "supplier": (
            "SELECT su.* REPLACE (s_suppkey + c.i * {o} AS s_suppkey) "
            "FROM t su, range(0, 8) c(i)"
        ),
        "part": (
            "SELECT p.* REPLACE (p_partkey + c.i * {o} AS p_partkey) "
            "FROM t p, range(0, 8) c(i)"
        ),
        "orders": (
            "SELECT o.* REPLACE (o_orderkey + c.i * {o} AS o_orderkey, "
            "o_custkey + c.i * {o} AS o_custkey) FROM t o, range(0, 8) c(i)"
        ),
        "lineitem": (
            "SELECT l.* REPLACE (l_orderkey + c.i * {o} AS l_orderkey, "
            "l_partkey + c.i * {o} AS l_partkey, "
            "l_suppkey + c.i * {o} AS l_suppkey) FROM t l, range(0, 8) c(i)"
        ),
    }
    for table, sql in reps.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{table}.parquet')"
        )
        con.execute(
            f"COPY ({sql.format(o=_OFF)}) TO '{out_dir}/{table}.parquet' "
            f"(FORMAT PARQUET)"
        )
    for t in ["region", "nation"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    con.close()


def main() -> None:
    from neo4j_database_to_data_importer_package_spark import registry
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="scaling-r06")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r06_8x_")
    try:
        build_8x(tmp)
        for name in QUERIES:
            fn = registry.QUERIES[name]
            row = {}
            for label, d in (("1x", SF_DIR), ("8x", tmp)):
                fn(spark, d).count()  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                row[label] = (time.perf_counter() - t0, n)
                spark.catalog.clearCache()
            r1, r8 = row["1x"][0], row["8x"][0]
            print(
                f"{name}: 1x {r1:.2f}s ({row['1x'][1]} rows) | "
                f"8x {r8:.2f}s ({row['8x'][1]} rows) | ratio {r8 / r1:.1f}",
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
