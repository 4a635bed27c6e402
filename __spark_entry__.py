"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the heaviest reference-parity
pipeline: per-pattern relationship export with semi-join endpoint
validation and sentinel filtering) on sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
its DuckDB oracle; implementations live in
``neo4j_database_to_data_importer_package_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neo4j_database_to_data_importer_package_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["rel_export_order_contains_part"](
        spark, "/root/testdata/sf0.001"
    )


# The driver's correctness gate evaluates the FIRST 50 entries of this
# dict (rounds 1-8 each produced rows for exactly list(queries())[:50],
# bit-identical key sets — see COVERAGE.md for the evidence). Round-9
# rotation (VERDICT r08 directive #1 — keep burning down the
# never-driver-gated backlog, oldest first): the oldest 45 entries of
# the round-8 `_NEXT_ROTATION` ledger (verbatim order), then 5
# family-spanning driver-green canaries (reference-parity flagship,
# TPC-H decimal-exact, iterative graph, streaming, multimodal). The
# streaming canary is `streaming_daily_rollup_evicted` because its
# replay harness is re-tuned this round (VERDICT r08 directive #3 —
# fewer replay chunks + tighter trigger interval) and the query must
# re-face the driver after that change. Every entry, regardless of
# position, is oracle-verified locally at sf0.01 by tools/local_gate.py
# and at sf0.001 by tests/test_oracle_parity.py.
_GATE_FIRST_50 = [
    # the oldest 45 of the 66-entry round-8 backlog
    # (r08 _NEXT_ROTATION prefix, verbatim order)
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
    # 5 canaries: reference-parity flagship, TPC-H decimal-exact,
    # iterative graph, streaming (the eviction replay harness is
    # re-tuned this round — VERDICT r08 directive #3), multimodal
    "rel_export_order_contains_part",
    "q1_pricing_summary",
    "graph_pagerank",
    "streaming_daily_rollup_evicted",
    "multimodal_features",
]
# Length AND uniqueness (ADVICE r07: a duplicate name would silently
# shrink the effective driver gate below 50 unique queries — the
# round-3 lost-slot failure class).
assert len(_GATE_FIRST_50) == 50, len(_GATE_FIRST_50)
assert len(set(_GATE_FIRST_50)) == 50, "duplicate gate window entry"
_GATE_PRIORITY = _GATE_FIRST_50

# Queries never yet driver-gated: the final 21 round-6 additions
# (oldest first — round 10 rotates them through the 50-slot window and
# closes the ledger, regaining 50−21−5 = 24 registration slots; registry
# growth stays frozen per VERDICT r06 directive #1 / r07 directive #8 /
# r08 directive #1 until then — the r10 close-out plan is written in
# COVERAGE.md). All are verified by the local sf0.01 gate replica and
# tests/test_oracle_parity.py (rotation ledger: COVERAGE.md).
_NEXT_ROTATION: list[str] = [
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, gate-priority
    order (never-gated queries first — see ``_GATE_PRIORITY``)."""
    missing = [n for n in _GATE_PRIORITY if n not in registry.QUERIES]
    assert not missing, f"_GATE_PRIORITY names not in registry: {missing}"
    ordered = {n: registry.QUERIES[n] for n in _GATE_PRIORITY}
    for n, fn in registry.QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(registry.ORACLES)
