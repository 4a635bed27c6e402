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
# dict. Round 12 is the second steady-state window (COVERAGE.md "Steady
# state (rounds 11+, ledger closed)"; VERDICT r11 directive #2): the
# cumulative driver ledger stays closed at 346/346, so the window is
# canaries only, composed by tools/steady_window.py from the
# CORRECTNESS ledger — prior-round reds first (r11 had none), then the
# round's changed-path re-gates, then the oldest-driver-evidence
# rotation round-robining across families. This round's proposer run:
#   python tools/steady_window.py --changed embedding_lsh_pairs,\
#     embedding_near_dup_clusters
# used VERBATIM (no author swaps; pinned by
# tests/test_gate_priority.py::test_window_matches_steady_state_proposal).
# The changed list is the r12 engine diff: the similarity screen's
# WARN/metric once-per-screen alignment + stale-recording detection
# (operators/similarity.py::_occupancy_capped_blocks, commit 57d9ced)
# re-gates its two registered consumers. Every entry, regardless of
# position, is oracle-verified locally at sf0.01 by tools/local_gate.py
# and at sf0.001 by tests/test_oracle_parity.py.
_GATE_FIRST_50 = [
    "embedding_lsh_pairs",  # changed path
    "embedding_near_dup_clusters",  # changed path
    "dedup_ngram_jaccard",  # last driver-green r02
    "embedding_ivf_topk",  # last driver-green r02
    "events_gap_stats",  # last driver-green r02
    "node_export_part",  # last driver-green r02
    "rel_export_nation_in_region",  # last driver-green r02
    "text_language_id",  # last driver-green r02
    "window_sliding_events",  # last driver-green r02
    "corpus_split_stats",  # last driver-green r03
    "graph_bfs_hops",  # last driver-green r03
    "lineitem_price_histogram_quantiles",  # last driver-green r03
    "multimodal_resize_plan",  # last driver-green r03
    "streaming_dedup_user_type",  # last driver-green r03
    "customer_balance_deciles",  # last driver-green r04
    "doc_novelty_profile",  # last driver-green r04
    "grouping_sets_revenue",  # last driver-green r04
    "motif_customer_order_part",  # last driver-green r04
    "orders_running_total",  # last driver-green r04
    "part_brand_families",  # last driver-green r04
    "pivot_orders_priority_status",  # last driver-green r04
    "q12_shipping_delay_class",  # last driver-green r04
    "q3_top_orders_by_revenue",  # last driver-green r04
    "q5_revenue_by_segment_nation",  # last driver-green r04
    "q6_forecast_revenue",  # last driver-green r04
    "quality_survival_curve",  # last driver-green r04
    "rolling_user_activity",  # last driver-green r04
    "signup_purchases_24h",  # last driver-green r04
    "skewed_join_hot_suppliers",  # last driver-green r04
    "top_parts_per_nation",  # last driver-green r04
    "vocabulary_oov_rate",  # last driver-green r04
    "basket_association_rules",  # last driver-green r05
    "bigram_perplexity_heldout",  # last driver-green r05
    "cms_term_estimates",  # last driver-green r05
    "domain_quality_percentiles",  # last driver-green r05
    "epoch_mixture_plan",  # last driver-green r05
    "language_confusion_matrix",  # last driver-green r05
    "length_drift_psi",  # last driver-green r05
    "pmi_collocations",  # last driver-green r05
    "split_leakage_check",  # last driver-green r05
    "vocab_growth_curve",  # last driver-green r05
    "weighted_corpus_sample",  # last driver-green r05
    "ann_recall_at_k",  # last driver-green r06
    "bpe_train_merges",  # last driver-green r06
    "brand_price_qty_regression",  # last driver-green r06
    "copurchase_recommendations",  # last driver-green r06
    "cross_domain_neardup_matrix",  # last driver-green r06
    "curriculum_order_plan",  # last driver-green r06
    "data_quality_checks",  # last driver-green r06
    "dataset_card_stats",  # last driver-green r06
]
# Length AND uniqueness (ADVICE r07: a duplicate name would silently
# shrink the effective driver gate below 50 unique queries — the
# round-3 lost-slot failure class).
assert len(_GATE_FIRST_50) == 50, len(_GATE_FIRST_50)
assert len(set(_GATE_FIRST_50)) == 50, "duplicate gate window entry"
_GATE_PRIORITY = _GATE_FIRST_50

# The never-driver-gated backlog is EMPTY: round 10's window rotates
# the final 21 round-6 additions through the driver, closing the
# cumulative ledger at 346/346 — every registered query driver-proven.
# The registry is declared complete at 346 (COVERAGE.md r10 close-out
# plan); any future registration must be ledgered here AND fit the
# standing budget rule (registrations per round ≤ 50 − backlog burned −
# mandatory canaries), so the backlog can never compound again.
_NEXT_ROTATION: list[str] = []


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
