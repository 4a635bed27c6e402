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
# dict. Round 13 is the third steady-state window (COVERAGE.md "Steady
# state (rounds 11+, ledger closed)"; VERDICT r12 directive #1): the
# cumulative driver ledger stays closed at 346/346, so the window is
# canaries only, composed by tools/steady_window.py from the
# CORRECTNESS ledger — prior-round reds first (r12 had none), then the
# round's changed-path re-gates, then the oldest-driver-evidence
# rotation round-robining across families. This round's proposer run:
#   python tools/steady_window.py --changed dedup_minhash_lsh_pairs,\
#     dedup_near_dup_clusters,dedup_cluster_representatives,\
#     dedup_rate_projection,split_leakage_check,\
#     cross_domain_neardup_matrix,dedup_simhash_pairs,\
#     embedding_lsh_pairs,embedding_near_dup_clusters
# used VERBATIM (no author swaps; pinned by
# tests/test_gate_priority.py::test_window_matches_steady_state_proposal).
# The changed list is the r13 engine diff: the dead-session sweep for
# similarity's _RECORDED_N_HOT moved into dedup._evict_dead_sessions,
# the shared lifecycle point (ADVICE r12, commit 22224de) — every
# registry consumer of the occupancy-screened operators
# (dedup.minhash_lsh_pairs, dedup.simhash_pairs,
# similarity.embedding_lsh_pairs) re-gates. Every entry, regardless of
# position, is oracle-verified locally at sf0.01 by tools/local_gate.py
# and at sf0.001 by tests/test_oracle_parity.py.
_GATE_FIRST_50 = [
    "dedup_minhash_lsh_pairs",  # changed path
    "dedup_near_dup_clusters",  # changed path
    "dedup_cluster_representatives",  # changed path
    "dedup_rate_projection",  # changed path
    "split_leakage_check",  # changed path
    "cross_domain_neardup_matrix",  # changed path
    "dedup_simhash_pairs",  # changed path
    "embedding_lsh_pairs",  # changed path
    "embedding_near_dup_clusters",  # changed path
    "events_json_props",  # last driver-green r02
    "rel_export_order_supplied_by_supplier",  # last driver-green r02
    "window_tumbling_events",  # last driver-green r02
    "dedup_incremental_batch",  # last driver-green r03
    "embedding_kmeans_step",  # last driver-green r03
    "graph_k_core",  # last driver-green r03
    "streaming_kmv_distinct_users",  # last driver-green r03
    "text_repetition_stats",  # last driver-green r03
    "corpus_hash_sample",  # last driver-green r04
    "lineitem_column_profile",  # last driver-green r04
    "customer_rfm_segments",  # last driver-green r05
    "doc_length_buckets",  # last driver-green r05
    "part_copurchase_topk",  # last driver-green r05
    "quality_classifier_score",  # last driver-green r05
    "domain_term_entropy",  # last driver-green r06
    "language_script_stats",  # last driver-green r06
    "term_zipf_fit",  # last driver-green r06
    "user_sequence_anomaly",  # last driver-green r06
    "vocab_coverage_curve",  # last driver-green r06
    "ann_recall_curve",  # last driver-green r07
    "kmv_audience_overlap",  # last driver-green r07
    "lang_token_budget_plan",  # last driver-green r07
    "orders_monthly_seasonality",  # last driver-green r07
    "source_gini_concentration",  # last driver-green r07
    "tokenizer_fertility_by_lang",  # last driver-green r07
    "bloom_filter_fp_audit",  # last driver-green r08
    "brand_return_wilson",  # last driver-green r08
    "join_key_skew_profile",  # last driver-green r08
    "lexical_diversity_by_source",  # last driver-green r08
    "nation_customer_median_ltv",  # last driver-green r08
    "order_total_reconciliation",  # last driver-green r08
    "posting_list_stats",  # last driver-green r08
    "retrieval_mrr_eval",  # last driver-green r08
    "returnflag_qty_discount_kendall",  # last driver-green r08
    "supplier_delay_trend",  # last driver-green r08
    "bm25_prf_expansion",  # last driver-green r09
    "ccnet_perplexity_buckets",  # last driver-green r09
    "dsir_importance_weights",  # last driver-green r09
    "kneser_ney_bigram_score",  # last driver-green r09
    "multimodal_ahash_near_dup",  # last driver-green r09
    "token_length_histogram",  # last driver-green r09
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
