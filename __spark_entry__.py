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
# The changed list is the r14 engine diff: the session-cache
# registration/sweep hardening (ADVICE r13 — identity-guarded
# register_session_cache + key-shape validation in
# dedup._evict_dead_sessions, commit 50f7230) — every registry consumer
# of the occupancy-screened operators (dedup.minhash_lsh_pairs,
# dedup.simhash_pairs, similarity.embedding_lsh_pairs) re-gates; the
# rotation fill resumes at the r03 evidence tail. Every entry,
# regardless of position, is oracle-verified locally at sf0.01 by
# tools/local_gate.py and at sf0.001 by tests/test_oracle_parity.py.
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
    "embedding_quantize_stats",  # last driver-green r03
    "graph_triangle_counts",  # last driver-green r03
    "streaming_session_events",  # last driver-green r03
    "corpus_shard_manifest",  # last driver-green r04
    "dedup_span_stats",  # last driver-green r04
    "events_group_sample",  # last driver-green r04
    "text_quality_score",  # last driver-green r04
    "quality_signal_ensemble",  # last driver-green r05
    "customer_top_percentile_share",  # last driver-green r07
    "doc_char_entropy",  # last driver-green r07
    "orders_pareto_skyline",  # last driver-green r07
    "source_js_divergence",  # last driver-green r07
    "lineitem_correlation_matrix",  # last driver-green r08
    "nation_revenue_hhi",  # last driver-green r08
    "part_brand_type_cramers_v",  # last driver-green r08
    "retrieval_ndcg_eval",  # last driver-green r08
    "returnflag_qty_discount_spearman",  # last driver-green r08
    "term_burstiness",  # last driver-green r08
    "bm25_tfidf_rank_agreement",  # last driver-green r09
    "language_id_margin",  # last driver-green r09
    "multimodal_audio_energy_windows",  # last driver-green r09
    "supplier_share_shift",  # last driver-green r09
    "asof_latest_high_value",  # last driver-green r10
    "bpe_apply_merge_stats",  # last driver-green r10
    "domain_mixture_weights",  # last driver-green r10
    "hybrid_rrf_retrieval",  # last driver-green r10
    "identifier_detection",  # last driver-green r10
    "model_v01_file_schemas",  # last driver-green r10
    "node_export_customer",  # last driver-green r10
    "pattern_discovery",  # last driver-green r10
    "q1_pricing_summary",  # last driver-green r10
    "q21_sole_late_supplier",  # last driver-green r10
    "q7_nation_volume_shipping",  # last driver-green r10
    "rel_export_order_contains_part",  # last driver-green r10
    "schema_union",  # last driver-green r10
    "type_inference_samples",  # last driver-green r10
    "uniqueness_profile_customer",  # last driver-green r10
    "bigram_next_token_topk",  # last driver-green r11
    "contamination_check",  # last driver-green r11
    "cube_orders_by_priority_status",  # last driver-green r11
    "customers_with_open_orders",  # last driver-green r11
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
