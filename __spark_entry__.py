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
# dict. Round 11 is the first STEADY-STATE window (COVERAGE.md "Steady
# state (rounds 11+, ledger closed)"; VERDICT r10 directive #1): the
# cumulative driver ledger closed at 346/346 in round 10, so the window
# is canaries only, composed by tools/steady_window.py from the
# CORRECTNESS ledger — prior-round reds first (r10 had none), then the
# round's changed-path re-gates, then the oldest-driver-evidence
# rotation round-robining across families. This round's proposer run:
#   python tools/steady_window.py --changed dedup_simhash_signatures,\
#     dedup_simhash_pairs,embedding_lsh_pairs,embedding_near_dup_clusters
# used VERBATIM (no author swaps; pinned by
# tests/test_gate_priority.py::test_window_matches_steady_state_proposal).
# The changed list is the r11 engine diff: the SimHash nibble
# decomposition + derived-geometry cap (operators/dedup.py) re-gates
# both SimHash queries, and the similarity screen's pre-checkpoint
# plan-key fix (operators/similarity.py) re-gates both embedding LSH
# consumers. Every entry, regardless of position, is oracle-verified
# locally at sf0.01 by tools/local_gate.py and at sf0.001 by
# tests/test_oracle_parity.py.
_GATE_FIRST_50 = [
    "dedup_simhash_signatures",  # changed path
    "dedup_simhash_pairs",  # changed path
    "embedding_lsh_pairs",  # changed path
    "embedding_near_dup_clusters",  # changed path
    "corpus_clean_pipeline",  # last driver-green r02
    "customers_with_open_orders",  # last driver-green r02
    "dedup_minhash_signatures",  # last driver-green r02
    "embedding_cosine_pairs",  # last driver-green r02
    "events_funnel_view_purchase",  # last driver-green r02
    "graph_degrees",  # last driver-green r02
    "lineitem_price_quantiles",  # last driver-green r02
    "multimodal_frame_plan",  # last driver-green r02
    "node_export_orders",  # last driver-green r02
    "orders_without_lineitems",  # last driver-green r02
    "rel_export_customer_placed_order",  # last driver-green r02
    "rollup_revenue_by_flag_status",  # last driver-green r02
    "streaming_running_totals",  # last driver-green r02
    "supplier_part_volume",  # last driver-green r02
    "text_fingerprints",  # last driver-green r02
    "window_session_events",  # last driver-green r02
    "bigram_next_token_topk",  # last driver-green r03
    "bm25_rank_spark_hash_join",  # last driver-green r03
    "doc_chunk_plan",  # last driver-green r03
    "domain_cap_sample",  # last driver-green r03
    "heavy_hitter_terms",  # last driver-green r03
    "kmv_distinct_users_per_type",  # last driver-green r03
    "lang_mixture_stats",  # last driver-green r03
    "pii_scrub_stats",  # last driver-green r03
    "q10_returned_revenue_by_nation",  # last driver-green r03
    "q11_part_volume_concentration",  # last driver-green r03
    "q13_customer_order_distribution",  # last driver-green r03
    "q14_promo_revenue_share",  # last driver-green r03
    "q15_top_supplier",  # last driver-green r03
    "q16_supplier_counts_by_part",  # last driver-green r03
    "q17_small_quantity_revenue",  # last driver-green r03
    "q18_large_volume_orders",  # last driver-green r03
    "q19_disjunctive_predicates",  # last driver-green r03
    "q2_min_cost_supplier",  # last driver-green r03
    "q20_heavy_shippers_of_small_parts",  # last driver-green r03
    "q22_rich_inactive_customers",  # last driver-green r03
    "q4_order_priority",  # last driver-green r03
    "q8_market_share",  # last driver-green r03
    "q9_product_type_profit",  # last driver-green r03
    "schema_union_sampled",  # last driver-green r03
    "sequence_pack_stats",  # last driver-green r03
    "tfidf_top_terms",  # last driver-green r03
    "unigram_logprob_score",  # last driver-green r03
    "bpe_merge_candidates",  # last driver-green r04
    "contamination_check",  # last driver-green r04
    "cube_orders_by_priority_status",  # last driver-green r04
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
