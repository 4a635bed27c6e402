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
# dict. Round 15 is the fifth steady-state window (COVERAGE.md "Steady
# state (rounds 11+, ledger closed)"): the cumulative driver ledger
# stays closed at 346/346, so the window is canaries only, composed by
# tools/steady_window.py from the CORRECTNESS ledger — prior-round reds
# first (r14 had none), then the round's changed-path re-gates, then
# the oldest-driver-evidence rotation round-robining across families.
# This round's changed list (VERDICT r14 directive #2 + the r15 diff)
# leads with the 17 paths the r14 optimization touched AFTER that
# round's window froze — the pagerank-family fused union-aggregates,
# state_broadcaster sites, LSH-literal/calibration rewrites and
# multi-consumer persists that were local-gate-green but never
# driver-verified (graph_pagerank … embedding_jl_distortion below),
# plus graph_connected_components (same r14 fusion, previously covered
# only via its dedup consumers) — then the r15 optimization diff
# (percolation fused CC loop, incremental k-core, SCC fixpoint exit,
# PCA persist, CMS one-pass: graph_percolation_robustness,
# graph_k_core, events_dominant_transition_scc,
# embedding_pca_power_iteration, cms_term_estimates; the three
# storage-level-hardened dedup consumers are already in the r14 17).
# Proposal used VERBATIM (no author swaps; pinned by
# tests/test_gate_priority.py::test_window_matches_steady_state_proposal).
# Every entry, regardless of position, is oracle-verified locally at
# sf0.01 by tools/local_gate.py and at sf0.001 by
# tests/test_oracle_parity.py.
_GATE_FIRST_50 = [
    "graph_pagerank",  # changed path
    "graph_personalized_pagerank",  # changed path
    "graph_katz_centrality",  # changed path
    "graph_spectral_radius",  # changed path
    "graph_label_propagation",  # changed path
    "graph_hits_scores",  # changed path
    "graph_shortest_hops",  # changed path
    "graph_modularity_lpa",  # changed path
    "graph_adamic_adar",  # changed path
    "graph_bfs_hops",  # changed path
    "graph_connected_components",  # changed path
    "dedup_minhash_calibration",  # changed path
    "graph_type_mixing_matrix",  # changed path
    "graph_neighbor_jaccard",  # changed path
    "graph_edge_triangle_support",  # changed path
    "dedup_ngram_jaccard",  # changed path
    "dedup_containment_pairs",  # changed path
    "supplier_dual_sourcing_overlap",  # changed path
    "embedding_jl_distortion",  # changed path
    "graph_percolation_robustness",  # changed path
    "graph_k_core",  # changed path
    "events_dominant_transition_scc",  # changed path
    "embedding_pca_power_iteration",  # changed path
    "cms_term_estimates",  # changed path
    "streaming_signup_purchase_pairs",  # last driver-green r03
    "corpus_snapshot_diff",  # last driver-green r04
    "embedding_label_stats",  # last driver-green r04
    "events_hourly_daily_rollup",  # last driver-green r04
    "dedup_incremental_near_dup",  # last driver-green r05
    "graph_assortativity",  # last driver-green r06
    "doc_length_bootstrap_ci",  # last driver-green r07
    "quality_calibration_bins",  # last driver-green r07
    "source_lang_chi2",  # last driver-green r07
    "customer_k_anonymity",  # last driver-green r08
    "orders_changepoint_day",  # last driver-green r08
    "lineitem_two_way_anova",  # last driver-green r09
    "nation_quarter_yoy",  # last driver-green r09
    "part_recs_coverage_diversity",  # last driver-green r09
    "text_rake_keywords",  # last driver-green r09
    "model_v24_table_schemas",  # last driver-green r10
    "multimodal_features",  # last driver-green r10
    "bm25_rank_spark_hash_join",  # last driver-green r11
    "bpe_merge_candidates",  # last driver-green r11
    "domain_cap_sample",  # last driver-green r11
    "heavy_hitter_terms",  # last driver-green r11
    "kmv_distinct_users_per_type",  # last driver-green r11
    "lang_mixture_stats",  # last driver-green r11
    "node_export_orders",  # last driver-green r11
    "pii_scrub_stats",  # last driver-green r11
    "q10_returned_revenue_by_nation",  # last driver-green r11
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
