"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.

Round-8 rotation (VERDICT r07 directives #2/#3): the window is the
oldest 42 of the 111-entry round-7 ``_NEXT_ROTATION`` ledger (verbatim
order), the three round-7 ledger-tail additions (which deserve driver
rows per directive #3), and 5 driver-green canaries — growing the
cumulative driver-gated ledger 235 -> 280 with the remaining 66
backlogged entries staying in ``_NEXT_ROTATION`` for round 9.
Registry growth is frozen until the backlog clears (r07 directive #8);
any query registered this round must append to the ledger per
COVERAGE.md's rule.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from neo4j_database_to_data_importer_package_spark import registry

REPO = os.path.dirname(os.path.abspath(entrymod.__file__))

_CORRECTNESS_FILES = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r02.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
    "CORRECTNESS_r06.json",
    "CORRECTNESS_r07.json",
)


def _load(path):
    with open(os.path.join(REPO, path)) as f:
        return json.load(f)


def _driver_green(rows):
    return {
        k
        for k, v in rows.items()
        if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
    }


def test_gate_window_is_exactly_50():
    assert len(entrymod._GATE_FIRST_50) == 50
    assert list(entrymod.queries())[:50] == entrymod._GATE_FIRST_50


def test_no_duplicates_and_all_registered():
    """ADVICE r07: a duplicated window name silently shrinks the
    effective driver gate below 50 unique queries (the round-3
    lost-slot failure class) — pin uniqueness, not just length."""
    names = entrymod._GATE_FIRST_50
    assert len(names) == 50
    assert len(set(names)) == 50
    missing = [n for n in names if n not in registry.QUERIES]
    assert not missing, missing


def test_every_registered_query_appears_exactly_once():
    ordered = list(entrymod.queries())
    assert sorted(ordered) == sorted(registry.QUERIES)
    assert len(ordered) == len(set(ordered))


def test_window_covers_all_never_gated_queries():
    """After this rotation, every registered query has been inside the
    50-slot window in some round: r01-r05 gated keys ∪ this window must
    equal the full registry, except queries added after the window froze
    — those must be explicitly ledgered in ``_NEXT_ROTATION`` (and rotate
    in next round)."""
    gated_before = set()
    for r in _CORRECTNESS_FILES:
        gated_before |= set(_load(r))
    window = set(entrymod._GATE_FIRST_50)
    never = set(registry.QUERIES) - gated_before - window
    unledgered = never - set(entrymod._NEXT_ROTATION)
    assert not unledgered, (
        f"never driver-gated, not in this window, not ledgered for the "
        f"next rotation: {sorted(unledgered)}"
    )
    stale = set(entrymod._NEXT_ROTATION) & (gated_before | window)
    assert not stale, f"_NEXT_ROTATION entries already gated/windowed: {sorted(stale)}"


def test_window_regates_all_prior_round_reds():
    """Any red row from the most recent driver gate must re-gate here.
    (Round 5 had zero reds — this keeps the invariant enforced anyway.)"""
    latest = _load(_CORRECTNESS_FILES[-1])
    reds = set(latest) - _driver_green(latest)
    missing = reds - set(entrymod._GATE_FIRST_50)
    assert not missing, f"prior-round red rows not re-gated: {sorted(missing)}"


def test_window_is_the_oldest_42_of_the_r07_rotation_ledger():
    """VERDICT r07 directive #2: rotate the never-driver-gated backlog
    oldest-first. The round-7 ``_NEXT_ROTATION`` ledger (111 names,
    committed in the r07 tree a59d44e — its 42-name prefix reproduced
    here) must open this round's window, in order, before the round-7
    additions and the canaries."""
    r07_prefix = [
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
    ]
    assert len(r07_prefix) == 42
    assert entrymod._GATE_FIRST_50[:42] == r07_prefix


def test_window_carries_the_three_r07_ledger_tail_additions():
    """VERDICT r07 directive #3: the three round-7 deliverables must
    face the driver this round, immediately after the backlog prefix."""
    assert entrymod._GATE_FIRST_50[42:45] == [
        "model_v24_table_schemas",
        "model_v01_file_schemas",
        "streaming_daily_rollup_evicted",
    ]


def test_window_regates_a_run_stream_to_memory_query():
    """The shared streaming stop path (``_graceful_stop``) changed this
    round (VERDICT r07 directives #1/#6); a batch-registry streaming
    query that goes through ``run_stream_to_memory`` must re-face the
    driver alongside the eviction query."""
    assert "streaming_tumbling_events" in entrymod._GATE_FIRST_50


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green = set()
    for r in _CORRECTNESS_FILES:
        green |= _driver_green(_load(r))
    canaries = green & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 5, sorted(canaries)
