"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.

Round-9 rotation (VERDICT r08 directive #1): the window is the oldest
45 of the 66-entry round-8 ``_NEXT_ROTATION`` ledger (verbatim order)
and 5 driver-green canaries — growing the cumulative driver-gated
ledger 280 -> 325 with the final 21 backlogged entries staying in
``_NEXT_ROTATION`` for round 10, which closes the ledger. Registry
growth is frozen until the backlog clears (r07 directive #8 / r08
directive #1); any query registered this round must append to the
ledger per COVERAGE.md's rule.
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
    "CORRECTNESS_r08.json",
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


def test_window_is_the_oldest_45_of_the_r08_rotation_ledger():
    """VERDICT r08 directive #1: rotate the never-driver-gated backlog
    oldest-first. The round-8 ``_NEXT_ROTATION`` ledger (66 names,
    committed in the r08 tree 3711e6e — its 45-name prefix reproduced
    here) must open this round's window, in order, before the
    canaries."""
    r08_prefix = [
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
    ]
    assert len(r08_prefix) == 45
    assert entrymod._GATE_FIRST_50[:45] == r08_prefix


def test_backlog_closes_next_round():
    """VERDICT r08 directive #1: after this rotation the backlog must be
    exactly 21 entries, so the 50-slot round-10 window (21 + up to 5
    canaries) clears the ledger with slots to spare."""
    assert len(entrymod._NEXT_ROTATION) == 21


def test_window_regates_the_eviction_streaming_query():
    """The eviction replay harness is re-tuned this round (VERDICT r08
    directive #3 — fewer replay chunks, tighter trigger interval); the
    query whose wall-clock and stop path that changes must re-face the
    driver as the streaming canary."""
    assert "streaming_daily_rollup_evicted" in entrymod._GATE_FIRST_50


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green = set()
    for r in _CORRECTNESS_FILES:
        green |= _driver_green(_load(r))
    canaries = green & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 5, sorted(canaries)
