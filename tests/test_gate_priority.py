"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.

Round-7 rotation (VERDICT r06 directive #1): the window is the oldest
44 of the 152 round-6 post-freeze additions (the r06 ``_NEXT_ROTATION``
ledger prefix, verbatim order) + 6 driver-green canaries — growing the
cumulative driver-gated ledger 191 -> 235 with the remaining 108
backlogged entries staying in ``_NEXT_ROTATION`` for rounds 8-9.
Registry growth is frozen until the backlog clears; the few queries
registered this round append to the ledger per COVERAGE.md's rule.
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
    names = entrymod._GATE_FIRST_50
    assert len(set(names)) == len(names)
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


def test_window_is_the_oldest_44_of_the_r06_rotation_ledger():
    """VERDICT r06 directive #1: rotate the never-driver-gated backlog
    oldest-first. The round-6 ``_NEXT_ROTATION`` ledger (152 names,
    committed in the r06 tree — its 44-name prefix reproduced here) must
    open this round's window, in order, before the canaries."""
    r06_prefix = [
        "graph_walk_corpus_multi", "graph_modularity_lpa",
        "graph_bridge_edges", "source_gini_concentration",
        "events_winsorized_stats", "doc_length_ks_drift",
        "source_lang_chi2", "source_lang_mutual_information",
        "doc_length_bootstrap_ci", "embedding_semdedup_prune",
        "embedding_knn_label_agreement", "dedup_tfidf_cosine_pairs",
        "events_ewma_daily", "orders_pareto_skyline",
        "customer_top_percentile_share", "events_seasonal_anomalies",
        "events_session_conversion", "dedup_rate_by_source",
        "streaming_ewma_trend", "events_linear_attribution",
        "orders_monthly_seasonality", "events_burst_days",
        "events_churn_hazard", "source_length_bootstrap_ci",
        "events_benford_audit", "embedding_centroid_split_drift",
        "graph_degree_powerlaw_fit", "quality_calibration_bins",
        "kmv_audience_overlap", "tokenizer_fertility_by_lang",
        "dedup_cluster_size_histogram", "events_transition_entropy",
        "doc_length_lang_anova", "doc_char_entropy", "graph_rich_club",
        "embedding_intrinsic_dimension", "events_weekly_autocorrelation",
        "lang_token_budget_plan", "events_funnel_steps",
        "source_js_divergence", "ann_recall_curve",
        "streaming_zscore_extremes", "events_fd_violations",
        "graph_edge_triangle_support",
    ]
    assert len(r06_prefix) == 44
    assert entrymod._GATE_FIRST_50[:44] == r06_prefix


def test_relsh_regates_after_default_change():
    """VERDICT r06 directive #2 changed ``embedding_lsh_pairs``'s
    signature-width defaults; a changed query must re-face the driver."""
    assert "embedding_lsh_pairs" in entrymod._GATE_FIRST_50


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green = set()
    for r in _CORRECTNESS_FILES:
        green |= _driver_green(_load(r))
    canaries = green & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 6, sorted(canaries)
