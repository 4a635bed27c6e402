"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.

Round-6 rotation: the window is the 28 round-5 post-freeze additions
(the r05 ``_NEXT_ROTATION`` ledger) + 22 driver-green canaries, closing
the cumulative driver-gated ledger at the full 191-query registry as of
the round-5 freeze. Queries registered this round append to the (empty
at freeze) ``_NEXT_ROTATION`` ledger per COVERAGE.md's standing rule.
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


def test_window_includes_entire_r05_rotation_ledger():
    """VERDICT r05 directive #1: the 28 queries ledgered as the round-5
    ``_NEXT_ROTATION`` (committed in the r05 tree; reproduced here) must
    all sit inside the round-6 window — closing the cumulative driver
    ledger at 191/191."""
    r05_ledger = {
        "model_v3_table_schemas", "term_zipf_fit", "language_script_stats",
        "domain_term_entropy", "events_cusum_drift", "curriculum_order_plan",
        "cross_domain_neardup_matrix", "embedding_dim_quantiles",
        "dataset_card_stats", "graph_closeness_sampled", "bpe_train_merges",
        "embedding_ivf_pq_topk", "copurchase_recommendations",
        "events_markov_transitions", "events_first_touch_attribution",
        "streaming_cusum_drift", "data_quality_checks",
        "user_sequence_anomaly", "embedding_matryoshka_audit",
        "embedding_pca_power_iteration", "vocab_coverage_curve",
        "graph_walk_corpus", "brand_price_qty_regression",
        "embedding_cluster_purity", "graph_assortativity",
        "graph_clustering_coefficients", "events_active_user_curves",
        "dedup_containment_pairs",
    }
    assert len(r05_ledger) == 28
    missing = r05_ledger - set(entrymod._GATE_FIRST_50)
    assert not missing, f"r05 rotation entries not in the r06 window: {sorted(missing)}"


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green = set()
    for r in _CORRECTNESS_FILES:
        green |= _driver_green(_load(r))
    canaries = green & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 22, sorted(canaries)
