"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.

Round-10 rotation (VERDICT r09 directive #1): the window is the final
21 entries of the round-9 ``_NEXT_ROTATION`` ledger (verbatim order)
and the 29 family-spanning driver-green canaries from COVERAGE.md's
r10 close-out plan — closing the cumulative driver-gated ledger at
346/346, every registered query driver-proven. The registry is
declared complete at 346; any future registration must be ledgered in
``_NEXT_ROTATION`` and fit the standing budget rule.
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
    "CORRECTNESS_r09.json",
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


def test_window_is_the_full_r09_rotation_ledger():
    """VERDICT r09 directive #1: the final 21 never-driver-gated
    entries (the round-9 ``_NEXT_ROTATION`` ledger, committed in the
    r09 tree cea835f — reproduced here verbatim) must open this
    round's window, in order, before the canaries. This rotation
    closes the ledger: cumulative driver-gated union = 346/346."""
    r09_ledger = [
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
    assert len(r09_ledger) == 21
    assert entrymod._GATE_FIRST_50[:21] == r09_ledger


def test_ledger_is_closed():
    """VERDICT r09 directive #1: this rotation clears the backlog — the
    union of all prior driver CORRECTNESS keys plus this window must be
    the ENTIRE registry, and ``_NEXT_ROTATION`` must be empty (registry
    declared complete at 346 per COVERAGE.md's close-out plan)."""
    assert entrymod._NEXT_ROTATION == []
    gated = set(entrymod._GATE_FIRST_50)
    for r in _CORRECTNESS_FILES:
        gated |= set(_load(r))
    assert gated >= set(registry.QUERIES), sorted(set(registry.QUERIES) - gated)


def test_window_regates_the_simhash_queries():
    """The SimHash block geometry is parameterized this round (VERDICT
    r09 directive #2 — wider signatures, corpus-sized blocks, Hamming
    verify); both queries on that code path must re-face the driver."""
    assert "dedup_simhash_signatures" in entrymod._GATE_FIRST_50
    assert "dedup_simhash_pairs" in entrymod._GATE_FIRST_50


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green = set()
    for r in _CORRECTNESS_FILES:
        green |= _driver_green(_load(r))
    canaries = green & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 5, sorted(canaries)
