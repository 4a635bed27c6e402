"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.

Round-5 rotation: the window is the 40 round-4 post-freeze additions
(the r04 ``_NEXT_ROTATION`` ledger) + 10 driver-green canaries, closing
the cumulative driver-gated ledger at the full registry.
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
    50-slot window in some round: r01-r04 gated keys ∪ this window must
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
    (Round 4 had zero reds — this keeps the invariant enforced anyway.)"""
    latest = _load(_CORRECTNESS_FILES[-1])
    reds = set(latest) - _driver_green(latest)
    missing = reds - set(entrymod._GATE_FIRST_50)
    assert not missing, f"prior-round red rows not re-gated: {sorted(missing)}"


def test_window_includes_entire_r04_rotation_ledger():
    """VERDICT r04 directive #1: the 40 queries ledgered as the round-4
    ``_NEXT_ROTATION`` (committed in the r04 tree; reproduced here) must
    all sit inside the round-5 window."""
    r04_ledger = {
        "bpe_apply_merge_stats", "vocab_growth_curve",
        "domain_quality_percentiles", "part_copurchase_topk",
        "graph_label_propagation", "streaming_moment_stats",
        "dedup_incremental_near_dup", "domain_mixture_weights",
        "embedding_ivf_cell_stats", "ann_recall_at_k",
        "cms_term_estimates", "events_retention_cohorts",
        "customer_rfm_segments", "bigram_perplexity_heldout",
        "basket_association_rules", "embedding_pq_audit",
        "embedding_dim_stats", "embedding_norm_outliers",
        "weighted_corpus_sample", "doc_length_buckets",
        "part_name_linkage", "events_scd2_state", "events_mad_outliers",
        "graph_hits_scores", "pmi_collocations",
        "quality_classifier_score", "embedding_centroid_outliers",
        "dedup_prefix_survivorship", "dedup_minhash_calibration",
        "language_confusion_matrix", "split_leakage_check",
        "streaming_sliding_events", "streaming_topk_users",
        "hybrid_rrf_retrieval", "streaming_funnel_state",
        "epoch_mixture_plan", "length_drift_psi",
        "graph_personalized_pagerank", "quality_signal_ensemble",
        "events_hourly_profile",
    }
    assert len(r04_ledger) == 40
    missing = r04_ledger - set(entrymod._GATE_FIRST_50)
    assert not missing, f"r04 rotation entries not in the r05 window: {sorted(missing)}"


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green = set()
    for r in _CORRECTNESS_FILES:
        green |= _driver_green(_load(r))
    canaries = green & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 10, sorted(canaries)
