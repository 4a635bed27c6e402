"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.

Round-11 window (VERDICT r10 directive #1, first steady-state round):
the cumulative driver ledger closed at 346/346 in round 10, so the
window is canaries only — composed by ``tools/steady_window.py`` per
COVERAGE.md's rounds-11+ rule (prior reds → changed-path re-gates →
oldest-evidence family rotation) and used verbatim; the proposal
equality is pinned below. The registry stays frozen at 346; any future
registration must be ledgered in ``_NEXT_ROTATION`` and fit the
standing budget rule.
"""

from __future__ import annotations

import importlib.util
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
    "CORRECTNESS_r10.json",
    "CORRECTNESS_r11.json",
    "CORRECTNESS_r12.json",
    "CORRECTNESS_r13.json",
    "CORRECTNESS_r14.json",
)

# The r15 engine diff's mandatory re-gates (same list the proposer was
# run with): the 17 paths the r14 optimization touched after that
# round's window froze (VERDICT r14 directive #2) plus
# graph_connected_components (same r14 CC fusion), then the r15
# optimization diff (incremental k-core, fused percolation CC loop,
# SCC fixpoint exit, PCA persist, CMS one-pass).
_R15_CHANGED = [
    "graph_pagerank",
    "graph_personalized_pagerank",
    "graph_katz_centrality",
    "graph_spectral_radius",
    "graph_label_propagation",
    "graph_hits_scores",
    "graph_shortest_hops",
    "graph_modularity_lpa",
    "graph_adamic_adar",
    "graph_bfs_hops",
    "graph_connected_components",
    "dedup_minhash_calibration",
    "graph_type_mixing_matrix",
    "graph_neighbor_jaccard",
    "graph_edge_triangle_support",
    "dedup_ngram_jaccard",
    "dedup_containment_pairs",
    "supplier_dual_sourcing_overlap",
    "embedding_jl_distortion",
    "graph_percolation_robustness",
    "graph_k_core",
    "events_dominant_transition_scc",
    "embedding_pca_power_iteration",
    "cms_term_estimates",
]


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


def test_window_matches_steady_state_proposal():
    """VERDICT r11 directive #2: the steady-state window must
    provably equal tools/steady_window.py's composition from the real
    CORRECTNESS ledger with this round's changed-path list — the
    governance built in round 10 actually steering the round, with no
    unexplained author swaps."""
    spec = importlib.util.spec_from_file_location(
        "steady_window", os.path.join(REPO, "tools", "steady_window.py")
    )
    sw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sw)
    greens, reds_last = sw.load_ledger(
        [os.path.join(REPO, f) for f in _CORRECTNESS_FILES]
    )
    proposal = sw.propose_window(
        list(entrymod.queries()), greens, reds_last, _R15_CHANGED, slots=50
    )
    assert entrymod._GATE_FIRST_50 == proposal


def test_window_opens_with_changed_path_regates():
    """r14 had zero reds, so the changed-path re-gates lead the window,
    in the order given to the proposer."""
    assert entrymod._GATE_FIRST_50[: len(_R15_CHANGED)] == _R15_CHANGED


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


def test_window_regates_the_changed_paths():
    """Every query whose shared code path the r14 diff touched (the
    hardened session-cache registration and sweep behind the occupancy
    screens) must re-face the driver this round."""
    for name in _R15_CHANGED:
        assert name in entrymod._GATE_FIRST_50, name


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green = set()
    for r in _CORRECTNESS_FILES:
        green |= _driver_green(_load(r))
    canaries = green & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 5, sorted(canaries)
