"""Pin the steady-state window proposer (tools/steady_window.py) to
COVERAGE.md's rounds-11+ composition rule: prior-round reds first, then
changed-path re-gates, then an oldest-driver-evidence rotation that
round-robins across families. The function is pure so the rule is
testable without a ledger on disk."""

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "steady_window",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "steady_window.py",
    ),
)
sw = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sw)


REGISTRY = [
    "graph_a", "graph_b", "graph_c",
    "dedup_a", "dedup_b",
    "events_a", "events_b",
    "orders_a",
]
GREENS = {
    "graph_a": 6, "graph_b": 9, "graph_c": 7,
    "dedup_a": 8, "dedup_b": 6,
    "events_a": 7, "events_b": 9,
    "orders_a": 6,
}


def test_priority_order_reds_then_changed_then_rotation():
    window = sw.propose_window(
        REGISTRY, GREENS, reds_last={"events_b"}, changed=["graph_b"], slots=5
    )
    assert window[0] == "events_b"  # prior-round red re-gates first
    assert window[1] == "graph_b"  # then the changed path
    # rotation fill: stalest (r06) members first, one per family before
    # any family repeats — dedup_b(6), graph_a(6), orders_a(6) are the
    # r06 cohort across three distinct families
    assert set(window[2:]) == {"dedup_b", "graph_a", "orders_a"}
    assert len(window) == 5 == len(set(window))


def test_family_round_robin_spans_before_repeating():
    window = sw.propose_window(REGISTRY, GREENS, set(), [], slots=4)
    # four slots, four families — no family twice while another waits
    assert len({sw.family(n) for n in window}) == 4


def test_never_gated_query_sorts_first():
    greens = dict(GREENS)
    del greens["orders_a"]  # registered but never driver-green
    window = sw.propose_window(REGISTRY, greens, set(), [], slots=1)
    assert window == ["orders_a"]


def test_changed_name_not_in_registry_rejected():
    with pytest.raises(ValueError, match="not in the registry"):
        sw.propose_window(REGISTRY, GREENS, set(), ["nope_x"], slots=5)


def test_red_also_changed_not_duplicated():
    window = sw.propose_window(
        REGISTRY, GREENS, reds_last={"graph_b"}, changed=["graph_b"], slots=3
    )
    assert window.count("graph_b") == 1 and len(window) == 3


def test_row_green_matches_ledger_semantics():
    assert sw.row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    )
    # rows-only check (no oracle): hash_match None still counts green
    assert sw.row_green(
        {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}
    )
    assert not sw.row_green(
        {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    )
    assert not sw.row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": "boom"}
    )


def test_ghost_red_skipped_with_warning(capsys):
    """ADVICE r10: a prior-round red whose query has since been
    renamed/removed must not emit a nonexistent name into the window —
    it is dropped with a stderr warning instead."""
    window = sw.propose_window(
        REGISTRY, GREENS, reds_last={"events_b", "renamed_away"}, changed=[],
        slots=3,
    )
    assert "renamed_away" not in window
    assert window[0] == "events_b"  # the real red still leads
    assert "renamed_away" in capsys.readouterr().err


def test_zero_slot_window_is_empty():
    """slots=0 (or an empty registry) must yield an empty proposal, not
    an exception — the --json stalest_round guard depends on it."""
    assert sw.propose_window(REGISTRY, GREENS, set(), [], slots=0) == []
    assert sw.propose_window([], {}, set(), [], slots=50) == []
