"""Gate-window invariants for ``__spark_entry__.queries()``.

The external driver evaluates exactly the first 50 entries (COVERAGE.md).
Round 3 lost a slot to an off-by-one (51 names before the rotation
marker, so ``skewed_join_hot_suppliers`` fell outside the window —
ADVICE r03). These tests pin the boundary and the rotation's intent.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from neo4j_database_to_data_importer_package_spark import registry

REPO = os.path.dirname(os.path.abspath(entrymod.__file__))


def _driver_green(path):
    with open(path) as f:
        rows = json.load(f)
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
    50-slot window in some round: r01-r03 gated keys ∪ this window must
    equal the full registry, except queries added after the window froze
    — those must be explicitly ledgered in ``_NEXT_ROTATION`` (and rotate
    in next round)."""
    gated_before = set()
    for r in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        with open(os.path.join(REPO, r)) as f:
            gated_before |= set(json.load(f))
    window = set(entrymod._GATE_FIRST_50)
    never = set(registry.QUERIES) - gated_before - window
    unledgered = never - set(entrymod._NEXT_ROTATION)
    assert not unledgered, (
        f"never driver-gated, not in this window, not ledgered for the "
        f"next rotation: {sorted(unledgered)}"
    )
    stale = set(entrymod._NEXT_ROTATION) & (gated_before | window)
    assert not stale, f"_NEXT_ROTATION entries already gated/windowed: {sorted(stale)}"


def test_window_regates_all_round3_reds():
    with open(os.path.join(REPO, "CORRECTNESS_r03.json")) as f:
        r3 = json.load(f)
    reds = {
        k
        for k, v in r3.items()
        if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    }
    missing = reds - set(entrymod._GATE_FIRST_50)
    assert not missing, f"round-3 red rows not re-gated: {sorted(missing)}"


def test_window_keeps_canary_regression_signal():
    """ADVICE r03: keep some already-green queries inside the window so a
    regression in rotated-out code is driver-visible."""
    green12 = _driver_green(os.path.join(REPO, "CORRECTNESS_r01.json")) | _driver_green(
        os.path.join(REPO, "CORRECTNESS_r02.json")
    )
    canaries = green12 & set(entrymod._GATE_FIRST_50)
    assert len(canaries) >= 15, sorted(canaries)
