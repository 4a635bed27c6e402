"""Regression tests for the gate replica's canonicalization.

Round 3 (VERDICT #4): ``tools/local_gate.py`` canonicalized floats with
``%.6g`` — 6 significant digits — which collapses cent-level differences
on 7-digit revenues, so the local replica reported 122/122 MATCH while
the driver reported 5 reds. A local gate that cannot reproduce a driver
failure is not evidence; these tests pin the hardened behavior:

- repr-precision floats (the exact r03 q7 failure pair must differ),
- Decimal normalization (DuckDB DECIMAL columns compare by value),
- HUGEINT screening (every r03 driver red had a HUGEINT oracle column).

The live reproduction was run once against the round-3 tree via a git
worktree: the hardened gate flagged exactly the 5 driver reds
(q7 value-mismatch; q12/span/contamination/oov hugeint) that the old
canon passed.
"""

from __future__ import annotations

import decimal

from tools.local_gate import canon, canonical_rows


def test_cent_difference_on_seven_digit_revenue_distinguishes():
    # The actual r03 q7 failing pair: 7-digit revenue, one-cent drift.
    # Under %.6g both rendered '634186' — invisible. repr keeps them apart.
    assert canon(634185.80) != canon(634185.79)


def test_repr_roundtrip_precision():
    assert canon(0.1 + 0.2) == repr(0.30000000000000004)
    assert canon(1.0) == "1.0"
    assert canon(float("nan")) == "NaN"


def test_decimal_normalizes_to_python_number():
    assert canon(decimal.Decimal("634185.80")) == canon(634185.80)
    assert canon(decimal.Decimal("42")) == canon(42)


def test_none_bool_and_collections():
    assert canon(None) == "∅"
    assert canon(True) == "True"
    assert canon([1.5, None]) == "[1.5,∅]"


def test_canonical_rows_column_order_insensitive():
    a = canonical_rows(["b", "a"], [(2.0, 1)])
    b = canonical_rows(["a", "b"], [(1, 2.0)])
    assert a == b
