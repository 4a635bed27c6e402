"""Property-based tests (Hypothesis) — SURVEY.md §5.2 layer 4.

These pin the *driver-side* invariants with randomized inputs:

- the JVM-side regex grammar used by ``infer_type_col`` agrees with
  Python's ``int()``/``float()`` acceptance (the reference's semantics,
  ``neo4j_export.py:1221-1244``) over the ASCII value space — so the
  distributed and driver implementations can never drift apart silently.
  (Known, documented divergence: Python's numeric parser also accepts
  non-ASCII unicode digits; the engine scopes parity to ASCII data.)
- identifier-cascade tiers 1-3/5 and column ordering (pure functions).

Spark-cluster invariants (tier-4 uniqueness, export row preservation)
are covered by the deterministic fixture tests; Hypothesis here stays
JVM-free so thousands of examples run in milliseconds.
"""

from __future__ import annotations

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_database_to_data_importer_package_spark.functions.type_inference import (
    _FLOAT_RE,
    _INT_RE,
    infer_type,
)
from neo4j_database_to_data_importer_package_spark.operators.node_export import (
    ordered_columns,
)

# ---------------------------------------------------------------------------
# Grammar parity: JVM regex ⟺ Python parse
# ---------------------------------------------------------------------------

ascii_text = st.text(alphabet=string.printable, max_size=30)
# Adversarial numeric-ish strings: the shapes where a hand-written grammar
# most plausibly diverges from CPython's lexer.
numericish = st.text(
    alphabet=list("0123456789_+-.eEinfatyNA xX"), max_size=20
)


def _py_int_ok(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


def _py_float_ok(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


@settings(max_examples=2000)
@given(st.one_of(ascii_text, numericish))
def test_int_regex_matches_python_int(s):
    assert bool(re.match(_INT_RE, s)) == _py_int_ok(s), repr(s)


@settings(max_examples=2000)
@given(st.one_of(ascii_text, numericish))
def test_float_regex_matches_python_float(s):
    assert bool(re.match(_FLOAT_RE, s)) == _py_float_ok(s), repr(s)


@settings(max_examples=1000)
@given(st.one_of(ascii_text, numericish))
def test_infer_type_precedence_is_total_and_lawful(s):
    t = infer_type(s)
    assert t in {"integer", "float", "boolean", "string"}
    if not s or s == "NULL":
        assert t == "string"
    elif _py_int_ok(s):
        assert t == "integer"
    elif _py_float_ok(s):
        assert t == "float"
    elif s.lower() in ("true", "false"):
        assert t == "boolean"
    else:
        assert t == "string"


# ---------------------------------------------------------------------------
# Identifier cascade, driver tiers (1-3, 5)
# ---------------------------------------------------------------------------

prop_name = st.text(
    alphabet=string.ascii_letters + string.digits + "_", min_size=1, max_size=12
)
prop_lists = st.lists(prop_name, min_size=1, max_size=8, unique=True)


def _cascade_no_data(properties, unique_constraints, label="L"):
    """Tiers 1-3 and 5 never touch data — call with df=None to prove it."""
    from neo4j_database_to_data_importer_package_spark.operators.identifier import (
        determine_identifier,
    )

    return determine_identifier(None, label, properties, unique_constraints)


@settings(max_examples=300)
@given(prop_lists, prop_name)
def test_tier1_constraint_always_wins(props, constrained):
    ident = _cascade_no_data(props, {"L": [constrained]})
    assert ident == constrained


@settings(max_examples=300)
@given(prop_lists)
def test_tier2_exact_id_beats_suffix(props):
    # Inject both an exact 'id' (some casing) and an 'xid' suffix.
    augmented = ["ID", "xid"] + [p for p in props if p.lower() not in ("id", "xid")]
    ident = _cascade_no_data(augmented, {})
    assert ident.lower() == "id"


@settings(max_examples=300)
@given(prop_lists)
def test_tier3_ranks_by_length_among_id_suffixed(props):
    cands = [p for p in props if p.lower().endswith("id")]
    if not any(p.lower().endswith("id") for p in props):
        props = props + ["long_uid", "uid"]
        cands = ["long_uid", "uid"]
    if any(p.lower() == "id" for p in props):
        return  # tier 2 territory
    ident = _cascade_no_data(props, {})
    assert ident in cands
    assert len(ident) == min(len(c) for c in cands)


@settings(max_examples=300)
@given(prop_lists, st.integers(min_value=0, max_value=7))
def test_ordered_columns_identifier_first_rest_sorted(props, idx):
    ident = props[idx % len(props)]
    cols = ordered_columns(props, ident)
    assert cols[0] == ident
    assert cols[1:] == sorted(p for p in props if p != ident)
    assert set(cols) == set(props)
