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


def test_schema_union_sampled_rate_one_equals_full(spark):
    """At sample_rate=1.0 the sampled metadata scan must equal the full
    scan; at a partial rate it must be a subset (apoc-style caveat)."""
    from neo4j_database_to_data_importer_package_spark.operators.schema_union import (
        schema_union_map,
        schema_union_map_sampled,
    )
    from neo4j_database_to_data_importer_package_spark.sources.property_graph import (
        nodes_from_view,
    )
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        load_graph_view,
    )

    nodes = nodes_from_view(load_graph_view(spark, "/root/testdata/sf0.001"))
    full = {tuple(r) for r in schema_union_map(nodes).collect()}
    assert {tuple(r) for r in schema_union_map_sampled(nodes, 1.0).collect()} == full
    part = {tuple(r) for r in schema_union_map_sampled(nodes, 0.2).collect()}
    assert part <= full and part


def test_repetition_stats_matches_python_reference(spark):
    """Run-length formulation must agree with a direct Python computation
    of the Gopher statistics on a crafted repetitive document."""
    import math

    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        repetition_stats,
    )

    words = ["spam", "spam", "eggs", "spam", "spam", "ham", "eggs", "spam"]
    doc = " ".join(words)
    row = repetition_stats(
        spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ).collect()[0]

    g2 = [" ".join(words[i : i + 2]) for i in range(len(words) - 1)]
    g3 = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    top2 = max(g2.count(g) for g in set(g2))
    counts = [words.count(w) for w in set(words)]
    n = len(words)
    ent = -sum((c / n) * math.log2(c / n) for c in counts)

    assert row["n_2grams"] == len(g2)
    assert row["dup_2gram_ratio"] == round((len(g2) - len(set(g2))) / len(g2), 6)
    assert row["dup_3gram_ratio"] == round((len(g3) - len(set(g3))) / len(g3), 6)
    assert row["top_2gram_share"] == round(top2 / len(g2), 6)
    assert abs(row["token_entropy"] - ent) < 1e-6


def test_bpe_merge_candidates_known_corpus(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        bpe_merge_candidates,
    )

    # "aaab aaab ab" → in-word pairs: aa,aa,ab ×2 (from aaab) + ab ×1
    df = spark.createDataFrame([(1, "aaab aaab ab"), (2, "x")], "doc_id long, text string")
    got = {r["pair"]: r["cnt"] for r in bpe_merge_candidates(df, top_k=5).collect()}
    assert got == {"aa": 4, "ab": 3}  # single-char word contributes nothing


@given(
    bits=st.integers(min_value=2, max_value=256),
    n=st.integers(min_value=0, max_value=10**12),
    target=st.integers(min_value=1, max_value=4096),
    min_blocks=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=300, deadline=None)
def test_derive_simhash_block_bits_laws(bits, n, target, min_blocks):
    """Property laws for the corpus-sized SimHash geometry (round 12):
    bounds, monotone widening in corpus size, monotone narrowing in
    target occupancy — a law violation would mean plan flapping or a
    geometry the blocker rejects."""
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        derive_simhash_block_bits,
    )

    w = derive_simhash_block_bits(
        n, bits=bits, target_occupancy=target, min_blocks=min_blocks
    )
    assert 1 <= w <= bits // 2
    # monotone non-decreasing in corpus size
    w2 = derive_simhash_block_bits(
        2 * n + 1, bits=bits, target_occupancy=target, min_blocks=min_blocks
    )
    assert w2 >= w
    # a laxer occupancy target never widens the block
    w3 = derive_simhash_block_bits(
        n, bits=bits, target_occupancy=2 * target, min_blocks=min_blocks
    )
    assert w3 <= w
