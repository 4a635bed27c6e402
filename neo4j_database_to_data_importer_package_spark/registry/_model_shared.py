"""Shared builders for the three model-generator gate queries
(`model_v3_table_schemas`, `model_v24_table_schemas`,
`model_v01_file_schemas`) — ONE copy of the min-identifier sample
manifest and ONE copy of the UNPIVOT/type-inference oracle SQL, so a
change to the inference grammar or the sample rendering cannot diverge
the three oracles (round-7 review finding)."""

from __future__ import annotations

from ._core import TPCH_GRAPH_SPEC


def assert_constraintless(view) -> None:
    """``sample_surface_oracle``'s key column hardcodes the reference's
    constraint-less fallback (key ⇔ field is the identifier column),
    while the Spark side runs the real generator with
    ``view.catalog.unique_constraints`` — if the fixture ever declares
    unique constraints the two sides would silently diverge. Fail
    loudly instead (ADVICE r07); a constrained fixture needs the oracle
    parameterized with the declared constraint."""
    assert not view.catalog.unique_constraints, (
        "model-surface oracle assumes a constraint-less catalog, but the "
        f"fixture declares: {view.catalog.unique_constraints!r} — "
        "parameterize sample_surface_oracle's key column before gating"
    )


def node_manifest(view):
    """Deterministic-sample node manifest: per label, the min-identifier
    row rendered with the exporter's Python ``str()``. Per-label 1-row
    collects are bounded driver fetches (6 labels), same class as the
    documented manifest scalars."""
    from ..operators.node_export import ordered_columns
    from ..plans.manifest import ExportManifest, NodeEntry

    idents = view.declared_identifiers()
    entries: dict[str, object] = {}
    for label in sorted(view.nodes):
        df = view.nodes[label]
        ident = idents[label]
        cols = ordered_columns(df.columns, ident)
        head = df.orderBy(ident).limit(1).select(*cols).collect()
        sample = {c: str(v) for c, v in zip(cols, head[0])} if head else {}
        entries[label] = NodeEntry(label, cols, ident, sample)
    return ExportManifest(nodes=entries, rels={})


def sample_surface_oracle(
    *,
    table_col: str,
    type_col: str,
    sample_col: str | None = None,
    nullable_col: str | None = None,
    key_col: str | None = None,
) -> str:
    """DuckDB oracle for a flattened per-(table, field) model surface:
    re-derives each field's inferred type (and optionally the 50-char
    sample, sample-nullability, and identifier-key flag) from the SAME
    parquet fixture — the min-identifier row rendered to VARCHAR and
    pushed through the reference's type-inference grammar
    (neo4j_export.py:1221-1244). Column names are parameters so the
    v3.0 / v2.4.0 / v0.1.0 surfaces share one SQL body."""
    from ..functions.type_inference import _FLOAT_RE, _INT_RE

    parts = []
    for n in TPCH_GRAPH_SPEC.nodes:
        cols = [
            f"'{n.label}.csv' AS {table_col}",
            "field",
            f"""CASE WHEN val = '' OR val = 'NULL' THEN 'string'
            WHEN regexp_matches(val, '{_INT_RE}') THEN 'integer'
            WHEN regexp_matches(val, '{_FLOAT_RE}') THEN 'float'
            WHEN lower(val) IN ('true', 'false') THEN 'boolean'
            ELSE 'string' END AS {type_col}""",
        ]
        if sample_col:
            cols.append(f"substr(val, 1, 50) AS {sample_col}")
        if nullable_col:
            cols.append(f"(val = '' OR val = 'NULL') AS {nullable_col}")
        if key_col:
            cols.append(f"(field = '{n.id_col}') AS {key_col}")
        select = ",\n       ".join(cols)
        parts.append(f"""
SELECT {select}
FROM (
  UNPIVOT (SELECT COALESCE(CAST(COLUMNS(*) AS VARCHAR), 'None') FROM
           (SELECT * FROM {n.table} ORDER BY {n.id_col} LIMIT 1))
  ON COLUMNS(*) INTO NAME field VALUE val
)""")
    return "\nUNION ALL\n".join(parts)
