"""Round-7 registrations (VERDICT r06 directive #4): driver-visible
oracle rows for the v2.4.0-beta.0 and v0.1.0-beta.0 model generators,
completing the set started by ``model_v3_table_schemas`` (round 6) so
all three reference generators (neo4j_export.py:460-729, :731-1040,
:1042-1219) face the DuckDB oracle, not just pytest goldens.

Registry growth is otherwise FROZEN this round (VERDICT r06 #1 — the
never-driver-gated backlog must clear before new registrations resume);
these two are the directive's own exceptions, ledgered at the tail of
``_NEXT_ROTATION``.
"""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    TPCH_GRAPH_SPEC,
    _view,
    register,
)


def _node_manifest(view):
    """Deterministic-sample node manifest (the ``model_v3_table_schemas``
    construction): per label, the min-identifier row rendered with the
    exporter's Python ``str()``. Per-label 1-row collects are bounded
    driver fetches (6 labels), same class as the documented manifest
    scalars."""
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


# ---------------------------------------------------------------------------
# Model generation (C6) — the v2.4.0-beta.0 model's tableSchemas +
# nodeKeyProperties surface. The oracle re-derives every field's
# recommendedType / 50-char sample / nullable from the SAME parquet
# fixture (min-identifier row rendered to VARCHAR, pushed through the
# reference type-inference grammar, neo4j_export.py:1221-1244); the key
# flag is the reference's rule — first unique-constraint property if
# declared, else the first (identifier) column — with the star schema's
# identifiers as spec literals (the catalog declares no unique
# constraints on the parquet fixture, so the fallback branch is what
# executes, same as the reference on a constraint-less database).
# ---------------------------------------------------------------------------

def _model_v24_oracle() -> str:
    from ..functions.type_inference import _FLOAT_RE, _INT_RE

    parts = []
    for n in TPCH_GRAPH_SPEC.nodes:
        parts.append(f"""
SELECT '{n.label}.csv' AS table_name, field,
       CASE WHEN val = '' OR val = 'NULL' THEN 'string'
            WHEN regexp_matches(val, '{_INT_RE}') THEN 'integer'
            WHEN regexp_matches(val, '{_FLOAT_RE}') THEN 'float'
            WHEN lower(val) IN ('true', 'false') THEN 'boolean'
            ELSE 'string' END AS recommended_type,
       substr(val, 1, 50) AS sample_value,
       (val = '' OR val = 'NULL') AS nullable,
       (field = '{n.id_col}') AS is_node_key
FROM (
  UNPIVOT (SELECT COALESCE(CAST(COLUMNS(*) AS VARCHAR), 'None') FROM
           (SELECT * FROM {n.table} ORDER BY {n.id_col} LIMIT 1))
  ON COLUMNS(*) INTO NAME field VALUE val
)""")
    return "\nUNION ALL\n".join(parts)


@register("model_v24_table_schemas", _model_v24_oracle())
def model_v24_table_schemas(spark, sf_dir):
    """Flattened v2.4.0-beta.0 model: one row per (tableSchema, field)
    with the field's recommendedType, 50-char sample, the matching
    nodeLabel property's nullable flag, and whether the field backs the
    label's nodeKeyProperties entry. Runs the REAL driver-side generator
    (``plans.models.generate_model_v2_4``, reference
    neo4j_export.py:731-1040) — property $ids are resolved through the
    generator's own global-counter cross-reference graph
    (nodeKeyProperties → p:{n} → nodeLabel property token), so a broken
    counter or dangling $ref surfaces as a wrong key flag, not just in
    pytest goldens."""
    from ..plans.models import generate_model_v2_4

    view = _view(spark, sf_dir)
    model = generate_model_v2_4(_node_manifest(view), view.catalog.unique_constraints)
    dm = model["dataModel"]
    schema = dm["graphSchemaRepresentation"]["graphSchema"]
    prop_by_id: dict[str, tuple[str, str, bool]] = {}
    label_by_id: dict[str, str] = {}
    for nl in schema["nodeLabels"]:
        label_by_id[nl["$id"]] = nl["token"]
        for p in nl["properties"]:
            prop_by_id[p["$id"]] = (nl["token"], p["token"], bool(p["nullable"]))
    obj_to_label: dict[str, str] = {}
    for nm in dm["graphMappingRepresentation"]["nodeMappings"]:
        obj_id = nm["node"]["$ref"].lstrip("#")
        # n:n{idx} ↔ nl:n{idx} share the index suffix
        obj_to_label[obj_id] = label_by_id["nl:" + obj_id.split(":")[1]]
    key_fields: set[tuple[str, str]] = set()
    for kp in dm["graphSchemaExtensionsRepresentation"]["nodeKeyProperties"]:
        label = obj_to_label[kp["node"]["$ref"].lstrip("#")]
        for ref in kp["keyProperties"]:
            _, token, _ = prop_by_id[ref["$ref"].lstrip("#")]
            key_fields.add((label, token))
    nullable_by = {(lbl, tok): nb for lbl, tok, nb in prop_by_id.values()}
    rows = []
    for ts in dm["graphMappingRepresentation"]["dataSourceSchema"]["tableSchemas"]:
        label = ts["name"][: -len(".csv")]
        for f in ts["fields"]:
            rows.append(
                (
                    ts["name"],
                    f["name"],
                    f["recommendedType"]["type"],
                    f["sample"],
                    nullable_by[(label, f["name"])],
                    (label, f["name"]) in key_fields,
                )
            )
    return spark.createDataFrame(
        rows,
        "table_name string, field string, recommended_type string, "
        "sample_value string, nullable boolean, is_node_key boolean",
    )


# ---------------------------------------------------------------------------
# Model generation (C7) — the v0.1.0-beta.0 legacy model's fileSchemas
# + nodeSchemas key surface. Same oracle construction; the key flag
# resolves through the v0.1 cross-reference chain (key.properties
# carries the property's minted UUID, so the flag only comes out right
# if the generator wires sample → type → identifier → key together).
# UUIDs themselves are injected deterministically and NOT emitted.
# ---------------------------------------------------------------------------

def _model_v01_oracle() -> str:
    from ..functions.type_inference import _FLOAT_RE, _INT_RE

    parts = []
    for n in TPCH_GRAPH_SPEC.nodes:
        parts.append(f"""
SELECT '{n.label}.csv' AS filename, field,
       CASE WHEN val = '' OR val = 'NULL' THEN 'string'
            WHEN regexp_matches(val, '{_INT_RE}') THEN 'integer'
            WHEN regexp_matches(val, '{_FLOAT_RE}') THEN 'float'
            WHEN lower(val) IN ('true', 'false') THEN 'boolean'
            ELSE 'string' END AS field_type,
       substr(val, 1, 50) AS sample_value,
       (field = '{n.id_col}') AS is_key
FROM (
  UNPIVOT (SELECT COALESCE(CAST(COLUMNS(*) AS VARCHAR), 'None') FROM
           (SELECT * FROM {n.table} ORDER BY {n.id_col} LIMIT 1))
  ON COLUMNS(*) INTO NAME field VALUE val
)""")
    return "\nUNION ALL\n".join(parts)


@register("model_v01_file_schemas", _model_v01_oracle())
def model_v01_file_schemas(spark, sf_dir):
    """Flattened v0.1.0-beta.0 legacy model: one row per (fileSchema,
    field) with the inferred type, the 50-char truncated sample the
    generator embeds, and whether the field's minted property UUID sits
    in the nodeSchema's key.properties. Runs the REAL generator
    (``plans.models.generate_model_v0_1``, reference
    neo4j_export.py:1042-1219) with an injected deterministic
    uuid_factory (the pytest-golden device — UUIDs stay internal)."""
    import itertools

    from ..plans.models import generate_model_v0_1

    view = _view(spark, sf_dir)
    counter = itertools.count()
    model = generate_model_v0_1(
        _node_manifest(view),
        view.catalog.unique_constraints,
        uuid_factory=lambda: f"uuid-{next(counter)}",
    )
    dm = model["dataModel"]
    key_uuids: set[str] = set()
    prop_uuid_to_field: dict[str, tuple[str, str]] = {}
    label_by_node_id: dict[str, str] = {}
    for node_id, ns in dm["graphModel"]["nodeSchemas"].items():
        label_by_node_id[node_id] = ns["label"]
        for p in ns["properties"]:
            prop_uuid_to_field[p["identifier"]] = (ns["label"], p["property"])
        key_uuids.update(ns["key"]["properties"])
    key_fields = {prop_uuid_to_field[u] for u in key_uuids}
    rows = []
    for filename, fs in dm["fileModel"]["fileSchemas"].items():
        label = filename[: -len(".csv")]
        for f in fs["fields"]:
            assert f["include"] is True  # constant in the reference
            rows.append(
                (
                    filename,
                    f["name"],
                    f["type"],
                    f["sample"],
                    (label, f["name"]) in key_fields,
                )
            )
    return spark.createDataFrame(
        rows,
        "filename string, field string, field_type string, "
        "sample_value string, is_key boolean",
    )
