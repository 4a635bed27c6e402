"""Importer-model JSON generators — three format versions (C5/C6/C7,
SURVEY.md §2.11), driver-side (the model is small at any data scale).

Shapes and ID-minting rules re-derived from the reference:
- v3.0   (``neo4j_export.py:460-729``): graphSchema with nodeLabels
  ``nl:{i}`` / nodeObjectTypes ``n:{i}`` / per-label property IDs
  ``p:{i}_{j}``; relationshipTypes deduped by token ``rt:{k}``;
  relationshipObjectTypes ``r:{m}`` carry from/to; mapping keys use a
  ``#`` ref prefix.
- v2.4.0 (``:731-1040``): ids ``n:n{i}`` / ``nl:n{i}``, ONE global
  property counter ``p:{n}`` starting at 1, one relationshipTypes entry
  PER PATTERN ``r:n{k}`` carrying from/to, per-rel propertyMappings,
  tableSchemas add empty primaryKeys/foreignKeys, plus indexes
  (``i:{n}``, RANGE→default) and constraints (``c:{n}``) sections.
- v0.1.0 (``:1042-1219``): legacy graph/nodes with caption, fileSchemas
  keyed by filename with include:true, nodeSchemas with uuid4 property
  identifiers + key, relationshipSchemas/Mappings keyed ``n{k}``.

Quirk compatibility (SURVEY.md §2.12) is controlled by ``quirks``:
- quirk 1: v2.4/v0.1 read the rel sample from ``{rel_type}.csv`` — a
  file that never exists (files are ``{src}_{rel}_{tgt}.csv``) — so all
  rel properties type as string/nullable. quirks=True reproduces (empty
  sample); quirks=False uses the real per-pattern sample.
- quirk 2: v3.0 refreshes the rel sample only on the first pattern of a
  type; later patterns reuse the previous sample. quirks=True
  reproduces the leak; quirks=False refreshes per pattern.
- quirk 3: v3.0 constraint name uses the first CSV column (the
  identifier column), not the key-property lookup — identical strings
  in practice, reproduced as-is.
- quirk 4: v3.0 rel property IDs use the ALREADY-INCREMENTED type
  counter (first type's properties are ``p:r1_*``). Reproduced always —
  it is the format's de-facto shape.

``uuid_factory`` and ``clock`` are injectable for golden-file tests
(F10/F7; driver contract forbids wall-clock nondeterminism).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from ..functions.type_inference import infer_nullable, infer_type
from ..catalog import ConstraintInfo, IndexInfo
from .manifest import ExportManifest


def _grid_position(idx: int) -> dict:
    """Visualization grid (F11, ``neo4j_export.py:510-512``)."""
    return {"x": 300 * (idx % 3) - 300, "y": 300 * (idx // 3)}


def _field_schema(name: str, sample: dict) -> dict:
    value = sample.get(name, "")
    return {
        "name": name,
        "sample": str(value if value is not None else "")[:50],
        "recommendedType": {"type": infer_type(value if value is not None else "")},
    }


def _prop_schema(prop_id: str, token: str, sample: dict) -> dict:
    value = sample.get(token, "")
    return {
        "$id": prop_id,
        "token": token,
        "type": {"type": infer_type(value if value is not None else "")},
        "nullable": infer_nullable(sample.get(token)) or token not in sample,
    }


def generate_model_v3_0(
    manifest: ExportManifest,
    unique_constraints: dict[str, list[str]] | None = None,
    quirks: bool = True,
) -> dict:
    """v3.0 model (default format). Reference: neo4j_export.py:460-729."""
    unique_constraints = unique_constraints or {}
    schema = {
        "nodeLabels": [],
        "relationshipTypes": [],
        "nodeObjectTypes": [],
        "relationshipObjectTypes": [],
        "constraints": [],
        "indexes": [],
    }
    model = {
        "version": "3.0.0",
        "visualisation": {"nodes": []},
        "dataModel": {
            "version": "3.0",
            "graphSchemaRepresentation": {"version": "1.0.0", "graphSchema": schema},
            "graphSchemaExtensionsRepresentation": {"nodeKeyProperties": []},
            "graphMappingRepresentation": {
                "dataSourceSchema": {"type": "local", "tableSchemas": []},
                "nodeMappings": [],
                "relationshipMappings": [],
            },
            "configurations": {"idsToIgnore": []},
        },
    }
    mapping = model["dataModel"]["graphMappingRepresentation"]
    ext = model["dataModel"]["graphSchemaExtensionsRepresentation"]

    node_obj_ids: dict[str, str] = {}
    node_label_ids: dict[str, str] = {}
    prop_ids: dict[tuple[str, str], str] = {}

    for idx, (label, entry) in enumerate(manifest.nodes.items()):
        obj_id, label_id = f"n:{idx}", f"nl:{idx}"
        node_obj_ids[label], node_label_ids[label] = obj_id, label_id
        model["visualisation"]["nodes"].append({"id": obj_id, "position": _grid_position(idx)})

        props = []
        for j, prop in enumerate(entry.columns):
            pid = f"p:{idx}_{j}"
            prop_ids[(label, prop)] = pid
            props.append(_prop_schema(pid, prop, entry.sample))
        schema["nodeLabels"].append({"$id": label_id, "token": label, "properties": props})
        schema["nodeObjectTypes"].append(
            {"$id": obj_id, "labels": [{"$ref": f"#{label_id}"}]}
        )

        key_prop_id = None
        if unique_constraints.get(label):
            key_prop_id = prop_ids.get((label, unique_constraints[label][0]))
        if not key_prop_id and entry.columns:
            key_prop_id = prop_ids[(label, entry.columns[0])]
        if key_prop_id:
            ext["nodeKeyProperties"].append(
                {"node": {"$ref": f"#{obj_id}"}, "keyProperties": [{"$ref": f"#{key_prop_id}"}]}
            )
            # quirk 3: name from the column-order head (== identifier col)
            schema["constraints"].append(
                {
                    "$id": f"c:{idx}",
                    "name": f"{entry.columns[0]}_{label}_uniq",
                    "constraintType": "uniqueness",
                    "entityType": "node",
                    "nodeLabel": {"$ref": f"#{label_id}"},
                    "relationshipType": None,
                    "properties": [{"$ref": f"#{key_prop_id}"}],
                }
            )

        filename = f"{label}.csv"
        mapping["dataSourceSchema"]["tableSchemas"].append(
            {
                "name": filename,
                "expanded": False,
                "fields": [_field_schema(p, entry.sample) for p in entry.columns],
            }
        )
        mapping["nodeMappings"].append(
            {
                "node": {"$ref": f"#{obj_id}"},
                "propertyMappings": [
                    {"property": {"$ref": f"#{prop_ids[(label, p)]}"}, "fieldName": p}
                    for p in entry.columns
                ],
                "tableName": filename,
            }
        )

    rel_type_counter = 0
    rel_obj_counter = 0
    rel_type_ids: dict[str, str] = {}
    sample: dict[str, str] = {}  # deliberately outer-scope: quirk 2 stale-leak

    for entry in manifest.rels.values():
        src_obj = node_obj_ids.get(entry.source_label)
        tgt_obj = node_obj_ids.get(entry.target_label)
        if not src_obj or not tgt_obj:
            continue

        if entry.rel_type not in rel_type_ids:
            rt_id = f"rt:{rel_type_counter}"
            rel_type_ids[entry.rel_type] = rt_id
            rel_type_counter += 1
            sample = entry.sample
            # quirk 4: property IDs minted AFTER the counter increment
            rel_props = [
                _prop_schema(f"p:r{rel_type_counter}_{j}", prop, sample)
                for j, prop in enumerate(entry.rel_properties)
            ]
            schema["relationshipTypes"].append(
                {"$id": rt_id, "token": entry.rel_type, "properties": rel_props}
            )
        else:
            rt_id = rel_type_ids[entry.rel_type]
            if not quirks:
                sample = entry.sample  # fixed mode: fresh sample per pattern

        rel_obj_id = f"r:{rel_obj_counter}"
        rel_obj_counter += 1
        schema["relationshipObjectTypes"].append(
            {
                "$id": rel_obj_id,
                "type": {"$ref": f"#{rt_id}"},
                "from": {"$ref": f"#{src_obj}"},
                "to": {"$ref": f"#{tgt_obj}"},
            }
        )

        from_mappings = {}
        to_mappings = {}
        sp = prop_ids.get((entry.source_label, entry.source_id_prop))
        tp = prop_ids.get((entry.target_label, entry.target_id_prop))
        if sp:
            from_mappings[f"#{sp}"] = entry.source_col_name
        if tp:
            to_mappings[f"#{tp}"] = entry.target_col_name

        filename = f"{entry.pattern_key}.csv"
        mapping["relationshipMappings"].append(
            {
                "relationship": {"$ref": f"#{rel_obj_id}"},
                "tableName": filename,
                "fromMappings": from_mappings,
                "toMappings": to_mappings,
                "propertyMappings": [],
            }
        )
        mapping["dataSourceSchema"]["tableSchemas"].append(
            {
                "name": filename,
                "expanded": True,
                "fields": [_field_schema(f, sample) for f in entry.all_properties],
            }
        )

    return model


def generate_model_v2_4(
    manifest: ExportManifest,
    unique_constraints: dict[str, list[str]] | None = None,
    constraints: list[ConstraintInfo] | None = None,
    indexes: list[IndexInfo] | None = None,
    quirks: bool = True,
) -> dict:
    """v2.4.0-beta.0 model. Reference: neo4j_export.py:731-1040."""
    unique_constraints = unique_constraints or {}
    schema = {"nodeLabels": [], "relationshipTypes": [], "indexes": [], "constraints": []}
    model = {
        "version": "2.4.0-beta.0",
        "visualisation": {"nodes": []},
        "dataModel": {
            "version": "2.4.0-beta.0",
            "graphSchemaRepresentation": {"version": "1.0.0", "graphSchema": schema},
            "graphSchemaExtensionsRepresentation": {"nodeKeyProperties": []},
            "graphMappingRepresentation": {
                "dataSourceSchema": {"type": "local", "tableSchemas": []},
                "nodeMappings": [],
                "relationshipMappings": [],
            },
            "configurations": {"idsToIgnore": []},
        },
    }
    mapping = model["dataModel"]["graphMappingRepresentation"]
    ext = model["dataModel"]["graphSchemaExtensionsRepresentation"]

    node_obj_ids: dict[str, str] = {}
    node_label_ids: dict[str, str] = {}
    prop_ids: dict[tuple[str, str], str] = {}
    prop_counter = 1  # ONE global counter, starts at 1 (:772)

    for idx, (label, entry) in enumerate(manifest.nodes.items()):
        obj_id, label_id = f"n:n{idx}", f"nl:n{idx}"
        node_obj_ids[label], node_label_ids[label] = obj_id, label_id
        model["visualisation"]["nodes"].append({"id": obj_id, "position": _grid_position(idx)})

        props = []
        for prop in entry.columns:
            pid = f"p:{prop_counter}"
            prop_counter += 1
            prop_ids[(label, prop)] = pid
            props.append(_prop_schema(pid, prop, entry.sample))
        schema["nodeLabels"].append({"$id": label_id, "token": label, "properties": props})

        key_prop_id = None
        if unique_constraints.get(label):
            key_prop_id = prop_ids.get((label, unique_constraints[label][0]))
        if not key_prop_id and entry.columns:
            key_prop_id = prop_ids[(label, entry.columns[0])]
        if key_prop_id:
            ext["nodeKeyProperties"].append(
                {"node": {"$ref": f"#{obj_id}"}, "keyProperties": [{"$ref": f"#{key_prop_id}"}]}
            )

        filename = f"{label}.csv"
        mapping["dataSourceSchema"]["tableSchemas"].append(
            {
                "name": filename,
                "expanded": False,
                "fields": [_field_schema(p, entry.sample) for p in entry.columns],
                "primaryKeys": [],
                "foreignKeys": [],
            }
        )
        mapping["nodeMappings"].append(
            {
                "node": {"$ref": f"#{obj_id}"},
                "propertyMappings": [
                    {"property": {"$ref": f"#{prop_ids[(label, p)]}"}, "fieldName": p}
                    for p in entry.columns
                ],
                "tableName": filename,
            }
        )

    rel_counter = 0
    for entry in manifest.rels.values():
        src_label_id = node_label_ids.get(entry.source_label)
        tgt_label_id = node_label_ids.get(entry.target_label)
        rt_id = f"r:n{rel_counter}"
        rel_counter += 1
        if not src_label_id or not tgt_label_id:
            continue

        # quirk 1: the reference samples {rel_type}.csv, which is never a
        # real file name → empty sample → everything string/nullable.
        sample = {} if quirks else entry.sample

        rel_props = []
        for prop in entry.rel_properties:
            pid = f"p:{prop_counter}"
            prop_counter += 1
            rel_props.append(_prop_schema(pid, prop, sample))

        schema["relationshipTypes"].append(
            {
                "$id": rt_id,
                "token": entry.rel_type,
                "from": {"$ref": f"#{src_label_id}"},
                "to": {"$ref": f"#{tgt_label_id}"},
                "properties": rel_props,
            }
        )

        from_mappings = {}
        to_mappings = {}
        sp = prop_ids.get((entry.source_label, entry.source_id_prop))
        tp = prop_ids.get((entry.target_label, entry.target_id_prop))
        if sp:
            from_mappings[sp] = entry.source_col_name  # no '#' prefix in v2.4
        if tp:
            to_mappings[tp] = entry.target_col_name

        filename = f"{entry.pattern_key}.csv"
        rel_mapping = {
            "relationship": {"$ref": f"#{rt_id}"},
            "propertyMappings": [
                {"property": {"$ref": f"#{p['$id']}"}, "fieldName": p["token"]}
                for p in rel_props
            ],
            "tableName": filename,
        }
        if from_mappings:
            rel_mapping["fromMappings"] = from_mappings
        if to_mappings:
            rel_mapping["toMappings"] = to_mappings
        mapping["relationshipMappings"].append(rel_mapping)

        mapping["dataSourceSchema"]["tableSchemas"].append(
            {
                "name": filename,
                "expanded": False,
                "fields": [_field_schema(f, sample) for f in entry.all_properties],
                "primaryKeys": [],
                "foreignKeys": [],
            }
        )

    # indexes (i:{n} starting 1; RANGE→default; only resolvable node ones)
    index_counter = 1
    for ix in indexes or []:
        if ix.entity_type.lower() != "node" or not ix.labels:
            continue
        label_id = node_label_ids.get(ix.labels[0])
        if not label_id:
            continue
        refs = [
            {"$ref": f"#{prop_ids[(ix.labels[0], p)]}"}
            for p in ix.properties
            if (ix.labels[0], p) in prop_ids
        ]
        if refs:
            schema["indexes"].append(
                {
                    "$id": f"i:{index_counter}",
                    "name": ix.name,
                    "indexType": "default" if ix.index_type == "RANGE" else ix.index_type,
                    "entityType": "node",
                    "nodeLabel": {"$ref": f"#{label_id}"},
                    "properties": refs,
                }
            )
            index_counter += 1

    constraint_counter = 0
    for ci in constraints or []:
        if ci.entity_type.lower() != "node" or not ci.labels:
            continue
        label_id = node_label_ids.get(ci.labels[0])
        if not label_id:
            continue
        refs = [
            {"$ref": f"#{prop_ids[(ci.labels[0], p)]}"}
            for p in ci.properties
            if (ci.labels[0], p) in prop_ids
        ]
        if refs:
            schema["constraints"].append(
                {
                    "$id": f"c:{constraint_counter}",
                    "name": ci.name,
                    "constraintType": ci.constraint_type,
                    "entityType": "node",
                    "nodeLabel": {"$ref": f"#{label_id}"},
                    "properties": refs,
                }
            )
            constraint_counter += 1

    return model


def generate_model_v0_1(
    manifest: ExportManifest,
    unique_constraints: dict[str, list[str]] | None = None,
    quirks: bool = True,
    uuid_factory: Callable[[], str] | None = None,
) -> dict:
    """v0.1.0-beta.0 legacy model. Reference: neo4j_export.py:1042-1219."""
    unique_constraints = unique_constraints or {}
    mk_uuid = uuid_factory or (lambda: str(uuid.uuid4()))
    model = {
        "version": "0.1.0-beta.0",
        "graph": {"nodes": [], "relationships": []},
        "dataModel": {
            "fileModel": {"fileSchemas": {}},
            "graphModel": {"nodeSchemas": {}, "relationshipSchemas": {}},
            "mappingModel": {"nodeMappings": {}, "relationshipMappings": {}},
        },
    }
    dm = model["dataModel"]
    node_ids: dict[str, str] = {}

    for idx, (label, entry) in enumerate(manifest.nodes.items()):
        node_id = f"n{idx}"
        node_ids[label] = node_id
        model["graph"]["nodes"].append(
            {"id": node_id, "position": _grid_position(idx), "caption": label}
        )

        filename = f"{label}.csv"
        dm["fileModel"]["fileSchemas"][filename] = {
            "expanded": False,
            "fields": [
                {
                    "name": p,
                    "type": infer_type(entry.sample.get(p, "") or ""),
                    "sample": str(entry.sample.get(p, "") or "")[:50],
                    "include": True,
                }
                for p in entry.columns
            ],
        }

        node_props = [
            {
                "property": p,
                "type": infer_type(entry.sample.get(p, "") or ""),
                "identifier": mk_uuid(),
            }
            for p in entry.columns
        ]
        key_props = []
        if unique_constraints.get(label):
            key_name = unique_constraints[label][0]
            match = next((p for p in node_props if p["property"] == key_name), None)
            if match:
                key_props.append(match["identifier"])
        if not key_props and node_props:
            key_props.append(node_props[0]["identifier"])

        dm["graphModel"]["nodeSchemas"][node_id] = {
            "label": label,
            "additionLabels": [],
            "labelProperties": [],
            "properties": node_props,
            "key": {"properties": key_props, "name": ""},
        }
        dm["mappingModel"]["nodeMappings"][node_id] = {
            "nodeSchema": node_id,
            "fileSchema": filename,
            "mappings": [{"field": p} for p in entry.columns],
        }

    rel_counter = 0
    for entry in manifest.rels.values():
        rel_id = f"n{rel_counter}"
        rel_counter += 1
        src_id, tgt_id = node_ids.get(entry.source_label), node_ids.get(entry.target_label)
        if not src_id or not tgt_id:
            continue

        model["graph"]["relationships"].append(
            {"id": rel_id, "type": entry.rel_type, "fromId": src_id, "toId": tgt_id}
        )

        sample = {} if quirks else entry.sample  # quirk 1 (same as v2.4)
        rel_props = [
            {
                "property": p,
                "type": infer_type(sample.get(p, "") or ""),
                "identifier": mk_uuid(),
            }
            for p in entry.rel_properties
        ]
        dm["graphModel"]["relationshipSchemas"][rel_id] = {
            "type": entry.rel_type,
            "sourceNodeSchema": src_id,
            "targetNodeSchema": tgt_id,
            "properties": rel_props,
        }
        dm["mappingModel"]["relationshipMappings"][rel_id] = {
            "relationshipSchema": rel_id,
            "mappings": [{"field": p} for p in entry.rel_properties],
            "sourceMappings": [{"field": entry.source_col_name}] if entry.source_col_name else [],
            "targetMappings": [{"field": entry.target_col_name}] if entry.target_col_name else [],
            "fileSchema": f"{entry.pattern_key}.csv",
        }

    return model


GENERATORS = {
    "3.0": generate_model_v3_0,
    "2.4.0": generate_model_v2_4,
    "0.1.0": generate_model_v0_1,
}
