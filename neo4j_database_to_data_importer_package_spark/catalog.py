"""Graph catalog: driver-side metadata the reference kept as plain dicts.

Mirrors the reference's intermediate representations (SURVEY.md §3.2):
``self.metadata`` (label → properties), ``self.unique_constraints``,
``self.constraints`` / ``self.indexes`` (detailed catalogs), plus the
export manifests ``node_files`` / ``rel_files``. Semantics per
``/root/reference/neo4j_export.py:58-130, :177-267`` — re-modeled as typed
dataclasses; never holds data rows, only schema-level metadata (bounded
driver memory at any scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PropertyMeta:
    name: str
    prop_type: str = "STRING"  # graph-side type (apoc.meta.data style); informational
    element_type: str = "node"


@dataclass
class LabelMeta:
    label: str
    kind: str = "node"  # "node" | "relationship"
    properties: dict[str, PropertyMeta] = field(default_factory=dict)


@dataclass
class ConstraintInfo:
    """Detailed constraint (reference neo4j_export.py:229-267).

    ``constraint_type`` is normalized to uniqueness/existence/key by
    substring classification (``:244-252``).
    """

    name: str
    constraint_type: str  # uniqueness | existence | key
    entity_type: str  # NODE | RELATIONSHIP
    labels: list[str] = field(default_factory=list)
    properties: list[str] = field(default_factory=list)


@dataclass
class IndexInfo:
    """Index metadata (reference neo4j_export.py:177-227)."""

    name: str
    index_type: str = "RANGE"
    entity_type: str = "NODE"
    labels: list[str] = field(default_factory=list)
    properties: list[str] = field(default_factory=list)


def parse_legacy_constraint_description(description: str) -> tuple[str, str] | None:
    """Parse a legacy ``CALL db.constraints()`` description string (F4).

    Bit-exact with the reference's fallback extraction
    (``neo4j_export.py:109-123``): only descriptions containing the literal
    ``UNIQUE`` (case-sensitive, as in the reference) are considered; the
    label is the text between the first ``:`` and the next ``)``; the
    property is the text between the first ``.`` and the next ``)``. The
    canonical format is
    ``CONSTRAINT ON ( label:Label ) ASSERT (label.property) IS UNIQUE``.

    Quirk preserved: for the paren-less Neo4j 3.x form
    ``... ASSERT person.email IS UNIQUE`` the reference extracts
    ``"email IS UNIQUE"`` (no ``)`` to stop at) — so do we.

    Returns ``(label, property)`` or ``None`` when the description does not
    parse (non-unique, missing ``:``, or missing ``.``).
    """
    description = description or ""
    if "UNIQUE" not in description:
        return None
    parts = description.split(":")
    if len(parts) >= 2:
        label = parts[1].split(")")[0].strip()
        prop_parts = description.split(".")
        if len(prop_parts) >= 2:
            prop = prop_parts[1].split(")")[0].strip()
            return label, prop
    return None


def classify_constraint_type(raw: str) -> str:
    """Normalize a raw constraint-type string (reference :244-252)."""
    raw_u = (raw or "").upper()
    if "UNIQUENESS" in raw_u or "UNIQUE" in raw_u:
        return "uniqueness"
    if "EXISTENCE" in raw_u or "EXISTS" in raw_u:
        return "existence"
    if "KEY" in raw_u:
        return "key"
    return "uniqueness"


@dataclass
class GraphCatalog:
    """Schema-level catalog of a property graph.

    In the reference this is discovered live from Neo4j (apoc.meta.data /
    SHOW CONSTRAINTS / SHOW INDEXES). Here it is either (a) declared by a
    source (star-schema graph view), (b) discovered by aggregation jobs
    over the nodes/edges DataFrames (operators.schema_union), or (c) loaded
    from a JSON manifest.
    """

    labels: dict[str, LabelMeta] = field(default_factory=dict)
    unique_constraints: dict[str, list[str]] = field(default_factory=dict)
    constraints: list[ConstraintInfo] = field(default_factory=list)
    indexes: list[IndexInfo] = field(default_factory=list)

    def node_labels(self) -> list[str]:
        return [l for l, m in self.labels.items() if m.kind == "node"]

    def rel_types(self) -> list[str]:
        return [l for l, m in self.labels.items() if m.kind == "relationship"]

    def properties_of(self, label: str) -> list[str]:
        return list(self.labels[label].properties.keys())

    def ingest_legacy_constraint_descriptions(self, descriptions: list[str]) -> None:
        """Populate ``unique_constraints`` from legacy ``db.constraints()``
        description strings — the reference's fallback path for pre-4.x
        catalogs (``neo4j_export.py:107-123``). Appends in input order,
        duplicates kept, exactly as the reference does.
        """
        for description in descriptions:
            parsed = parse_legacy_constraint_description(description)
            if parsed is not None:
                label, prop = parsed
                if label not in self.unique_constraints:
                    self.unique_constraints[label] = []
                self.unique_constraints[label].append(prop)
