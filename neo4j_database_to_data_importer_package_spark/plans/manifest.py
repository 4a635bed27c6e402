"""Export manifest: the driver-side IR between the export jobs and the
model generators (the reference's ``node_files`` / ``rel_files`` dicts,
``neo4j_export.py:329``, ``:433-444``).

Holds only schema-level metadata and 1-row samples — never data rows —
so driver memory stays O(labels+patterns) at any input scale.
Insertion order is significant: model-ID minting enumerates it
(SURVEY.md §7.3 #3); the engine pins catalog order (sorted labels) in
native mode and preserves caller order for compat.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NodeEntry:
    label: str
    columns: list[str]  # ordered: identifier first, rest lexicographic
    identifier: str
    sample: dict[str, str] = field(default_factory=dict)  # first CSV data row
    row_count: int | None = None


@dataclass
class RelEntry:
    pattern_key: str  # {Src}_{TYPE}_{Tgt}
    rel_type: str
    source_label: str
    target_label: str
    all_properties: list[str]  # full CSV column list (ordered)
    rel_properties: list[str]  # the relationship's own properties (sorted)
    source_id_prop: str
    target_id_prop: str
    source_col_name: str
    target_col_name: str
    sample: dict[str, str] = field(default_factory=dict)
    row_count: int | None = None


@dataclass
class ExportManifest:
    nodes: dict[str, NodeEntry] = field(default_factory=dict)  # label → entry
    rels: dict[str, RelEntry] = field(default_factory=dict)  # pattern_key → entry
