"""Relationship-pattern discovery (C2/S6/A1, SURVEY.md §2.11).

The reference runs one Cypher DISTINCT scan *per relationship type*
(``neo4j_export.py:342-354``) and then re-scans per pattern — (k+1)×
amplification (BASELINE.md). Here discovery is ONE job over all edges:
a distinct aggregation on (src_label, rel_type, tgt_label), validated
against endpoint existence via semi-joins where the source can't
guarantee referential integrity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.star_schema import GraphView


def discover_patterns_map(edges: DataFrame) -> DataFrame:
    """Distinct (src_label, rel_type, tgt_label) triples from canonical
    edges — single hash-aggregate job, partial agg map-side."""
    return edges.select("src_label", "rel_type", "tgt_label").distinct()


def discover_patterns_view(view: GraphView, validate: bool = True) -> DataFrame:
    """Pattern triples from a star-schema view in ONE unioned job.

    A pattern exists iff ≥1 edge row exists whose endpoints exist in the
    endpoint node tables (inner-join semantics of the reference's Cypher
    ``MATCH (s)-[r]->(t)``). ``validate=False`` skips the existence joins
    when the source declares referential integrity.
    """
    parts = []
    for spec in view.spec.edges:
        e = view.tables[spec.table].select(
            F.col(spec.src_key).alias("__src"), F.col(spec.tgt_key).alias("__tgt")
        )
        if validate:
            src_nodes = view.nodes[spec.src_label]
            tgt_nodes = view.nodes[spec.tgt_label]
            src_id, tgt_id = src_nodes.columns[0], tgt_nodes.columns[0]
            # No broadcast hint: AQE broadcasts small node sides on its
            # own; a forced broadcast of a 100 TB node table would OOM.
            e = e.join(
                src_nodes.select(F.col(src_id).alias("__src")), "__src", "left_semi"
            ).join(
                tgt_nodes.select(F.col(tgt_id).alias("__tgt")), "__tgt", "left_semi"
            )
        parts.append(
            e.limit(1).select(
                F.lit(spec.src_label).alias("src_label"),
                F.lit(spec.rel_type).alias("rel_type"),
                F.lit(spec.tgt_label).alias("tgt_label"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
