"""Dynamic schema discovery (P2/A5/U2, SURVEY.md §2.2/§2.4).

The reference unions observed property keys over all rows of a label
(``all_properties.update(...)``, ``neo4j_export.py:285-292``, rels
``:412``). On a typed star-schema view the per-label schema is static
(the parquet footer), so discovery is free; on a canonical map-typed
graph it is a distinct-aggregation over exploded map keys — exactly the
partial+final hash aggregate Spark gives for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schema_union_map(nodes: DataFrame, key_col: str = "label", props_col: str = "props") -> DataFrame:
    """(label, property) pairs observed anywhere in a map-typed graph.

    One shuffle (partial distinct map-side); at 100 TB this is the
    idiomatic replacement for the reference's full client materialization.
    """
    return (
        nodes.select(F.col(key_col).alias("label"), F.explode(F.map_keys(F.col(props_col))).alias("property"))
        .distinct()
    )


def schema_union_view(node_dfs: dict[str, DataFrame]) -> list[tuple[str, str]]:
    """Static schema union over a typed view: no job at all — the schema
    IS the catalog (sorted for deterministic downstream order)."""
    out: list[tuple[str, str]] = []
    for label in node_dfs:
        for c in sorted(node_dfs[label].columns):
            out.append((label, c))
    return out
