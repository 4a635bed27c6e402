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


def schema_union_map_sampled(
    nodes: DataFrame,
    sample_rate: float = 0.2,
    key_col: str = "label",
    props_col: str = "props",
    id_col: str = "node_id",
) -> DataFrame:
    """S1 sampling variant: schema union over a deterministic row sample.

    The reference's metadata scan (apoc.meta.data, ``neo4j_export.py:285``)
    SAMPLES rows per label rather than scanning all of them — at 100 TB
    the full distinct-aggregation over every row is scan-cost overkill
    for a catalog job. Sampling is hash-Bernoulli on the stable
    (label, node_id) identity (md5 → uniform (0,1), keep < rate), NOT
    ``df.sample()``: the keep-set is a pure function of the row identity,
    so it is reproducible across runs, engines, partitionings and
    retries, and the filter is a scan-level predicate (no shuffle).

    Exactness caveat (same as apoc's): a (label, property) pair is
    observed only if the label has at least one sampled row.
    """
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col(key_col), F.col(id_col))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    return schema_union_map(
        nodes.filter(frac < F.lit(sample_rate)), key_col, props_col
    )


def schema_union_view(node_dfs: dict[str, DataFrame]) -> list[tuple[str, str]]:
    """Static schema union over a typed view: no job at all — the schema
    IS the catalog (sorted for deterministic downstream order)."""
    out: list[tuple[str, str]] = []
    for label in node_dfs:
        for c in sorted(node_dfs[label].columns):
            out.append((label, c))
    return out
