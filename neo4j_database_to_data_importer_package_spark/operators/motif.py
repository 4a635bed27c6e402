"""Chain-pattern (mini-Cypher) matching over the canonical edge table
(beyond-reference: the reference only *exports* patterns it discovers,
``neo4j_export.py:342-369``; users coming from Neo4j also ask pattern
queries, so the engine exposes the chain subset of that surface).

``match_chain(edges, "(Customer)-[PLACED]->(Order)-[CONTAINS]->(Part)")``
returns one row per path with columns ``n0, n1, ..., n{k}`` (node ids
hop by hop). Each hop is an equi-join on the previous hop's destination
— Catalyst orders/broadcasts them like any join chain, and label/type
predicates reach the edge scans (partition pruning when the canonical
graph is written ``partitionBy(rel_type)``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PATTERN = re.compile(
    r"^\((\w+)\)(?:-\[(\w+)\]->\((\w+)\))+$"
)
_HOP = re.compile(r"-\[(\w+)\]->\((\w+)\)")


def parse_chain(pattern: str) -> tuple[str, list[tuple[str, str]]]:
    """'(A)-[T1]->(B)-[T2]->(C)' -> ('A', [('T1','B'), ('T2','C')])."""
    pattern = pattern.replace(" ", "")
    if not _PATTERN.match(pattern):
        raise ValueError(f"unsupported chain pattern: {pattern!r}")
    start = pattern[1 : pattern.index(")")]
    hops = _HOP.findall(pattern)
    return start, hops


def match_chain(edges: DataFrame, pattern: str) -> DataFrame:
    """Match a left-to-right chain over canonical edges
    (src, dst, src_label, rel_type, tgt_label) — see
    ``sources.property_graph``. Returns hop node ids as n0..nk."""
    start, hops = parse_chain(pattern)
    out = None
    prev_label = start
    for i, (rel, tgt) in enumerate(hops):
        hop = (
            edges.filter(
                (F.col("src_label") == prev_label)
                & (F.col("rel_type") == rel)
                & (F.col("tgt_label") == tgt)
            )
            .select(F.col("src").alias(f"n{i}"), F.col("dst").alias(f"n{i + 1}"))
        )
        out = hop if out is None else out.join(hop, f"n{i}")
        prev_label = tgt
    cols = [f"n{i}" for i in range(len(hops) + 1)]
    return out.select(*cols)
