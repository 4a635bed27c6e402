"""Canonical property-graph DataFrames (GraphFrames-style).

The schema-flexible representation (SURVEY.md §1.5): nodes and edges with
open ``map<string,string>`` property bags, mirroring the reference's
"union of observed keys" dynamic schema (``neo4j_export.py:284-292``).
Used by the schema-discovery operators and the quirk-compat export path;
the typed star-schema view (``star_schema.py``) is the fast path.

Layout for scale: write canonical graphs ``partitionBy("label")`` (nodes)
and ``partitionBy("rel_type")`` (edges) so per-label scans partition-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .star_schema import GraphView

NODE_SCHEMA_COLS = ("node_id", "label", "labels", "props")
EDGE_SCHEMA_COLS = ("src", "dst", "src_label", "rel_type", "tgt_label", "props")


def _props_map(df: DataFrame, cols: list[str]) -> F.Column:
    """Build map<string,string> of property name → stringified value.

    Values pass through ``cast("string")`` — the canonical graph is
    stringly-typed like the reference's CSV output (SURVEY.md §1.3).
    """
    pairs = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    return F.map_from_arrays(
        F.array(*pairs[::2]), F.array(*pairs[1::2])
    )


def nodes_from_view(view: GraphView) -> DataFrame:
    """Union all per-label tables into canonical nodes.

    ``node_id`` is the label-local identifier stringified; global identity
    is the (label, node_id) pair. ``labels`` is an array to model
    multi-label nodes (quirk 5, SURVEY.md §2.12) — star-schema nodes carry
    exactly one label.
    """
    parts = []
    for spec in view.spec.nodes:
        df = view.nodes[spec.label]
        id_col = df.columns[0]  # star-schema convention: key first; cascade refines later
        parts.append(
            df.select(
                F.col(id_col).cast("string").alias("node_id"),
                F.lit(spec.label).alias("label"),
                F.array(F.lit(spec.label)).alias("labels"),
                _props_map(df, df.columns).alias("props"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def edges_from_view(view: GraphView) -> DataFrame:
    """Union all FK-derived edges into canonical edges."""
    parts = []
    for spec in view.spec.edges:
        df = view.edge_df(spec)
        parts.append(
            df.select(
                F.col(spec.src_key).cast("string").alias("src"),
                F.col(spec.tgt_key).cast("string").alias("dst"),
                F.lit(spec.src_label).alias("src_label"),
                F.lit(spec.rel_type).alias("rel_type"),
                F.lit(spec.tgt_label).alias("tgt_label"),
                _props_map(df, list(spec.props)).alias("props"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_partitioned_graph(
    nodes: DataFrame, edges: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    """Persist a canonical graph partitioned for label/type pruning.

    ``fmt`` is any Spark-built-in columnar format — parquet (default)
    or orc; both carry the map-typed property column and both
    partition-prune identically, so the choice is an ecosystem fit
    (Hive/ORC shops), not a semantics one.
    """
    nodes.write.mode("overwrite").partitionBy("label").format(fmt).save(
        f"{path}/nodes"
    )
    edges.write.mode("overwrite").partitionBy("rel_type").format(fmt).save(
        f"{path}/edges"
    )


def read_partitioned_graph(
    spark, path: str, fmt: str = "parquet"
) -> tuple[DataFrame, DataFrame]:
    """Read back a ``write_partitioned_graph`` layout. Per-label /
    per-type filters partition-prune (the scan lists only the matching
    ``label=``/``rel_type=`` directories)."""
    nodes = spark.read.format(fmt).load(f"{path}/nodes").select(*NODE_SCHEMA_COLS)
    edges = spark.read.format(fmt).load(f"{path}/edges").select(*EDGE_SCHEMA_COLS)
    return nodes, edges


def write_apoc_jsonl_graph(
    nodes: DataFrame, edges: DataFrame, path: str
) -> None:
    """Write the canonical (nodes, edges) pair as an apoc.export.json-
    style JSON-lines dump — the inverse of ``read_apoc_jsonl_graph``
    (round-trip tested). One distributed text write per side; property
    maps serialize via to_json, all JVM-side."""
    n = nodes.select(
        F.to_json(
            F.struct(
                F.lit("node").alias("type"),
                F.col("node_id").alias("id"),
                F.col("labels"),
                F.col("props").alias("properties"),
            )
        ).alias("value")
    )
    e = edges.select(
        F.to_json(
            F.struct(
                F.lit("relationship").alias("type"),
                F.col("rel_type").alias("label"),
                F.struct(
                    F.col("src").alias("id"), F.array(F.col("src_label")).alias("labels")
                ).alias("start"),
                F.struct(
                    F.col("dst").alias("id"), F.array(F.col("tgt_label")).alias("labels")
                ).alias("end"),
                F.col("props").alias("properties"),
            )
        ).alias("value")
    )
    n.unionByName(e).write.mode("overwrite").text(path)


def read_apoc_jsonl_graph(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Compatibility source: an ``apoc.export.json``-style JSON-lines
    dump (the public export format reference users already have), i.e.
    rows of

        {"type":"node","id":"0","labels":["Customer"],"properties":{...}}
        {"type":"relationship","label":"PLACED","start":{"id":"0",
         "labels":["Customer"]},"end":{"id":"7","labels":["Order"]},
         "properties":{...}}

    into the canonical (nodes, edges) pair. Properties become
    ``map<string,string>`` via to_json/from_json — JVM-side, no UDF, and
    faithful to the reference's stringly-typed property bags. Multi-label
    nodes keep the full array; ``label`` is the first label (quirk 5,
    SURVEY.md §2.12).
    """
    raw = spark.read.json(path)
    to_map = lambda c: F.from_json(F.to_json(c), "map<string,string>")
    nodes = raw.filter(F.col("type") == "node").select(
        F.col("id").cast("string").alias("node_id"),
        F.col("labels")[0].alias("label"),
        F.col("labels").alias("labels"),
        to_map(F.col("properties")).alias("props"),
    )
    edges = raw.filter(F.col("type") == "relationship").select(
        F.col("start.id").cast("string").alias("src"),
        F.col("end.id").cast("string").alias("dst"),
        F.col("start.labels")[0].alias("src_label"),
        F.col("label").alias("rel_type"),
        F.col("end.labels")[0].alias("tgt_label"),
        to_map(F.col("properties")).alias("props"),
    )
    return nodes, edges


def read_exported_graph(
    spark,
    export_dir: str,
    manifest,
) -> tuple[dict[str, DataFrame], dict[str, DataFrame]]:
    """Round-trip reader for the engine's own CSV export: given the
    export directory and its ``ExportManifest``, load every node label
    and relationship pattern back as DataFrames — the "re-import what
    you exported" path a Data-Importer-shaped pipeline needs for
    verification, incremental re-export diffs, and downstream Spark
    jobs over already-exported data.

    Columns come back as strings with the export's ``NULL`` sentinel
    restored to real nulls (the export stringifies every value — type
    recovery is the importer's job, mirroring the reference's contract).
    Works identically for single-file and sharded exports: the sharded
    layout is a directory of part files with one header each, which the
    Spark CSV reader consumes as-is. Scans stay lazy and schema-pinned
    (no inferSchema pass over 100 TB of CSV).
    """
    import os

    from pyspark.sql import types as T

    def _read(path: str, columns: list[str]) -> DataFrame:
        schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in columns]
        )
        return (
            spark.read.schema(schema)
            .option("header", True)
            .option("nullValue", "NULL")
            .csv(path)
        )

    nodes = {}
    for label, entry in manifest.nodes.items():
        single = os.path.join(export_dir, f"{label}.csv")
        path = single if os.path.exists(single) else os.path.join(
            export_dir, label
        )
        nodes[label] = _read(path, entry.columns)
    rels = {}
    for key, entry in manifest.rels.items():
        single = os.path.join(export_dir, f"{key}.csv")
        path = single if os.path.exists(single) else os.path.join(
            export_dir, key
        )
        rels[key] = _read(path, entry.all_properties)
    return nodes, rels
