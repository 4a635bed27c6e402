#!/usr/bin/env python
"""Live-Neo4j end-to-end smoke: full export against a REAL server.

The sandbox this engine is built in has no network and no Neo4j server,
so the ``Neo4jConnectorSource`` seam (``sources/base.py``) is contract-
tested with an injected reader and a recorded wire fixture
(``tests/test_graph_source_seam.py``, ``tests/test_connector_wire_fixture.py``).
This script is the missing last mile: the day a server is reachable, it
runs the ENTIRE reference-parity pipeline — connector read → identifier
cascade → node/rel export → model generation → zip — with zero code
changes (reference behavior: ``neo4j_export.py:35`` driver connect,
``:52-56`` session reads feeding the same downstream stages).

Usage::

    spark-submit --packages org.neo4j:neo4j-connector-apache-spark_2.13:5.3.0_for_spark_3 \
        tools/live_neo4j_smoke.py \
        --uri bolt://localhost:7687 --user neo4j --password secret \
        --spec graph_spec.json --out /tmp/neo4j_export [--zip]

or plain ``python`` with ``--connector-package`` to let the script pull
the jar itself (needs internet).

``graph_spec.json`` declares what to read (the connector needs labels
and identifier properties up front; the reference discovers them from
the live catalog — run ``--discover`` first to print a starter spec
from CALL db.labels()/db.relationshipTypes() via the connector's query
read, then edit in the id/property columns)::

    {
      "nodes": [
        {"label": "Customer", "id_col": "customerID"},
        {"label": "Order",    "id_col": "orderID"}
      ],
      "edges": [
        {"src_label": "Customer", "rel_type": "PLACED", "tgt_label": "Order",
         "props": ["orderDate"]}
      ]
    }
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def build_spec(spec_json: dict):
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        EdgeSpec,
        GraphSpec,
        NodeSpec,
    )

    nodes = [
        NodeSpec(n["label"], n.get("table", n["label"]), n["id_col"])
        for n in spec_json["nodes"]
    ]
    edges = [
        EdgeSpec(
            e["src_label"],
            e["rel_type"],
            e["tgt_label"],
            e.get("table", e["rel_type"]),
            e.get("src_col", ""),
            e.get("tgt_col", ""),
            tuple(e.get("props", ())),
        )
        for e in spec_json.get("edges", ())
    ]
    return GraphSpec(nodes=nodes, edges=edges)


def discover(spark: SparkSession, base_opts: dict) -> None:
    """Print a starter spec from the live catalog (labels + rel types)."""

    def q(cypher: str):
        return (
            spark.read.format("org.neo4j.spark.DataSource")
            .options(**{**base_opts, "query": cypher})
            .load()
            .collect()
        )

    labels = [r[0] for r in q("CALL db.labels() YIELD label RETURN label")]
    rels = [
        r[0]
        for r in q(
            "CALL db.relationshipTypes() YIELD relationshipType "
            "RETURN relationshipType"
        )
    ]
    print(
        json.dumps(
            {
                "nodes": [
                    {"label": l, "id_col": "<FILL: identifier property>"}
                    for l in labels
                ],
                "edges": [
                    {
                        "src_label": "<FILL>",
                        "rel_type": t,
                        "tgt_label": "<FILL>",
                        "props": [],
                    }
                    for t in rels
                ],
            },
            indent=2,
        )
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--uri", required=True)
    ap.add_argument("--user", default="neo4j")
    ap.add_argument("--password", default="password")
    ap.add_argument("--database", default=None)
    ap.add_argument("--spec", help="graph spec JSON file (see module docstring)")
    ap.add_argument("--out", default="/tmp/neo4j_export")
    ap.add_argument("--format-version", default="3.0", choices=["3.0", "2.4.0", "0.1.0"])
    ap.add_argument("--zip", action="store_true", help="also produce the importer zip")
    ap.add_argument(
        "--discover",
        action="store_true",
        help="print a starter spec from the live catalog and exit",
    )
    ap.add_argument(
        "--connector-package",
        default=None,
        help="maven coordinate to add via spark.jars.packages, e.g. "
        "org.neo4j:neo4j-connector-apache-spark_2.13:5.3.0_for_spark_3",
    )
    args = ap.parse_args(argv)

    builder = SparkSession.builder.appName("live-neo4j-smoke")
    if args.connector_package:
        builder = builder.config("spark.jars.packages", args.connector_package)
    spark = builder.getOrCreate()

    base_opts = {
        "url": args.uri,
        "authentication.type": "basic",
        "authentication.basic.username": args.user,
        "authentication.basic.password": args.password,
    }
    if args.database:
        base_opts["database"] = args.database

    if args.discover:
        discover(spark, base_opts)
        return 0

    if not args.spec:
        ap.error("--spec is required unless --discover is given")
    with open(args.spec, encoding="utf-8") as f:
        spec = build_spec(json.load(f))

    from neo4j_database_to_data_importer_package_spark.plans.exporter import GraphExporter
    from neo4j_database_to_data_importer_package_spark.sources import Neo4jConnectorSource

    source = Neo4jConnectorSource(
        args.uri,
        user=args.user,
        password=args.password,
        database=args.database,
        spec=spec,
    )
    view = source.load(spark)
    result = GraphExporter(
        view, args.out, format_version=args.format_version
    ).run(create_zip_file=args.zip)

    print(f"export OK -> {args.out}")
    for label, entry in result.manifest.nodes.items():
        print(f"  node  {label}: identifier={entry.identifier} cols={len(entry.columns)}")
    for key, entry in result.manifest.rels.items():
        print(f"  rel   {key}: {entry.source_label}-[{entry.rel_type}]->{entry.target_label}")
    if result.zip_path:
        print(f"  zip   {result.zip_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
