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
import os
import sys

# Runnable as `python tools/live_neo4j_smoke.py` from anywhere: the
# engine package lives at the repo root, which is NOT on sys.path when
# the interpreter starts from the script's own directory (found during
# the round-11 pin re-check — the documented dry-run invocation failed
# with ModuleNotFoundError outside spark-submit/pytest contexts).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def build_spec(spec_json: dict):
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        EdgeSpec,
        GraphSpec,
        NodeSpec,
    )

    # Reject unknown top-level keys instead of silently ignoring them: a
    # spec typo'd as {"relationships": [...]} used to produce an
    # edge-less spec and a misleading "dry-run OK" (found re-checking
    # the seam in round 12).
    unknown = set(spec_json) - {"nodes", "edges"}
    if unknown:
        raise SystemExit(
            f"unknown spec keys {sorted(unknown)}: a graph spec has "
            f"'nodes' and optional 'edges' (see module docstring)"
        )

    # Same discipline for the required key itself (ADVICE r13): a spec
    # with only "edges" used to die on a bare KeyError at
    # spec_json["nodes"], inconsistent with the named errors below.
    if "nodes" not in spec_json:
        raise SystemExit(
            "graph spec is missing the required 'nodes' key: a graph "
            "spec has 'nodes' and optional 'edges' (see module docstring)"
        )

    # Same discipline per entry (found re-checking the seam in round
    # 13): a node typo'd as {"label": ..., "id": ...} used to die on a
    # bare KeyError, and an extra key like "properties" was silently
    # dropped — name the allowed vocabulary in the error instead.
    for n in spec_json["nodes"]:
        unknown = set(n) - {"label", "table", "id_col"}
        if unknown:
            raise SystemExit(
                f"unknown node spec keys {sorted(unknown)} in {n!r}: a "
                f"node has 'label', 'id_col', optional 'table'"
            )
        if "label" not in n or "id_col" not in n:
            raise SystemExit(f"node spec {n!r} needs 'label' and 'id_col'")
    for e in spec_json.get("edges", ()):
        unknown = set(e) - {
            "src_label", "rel_type", "tgt_label",
            "table", "src_col", "tgt_col", "props",
        }
        if unknown:
            raise SystemExit(
                f"unknown edge spec keys {sorted(unknown)} in {e!r}: an "
                f"edge has 'src_label', 'rel_type', 'tgt_label', optional "
                f"'table'/'src_col'/'tgt_col'/'props'"
            )
        missing = {"src_label", "rel_type", "tgt_label"} - set(e)
        if missing:
            raise SystemExit(f"edge spec {e!r} missing {sorted(missing)}")

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


def dry_run(spark: SparkSession, args, spec) -> int:
    """Print and VERIFY the full connector option set this tool would
    send — one read per node label and edge pattern — without touching
    the network (VERDICT r06 directive #7). A recording reader captures
    every options dict the adapter emits and returns empty frames in
    the connector's documented wire shape; each captured set is checked
    key-for-key against ``sources.base.CONNECTOR_PIN`` (the same pin the
    offline wire-fixture test enforces), so seam drift fails here before
    it could fail against a live server."""
    from neo4j_database_to_data_importer_package_spark.sources import (
        CONNECTOR_PIN,
        Neo4jConnectorSource,
    )

    id_props = {n.label: n.id_col for n in spec.nodes}
    captured: list[dict] = []

    def reader(sess, options):
        captured.append(dict(options))
        if "labels" in options:
            label = options["labels"].lstrip(":")
            return sess.createDataFrame(
                [],
                f"`<id>` BIGINT, `<labels>` ARRAY<STRING>, "
                f"`{id_props[label]}` STRING",
            )
        src = options["relationship.source.labels"].lstrip(":")
        tgt = options["relationship.target.labels"].lstrip(":")
        e = next(
            x
            for x in spec.edges
            if x.rel_type == options["relationship"]
            and x.src_label == src
            and x.tgt_label == tgt
        )
        cols = [
            "`<rel.id>` BIGINT",
            "`<rel.type>` STRING",
            f"`source.{id_props[src]}` STRING",
            f"`target.{id_props[tgt]}` STRING",
        ] + [f"`rel.{p}` STRING" for p in e.props]
        return sess.createDataFrame([], ", ".join(cols))

    source = Neo4jConnectorSource(
        args.uri,
        user=args.user,
        password=args.password,
        database=args.database,
        spec=spec,
        reader=reader,
    )
    source.load(spark)

    base = source._base_options()
    failures = []
    want_auth = set(CONNECTOR_PIN["auth_option_keys"])
    if args.database:
        want_auth |= set(CONNECTOR_PIN["optional_auth_option_keys"])
    if set(base) != want_auth:
        failures.append(f"auth options drift: {sorted(base)} != {sorted(want_auth)}")
    for opts in captured:
        keys = sorted(opts)
        if "labels" in opts:
            want = sorted(CONNECTOR_PIN["node_option_keys"])
        else:
            want = sorted(CONNECTOR_PIN["relationship_option_keys"])
        if keys != want:
            failures.append(f"read options drift: {keys} != {want}")
    n_reads = len(spec.nodes) + len(spec.edges)
    if len(captured) != n_reads:
        failures.append(f"expected {n_reads} reads, adapter issued {len(captured)}")

    shown_base = {**base}
    if "authentication.basic.password" in shown_base:
        shown_base["authentication.basic.password"] = "********"
    print(f"format: {CONNECTOR_PIN['format']}")
    print(f"pinned connector: {CONNECTOR_PIN['version']}")
    print(f"base options (every read): {json.dumps(shown_base, sort_keys=True)}")
    for opts in captured:
        print(f"read: {json.dumps(opts, sort_keys=True)}")
    if failures:
        for f in failures:
            print(f"DRIFT: {f}", file=sys.stderr)
        return 1
    print(f"dry-run OK: {len(captured)} reads, option sets match CONNECTOR_PIN")
    return 0


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
        "--dry-run",
        action="store_true",
        help="print + verify the full connector option set that would be "
        "sent (no network, no connector jar needed) and exit",
    )
    ap.add_argument(
        "--connector-package",
        default=None,
        help="maven coordinate to add via spark.jars.packages, e.g. "
        "org.neo4j:neo4j-connector-apache-spark_2.13:5.3.0_for_spark_3",
    )
    args = ap.parse_args(argv)

    # Flag validation BEFORE any Spark/JVM boot: with --connector-package
    # the builder resolves jars over the network, which must not happen
    # for an invocation that is about to be rejected (round-11 review).
    if args.discover and args.dry_run:
        # Discovery is a live catalog read (CALL db.labels() via the
        # connector) — there is nothing to dry-run, and silently going
        # to the network under --dry-run would betray the flag's
        # promise (round-11 pin re-check).
        ap.error("--discover needs a live server; it cannot be combined "
                 "with --dry-run (use --spec for the offline check)")
    if not args.discover and not args.spec:
        ap.error("--spec is required unless --discover is given")

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
    with open(args.spec, encoding="utf-8") as f:
        spec = build_spec(json.load(f))

    if args.dry_run:
        return dry_run(spark, args, spec)

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
