"""CLI entry point — the engine's ``main()`` (reference
``neo4j_export.py:1336-1473``): parse args, resolve config, run the
export DAG, optionally move the zip to a custom path.

Flag surface is a superset of the reference's
(``neo4j_export.py:1336-1409``, ``README.md:75-97``): the short
connection/output flags ``-u/-U/-P/-d/-o/-f/-z`` and ``--no-zip`` are
accepted verbatim, alongside the engine's long-form flags. Under
``--profile reference`` the zip is created by default exactly like the
reference (``create_zip = not args.no_zip``, ``:1463``); the engine
profile keeps zip opt-in.

Usage:
    python -m neo4j_database_to_data_importer_package_spark.cli \
        --input-dir /root/testdata/sf0.001 -o /tmp/export -f 3.0 -z out.zip
"""

from __future__ import annotations

import argparse
import sys

from .config import load_config
from .plans.exporter import GraphExporter
from .session import get_spark
from .sinks.zip_sink import move_zip
from .sources.star_schema import load_graph_view


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="PySpark graph → relational export engine",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Configuration Priority (highest to lowest):
  1. Command line arguments
  2. Environment variables (GRAPH_EXPORT_*, then NEO4J_URI/NEO4J_USER/
     NEO4J_PASSWORD/NEO4J_DATABASE/OUTPUT_DIR/FORMAT_VERSION)
  3. .env file
  4. Default values

Examples:
  %(prog)s -u bolt://localhost -U neo4j -P password -o myexport --profile reference
  %(prog)s --env-file .env.production -o myexport
""",
    )
    conn = p.add_argument_group("connection options")
    conn.add_argument("-u", "--uri", dest="uri",
                      help="Neo4j connection URI (default: bolt://localhost or NEO4J_URI)")
    conn.add_argument("-U", "--user", dest="user",
                      help="Neo4j username (default: neo4j or NEO4J_USER)")
    conn.add_argument("-P", "--password", dest="password",
                      help="Neo4j password (default: password or NEO4J_PASSWORD)")
    conn.add_argument("-d", "--database", dest="database",
                      help="Neo4j database name (optional, NEO4J_DATABASE)")

    out = p.add_argument_group("output options")
    p.add_argument("--input-dir", dest="input_dir", help="star-schema parquet directory")
    out.add_argument("-o", "--output", "--output-dir", dest="output_dir",
                     help="output directory/basename for export")
    out.add_argument("-f", "--format", "--format-version", dest="format_version",
                     choices=["3.0", "2.4.0", "0.1.0"],
                     help="importer model format (default 3.0 or FORMAT_VERSION)")
    out.add_argument("-z", "--zip", dest="zip",
                     help="custom zip file name (default: auto-generated with timestamp)")
    out.add_argument("--no-zip", dest="no_zip", action="store_true",
                     help="skip creating zip file (only export CSVs and JSON)")

    p.add_argument("--profile", dest="profile", choices=["engine", "reference"],
                   help="'reference' replicates the reference CLI contract "
                        "(zip on by default); default 'engine'")
    p.add_argument("--source", dest="source", choices=["star", "neo4j"], default="star",
                   help="graph source: 'star' reads --input-dir parquet (default); "
                        "'neo4j' reads a live server via the public "
                        "neo4j-spark-connector using -u/-U/-P/-d")
    p.add_argument("--no-single-file", dest="single_file", action="store_const", const="false",
                   help="sharded CSV + manifest (100 TB mode) instead of one file per table")
    p.add_argument("--profile-columns", dest="profile_columns", action="store_true",
                   help="also write column_profiles.csv (per-column null/distinct/"
                        "min/max stats for every node table, HLL mode)")
    p.add_argument("--shard-output", dest="shard_output", type=int, metavar="N",
                   help="also write every node table as N hash-sharded parquet "
                        "files under <output>/shards/<label>/ with a "
                        "shard_manifest.json (bulk 100 TB export path)")
    p.add_argument("--compat-render", dest="compat_render", action="store_const", const="true",
                   help="Python str() value rendering parity (slow path)")
    p.add_argument("--no-quirks", dest="quirks", action="store_const", const="false",
                   help="fixed semantics instead of bit-compat quirk reproduction")
    p.add_argument("--env-file", dest="env_file", help="optional .env file")
    return p.parse_args(argv)


def _write_column_profiles(view, output_dir: str) -> str:
    """One long-form CSV of per-column stats across every node table
    (label, column, n_rows, n_nulls, n_distinct, min_value, max_value).
    HLL mode: a single aggregation pass per table, no expand — the shape
    that still runs in one job per table at 100 TB."""
    import os

    from pyspark.sql import functions as F

    from .operators.profiling import column_profile
    from .sinks.csv_sink import write_csv_single_file

    profiles = None
    for label, df in sorted(view.nodes.items()):
        prof = column_profile(df, df.columns, exact=False).select(
            F.lit(label).alias("label"), "*"
        )
        profiles = prof if profiles is None else profiles.unionByName(prof)
    path = os.path.join(output_dir, "column_profiles.csv")
    write_csv_single_file(profiles, path)
    return path


def _write_output_shards(view, identifiers: dict, output_dir: str, n_shards: int) -> str:
    """Hash-sharded parquet bulk export: every node table split into
    ``n_shards`` deterministic md5 shards on its identifier column, plus
    one shard_manifest.json with per-shard row counts."""
    import json
    import os

    from .sinks.shard_sink import write_corpus_shards

    manifest = {}
    for label, df in sorted(view.nodes.items()):
        out = write_corpus_shards(
            df,
            os.path.join(output_dir, "shards", label),
            n_shards=n_shards,
            id_col=identifiers[label],
        )
        manifest[label] = {
            "id_col": identifiers[label],
            "n_shards": out["n_shards"],
            "shards": out["shards"],
        }
    path = os.path.join(output_dir, "shard_manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return path


def main(argv=None) -> int:
    args = parse_args(argv)
    cli = {
        k: v
        for k, v in vars(args).items()
        if k not in ("env_file", "no_zip", "profile_columns", "shard_output")
    }
    # --no-zip beats -z, as in the reference (neo4j_export.py:1463: the
    # custom name is only applied when a zip was created at all).
    if args.no_zip:
        cli["create_zip"] = "false"
    elif args.zip:
        cli["create_zip"] = "true"
    cfg = load_config(cli_args=cli, env_file=args.env_file)

    if cfg.profile == "reference":
        # Banner parity with the reference's main() (neo4j_export.py:1440-1449).
        print(f"Graph source: {cfg.input_dir} (connection recorded: {cfg.uri})")
        if cfg.database:
            print(f"Database: {cfg.database}")
        print(f"Output directory: {cfg.output_dir}")
        print(f"Format version: {cfg.format_version}")
        if not cfg.create_zip:
            print("Zip creation: Disabled")
        elif cfg.zip:
            print(f"Zip file: {cfg.zip}")

    spark = get_spark(app_name="graph-export")
    if args.source == "neo4j":
        from .sources.base import Neo4jConnectorSource

        view = Neo4jConnectorSource(
            cfg.uri, cfg.user, cfg.password, cfg.database
        ).load(spark)
    else:
        view = load_graph_view(spark, cfg.input_dir)
    exporter = GraphExporter(
        view,
        cfg.output_dir,
        format_version=cfg.format_version,
        single_file=cfg.single_file,
        compat_render=cfg.compat_render,
        quirks=cfg.quirks,
    )
    result = exporter.run(create_zip_file=cfg.create_zip)
    if cfg.create_zip and cfg.zip and result.zip_path:
        move_zip(result.zip_path, cfg.zip)
        result.zip_path = cfg.zip

    print(f"Exported {len(result.manifest.nodes)} node tables, "
          f"{len(result.manifest.rels)} relationship tables to {result.output_dir}")
    if result.zip_path:
        print(f"Zip: {result.zip_path}")
    if args.profile_columns:
        path = _write_column_profiles(view, result.output_dir)
        print(f"Column profiles: {path}")
    if args.shard_output:
        path = _write_output_shards(
            view, exporter.detect_identifiers(), result.output_dir, args.shard_output
        )
        print(f"Shard manifest: {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
