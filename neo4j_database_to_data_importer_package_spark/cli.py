"""CLI entry point — the engine's ``main()`` (reference
``neo4j_export.py:1336-1473``): parse args, resolve config, run the
export DAG, optionally move the zip to a custom path.

Usage:
    python -m neo4j_database_to_data_importer_package_spark.cli \
        --input-dir /root/testdata/sf0.001 --output-dir /tmp/export \
        --format-version 3.0 --zip out.zip
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
    p = argparse.ArgumentParser(description="PySpark graph → relational export engine")
    p.add_argument("--input-dir", dest="input_dir", help="star-schema parquet directory")
    p.add_argument("--output-dir", dest="output_dir", help="export output directory")
    p.add_argument(
        "--format-version",
        dest="format_version",
        choices=["3.0", "2.4.0", "0.1.0"],
        help="importer model format (default 3.0)",
    )
    p.add_argument("--zip", dest="zip", help="create zip at this exact path")
    p.add_argument("--no-single-file", dest="single_file", action="store_const", const="false",
                   help="sharded CSV + manifest (100 TB mode) instead of one file per table")
    p.add_argument("--compat-render", dest="compat_render", action="store_const", const="true",
                   help="Python str() value rendering parity (slow path)")
    p.add_argument("--no-quirks", dest="quirks", action="store_const", const="false",
                   help="fixed semantics instead of bit-compat quirk reproduction")
    p.add_argument("--env-file", dest="env_file", help="optional .env file")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cli = {k: v for k, v in vars(args).items() if k != "env_file"}
    cfg = load_config(cli_args=cli, env_file=args.env_file)
    if args.zip:
        cfg.create_zip = True

    spark = get_spark(app_name="graph-export")
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
    if cfg.zip and result.zip_path:
        move_zip(result.zip_path, cfg.zip)
        result.zip_path = cfg.zip

    print(f"Exported {len(result.manifest.nodes)} node tables, "
          f"{len(result.manifest.rels)} relationship tables to {result.output_dir}")
    if result.zip_path:
        print(f"Zip: {result.zip_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
