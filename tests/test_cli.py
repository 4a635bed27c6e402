"""CLI end-to-end: the engine's main() runs the full export DAG."""

from __future__ import annotations

import json
import os
import zipfile

from neo4j_database_to_data_importer_package_spark.cli import main


def test_cli_full_export_with_zip(tmp_path, spark):
    out = tmp_path / "export"
    zip_path = tmp_path / "custom.zip"
    rc = main(
        [
            "--input-dir", "/root/testdata/sf0.001",
            "--output-dir", str(out),
            "--format-version", "3.0",
            "--zip", str(zip_path),
        ]
    )
    assert rc == 0
    files = sorted(os.listdir(out))
    assert "Customer.csv" in files and "neo4j_importer_model.json" in files
    assert any(f.endswith("_PLACED_Order.csv") or "_PLACED_" in f for f in files)
    model = json.loads((out / "neo4j_importer_model.json").read_text())
    assert model["version"].startswith("3.0")
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
        assert "neo4j_importer_model.json" in names
        assert "Customer.csv" in names


def test_cli_reference_readme_command_line_no_zip(tmp_path, spark):
    """Mirror of the reference README example (README.md:84-97) with the
    short connection/output flags; --no-zip skips packaging."""
    out = tmp_path / "myexport"
    rc = main(
        [
            "-u", "bolt://localhost",
            "-U", "neo4j",
            "-P", "password",
            "-o", str(out),
            "-f", "2.4.0",
            "--no-zip",
            "--profile", "reference",
            "--input-dir", "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    files = sorted(os.listdir(out))
    assert "Customer.csv" in files and "neo4j_importer_model.json" in files
    model = json.loads((out / "neo4j_importer_model.json").read_text())
    assert model["version"].startswith("2.4")
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".zip")]


def test_cli_reference_profile_zips_by_default(tmp_path, spark):
    """Reference contract: zip is created unless --no-zip
    (neo4j_export.py:1463), auto-named {base}-export-{timestamp}.zip."""
    out = tmp_path / "myexport"
    rc = main(
        [
            "--profile", "reference",
            "-o", str(out),
            "--input-dir", "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    zips = [f for f in os.listdir(tmp_path) if f.endswith(".zip")]
    assert len(zips) == 1
    assert zips[0].startswith("myexport-export-")
    with zipfile.ZipFile(tmp_path / zips[0]) as z:
        assert "neo4j_importer_model.json" in z.namelist()


def test_cli_neo4j_source_reachable_but_offline(tmp_path, spark):
    """--source neo4j wires -u/-U/-P/-d into the Neo4jConnectorSource
    seam; without the connector jar it must fail with the actionable
    error, not a bare ClassNotFoundException."""
    import pytest

    with pytest.raises(RuntimeError, match="neo4j-spark-connector"):
        main(
            [
                "--source", "neo4j",
                "-u", "bolt://nowhere:7687",
                "-o", str(tmp_path / "out"),
            ]
        )


def test_cli_reference_custom_zip_name(tmp_path, spark):
    """-z renames the zip (S13, neo4j_export.py:1466-1470)."""
    out = tmp_path / "myexport"
    rc = main(
        [
            "--profile", "reference",
            "-o", str(out),
            "-z", str(tmp_path / "custom_name.zip"),
            "--input-dir", "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    assert (tmp_path / "custom_name.zip").exists()
    assert [f for f in os.listdir(tmp_path) if f.endswith(".zip")] == ["custom_name.zip"]


def test_cli_profile_columns_and_shard_output(tmp_path, spark):
    """Round-4 (VERDICT r03 #8): --profile-columns writes the per-column
    stats CSV and --shard-output N writes hash-sharded parquet per node
    table plus a shard manifest, alongside the normal export."""
    import csv

    out = tmp_path / "export"
    rc = main(
        [
            "--input-dir", "/root/testdata/sf0.001",
            "--output-dir", str(out),
            "--no-zip",
            "--profile-columns",
            "--shard-output", "4",
        ]
    )
    assert rc == 0
    # normal export still intact
    assert "Customer.csv" in os.listdir(out)

    # column profiles: long-form, one row per (label, column)
    with open(out / "column_profiles.csv") as f:
        rows = list(csv.DictReader(f))
    labels = {r["label"] for r in rows}
    assert "Customer" in labels and "Order" in labels
    # profiles run on the SOURCE view (pre-export property names)
    cust_id = [r for r in rows if r["label"] == "Customer" and r["column"] == "c_custkey"]
    assert cust_id, rows[:5]
    assert int(cust_id[0]["n_nulls"]) == 0
    assert int(cust_id[0]["n_rows"]) > 0

    # shards: N parquet shard dirs per label + manifest counts that sum
    # to the table row count
    manifest = json.loads((out / "shard_manifest.json").read_text())
    assert manifest["Customer"]["n_shards"] == 4
    n_csv = sum(1 for _ in open(out / "Customer.csv")) - 1  # header
    assert sum(manifest["Customer"]["shards"].values()) == n_csv
    shard_dir = out / "shards" / "Customer" / "shards"
    assert shard_dir.is_dir()
    back = spark.read.parquet(str(shard_dir))
    assert back.count() == n_csv
    assert back.select("shard_id").distinct().count() <= 4
