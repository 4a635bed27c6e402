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
