"""Export → re-import round trip: the engine must be able to consume its
own CSV export losslessly (modulo the documented stringification), for
both the single-file and the sharded layouts.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.plans.exporter import GraphExporter
from neo4j_database_to_data_importer_package_spark.sources.property_graph import (
    read_exported_graph,
)
from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
    load_graph_view,
)


@pytest.fixture(scope="module")
def view(spark, sf_dir):
    return load_graph_view(spark, sf_dir)


@pytest.fixture(scope="module", params=[True, False], ids=["single", "sharded"])
def roundtrip(request, view, tmp_path_factory, spark):
    out = tmp_path_factory.mktemp(f"rt_{request.param}")
    exporter = GraphExporter(
        view,
        str(out),
        clock=lambda: datetime(2026, 1, 2, 3, 4, 5),
        single_file=request.param,
    )
    result = exporter.run()
    nodes, rels = read_exported_graph(spark, str(out), result.manifest)
    return view, result, nodes, rels


def test_roundtrip_row_counts(roundtrip):
    view, result, nodes, rels = roundtrip
    for label, df in nodes.items():
        assert df.count() == view.nodes[label].count(), label
    for key, df in rels.items():
        n = df.count()
        assert n > 0, key
        if result.manifest.rels[key].row_count is not None:
            assert n == result.manifest.rels[key].row_count, key
    # spot-check a pattern whose cardinality the source fixes exactly
    assert (
        rels["Customer_PLACED_Order"].count() == view.nodes["Order"].count()
    )


def test_roundtrip_columns_match_manifest(roundtrip):
    _, result, nodes, rels = roundtrip
    for label, df in nodes.items():
        assert df.columns == result.manifest.nodes[label].columns, label
    for key, df in rels.items():
        assert df.columns == result.manifest.rels[key].all_properties, key


def test_roundtrip_identifier_unique_and_joinable(roundtrip):
    """The re-imported graph must be internally consistent: identifiers
    unique per label, and every edge endpoint resolves against the
    re-imported node tables (a semi-join loses nothing)."""
    _, result, nodes, rels = roundtrip
    for label, entry in result.manifest.nodes.items():
        df = nodes[label]
        assert (
            df.select(entry.identifier).distinct().count() == df.count()
        ), label
    entry = result.manifest.rels["Customer_PLACED_Order"]
    edges = rels["Customer_PLACED_Order"]
    cust = nodes["Customer"].select(
        F.col(result.manifest.nodes["Customer"].identifier).alias("__id")
    )
    resolved = edges.join(
        cust, edges[entry.source_col_name] == cust["__id"], "left_semi"
    )
    assert resolved.count() == edges.count()


def test_roundtrip_null_sentinel_restored(roundtrip, spark):
    """Values written as the NULL sentinel come back as real nulls."""
    _, result, nodes, _ = roundtrip
    # the fixture graph has no genuine nulls; check the reader mechanics
    # directly on a crafted file instead
    import csv as _csv
    import tempfile, os

    d = tempfile.mkdtemp()
    p = os.path.join(d, "X.csv")
    with open(p, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["id", "prop"])
        w.writerow(["1", "NULL"])
        w.writerow(["2", "ok"])

    class _E:
        columns = ["id", "prop"]

    class _M:
        nodes = {"X": _E()}
        rels = {}

    nodes2, _ = read_exported_graph(spark, d, _M())
    rows = {r["id"]: r["prop"] for r in nodes2["X"].collect()}
    assert rows["1"] is None and rows["2"] == "ok"
