"""Property-graph source round-trips: partitioned parquet and the
apoc-style JSONL compatibility reader."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.sources.property_graph import (
    edges_from_view,
    nodes_from_view,
    read_apoc_jsonl_graph,
    read_partitioned_graph,
    write_partitioned_graph,
)
from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
    load_graph_view,
)


def test_partitioned_graph_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    view = load_graph_view(spark, sf_dir)
    nodes, edges = nodes_from_view(view), edges_from_view(view)
    path = str(tmp_path / "graph")
    write_partitioned_graph(nodes, edges, path)
    rn, re_ = read_partitioned_graph(spark, path)
    assert rn.count() == nodes.count()
    assert re_.count() == edges.count()
    # label filter partition-prunes: the predicate appears as a partition
    # filter on the scan (not a post-scan data filter)
    one = rn.filter(F.col("label") == "Customer")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "label" in plan.split("PartitionFilters")[1][:120]
    assert one.count() == view.nodes["Customer"].count()


def test_apoc_jsonl_reader(spark, tmp_path):
    lines = [
        {"type": "node", "id": "0", "labels": ["Customer", "VIP"],
         "properties": {"name": "Ada", "balance": 10.5}},
        {"type": "node", "id": "1", "labels": ["Order"],
         "properties": {"total": 99}},
        {"type": "relationship", "label": "PLACED",
         "start": {"id": "0", "labels": ["Customer", "VIP"]},
         "end": {"id": "1", "labels": ["Order"]},
         "properties": {"at": "2024-01-01"}},
    ]
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(json.dumps(l) for l in lines))
    nodes, edges = read_apoc_jsonl_graph(spark, str(p))
    n = {r["node_id"]: r for r in nodes.collect()}
    assert n["0"]["label"] == "Customer" and n["0"]["labels"] == ["Customer", "VIP"]
    assert n["0"]["props"]["name"] == "Ada"
    assert n["1"]["props"]["total"] == "99"  # stringly-typed bag
    e = edges.collect()[0]
    assert (e["src"], e["dst"], e["rel_type"]) == ("0", "1", "PLACED")
    assert (e["src_label"], e["tgt_label"]) == ("Customer", "Order")
    assert e["props"]["at"] == "2024-01-01"


def test_apoc_jsonl_roundtrip(spark, sf_dir, tmp_path):
    from neo4j_database_to_data_importer_package_spark.sources.property_graph import (
        write_apoc_jsonl_graph,
    )

    view = load_graph_view(spark, sf_dir)
    nodes, edges = nodes_from_view(view), edges_from_view(view)
    path = str(tmp_path / "dump")
    write_apoc_jsonl_graph(nodes, edges, path)
    rn, re_ = read_apoc_jsonl_graph(spark, path)
    assert rn.count() == nodes.count()
    assert re_.count() == edges.count()
    # spot-check lossless property bags for one label
    a = {r["node_id"]: r["props"] for r in nodes.filter(F.col("label") == "Nation").collect()}
    b = {r["node_id"]: r["props"] for r in rn.filter(F.col("label") == "Nation").collect()}
    assert a == b
    # edge endpoints and types survive
    ea = sorted((r["src"], r["rel_type"], r["dst"]) for r in edges.collect())
    eb = sorted((r["src"], r["rel_type"], r["dst"]) for r in re_.collect())
    assert ea == eb


def test_partitioned_graph_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the second built-in columnar format: same layout, same
    pruning, same map-typed property column."""
    from neo4j_database_to_data_importer_package_spark.sources.property_graph import (
        edges_from_view,
        nodes_from_view,
        read_partitioned_graph,
        write_partitioned_graph,
    )
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        load_graph_view,
    )

    view = load_graph_view(spark, sf_dir)
    nodes, edges = nodes_from_view(view), edges_from_view(view)
    path = str(tmp_path / "g_orc")
    write_partitioned_graph(nodes, edges, path, fmt="orc")
    rn, re_ = read_partitioned_graph(spark, path, fmt="orc")
    assert rn.count() == nodes.count()
    assert re_.count() == edges.count()
    one = rn.filter("label = 'Customer'")
    assert one.count() == view.nodes["Customer"].count()


def test_missing_sf_dir_raises_clean_analysis_exception(spark):
    """A bad data directory must surface as Spark's PATH_NOT_FOUND
    AnalysisException at first action — never a partial result."""
    import pytest
    from pyspark.errors import AnalysisException

    from neo4j_database_to_data_importer_package_spark import registry

    df = None
    with pytest.raises(AnalysisException) as ei:
        df = registry.QUERIES["q1_pricing_summary"](
            spark, "/root/testdata/sf_does_not_exist"
        )
        df.count()
    assert "PATH_NOT_FOUND" in str(ei.value) or "Path does not exist" in str(
        ei.value
    )
