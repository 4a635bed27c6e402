"""Node/relationship export pipeline semantics (FIXTURES.md B4/B7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators.node_export import (
    export_node_table,
    ordered_columns,
)
from neo4j_database_to_data_importer_package_spark.operators.rel_export import (
    endpoint_column_names,
    export_relationship_table,
)
from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
    EdgeSpec,
    GraphSpec,
    GraphView,
    NodeSpec,
)
from neo4j_database_to_data_importer_package_spark.catalog import GraphCatalog


def test_ordered_columns_identifier_first():
    assert ordered_columns(["b", "id", "a", "c"], "id") == ["id", "a", "b", "c"]


def test_node_export_sentinel_filter_and_order(spark):
    rows = [
        ("k1", "x"),
        (None, "x"),  # duplicate aaa → aaa loses tier 4 despite sorting first
        ("", "z"),
        ("NULL", "w"),
        ("k2", "NULL"),  # sentinel in NON-id column survives
    ]
    df = spark.createDataFrame(rows, "serial string, aaa string")
    out, ident = export_node_table(df, "W")
    assert ident == "serial"
    got = [(r["serial"], r["aaa"]) for r in out.collect()]
    assert sorted(got) == [("k1", "x"), ("k2", "NULL")]
    assert out.columns == ["serial", "aaa"]


def _mini_view(spark, same_prop=False):
    people = spark.createDataFrame(
        [("p1", "alice"), ("p2", "bob"), ("p3", "carol")], "pid string, name string"
    )
    knows = spark.createDataFrame(
        [("p1", "p2", "2020"), ("p2", "p2", "2021"), ("p9", "p1", "2022"), ("", "p3", "2023")],
        "src_pid string, dst_pid string, since string",
    )
    spec = GraphSpec(
        nodes=[NodeSpec("Person", "person", "pid")],
        edges=[EdgeSpec("Person", "KNOWS", "Person", "knows", "src_pid", "dst_pid", ("since",))],
    )
    return GraphView(spark, spec, {"Person": people}, {"person": people, "knows": knows}, GraphCatalog())


def test_self_relationship_column_naming():
    spec = EdgeSpec("Person", "KNOWS", "Person", "knows", "s", "d")
    assert endpoint_column_names(spec, "pid", "pid") == ("Person_pid_source", "Person_pid_target")
    spec2 = EdgeSpec("Customer", "PLACED", "Order", "orders", "s", "d")
    assert endpoint_column_names(spec2, "c_custkey", "o_orderkey") == (
        "Customer_c_custkey", "Order_o_orderkey"
    )


def test_rel_export_self_rel_and_dangling(spark):
    view = _mini_view(spark)
    df = export_relationship_table(view, view.spec.edges[0], {"Person": "pid"})
    assert df.columns == ["Person_pid_source", "Person_pid_target", "since"]
    rows = sorted((r[0], r[1]) for r in df.collect())
    # p9 edge dropped (dangling source), "" edge dropped (sentinel), self-loop kept
    assert rows == [("p1", "p2"), ("p2", "p2")]


def test_rel_export_skips_missing_identifier(spark):
    view = _mini_view(spark)
    assert export_relationship_table(view, view.spec.edges[0], {}) is None
