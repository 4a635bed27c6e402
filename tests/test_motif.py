"""Chain-pattern matcher: parser and join semantics."""

from __future__ import annotations

import pytest

from neo4j_database_to_data_importer_package_spark.operators.motif import (
    match_chain,
    parse_chain,
)


def test_parse_chain():
    start, hops = parse_chain("(A)-[T1]->(B)-[T2]->(C)")
    assert start == "A"
    assert hops == [("T1", "B"), ("T2", "C")]
    with pytest.raises(ValueError):
        parse_chain("(A)<-[T]-(B)")  # only left-to-right chains


def test_match_chain_two_hops(spark):
    edges = spark.createDataFrame(
        [
            ("c1", "o1", "Customer", "PLACED", "Order"),
            ("c1", "o2", "Customer", "PLACED", "Order"),
            ("o1", "p1", "Order", "CONTAINS", "Part"),
            ("o1", "p2", "Order", "CONTAINS", "Part"),
            ("o2", "p1", "Order", "CONTAINS", "Part"),
            # noise: wrong labels/types must not match
            ("c9", "o9", "Customer", "CANCELLED", "Order"),
            ("x1", "y1", "Supplier", "PLACED", "Order"),
        ],
        "src string, dst string, src_label string, rel_type string, tgt_label string",
    )
    rows = {
        (r["n0"], r["n1"], r["n2"])
        for r in match_chain(
            edges, "(Customer)-[PLACED]->(Order)-[CONTAINS]->(Part)"
        ).collect()
    }
    assert rows == {("c1", "o1", "p1"), ("c1", "o1", "p2"), ("c1", "o2", "p1")}


def test_match_chain_single_hop(spark):
    edges = spark.createDataFrame(
        [("a", "b", "N", "IN", "R")],
        "src string, dst string, src_label string, rel_type string, tgt_label string",
    )
    out = match_chain(edges, "(N)-[IN]->(R)")
    assert out.columns == ["n0", "n1"]
    assert out.count() == 1
