"""Round-7 registrations: driver-visible v2.4 / v0.1 model surfaces."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def v24_rows(spark):
    from neo4j_database_to_data_importer_package_spark.registry import QUERIES

    return QUERIES["model_v24_table_schemas"](spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def v01_rows(spark):
    from neo4j_database_to_data_importer_package_spark.registry import QUERIES

    return QUERIES["model_v01_file_schemas"](spark, SF_DIR).collect()


def test_v24_one_key_per_label_and_it_is_the_identifier(v24_rows):
    """The nodeKeyProperties chain (node $ref → global-counter p:{n} →
    property token) must resolve to exactly the identifier column of
    every label — the reference's fallback rule on a constraint-less
    database (first-column fallback, neo4j_export.py:783-788)."""
    from neo4j_database_to_data_importer_package_spark.registry._core import (
        TPCH_GRAPH_SPEC,
    )

    ident_by_table = {f"{n.label}.csv": n.id_col for n in TPCH_GRAPH_SPEC.nodes}
    keys = {}
    for r in v24_rows:
        if r["is_node_key"]:
            keys.setdefault(r["table_name"], []).append(r["field"])
    assert keys == {t: [c] for t, c in ident_by_table.items()}


def test_v24_sample_types_track_the_inference_grammar(v24_rows):
    """Identifier samples are integers; name columns are strings; every
    sample is the 50-char-truncated exporter ``str()`` render."""
    by = {(r["table_name"], r["field"]): r for r in v24_rows}
    assert by[("Customer.csv", "c_custkey")]["recommended_type"] == "integer"
    assert by[("Customer.csv", "c_name")]["recommended_type"] == "string"
    assert by[("Order.csv", "o_totalprice")]["recommended_type"] == "float"
    # timestamp renders as the Python str() wall-clock form
    od = by[("Order.csv", "o_orderdate")]["sample_value"]
    assert len(od) == 19 and od[4] == "-" and od[10] == " ", od
    for r in v24_rows:
        assert len(r["sample_value"]) <= 50
        assert not r["nullable"]  # min-identifier rows have no empty cells


def test_v01_matches_v24_on_the_shared_surface(spark, v24_rows, v01_rows):
    """v0.1 fileSchemas carry the same (file, field, type, sample)
    surface as v2.4 tableSchemas (both flow through the same sample +
    inference); the v0.1 key chain (minted UUID → key.properties) must
    agree with v2.4's nodeKeyProperties."""
    v24 = {
        (r["table_name"], r["field"]): (
            r["recommended_type"], r["sample_value"], r["is_node_key"]
        )
        for r in v24_rows
    }
    v01 = {
        (r["filename"], r["field"]): (r["field_type"], r["sample_value"], r["is_key"])
        for r in v01_rows
    }
    assert v24 == v01
