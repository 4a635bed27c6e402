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


def test_streaming_daily_rollup_evicts_each_day_exactly_once(spark, tmp_path):
    """Stream-vs-batch parity for the ProcessingTimeTimeout eviction
    operator (VERDICT r06 #6): a day spanning two files must keep
    accumulating (batch data beats an expired timer), every closed day
    must flush exactly once with full totals, and days still open at
    end-of-data must evict in the post-drain timeout batches."""
    import glob
    import os
    import shutil
    import time

    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        run_stream_until_count,
    )
    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        streaming_daily_rollup_evicted as op,
    )

    files = [
        [("d1", 10), ("d1", 5)],
        [("d1", 1), ("d2", 7)],   # d1 spans the file boundary
        [("d3", 42)],             # open at end-of-data -> post-drain evict
    ]
    tmp = str(tmp_path / "replay")
    os.makedirs(tmp)
    t0 = time.time() - 3600
    for k, rows in enumerate(files):
        df = spark.createDataFrame(rows, "day string, cents long")
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/_s")
        part = glob.glob(f"{tmp}/_s/part-*.parquet")[0]
        dst = f"{tmp}/{k:02d}.parquet"
        shutil.move(part, dst)
        os.utime(dst, (t0 + k, t0 + k))
    shutil.rmtree(f"{tmp}/_s")
    schema = spark.read.parquet(f"{tmp}/00.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    got = run_stream_until_count(
        op(stream), "t_r7_evict", target_rows=3, state_partitions=2,
        timeout_sec=120,
    ).collect()
    emitted = sorted((r["day"], r["n_events"], r["sum_value"]) for r in got)
    assert emitted == [("d1", 3, 0.16), ("d2", 1, 0.07), ("d3", 1, 0.42)]
    assert len(got) == 3  # exactly one flush per day — no split emissions
