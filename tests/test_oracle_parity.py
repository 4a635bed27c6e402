"""Mirror of the driver's t2 gate: every registered query with an oracle
must hash-match DuckDB on the same parquet tables (sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from neo4j_database_to_data_importer_package_spark import registry

from oracle_utils import compare_query

_WITH_ORACLE = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, name, registry.QUERIES[name], registry.ORACLES[name], sf_dir)


_ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    # The driver's canonicalizer sorts a pandas frame by every column —
    # array/map/struct top-level columns are unhashable there and crash the
    # gate (round-1 multimodal_features). Every gate output must be scalar.
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: non-scalar gate columns {complex_cols} — serialize them "
        "(F.to_json) before returning from the registry entry"
    )
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
