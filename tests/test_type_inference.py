"""F1 parity: driver-side infer_type must be bit-exact with the
reference's Python parse rules (SURVEY.md §1.3 quirks, FIXTURES.md B6),
and the distributed infer_type_col must agree with infer_type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.functions.type_inference import (
    infer_nullable,
    infer_type,
    infer_type_col,
)

CASES = [
    ("42", "integer"),
    ("1_000", "integer"),
    ("  7 ", "integer"),
    ("-5", "integer"),
    ("+99", "integer"),
    ("3.14", "float"),
    ("nan", "float"),
    ("NaN", "float"),
    ("inf", "float"),
    ("-inf", "float"),
    ("Infinity", "float"),
    ("1e5", "float"),
    ("1E5", "float"),
    ("5.", "float"),
    (".5", "float"),
    ("1_0.5", "float"),
    ("1.5e-3", "float"),
    ("True", "boolean"),
    ("FALSE", "boolean"),
    ("tRuE", "boolean"),
    ("0x1F", "string"),
    ("hello", "string"),
    ("", "string"),
    ("NULL", "string"),
    ("--3", "string"),
    ("1__0", "string"),
    ("_1", "string"),
    ("1_", "string"),
    ("1 000", "string"),
    ("2021-01-01", "string"),
]


@pytest.mark.parametrize("value,expected", CASES)
def test_infer_type_parity(value, expected):
    # Ground truth: the same Python parse attempts the reference performs.
    assert infer_type(value) == expected


def test_infer_type_matches_python_semantics():
    # Differential check against Python's own lexers for every case.
    for value, _ in CASES:
        if not value or value == "NULL":
            expected = "string"
        else:
            try:
                int(value)
                expected = "integer"
            except ValueError:
                try:
                    float(value)
                    expected = "float"
                except ValueError:
                    expected = "boolean" if value.lower() in ["true", "false"] else "string"
        assert infer_type(value) == expected, value


def test_infer_type_col_agrees_with_driver_fn(spark):
    df = spark.createDataFrame([(v,) for v, _ in CASES], "value string")
    got = {r["value"]: r["inferred"] for r in df.select("value", infer_type_col(F.col("value")).alias("inferred")).collect()}
    for v, expected in CASES:
        assert got[v] == expected, f"distributed inference diverges on {v!r}"


def test_infer_nullable():
    assert infer_nullable("")
    assert infer_nullable("NULL")
    assert infer_nullable(None)
    assert not infer_nullable("x")
    assert not infer_nullable("0")
