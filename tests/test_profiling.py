"""Column profiler: exact vs approx modes, null accounting."""

from __future__ import annotations

from neo4j_database_to_data_importer_package_spark.operators.profiling import column_profile


def test_exact_profile_known_table(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")], "k long, s string"
    )
    got = {r["column"]: r for r in column_profile(df, ["k", "s"], exact=True).collect()}
    assert got["k"]["n_rows"] == 4
    assert got["k"]["n_nulls"] == 0
    assert got["k"]["n_distinct"] == 3
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("1", "3")
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2  # countDistinct skips NULL
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")


def test_approx_profile_single_pass_no_expand(spark):
    """HLL mode must not plan an Expand (the exact-mode row-replication
    operator) — that is the whole point of the scale path."""
    df = spark.range(1000).selectExpr("id AS a", "id % 7 AS b")
    prof = column_profile(df, ["a", "b"], exact=False)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    got = {r["column"]: r["n_distinct"] for r in prof.collect()}
    assert got["b"] == 7  # HLL is exact at tiny cardinalities
