"""as_of_join semantics: inclusive match, carry-forward, no-match NULLs."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators.asof import as_of_join


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_asof_inclusive_carry_and_null(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(9), "before-any"),
            (1, _ts(10), "exact-tie"),
            (1, _ts(11), "carried"),
            (1, _ts(13), "newer-wins"),
            (2, _ts(12), "other-key-no-match"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(12), 200.0), (3, _ts(1), 999.0)],
        "k int, ts timestamp, price double",
    )
    out = {
        r["tag"]: (r["asof_ts"], r["asof_price"])
        for r in as_of_join(left, right, on="k").collect()
    }
    assert out["before-any"] == (None, None)
    assert out["exact-tie"] == (_ts(10), 100.0)  # right_ts == left_ts matches
    assert out["carried"] == (_ts(10), 100.0)
    assert out["newer-wins"] == (_ts(12), 200.0)
    assert out["other-key-no-match"] == (None, None)


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("payload"),
    )
    right = spark.range(10).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("ts"),
        F.lit("x").alias("v"),
    ).groupBy("k", "ts").agg(F.first("v").alias("v"))
    out = as_of_join(left, right, on="k")
    assert out.count() == 100
    assert set(out.columns) == {"k", "ts", "payload", "asof_ts", "asof_v"}


def test_interval_join_matches_naive_theta_join(spark):
    """Bucketed interval join == the naive theta-join on random data,
    including window edges (exclusive lower, inclusive upper)."""
    import random

    rng = random.Random(11)
    rows = [
        (i, i % 5, datetime(2024, 1, 1 + rng.randrange(20), rng.randrange(24), rng.randrange(60)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, k long, ts timestamp_ntz")
    left = df.select("event_id", "k", "ts")
    right = df.select("k", F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"))
    from neo4j_database_to_data_importer_package_spark.operators.asof import (
        interval_join,
    )

    got = {
        (r["event_id"], r["r_id"])
        for r in interval_join(
            left, right, on="k", left_ts="ts", right_ts="r_ts",
            lower_s=0, upper_s=6 * 3600,
        ).collect()
    }
    naive = {
        (r["event_id"], r["r_id"])
        for r in left.join(right, "k")
        .filter(
            (F.col("r_ts") > F.col("ts"))
            & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 6 HOURS"))
        )
        .collect()
    }
    assert got == naive and len(naive) > 0


def test_interval_join_renames_colliding_right_columns(spark):
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10)), (1, datetime(2024, 1, 1, 20))],
        "k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12))], "k long, ts timestamp_ntz"
    )
    from neo4j_database_to_data_importer_package_spark.operators.asof import (
        interval_join,
    )

    out = interval_join(left, right, on="k", lower_s=0, upper_s=4 * 3600)
    assert set(out.columns) == {"k", "ts", "ts_r"}
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["ts"] == datetime(2024, 1, 1, 10)
    assert rows[0]["ts_r"] == datetime(2024, 1, 1, 12)
