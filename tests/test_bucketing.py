"""Bucketed layout: the fact-fact join must lose its Exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.sources.bucketing import (
    bucketed_join_plan_is_shuffle_free,
    read_table,
    write_bucketed,
)
from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
    read_parquet_table,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = read_parquet_table(spark, f"{sf_dir}/orders.parquet")
    lineitem = read_parquet_table(spark, f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", "okey", 8
    )
    return orders, lineitem


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    # Disable auto-broadcast so the assertion is about bucketing, not size.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, "okey").groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert bucketed_join_plan_is_shuffle_free(bl.join(bo, "okey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the groupBy on a non-bucket key still shuffles, but the JOIN must not:
        # exactly one Exchange (for the agg), not three.
        assert plan.count("Exchange") <= 1, plan[:1500]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    got = (
        bl.join(bo, "okey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
