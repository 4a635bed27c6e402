"""Bucketed table layout — co-located joins and aggregations without a
shuffle (SURVEY.md §4 scan-reuse / §7 Phase F scale hardening).

At 100 TB the dominant cost of the export's J1 pattern join and the
fact-fact analytics joins is the exchange of the big side. Writing both
sides bucketed by the join key (`bucketBy(n, key).sortBy(key)`) makes
every such join a zipped per-bucket merge: Spark reads matching buckets
pairwise and the Exchange disappears from the plan (asserted in
tests/test_bucketing.py).

Buckets are the persisted analogue of `repartition(key)`: choose
``n_buckets`` so one bucket of the LARGEST co-bucketed table fits an
executor core's memory (128 MB-1 GB parquet per bucket is the usual
band). All co-joined tables must share n_buckets and key type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed managed table (bucket pruning + shuffle-free
    joins on ``key``). Overwrites an existing table of the same name."""
    keys = [key] if isinstance(key, str) else list(key)
    spark = df.sparkSession
    # A stale warehouse directory from a previous session blocks
    # saveAsTable even in overwrite mode (the catalog no longer tracks
    # the table, but its location survives) — drop both.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import os
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table)
    if os.path.exists(loc):
        shutil.rmtree(loc)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join_plan_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the join reads co-bucketed sides with no Exchange."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
