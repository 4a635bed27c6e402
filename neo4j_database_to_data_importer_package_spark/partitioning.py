"""Partition-shape helpers.

At cluster scale inputs arrive in thousands of parquet splits and these
helpers are no-ops; on tiny local files (one row group → one input
split) a CPU-heavy narrow stage (shingle explode, per-bit simhash
expansion, 16-way md5) would otherwise run in a single task while 31
cores idle. ``fan_out`` widens only when the current plan is narrower
than the session's parallelism — the 100 TB path never pays the extra
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(
    df: DataFrame, min_partitions: int | None = None, min_bytes: int = 0
) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism —
    only when the plan currently has fewer partitions (small-file skew)
    AND the input is at least ``min_bytes`` (Catalyst size estimate);
    otherwise returns ``df`` unchanged. Tiny dimension tables should not
    pay a 32-task shuffle to save a 10 ms single-task scan — callers with
    CPU-heavy downstream stages (explode × hash) pass ``min_bytes=0``."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if min_bytes:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        if size < min_bytes:
            return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
