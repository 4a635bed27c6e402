"""Column-level data profiling — the ANALYZE TABLE / catalog-statistics
pass (S1-adjacent; the reference's metadata scan stops at property names,
``neo4j_export.py:285`` — real pipelines also want per-column null
fractions, cardinalities, and ranges before planning joins or filters).

Two modes sharing one shape:

- ``exact=False`` (the 100 TB default): ``approx_count_distinct`` (HLL)
  — a single streaming aggregation pass, no expand, constant memory per
  column.
- ``exact=True`` (the oracle/gate mode): ``countDistinct`` — Spark plans
  multi-column exact distincts via EXPAND (one row replica per profiled
  column), fine at validation scale and bit-comparable to SQL engines.

Output is long-form (one row per column) so profiles of any width union
cleanly into a catalog table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str], exact: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max stringified for a uniform schema."""
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            distinct_fn(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")
