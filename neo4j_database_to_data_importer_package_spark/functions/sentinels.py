"""Tri-sentinel NULL semantics.

The reference treats SQL NULL, empty string, and the literal string "NULL"
as null when filtering identifiers and relationship endpoints
(``neo4j_export.py:303-313``, ``:398-403``) and writes missing values as
the string "NULL" (``restval='NULL'``, ``:324-325``). These are explicit
predicates — ``isNotNull`` alone is NOT equivalent (SURVEY.md §2.2 P3/P4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SENTINELS = ["", "NULL"]


def non_sentinel(col: Column | str, dtype: T.DataType | None = None) -> Column:
    """Predicate: value is not (NULL | "" | "NULL").

    For non-string columns the string sentinels can't occur, so the
    predicate collapses to ``isNotNull`` — keeping it cheap and
    pushdown-friendly (a simple IsNotNull reaches the parquet scan).
    """
    c = F.col(col) if isinstance(col, str) else col
    if dtype is not None and not isinstance(dtype, T.StringType):
        return c.isNotNull()
    return c.isNotNull() & ~c.cast("string").isin(*SENTINELS)


def sentinel_to_null(col: Column | str) -> Column:
    """Map sentinel values to real NULL (for aggregation exclusion)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.cast("string").isin(*SENTINELS), F.lit(None)).otherwise(c)


def sentinel_filter(df: DataFrame, *cols: str) -> DataFrame:
    """Keep rows where every named column is non-sentinel (P3/P4)."""
    out = df
    for name in cols:
        dtype = dict(df.dtypes).get(name)
        is_str = dtype == "string"
        out = out.filter(non_sentinel(F.col(name), T.StringType() if is_str else T.LongType()))
    return out
