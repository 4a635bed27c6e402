"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the heaviest reference-parity
pipeline: per-pattern relationship export with semi-join endpoint
validation and sentinel filtering) on sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
its DuckDB oracle; implementations live in
``neo4j_database_to_data_importer_package_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neo4j_database_to_data_importer_package_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["rel_export_order_contains_part"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(registry.ORACLES)
