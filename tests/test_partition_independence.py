"""Partition-count independence of rounded aggregates.

The round-4 decimal-sum conversion (functions/numeric.dsum) claims that
every cent/4dp-rounded aggregate is identical under ANY partitioning —
the property that makes results stable across cluster sizes, AQE
re-plans, and stage retries (and makes the DuckDB oracle meaningful).
This test executes representative money-sum queries under two very
different shuffle/partition regimes and asserts bit-identical rows —
under plain double sums this is exactly where q7's cent drift appeared.
"""

from __future__ import annotations

import pytest

from neo4j_database_to_data_importer_package_spark import registry

QUERIES = [
    "q1_pricing_summary",       # scan agg, 4 groups, 1e9-magnitude sums
    "q7_nation_volume_shipping",  # the r03 red: 4188 groups on the boundary
    "skewed_join_hot_suppliers",  # the r04 strict-canon red: hot-key groups
    "window_tumbling_events",   # event-value sums + avg
    "events_zscore_outliers",   # decimal moments → stddev → threshold counts
    # round-6 decimal-discipline representatives
    "events_ewma_daily",        # 9-dp contributions + dsum weighted sums
    "dedup_tfidf_cosine_pairs", # 9-dp weights, decimal dots/norms
    "source_gini_concentration",  # dsum per-key totals feed a global rank
    "doc_length_bootstrap_ci",  # md5-Poisson fan-out + decimal replicate means
    "graph_modularity_lpa",     # integer-exact community algebra over LPA
    "kmv_audience_overlap",     # two-level bounded bottom-k sketch merge
    # round-7 representatives
    "embedding_lsh_pairs",      # 128-bit signature blocking + 6-dp cosine
    "streaming_daily_rollup_evicted",  # integer-cent state flushed by timeout
]


def _rows(spark, name, n_part):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        df = registry.QUERIES[name](spark, "/root/testdata/sf0.01")
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", QUERIES)
def test_rounded_aggregates_partition_independent(spark, name):
    a = _rows(spark, name, 2)
    b = _rows(spark, name, 64)
    assert a == b, f"{name}: results differ between 2 and 64 shuffle partitions"
