"""Unit tests for data-mixing, time-series, and bigram-LM operators
(oracle parity is covered separately in test_oracle_parity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators import mixing
from neo4j_database_to_data_importer_package_spark.operators import text_analysis as ta
from neo4j_database_to_data_importer_package_spark.operators import windows as W


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 3}", ["en", "de", "zh"][i % 3], 100 + i) for i in range(60)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long"
    )


def test_split_assignment_is_stable_under_growth(spark, docs):
    # The split of an existing doc must not change when new docs arrive.
    first = {
        r.doc_id: r.split
        for r in mixing.assign_split(docs.filter("doc_id < 30")).collect()
    }
    grown = {r.doc_id: r.split for r in mixing.assign_split(docs).collect()}
    assert all(grown[d] == s for d, s in first.items())
    assert set(grown.values()) <= {"train", "val", "test"}


def test_cap_per_group_matches_window_reference(spark, docs):
    capped = mixing.cap_per_group(docs, "source", "doc_id", k=5)
    got = sorted((r.source, r.doc_id) for r in capped.collect())
    # Reference: plain per-group window rank by (md5, id).
    from pyspark.sql import Window

    ref = (
        docs.withColumn("h", F.md5(F.col("doc_id").cast("string")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy("h", "doc_id")
            ),
        )
        .filter("rn <= 5")
    )
    want = sorted((r.source, r.doc_id) for r in ref.collect())
    assert got == want
    # k larger than any group: everything is kept.
    assert mixing.cap_per_group(docs, "source", "doc_id", k=1000).count() == 60


def test_mixture_sample_monotone_in_weights(spark, docs):
    low = {r.doc_id for r in mixing.weighted_mixture_sample(
        docs, weights={"en": 0.2, "de": 0.2, "zh": 0.2}).collect()}
    high = {r.doc_id for r in mixing.weighted_mixture_sample(
        docs, weights={"en": 0.8, "de": 0.8, "zh": 0.8}).collect()}
    assert low <= high
    # Unknown language -> weight 0 -> dropped.
    assert (
        mixing.weighted_mixture_sample(docs, weights={"xx": 1.0}).count() == 0
    )


def test_rolling_range_activity_hand_case(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-02 00:00:00", 2.0),  # within 3d of row 1
            (1, "2024-01-10 00:00:00", 4.0),  # isolated
            (2, "2024-01-01 00:00:00", 8.0),
        ],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value")
    got = {r.user_id: r for r in W.rolling_range_activity(ev).collect()}
    # Peaks are per-metric maxima over the rolling frames: the count peak
    # (2, from Jan 1-2) and the value peak (4.0, the isolated Jan 10 row)
    # come from different windows.
    assert got[1].peak_window_events == 2 and got[1].peak_window_value == 4.0
    assert got[2].peak_window_events == 1 and got[2].peak_window_value == 8.0


def test_zscore_outliers_constant_group(spark):
    ev = spark.createDataFrame(
        [("a", 5.0)] * 10 + [("b", 1.0)] * 9 + [("b", 100.0)],
        "event_type string, value double",
    )
    got = {r.event_type: r for r in W.zscore_outliers(ev).collect()}
    assert got["a"].n_outliers == 0 and got["a"].max_abs_z == 0.0  # sd = 0
    assert got["b"].n_events == 10 and got["b"].max_abs_z > 2.0


def test_bigram_topk_hand_case(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "a b x"), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    out = ta.bigram_next_token_topk(docs, top_prefixes=2, k=2)
    rows = {(r.w1, r.rnk): (r.w2, r.pair_count) for r in out.collect()}
    # 'a' (4 bigrams) and 'b' (3) are the top prefixes; next-token ranks
    # break count-desc then lexicographic.
    assert rows[("a", 1)] == ("b", 3)
    assert rows[("a", 2)] == ("c", 1)
    assert rows[("b", 1)] == ("a", 2)
    assert rows[("b", 2)] == ("x", 1)
