"""Semantics tests for the round-4 third batch: PMI collocations, the
logistic quality classifier, centroid-distance label-noise screening,
and prefix-survivorship dedup. Oracle parity at sf0.001 is covered by
test_oracle_parity.py; these pin the laws on constructed inputs.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from neo4j_database_to_data_importer_package_spark.operators.dedup import (
    prefix_survivorship,
)
from neo4j_database_to_data_importer_package_spark.operators.similarity import (
    centroid_outliers,
)
from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
    pmi_collocations,
    quality_classifier_score,
)


# ---------------------------------------------------------- collocations
def test_pmi_ranks_exclusive_pairs_above_frequent_ones(spark):
    # "north korea" always co-occur (PMI high); "the cat"/"the dog" split
    # "the"'s mass (PMI lower) even though "the" is more frequent.
    docs = []
    for i in range(10):
        docs.append(Row(doc_id=i, text="north korea is big"))
        docs.append(Row(doc_id=100 + i, text="the cat and the dog"))
    df = spark.createDataFrame(docs)
    out = pmi_collocations(df, min_count=5, k=10).collect()
    by_pair = {(r["w1"], r["w2"]): r["pmi"] for r in out}
    # (north, korea) sits in the top PMI tier; pairs involving the
    # promiscuous "the" (doubled unigram mass) score strictly lower
    top = max(by_pair.values())
    assert by_pair[("north", "korea")] == top
    assert by_pair[("the", "cat")] < by_pair[("north", "korea")]


def test_pmi_min_count_filter(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="rare pair")]
        + [Row(doc_id=i, text="common pair") for i in range(1, 8)]
    )
    pairs = {(r["w1"], r["w2"]) for r in pmi_collocations(df, min_count=5).collect()}
    assert ("common", "pair") in pairs and ("rare", "pair") not in pairs


# ------------------------------------------------- quality classifier
def test_quality_classifier_features_and_sigmoid(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="4531 99 872 001 55"),
        ]
    )
    rows = {r["doc_id"]: r for r in quality_classifier_score(df).collect()}
    clean, digits = rows[1], rows[2]
    assert digits["digit_ratio"] > 0.5 and clean["digit_ratio"] == 0.0
    assert clean["stopword_ratio"] == pytest.approx(2 / 6, abs=1e-6)
    # digit-heavy text must score strictly lower
    assert digits["quality_prob"] < clean["quality_prob"]
    # reproduce the sigmoid by hand for the clean doc
    z = (
        -1.0
        + 0.3 * clean["mean_word_len"]
        + 2.0 * clean["stopword_ratio"]
        - 4.0 * clean["digit_ratio"]
        - 1.5 * clean["long_word_ratio"]
    )
    assert clean["quality_prob"] == pytest.approx(1 / (1 + math.exp(-z)), abs=1e-5)


# ------------------------------------------------- centroid outliers
def test_centroid_outliers_flags_planted_outlier(spark):
    rows = [
        Row(vec_id=i, label=0, embedding=[1.0 + 0.01 * i, 0.0]) for i in range(5)
    ]
    rows.append(Row(vec_id=50, label=0, embedding=[50.0, 50.0]))
    rows += [Row(vec_id=100 + i, label=1, embedding=[0.0, 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows)
    out = centroid_outliers(df, k=1).collect()
    top = {r["label"]: r for r in out}
    assert top[0]["vec_id"] == 50 and top[0]["rank"] == 1
    # label 1 is degenerate (all identical): distance to centroid is 0
    assert top[1]["centroid_dist"] == 0.0


# --------------------------------------------- prefix survivorship
def test_survivorship_keeps_longest_then_smallest_id(spark):
    prefix = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=prefix + " short", n_chars=10),
            Row(doc_id=2, text=prefix + " much longer tail here", n_chars=50),
            Row(doc_id=3, text=prefix + " other tail", n_chars=50),  # tie with 2
            Row(doc_id=4, text="completely different document text here ok", n_chars=40),
        ]
    )
    rows = {r["doc_id"]: r for r in prefix_survivorship(df).collect()}
    # group {1,2,3}: longest n_chars=50, tie -> smallest id (2)
    for d in (1, 2, 3):
        assert rows[d]["canonical_id"] == 2 and rows[d]["group_size"] == 3
    assert rows[2]["is_canonical"] and not rows[1]["is_canonical"]
    assert rows[4]["canonical_id"] == 4 and rows[4]["group_size"] == 1
