"""Degenerate-input robustness: empty tables, empty/NULL text, docs
shorter than the shingle width. Every operator must return an empty or
well-defined result — never raise."""

from __future__ import annotations

import pytest

from neo4j_database_to_data_importer_package_spark.operators import (
    dedup,
    similarity,
)
from neo4j_database_to_data_importer_package_spark.operators import (
    text_analysis as ta,
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def short_docs(spark):
    # Below shingle width (3 words), empty string, NULL.
    return spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, None), (4, "two words")],
        "doc_id long, text string",
    )


def test_dedup_ops_tolerate_empty_table(empty_docs):
    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs).count() == 0


def test_dedup_ops_tolerate_shingle_starved_docs(short_docs):
    # No doc reaches 3-word shingles → no signatures → no pairs, no error.
    assert dedup.minhash_lsh_pairs(short_docs).count() == 0
    assert dedup.minhash_signatures(short_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(short_docs).count() == 0


def test_text_ops_tolerate_null_and_empty_text(short_docs):
    assert ta.quality_score(short_docs).count() == 4
    assert ta.language_id(short_docs).count() == 4
    assert ta.token_stats(short_docs).count() == 4
    assert ta.fingerprints(short_docs).count() == 4


def test_similarity_tolerates_empty_table(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.cosine_pairs(empty).count() == 0
    assert similarity.brute_force_topk(empty).count() == 0


def test_repetition_stats_flags_and_edges(spark, short_docs):
    # Highly repetitive doc flagged; varied doc not; tiny/NULL docs get
    # all-zero ratios without erroring.
    docs = spark.createDataFrame(
        [
            (10, "spam spam spam spam spam spam spam spam"),
            (11, "the quick brown fox jumps over one lazy dog"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ta.repetition_stats(docs).collect()}
    assert rows[10].flagged and rows[10].dup_2gram_ratio > 0.8
    assert not rows[11].flagged and rows[11].dup_2gram_ratio == 0.0
    # 9 distinct tokens of 9 -> entropy = log2(9)
    assert abs(rows[11].token_entropy - 3.169925) < 1e-6
    edge = {r.doc_id: r for r in ta.repetition_stats(short_docs).collect()}
    assert len(edge) == 4
    for r in edge.values():
        assert not r.flagged
