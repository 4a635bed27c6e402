"""Retrieval operators: TF-IDF, BM25, vocabulary/OOV — unit semantics on
tiny in-memory corpora plus the scale properties the module promises
(distributed top-k, broadcast vocabulary)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
    bm25_topk,
    tfidf_top_terms,
    vocabulary_oov,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark hash join"),
            (2, "hash join merge sort"),
            (3, "the the the the spark"),
        ],
        ["doc_id", "text"],
    )


def test_tfidf_idf_downweights_common_terms(spark):
    rows = {
        (r["doc_id"], r["term"]): r
        for r in tfidf_top_terms(_corpus(spark), k=4).collect()
    }
    # 'spark' appears in 2/3 docs, 'merge' in 1/3 — with equal tf=1 (doc 2
    # vs doc 1), the rarer term scores strictly higher.
    idf = lambda df: math.log(4.0 / (df + 1.0)) + 1.0
    assert rows[(2, "merge")]["tfidf"] > rows[(1, "spark")]["tfidf"] / 2  # tf=2 in doc1
    got = rows[(1, "spark")]["tfidf"]
    want = math.floor(2 * idf(2) * 1e6 + 0.5) / 1e6
    assert got == want


def test_tfidf_rank_is_dense_per_doc(spark):
    out = tfidf_top_terms(_corpus(spark), k=10).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_bm25_prefers_matching_docs(spark):
    out = bm25_topk(_corpus(spark), ["spark"], k=3).collect()
    # Doc 1 (tf=2, short) outranks doc 3 (tf=1, stuffed with 'the').
    assert [r["doc_id"] for r in out] == [1, 3]
    assert out[0]["bm25"] > out[1]["bm25"]
    assert [r["rank"] for r in out] == [1, 2]


def test_bm25_topk_plan_is_distributed_take_ordered(spark):
    df = bm25_topk(_corpus(spark), ["spark", "hash"], k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, (
        "global top-k must compile to TakeOrderedAndProject, not a "
        "single-partition full sort"
    )


def test_vocabulary_oov_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a b zzz"), (2, "a b b qqq www")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in vocabulary_oov(df, vocab_size=2).collect()}
    # vocab = top-2 by frequency = {a, b}; zzz/qqq/www are OOV
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[2]["n_tokens"] == 5 and out[2]["n_oov"] == 2
    assert out[2]["oov_rate"] == math.floor(2 / 5 * 1e6 + 0.5) / 1e6


def test_vocabulary_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        vocabulary_oov(df, vocab_size=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, (
        "the V-row vocabulary must broadcast — a shuffle join keyed on "
        "term would reshuffle the whole token stream"
    )
