"""Chunking / packing / scrubbing / quantization unit tests."""

from __future__ import annotations

import hashlib

from neo4j_database_to_data_importer_package_spark.operators.chunking import (
    chunk_plan,
    sequence_packs,
)
from neo4j_database_to_data_importer_package_spark.operators.text_analysis import pii_scrub
from neo4j_database_to_data_importer_package_spark.operators.similarity import quantize_stats
from neo4j_database_to_data_importer_package_spark.operators.analytics import (
    deterministic_group_sample,
)


def test_chunk_plan_windows(spark):
    text = "a b c d e f g h i j"  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["token_start"], r["token_end"], r["chunk_text"])
        for r in chunk_plan(df, chunk_size=4, overlap=1).collect()
    )
    # stride 3: chunks [0,4) [3,7) [6,10)
    assert rows == [
        (0, 0, 4, "a b c d"),
        (1, 3, 7, "d e f g"),
        (2, 6, 10, "g h i j"),
    ]


def test_chunk_plan_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "   ")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["chunk_id"], r["token_start"], r["token_end"], r["chunk_text"])
        for r in chunk_plan(df, chunk_size=128, overlap=32).collect()
    }
    assert rows[1] == (0, 0, 3, "only three tokens")
    assert rows[2] == (0, 0, 0, "")


def test_sequence_packs_boundaries(spark):
    # shard A: token counts 3, 4, 5 with budget 6 -> offsets 0,3,7 -> packs 0,0,1
    rows = [("A", 0, "x x x"), ("A", 1, "y y y y"), ("A", 2, "z z z z z"), ("B", 9, "w")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    packs = {
        (r["source"], r["pack_id"]): (r["n_docs"], r["total_tokens"], r["first_doc"], r["last_doc"])
        for r in sequence_packs(df, budget=6).collect()
    }
    assert packs[("A", 0)] == (2, 7, 0, 1)
    assert packs[("A", 1)] == (1, 5, 2, 2)
    assert packs[("B", 0)] == (1, 1, 9, 9)


def test_pii_scrub_redacts(spark):
    text = "write to bob.smith+x@corp.example.com or see https://docs.example.com/a_b/c now"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = pii_scrub(df).collect()[0]
    clean = "write to [EMAIL] or see [URL] now"
    assert (r["n_emails"], r["n_urls"]) == (1, 1)
    assert r["clean_len"] == len(clean)
    assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()


def test_quantize_stats_exact(spark):
    df = spark.createDataFrame(
        [(1, [1.27, -0.635, 0.0, 0.635])], "vec_id long, embedding array<double>"
    )
    r = quantize_stats(df).collect()[0]
    # scale = 1.27/127 = 0.01; q = [127, -63 (floor(-63.5+0.5)), 0, 64 (floor(63.5+0.5))]
    assert abs(r["scale"] - 0.01) < 1e-9
    assert r["n_clipped"] == 0
    expected_err = (abs(-0.635 - -63 * 0.01) + abs(0.635 - 64 * 0.01)) / 4
    assert abs(r["mean_abs_err"] - expected_err) < 1e-8


def test_deterministic_group_sample_stable(spark):
    rows = [(t, i) for t in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "event_type string, event_id long")
    s1 = sorted(map(tuple, deterministic_group_sample(df, "event_type", "event_id", k=10).collect()))
    s2 = sorted(
        map(
            tuple,
            deterministic_group_sample(
                df.repartition(13), "event_type", "event_id", k=10
            ).collect(),
        )
    )
    assert s1 == s2
    assert len(s1) == 20
    # groups smaller than k keep everything
    small = spark.createDataFrame([("c", 1), ("c", 2)], "event_type string, event_id long")
    assert deterministic_group_sample(small, "event_type", "event_id", k=10).count() == 2


def test_histogram_quantiles_uniform(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([(float(i),) for i in range(1, 1001)], "v double")
    est = {r["quantile"]: r["estimate"] for r in histogram_quantiles(df, "v", [0.5, 0.9], n_bins=100).collect()}
    # bin width ~ 9.99; estimates land within one bin of the true quantile
    assert abs(est[0.5] - 500.5) < 11
    assert abs(est[0.9] - 900.1) < 11


def test_unigram_logprob_manual(spark):
    import math

    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        unigram_logprob_score,
    )

    # corpus: "x x y" and "y z" -> counts x:2 y:2 z:1, total 5
    df = spark.createDataFrame([(1, "x x y"), (2, "y z")], "doc_id long, text string")
    res = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"]) for r in unigram_logprob_score(df).collect()}
    exp1 = (math.log(2 / 5) * 3) / 3
    exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert res[1][0] == 3 and abs(res[1][1] - exp1) < 1e-3
    assert res[2][0] == 2 and abs(res[2][1] - exp2) < 1e-3
