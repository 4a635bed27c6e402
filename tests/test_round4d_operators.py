"""Semantics tests for the round-4 fourth batch: MinHash calibration,
the language-ID confusion matrix, and the train/test split leakage
audit. Oracle parity at sf0.001 is covered by test_oracle_parity.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from neo4j_database_to_data_importer_package_spark.operators.dedup import (
    minhash_calibration,
)
from neo4j_database_to_data_importer_package_spark.operators.mixing import (
    assign_split,
    split_leakage_check,
)
from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
    language_confusion,
)


def test_minhash_calibration_exact_duplicates_agree_fully(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=text),
            Row(doc_id=2, text=text),  # identical: est = exact = 1.0
            Row(doc_id=3, text="unrelated words entirely different content here now"),
        ]
    )
    rows = {(r["id_a"], r["id_b"]): r for r in minhash_calibration(df).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["est_jaccard"] == 1.0 and r["exact_jaccard"] == 1.0
    assert r["abs_err"] == 0.0
    # the unrelated doc shares no band signature with anything
    assert all(3 not in p for p in rows)


def test_minhash_estimate_bounded_and_err_consistent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = minhash_calibration(docs).collect()
    assert rows, "expected candidate pairs in the fixture corpus"
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert r["abs_err"] == pytest.approx(
            abs(r["est_jaccard"] - r["exact_jaccard"]), abs=2e-6
        )


def test_language_confusion_diagonal_on_clear_text(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="the cat is in the hat and it is fine"),
            Row(doc_id=2, lang="de", text="der hund und die katze ist ein tier"),
            Row(doc_id=3, lang="en", text="xyzzy plugh"),  # no stopwords -> und
        ]
    )
    cells = {
        (r["lang"], r["detected_lang"]): r for r in language_confusion(df).collect()
    }
    assert cells[("en", "en")]["n_docs"] == 1
    assert cells[("de", "de")]["n_docs"] == 1
    assert cells[("en", "und")]["n_docs"] == 1
    assert cells[("en", "en")]["share_of_lang"] == 0.5
    assert cells[("de", "de")]["share_of_lang"] == 1.0


def test_split_leakage_labels_match_assign_split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = split_leakage_check(docs).collect()
    assert out, "fixture corpus has near-dup pairs"
    # cells partition the verified near-dup pair set
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    n_pairs = minhash_lsh_pairs(docs).count()
    assert sum(r["n_pairs"] for r in out) == n_pairs
    # label spot-check: recompute one pair's splits via assign_split
    splits = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs.select("doc_id")).collect()
    }
    pair = minhash_lsh_pairs(docs).limit(1).collect()[0]
    cell = [
        r
        for r in out
        if r["split_a"] == splits[pair["id_a"]]
        and r["split_b"] == splits[pair["id_b"]]
    ]
    assert cell, "the labeled cell for a known pair must exist"


def test_hybrid_rrf_fusion_law(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        bm25_topk,
        hybrid_rrf_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = hybrid_rrf_topk(docs, emb, ["spark", "hash", "join"]).collect()
    assert 0 < len(out) <= 10
    ranks = [r["fused_rank"] for r in out]
    assert ranks == list(range(1, len(out) + 1))
    for r in out:
        # at least one list contributed; the score is exactly the RRF sum
        assert r["lex_rank"] is not None or r["vec_rank"] is not None
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (60 + r["lex_rank"])
        if r["vec_rank"] is not None:
            expect += 1.0 / (60 + r["vec_rank"])
        assert r["rrf_score"] == pytest.approx(expect, abs=2e-6)
    # a doc on both lists must outrank one with only the weaker of its two
    both = [r for r in out if r["lex_rank"] and r["vec_rank"]]
    lex = {r["doc_id"]: r["rank"] for r in
           bm25_topk(docs, ["spark", "hash", "join"], k=20).collect()}
    assert set(lex) & {r["doc_id"] for r in out}, "lexical hits must surface"


def test_streaming_funnel_conversion_flag_semantics(spark):
    # pure batch check of the conversion law on the stateful operator's
    # statistics: converted <=> last_purchase strictly after first view
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rows = [
        Row(event_id=1, user_id=1, event_type="view", ts="2024-01-01 10:00:00"),
        Row(event_id=2, user_id=1, event_type="purchase", ts="2024-01-01 11:00:00"),
        Row(event_id=3, user_id=2, event_type="purchase", ts="2024-01-01 09:00:00"),
        Row(event_id=4, user_id=2, event_type="view", ts="2024-01-01 10:00:00"),
        Row(event_id=5, user_id=3, event_type="view", ts="2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        streaming_funnel_state,
    )

    # applyInPandasWithState requires a stream; exercise the update fn
    # directly on a single "batch" per user instead.
    import pandas as pd

    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        _update_funnel,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.v = v

    pdf = df.filter("user_id = 2").toPandas()
    (out,) = _update_funnel((2,), iter([pdf]), FakeState())
    assert not out["converted"][0]  # purchase BEFORE the first view
    pdf1 = df.filter("user_id = 1").toPandas()
    (out1,) = _update_funnel((1,), iter([pdf1]), FakeState())
    assert out1["converted"][0]


def test_epoch_mixture_plan_realizes_epochs(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark.operators.mixing import (
        domain_mixture_weights,
        epoch_mixture_plan,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = {r["source"]: r for r in epoch_mixture_plan(docs).collect()}
    weights = {r["source"]: r for r in domain_mixture_weights(docs).collect()}
    assert set(plan) == set(weights)
    for s, p in plan.items():
        e = weights[s]["effective_epochs"]
        # realized epochs within 1 copy/doc of the target (Bernoulli rounding)
        assert abs(p["realized_epochs"] - e) < 1.0
        assert p["planned_doc_copies"] >= p["n_docs"] * int(e)


def test_length_drift_psi_zero_for_identical_profile(spark):
    from pyspark.sql import Row

    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        length_drift_psi,
    )

    text_a = " ".join(["w"] * 20)
    text_b = " ".join(["w"] * 300)
    rows = []
    for i in range(50):
        rows.append(Row(doc_id=i, source="src0", text=text_a if i % 2 else text_b))
        rows.append(Row(doc_id=100 + i, source="same", text=text_a if i % 2 else text_b))
        rows.append(Row(doc_id=200 + i, source="shifted", text=text_b))
    df = spark.createDataFrame(rows)
    out = {r["source"]: r["psi"] for r in length_drift_psi(df).collect()}
    assert out["same"] == 0.0          # identical distribution: PSI exactly 0
    assert out["shifted"] > 0.2        # concentrated profile drifts


def test_length_drift_psi_grid_follows_max_len(spark):
    """ADVICE r04: with max_len != 2048 the bucket CASE chain and the
    smoothing grid must still agree — an identical distribution stays
    PSI == 0 under any max_len (phantom empty buckets used to inject
    spurious nonzero terms)."""
    from pyspark.sql import Row

    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        length_drift_psi,
    )

    text_a = " ".join(["w"] * 20)
    text_b = " ".join(["w"] * 90)
    rows = []
    for i in range(40):
        rows.append(Row(doc_id=i, source="src0", text=text_a if i % 2 else text_b))
        rows.append(Row(doc_id=100 + i, source="same", text=text_a if i % 2 else text_b))
    df = spark.createDataFrame(rows)
    for max_len in (128, 512, 8192):
        out = {
            r["source"]: r["psi"]
            for r in length_drift_psi(df, max_len=max_len).collect()
        }
        assert out["same"] == 0.0, (max_len, out)
