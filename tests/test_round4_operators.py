"""Semantics pins for the round-4 operators, independent of the DuckDB
oracles: greedy BPE merge application, label propagation on a known
graph, vocab growth attribution, co-purchase ranking."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_apply_greedy_single_pass(spark):
    """Greedy left-to-right: a merged pair consumes both chars, so in
    'abab' with merge {ab} two merges apply, in 'aaa' with merge {aa}
    only ONE applies (the middle pair is consumed)."""
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        bpe_apply_merge_stats,
    )

    # Build a corpus whose top-20 char pairs include 'ab' and 'aa' by
    # construction (tiny vocabulary).
    docs = _docs(
        spark,
        [(1, "abab abab abab"), (2, "aaa aaa aaa"), (3, "xy")],
    )
    got = {
        r["doc_id"]: r
        for r in bpe_apply_merge_stats(docs, top_k=20).collect()
    }
    # doc 1: three 'abab' words, 4 symbols each; greedy applies 'ab' at
    # positions 1 and 3 → 2 merges per word
    assert got[1]["n_symbols"] == 12
    assert got[1]["n_merges"] == 6
    assert got[1]["n_after"] == 6
    # doc 2: 'aaa' → pairs at 1,2 both 'aa' but greedy takes only pos 1
    assert got[2]["n_symbols"] == 9
    assert got[2]["n_merges"] == 3
    # doc 3: 'xy' occurs once in the corpus — still a top-20 pair in this
    # tiny vocabulary, so one merge applies
    assert got[3]["n_symbols"] == 2
    assert got[3]["n_merges"] in (0, 1)  # depends on top-20 cut
    assert got[3]["n_after"] == got[3]["n_symbols"] - got[3]["n_merges"]


def test_label_propagation_two_triangles(spark):
    """Two triangles bridged by one edge: after enough rounds each
    triangle converges to its own minimum label (majority of neighbors
    within the triangle beats the single bridge vote via the min
    tie-break)."""
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("a", "c"),      # triangle 1
            ("x", "y"), ("y", "z"), ("x", "z"),      # triangle 2
            ("c", "x"),                               # bridge
        ],
        "src string, dst string",
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()}
    assert got["a"] == "a" and got["b"] == "a"
    # triangle 2's interior nodes converge to a label from triangle 1's
    # side or their own min — all deterministic; just pin determinism:
    got2 = {
        r["node"]: r["label"] for r in label_propagation(edges, rounds=4).collect()
    }
    assert got == got2


def test_vocab_growth_monotone_and_total(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        vocab_growth_curve,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    docs = _view(spark, sf_dir).tables["documents"]
    rows = sorted(
        vocab_growth_curve(docs).collect(), key=lambda r: r["bucket"]
    )
    cums = [r["cum_vocab"] for r in rows]
    assert cums == sorted(cums)  # cumulative is monotone
    n_vocab = (
        docs.select(F.explode_outer(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
        .select("t")
        .distinct()
        .count()
    )
    assert cums[-1] == n_vocab  # total equals corpus distinct vocabulary
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_copurchase_rank_is_per_part_and_symmetric(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        part_copurchase_topk,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    view = _view(spark, sf_dir)
    got = part_copurchase_topk(view, k=3).collect()
    by_part: dict = {}
    pair_counts = {}
    for r in got:
        by_part.setdefault(r["part"], []).append((r["rnk"], r["n_co_orders"]))
        pair_counts[(r["part"], r["co_part"])] = r["n_co_orders"]
    for part, rows in by_part.items():
        rnks = sorted(r[0] for r in rows)
        assert rnks == list(range(1, len(rnks) + 1)), part  # dense 1..k
        counts = [c for _, c in sorted(rows)]
        assert counts == sorted(counts, reverse=True), part  # ordered
    # symmetry of the underlying pair counts (when both directions kept)
    for (p, q), c in pair_counts.items():
        if (q, p) in pair_counts:
            assert pair_counts[(q, p)] == c


def test_rfm_scores_in_range_and_quintile_balanced(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        customer_rfm_segments,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    rows = customer_rfm_segments(_view(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5
        assert r["recency_days"] >= 0 and r["frequency"] >= 1
    # monetary quintiles: the exact-threshold rule puts ~20% in each
    # bucket (ties can skew frequency, but monetary is near-continuous)
    from collections import Counter

    c = Counter(r["m_score"] for r in rows)
    n = len(rows)
    for s in range(1, 6):
        assert 0.1 * n <= c[s] <= 0.3 * n, (s, c, n)


def test_retention_cohort_week0_is_cohort_size(spark, sf_dir):
    """Every signed-up user is active in their signup week (the signup
    event itself), so week_offset=0 counts equal the cohort sizes."""
    from pyspark.sql import functions as F

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        retention_cohorts,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    ev = _view(spark, sf_dir).tables["events"]
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert got
    cohort_sizes = {
        r["cw"]: r["n"]
        for r in ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("sd"))
        .select(
            F.floor(
                F.datediff("sd", F.lit("2024-01-01").cast("date")) / 7
            ).cast("int").alias("cw")
        )
        .groupBy("cw")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for cw, size in cohort_sizes.items():
        assert got.get((cw, 0)) == size, (cw, size, got.get((cw, 0)))


def test_heldout_perplexity_positive_and_bounded(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        bigram_perplexity_heldout,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    docs = _view(spark, sf_dir).tables["documents"]
    rows = bigram_perplexity_heldout(docs).collect()
    assert rows
    v_plus = 1e9  # ppl can never exceed c1+V (add-one smoothing floor)
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert 0 < r["avg_nll"]
        assert 1.0 <= r["perplexity"] <= v_plus


def test_ann_recall_between_zero_and_one(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        ann_recall_at_k,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    emb = _view(spark, sf_dir).tables["embeddings"]
    rows = ann_recall_at_k(emb, k=10).collect()
    assert len(rows) == 10  # one per query
    for r in rows:
        assert 0 <= r["n_overlap"] <= 10
        assert abs(r["recall_at_k"] - r["n_overlap"] / 10.0) < 1e-9


def test_cms_estimate_never_underestimates(spark, sf_dir):
    """The count-min guarantee: estimate >= true count, always."""
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        cms_term_estimates,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    docs = _view(spark, sf_dir).tables["documents"]
    rows = cms_term_estimates(docs).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_estimate"] >= r["true_count"]
        assert r["overestimate"] == r["cms_estimate"] - r["true_count"]
