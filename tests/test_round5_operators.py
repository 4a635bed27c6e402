"""Semantics tests for the round-5 operator batch: Zipf fit, script
stats, domain entropy, CUSUM drift, curriculum phases, cross-domain
near-dup matrix, per-dimension quantiles, dataset cards, sampled
closeness."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators.dedup import (
    cross_domain_neardup_matrix,
)
from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
    closeness_sampled,
)
from neo4j_database_to_data_importer_package_spark.operators.mixing import (
    curriculum_phases,
)
from neo4j_database_to_data_importer_package_spark.operators.profiling import (
    dataset_card_stats,
)
from neo4j_database_to_data_importer_package_spark.operators.similarity import (
    dim_quantiles,
)
from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
    domain_term_entropy,
    script_char_stats,
    term_zipf_fit,
)
from neo4j_database_to_data_importer_package_spark.operators.windows import (
    cusum_drift,
)


# ------------------------------------------------------------- zipf fit
def test_zipf_fit_recovers_power_law(spark):
    # term i appears floor(1000/i) times -> ln f = ln 1000 - ln rank
    docs = []
    did = 0
    for i in range(1, 51):
        for _ in range(1000 // i):
            docs.append(Row(doc_id=did, text=f"w{i:02d}"))
            did += 1
    out = term_zipf_fit(spark.createDataFrame(docs), top_n=50).collect()[0]
    assert out["n_terms"] == 50
    assert -1.05 <= out["slope"] <= -0.95
    assert out["pearson_r"] < -0.99


def test_zipf_fit_flat_corpus_has_zero_slope(spark):
    docs = [Row(doc_id=i, text=f"t{i % 10}") for i in range(100)]
    out = term_zipf_fit(spark.createDataFrame(docs), top_n=10).collect()[0]
    assert out["slope"] == 0.0  # all frequencies equal
    assert out["pearson_r"] is None  # var(lnf)=0: undefined, like SQL corr


# --------------------------------------------------------- script stats
def test_script_char_stats_exact_fractions(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="ab 12"),   # 2 letters 2 digits 1 space
            Row(doc_id=2, lang="en", text="a!!!!"),   # 1 letter 4 other
            Row(doc_id=3, lang="xx", text=""),        # filtered out
        ]
    )
    rows = {r["lang"]: r for r in script_char_stats(df).collect()}
    en = rows["en"]
    assert en["n_docs"] == 2
    assert en["mean_letter_frac"] == pytest.approx((2 / 5 + 1 / 5) / 2, abs=1e-6)
    assert en["mean_digit_frac"] == pytest.approx((2 / 5) / 2, abs=1e-6)
    assert en["mean_other_frac"] == pytest.approx((4 / 5) / 2, abs=1e-6)
    assert "xx" not in rows  # empty docs contribute nothing


# -------------------------------------------------------- domain entropy
def test_domain_entropy_uniform_and_degenerate(spark):
    import math

    rows = [Row(doc_id=i, source="uni", text=f"u{i % 8}") for i in range(800)]
    rows += [Row(doc_id=1000 + i, source="one", text="same") for i in range(100)]
    out = {r["source"]: r for r in domain_term_entropy(spark.createDataFrame(rows)).collect()}
    assert out["uni"]["entropy"] == pytest.approx(math.log(8), abs=1e-3)
    assert out["one"]["entropy"] == 0.0
    # the degenerate domain diverges from the blended corpus distribution
    assert out["one"]["kl_vs_corpus"] > 0
    assert out["uni"]["vocab"] == 8 and out["one"]["vocab"] == 1


# ----------------------------------------------------------- CUSUM drift
def _day(d):
    return datetime.datetime(2024, 1, d, 12, 0, 0)


def test_cusum_constant_series_is_flat(spark):
    rows = [
        Row(event_id=i, ts=_day(1 + i % 10), user_id=1, event_type="a", value=1.0)
        for i in range(50)
    ]  # 5 events every day -> x == mean everywhere
    out = cusum_drift(spark.createDataFrame(rows)).collect()[0]
    assert out["max_cusum"] == 0.0
    assert out["drift_stat"] is None  # sd == 0 guard


def test_cusum_peaks_at_level_shift(spark):
    # days 1-5: 2/day; days 6-10: 8/day -> |S| peaks at day 5
    rows = []
    eid = 0
    for d in range(1, 11):
        for _ in range(2 if d <= 5 else 8):
            rows.append(
                Row(event_id=eid, ts=_day(d), user_id=1, event_type="a", value=1.0)
            )
            eid += 1
    out = cusum_drift(spark.createDataFrame(rows)).collect()[0]
    assert str(out["peak_day"]) == "2024-01-05"
    assert out["max_cusum"] == 15.0  # 5 days x (2 - 5)
    assert out["drift_stat"] > 1.36  # clearly drifting


# ----------------------------------------------------- curriculum phases
def test_curriculum_positions_are_global_rank(spark):
    rows = [Row(doc_id=i, s=(i * 37) % 100) for i in range(200)]
    out = curriculum_phases(
        spark.createDataFrame(rows), score_col="s", n_phases=4
    ).collect()
    by_pos = sorted(out, key=lambda r: r["position"])
    assert [r["position"] for r in by_pos] == list(range(1, 201))
    # positions follow (score, doc_id) total order
    keys = [(r["score"], r["doc_id"]) for r in by_pos]
    assert keys == sorted(keys)
    # 4 equal phases of 50
    from collections import Counter

    assert Counter(r["phase"] for r in out) == {1: 50, 2: 50, 3: 50, 4: 50}


def test_curriculum_partitioning_invariance(spark):
    rows = [Row(doc_id=i, s=(i * 13) % 7) for i in range(97)]
    df = spark.createDataFrame(rows)
    a = {(r["doc_id"], r["position"], r["phase"])
         for r in curriculum_phases(df.coalesce(1), "s").collect()}
    b = {(r["doc_id"], r["position"], r["phase"])
         for r in curriculum_phases(df.repartition(13), "s").collect()}
    assert a == b


# ------------------------------------------- cross-domain near-dup matrix
def test_cross_domain_matrix_counts_mirrors(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        Row(doc_id=1, source="A", text=text),
        Row(doc_id=2, source="B", text=text),          # mirror of 1
        Row(doc_id=3, source="A", text=text + " iota"),  # near-dup of both
        Row(doc_id=4, source="B", text="totally different words here now ok"),
    ]
    out = {
        (r["domain_a"], r["domain_b"]): r
        for r in cross_domain_neardup_matrix(spark.createDataFrame(rows)).collect()
    }
    assert out[("A", "B")]["n_pairs"] >= 2  # (1,2) exact mirror + (2,3)
    assert out[("A", "B")]["mean_jaccard"] > 0.5
    assert ("A", "A") in out  # (1,3) same-domain near-dup


# ------------------------------------------------------- dim quantiles
def test_dim_quantiles_known_values(spark):
    rows = [Row(vec_id=i, embedding=[float(i), 10.0 * i]) for i in range(1, 6)]
    out = {r["dim"]: r for r in dim_quantiles(spark.createDataFrame(rows)).collect()}
    assert out[0]["median"] == 3.0 and out[0]["q25"] == 2.0 and out[0]["q75"] == 4.0
    assert out[0]["iqr"] == 2.0
    assert out[1]["median"] == 30.0 and out[1]["iqr"] == 20.0
    assert out[0]["n"] == 5


# ------------------------------------------------------- dataset cards
def test_dataset_card_stats_fields(spark):
    rows = [
        Row(doc_id=1, source="s1", lang="en", text="a b c"),
        Row(doc_id=2, source="s1", lang="en", text="a b c"),  # exact dup
        Row(doc_id=3, source="s1", lang="fr", text="x y"),
        Row(doc_id=4, source="s2", lang="de", text="q"),
    ]
    out = {r["source"]: r for r in dataset_card_stats(spark.createDataFrame(rows)).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["n_tokens"] == 8
    assert s1["n_langs"] == 2 and s1["top_lang"] == "en"
    assert s1["top_lang_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert s1["dup_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["s2"]["dup_rate"] == 0.0


# --------------------------------------------------- sampled closeness
def test_closeness_on_path_graph(spark):
    # path a-b-c-d; seed at a: dists 0,1,2,3 -> closeness 3/6
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"), Row(src="c", dst="d")]
    )
    seeds = spark.createDataFrame([Row(node="a"), Row(node="b")])
    out = {r["seed"]: r for r in closeness_sampled(edges, seeds, max_hops=5).collect()}
    assert out["a"]["n_reached"] == 3 and out["a"]["sum_dist"] == 6
    assert out["a"]["closeness"] == 0.5
    # b is central: dists 1,0,1,2 -> 3/4
    assert out["b"]["closeness"] == 0.75


def test_closeness_respects_hop_bound(spark):
    edges = spark.createDataFrame(
        [Row(src=f"n{i}", dst=f"n{i + 1}") for i in range(6)]
    )
    seeds = spark.createDataFrame([Row(node="n0")])
    out = closeness_sampled(edges, seeds, max_hops=2).collect()[0]
    assert out["n_reached"] == 2 and out["sum_dist"] == 3


# -------------------------------------------------------- BPE training
def test_bpe_train_is_sequential(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        bpe_train_merges,
    )

    docs = [Row(doc_id=1, text="abab abab abab ab ab cc cc cc cc x")]
    out = [tuple(r) for r in bpe_train_merges(spark.createDataFrame(docs), rounds=3).collect()]
    # round 1 merges (a,b); round 3's winning pair is (ab, ab) — a pair of
    # round-1's MERGED symbol, which a one-snapshot candidate list can
    # never produce.
    assert out == [
        (1, "a", "b", "ab", 8),
        (2, "c", "c", "cc", 4),
        (3, "ab", "ab", "abab", 3),
    ]


def test_bpe_train_greedy_no_overlap(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        bpe_train_merges,
    )

    # "aaa": merge (a,a) applies once per word (leftmost, consumes both)
    docs = [Row(doc_id=1, text="aaa aaa")]
    out = [tuple(r) for r in bpe_train_merges(spark.createDataFrame(docs), rounds=2).collect()]
    # round 1: pairs (a,a) x2 per word x2 words = 4
    assert out[0] == (1, "a", "a", "aa", 4)
    # after apply each word is [aa, a]: round 2 best is (aa, a) x2
    assert out[1] == (2, "aa", "a", "aaa", 2)


# ------------------------------------------------------------ IVF + PQ
def test_ivf_pq_matches_numpy_reference(spark):
    import numpy as np

    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        ivf_pq_topk,
    )

    rng = np.random.RandomState(7)
    n, dim = 40, 64
    vecs = rng.randn(n, dim).astype("float64")
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(n)]
    )
    n_cells, nprobe, n_queries, n_sub, n_codes, k = 8, 3, 5, 4, 8, 5
    out = ivf_pq_topk(
        df, k=k, n_cells=n_cells, nprobe=nprobe, n_queries=n_queries,
        n_subspaces=n_sub, n_codes=n_codes,
    ).collect()

    # numpy reference
    sub = dim // n_sub
    norms = np.linalg.norm(vecs, axis=1)
    cents = vecs[:n_cells]
    cos_to_cents = (vecs @ cents.T) / np.outer(norms, norms[:n_cells])
    cell = np.array([
        min(range(n_cells), key=lambda c: (-round(cos_to_cents[i, c], 6), c))
        for i in range(n)
    ])
    codebook = vecs[:n_codes].reshape(n_codes, n_sub, sub)
    codes = np.zeros((n, n_sub), dtype=int)
    for i in range(n):
        for mm in range(n_sub):
            d2 = ((vecs[i, mm * sub:(mm + 1) * sub] - codebook[:, mm, :]) ** 2).sum(1)
            codes[i, mm] = min(range(n_codes), key=lambda c: (d2[c], c))
    expect = {}
    for qi in range(n_queries):
        probes = sorted(range(n_cells),
                        key=lambda c: (-round(cos_to_cents[qi, c], 6), c))[:nprobe]
        cand = [j for j in range(n) if cell[j] in probes and j != qi]
        scored = []
        for j in cand:
            dist = 0.0
            for mm in range(n_sub):
                dist += ((vecs[qi, mm * sub:(mm + 1) * sub]
                          - codebook[codes[j, mm], mm, :]) ** 2).sum()
            scored.append((round(dist, 6), j))
        scored.sort()
        expect[qi] = [(j, d) for d, j in scored[:k]]
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["approx_dist2"]))
    assert set(got) == set(expect)
    for qi in expect:
        assert [j for j, _ in got[qi]] == [j for j, _ in expect[qi]], qi
        for (ja, da), (jb, db) in zip(got[qi], expect[qi]):
            assert abs(da - db) < 2e-6


# --------------------------------------------------- recommendations
def test_copurchase_recommendations_excludes_owned(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        copurchase_recommendations,
    )
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        GraphView, TPCH_GRAPH_SPEC,
    )

    li = spark.createDataFrame(
        [  # orders 1..4 as baskets; parts 10,20,30
            Row(l_orderkey=1, l_partkey=10), Row(l_orderkey=1, l_partkey=20),
            Row(l_orderkey=2, l_partkey=10), Row(l_orderkey=2, l_partkey=20),
            Row(l_orderkey=3, l_partkey=20), Row(l_orderkey=3, l_partkey=30),
            Row(l_orderkey=4, l_partkey=20), Row(l_orderkey=4, l_partkey=30),
            Row(l_orderkey=5, l_partkey=10),  # customer 2 bought only part 10
        ]
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=1, o_custkey=1), Row(o_orderkey=2, o_custkey=1),
         Row(o_orderkey=3, o_custkey=3), Row(o_orderkey=4, o_custkey=3),
         Row(o_orderkey=5, o_custkey=2)]
    )
    view = GraphView(spark, TPCH_GRAPH_SPEC, {}, {"lineitem": li, "orders": orders}, None)
    out = copurchase_recommendations(view, k=3, min_co_orders=2).collect()
    recs = {(r["custkey"], r["rec_part"]): r for r in out}
    # customer 2 owns {10}; 10 co-occurs with 20 (orders 1,2) -> recommend 20
    assert (2, 20) in recs and recs[(2, 20)]["common_items"] == 1
    # owned items are never recommended
    assert (2, 10) not in recs and (1, 10) not in recs and (1, 20) not in recs
    # customer 1 owns {10,20}: 30 co-occurs with 20 twice -> recommended
    assert (1, 30) in recs


# ------------------------------------------------- Markov transitions
def test_markov_transition_probabilities(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        markov_transitions,
    )

    rows = [
        Row(event_id=i, ts=_day(1 + i), user_id=1, event_type=t, value=0.0)
        for i, t in enumerate(["a", "b", "a", "c"])
    ] + [Row(event_id=10, ts=_day(1), user_id=2, event_type="a", value=0.0)]
    out = {(r["from_type"], r["to_type"]): r for r in markov_transitions(
        spark.createDataFrame(rows)).collect()}
    # user 1 transitions: a->b, b->a, a->c; user 2 contributes none
    assert out[("a", "b")]["n"] == 1 and out[("a", "b")]["prob"] == 0.5
    assert out[("a", "c")]["prob"] == 0.5
    assert out[("b", "a")]["prob"] == 1.0
    assert len(out) == 3


# ----------------------------------------------------- attribution
def test_first_touch_attribution_channels(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        first_touch_attribution,
    )

    rows = [
        # user 1: view -> click -> purchase  => credited to 'view'
        Row(event_id=1, ts=_day(1), user_id=1, event_type="view", value=0.0),
        Row(event_id=2, ts=_day(2), user_id=1, event_type="click", value=0.0),
        Row(event_id=3, ts=_day(3), user_id=1, event_type="purchase", value=0.0),
        # user 2: cold purchase => '(none)'
        Row(event_id=4, ts=_day(1), user_id=2, event_type="purchase", value=0.0),
        # user 2 buys again after a click => still first touch ... 'click'
        Row(event_id=5, ts=_day(2), user_id=2, event_type="click", value=0.0),
        Row(event_id=6, ts=_day(3), user_id=2, event_type="purchase", value=0.0),
    ]
    out = {r["channel"]: r for r in first_touch_attribution(
        spark.createDataFrame(rows)).collect()}
    assert out["view"]["n_conversions"] == 1
    assert out["(none)"]["n_conversions"] == 1
    assert out["click"]["n_conversions"] == 1
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-5


# ------------------------------------------------- data quality checks
def test_data_quality_checks_flags_violations(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        data_quality_checks,
    )
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        GraphView, TPCH_GRAPH_SPEC,
    )

    tables = {
        "customer": spark.createDataFrame(
            [Row(c_custkey=1), Row(c_custkey=2), Row(c_custkey=2)]  # dup key
        ),
        "orders": spark.createDataFrame(
            [Row(o_orderkey=10, o_custkey=1), Row(o_orderkey=11, o_custkey=99)]  # 99: orphan FK
        ),
        "lineitem": spark.createDataFrame(
            [Row(l_orderkey=10, l_quantity=5.0), Row(l_orderkey=77, l_quantity=99.0)]
        ),
        "events": spark.createDataFrame(
            [Row(value=1.0), Row(value=-2.0)]
        ),
        "documents": spark.createDataFrame(
            [Row(text="hello"), Row(text="")]
        ),
    }
    view = GraphView(spark, TPCH_GRAPH_SPEC, {}, tables, None)
    out = {r["rule"]: r for r in data_quality_checks(view).collect()}
    assert out["o_custkey_in_customer"]["n_violations"] == 1
    assert out["l_orderkey_in_orders"]["n_violations"] == 1
    assert out["l_quantity_in_1_50"]["n_violations"] == 1
    assert out["value_non_negative"]["pass_rate"] == 0.5
    assert out["text_non_empty"]["n_violations"] == 1
    assert out["c_custkey_unique"]["n_violations"] == 1  # one dup key group
    assert out["c_custkey_unique"]["n_rows"] == 2  # key groups, not rows


def test_sequence_anomaly_ranks_rare_orderings(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        sequence_anomaly_scores,
    )

    rows = []
    eid = 0
    # 10 normal users do a->b; one weird user does b->a
    for u in range(10):
        for i, t in enumerate(["a", "b"]):
            rows.append(Row(event_id=eid, ts=_day(1 + i), user_id=u,
                            event_type=t, value=0.0))
            eid += 1
    rows.append(Row(event_id=eid, ts=_day(1), user_id=99, event_type="b", value=0.0))
    rows.append(Row(event_id=eid + 1, ts=_day(2), user_id=99, event_type="a", value=0.0))
    out = {r["user_id"]: r for r in sequence_anomaly_scores(
        spark.createDataFrame(rows)).collect()}
    # the rare b->a transition (1 of 1 from 'b') is certain given 'b',
    # but a->b is 10/10 too: both prob 1.0 here; make the anomaly real:
    assert out[99]["n_transitions"] == 1
    # instead verify scoring against exact probabilities
    # P(a->b) = 10/10, P(b->a) = 1/1 -> both mean_logprob 0
    assert out[0]["mean_logprob"] == 0.0 and out[99]["mean_logprob"] == 0.0


def test_sequence_anomaly_mixed_probabilities(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        sequence_anomaly_scores,
    )
    import math

    rows = []
    eid = 0
    # from 'a': 3 users go to b, 1 user goes to c  => P(a->b)=.75 P(a->c)=.25
    for u, nxt in enumerate(["b", "b", "b", "c"]):
        rows.append(Row(event_id=eid, ts=_day(1), user_id=u, event_type="a", value=0.0))
        rows.append(Row(event_id=eid + 1, ts=_day(2), user_id=u, event_type=nxt, value=0.0))
        eid += 2
    out = {r["user_id"]: r for r in sequence_anomaly_scores(
        spark.createDataFrame(rows)).collect()}
    assert out[3]["min_transition_prob"] == 0.25
    assert out[3]["mean_logprob"] == pytest.approx(math.log(0.25), abs=1e-3)
    assert out[0]["mean_logprob"] == pytest.approx(math.log(0.75), abs=1e-3)


def test_matryoshka_full_prefix_is_perfect_recall(spark):
    """Using ALL dimensions as the 'prefix' must reproduce the full
    ranking exactly (recall 1.0); a 1-dim prefix on structured data
    should lose most of it."""
    import numpy as np

    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        matryoshka_prefix_audit,
    )

    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 64)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(30)]
    )
    out = matryoshka_prefix_audit(
        df, prefix_dims=(1, 64), k=5, n_queries=5
    ).collect()
    by_dim = {}
    for r in out:
        by_dim.setdefault(r["prefix_dim"], []).append(r["recall_at_k"])
    assert all(v == 1.0 for v in by_dim[64])
    assert len(by_dim[1]) == 5  # recall-0 queries still emit rows
    assert sum(by_dim[1]) / 5 < sum(by_dim[64]) / 5


def test_vocab_coverage_curve_monotone(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        vocab_coverage_curve,
    )

    # 300 distinct terms, zipf-ish: term i appears 301-i times
    docs = []
    did = 0
    for i in range(1, 301):
        for _ in range(301 - i):
            docs.append(Row(doc_id=did, text=f"t{i:03d}"))
            did += 1
    out = {r["vocab_size"]: r for r in vocab_coverage_curve(
        spark.createDataFrame(docs), vocab_sizes=(10, 100, 300)).collect()}
    total = sum(301 - i for i in range(1, 301))
    assert out[300]["coverage"] == 1.0
    assert out[10]["covered_tokens"] == sum(301 - i for i in range(1, 11))
    assert out[10]["coverage"] < out[100]["coverage"] < 1.0 or out[100]["coverage"] == 1.0
    assert out[100]["covered_tokens"] == sum(301 - i for i in range(1, 101))


def test_pca_power_iteration_finds_planted_direction(spark):
    import numpy as np

    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        pca_power_iteration,
    )

    rng = np.random.RandomState(5)
    # strong axis-7 component + small isotropic noise
    n, dim = 200, 16
    base = rng.randn(n, 1) @ np.eye(1, dim, 7) * 10.0
    vecs = base + rng.randn(n, dim) * 0.1
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(n)]
    )
    out = pca_power_iteration(df, iterations=4, dim=16).collect()
    loadings = {r["pos"]: r["loading"] for r in out}
    share = out[0]["explained_share"]
    assert abs(abs(loadings[7]) - 1.0) < 0.01  # dominant axis recovered
    assert all(abs(loadings[p]) < 0.05 for p in loadings if p != 7)
    assert share > 0.98  # nearly all energy on the planted axis


def test_walk_corpus_follows_md5_argmin_and_handles_dead_ends(spark):
    import hashlib

    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        walk_corpus,
    )

    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="a", dst="c"), Row(src="b", dst="d")]
    )
    seeds = spark.createDataFrame([Row(node="a"), Row(node="z")])
    out = {r["walk_id"]: r for r in walk_corpus(edges, seeds, steps=3).collect()}

    def pick(cur, neighbors, t):
        return min(
            neighbors,
            key=lambda b: hashlib.md5(f"{cur}|{b}|{t}".encode()).hexdigest(),
        )

    und = {"a": ["b", "c"], "b": ["a", "d"], "c": ["a"], "d": ["b"]}
    cur, path = "a", ["a"]
    for t in (1, 2, 3):
        cur = pick(cur, und[cur], t)
        path.append(cur)
    assert out["a"]["path"] == " ".join(path)
    assert out["a"]["n_nodes"] == 4
    # isolated seed: walk is just the seed, frozen at length 1
    assert out["z"]["path"] == "z" and out["z"]["n_nodes"] == 1


def test_walk_corpus_partitioning_invariance(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        walk_corpus,
    )

    edges = spark.createDataFrame(
        [Row(src=f"u{i}", dst=f"u{(i * 3 + 1) % 20}") for i in range(20)]
    )
    seeds = spark.createDataFrame([Row(node=f"u{i}") for i in range(5)])
    a = {tuple(r) for r in walk_corpus(edges.coalesce(1), seeds, steps=4).collect()}
    b = {tuple(r) for r in walk_corpus(edges.repartition(7), seeds, steps=4).collect()}
    assert a == b


def test_grouped_regression_exact_line_and_guards(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        grouped_linear_regression,
    )

    rows = (
        # group 'lin': y = 2x + 1 exactly
        [Row(g="lin", x=float(i), y=2.0 * i + 1.0) for i in range(10)]
        # group 'flat': constant x -> degenerate, NULL fit
        + [Row(g="flat", x=5.0, y=float(i)) for i in range(5)]
        # group 'tiny': below min_points
        + [Row(g="tiny", x=1.0, y=1.0), Row(g="tiny", x=2.0, y=2.0)]
    )
    out = {r["g"]: r for r in grouped_linear_regression(
        spark.createDataFrame(rows), "g", "x", "y").collect()}
    assert out["lin"]["slope"] == 2.0 and out["lin"]["intercept"] == 1.0
    assert out["lin"]["pearson_r"] == 1.0
    assert out["flat"]["slope"] is None
    assert out["tiny"]["slope"] is None


def test_cluster_purity_separable_labels(spark):
    import numpy as np

    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        cluster_label_purity,
    )

    rng = np.random.RandomState(11)
    rows = []
    # two well-separated label blobs along different axes; first 2 ids
    # (the centroids) are one from each blob
    for i in range(40):
        label = i % 2
        base = np.eye(1, 8, 0) if label == 0 else np.eye(1, 8, 4)
        v = (base * 10.0 + rng.randn(1, 8) * 0.1).ravel()
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v], label=label))
    out = cluster_label_purity(
        spark.createDataFrame(rows), n_cells=2
    ).collect()
    assert {r["cell"] for r in out} == {0, 1}
    for r in out:
        assert r["purity"] == 1.0  # perfectly separable
        assert r["n_vecs"] == 20


def test_assortativity_star_is_negative(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        degree_assortativity,
    )

    # star: hub h with 10 leaves — degree-1 nodes attach to a degree-10
    # node: strongly disassortative
    star = spark.createDataFrame([Row(src="h", dst=f"l{i}") for i in range(10)])
    out = degree_assortativity(star).collect()[0]
    assert out["n_edges"] == 10
    assert out["assortativity"] == -1.0
    # 4-cycle: degree-regular -> undefined (NULL), not a crash
    cyc = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"),
         Row(src="c", dst="d"), Row(src="d", dst="a")]
    )
    assert degree_assortativity(cyc).collect()[0]["assortativity"] is None


def test_clustering_coefficients_triangle_plus_tail(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        clustering_coefficients,
    )

    # triangle a-b-c plus pendant d on a
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"),
         Row(src="c", dst="a"), Row(src="a", dst="d")]
    )
    out = {r["node"]: r for r in clustering_coefficients(edges).collect()}
    assert out["b"]["clustering_coef"] == 1.0  # deg 2, 1 triangle
    assert out["a"]["degree"] == 3 and out["a"]["n_triangles"] == 1
    assert out["a"]["clustering_coef"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["d"]["clustering_coef"] == 0.0  # degree 1 convention


def test_active_user_curves_exact_windows(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        active_user_curves,
    )

    rows = [
        # user 1 active on day 1 and day 10; user 2 on day 10 only
        Row(event_id=1, ts=_day(1), user_id=1, event_type="a", value=0.0),
        Row(event_id=2, ts=_day(10), user_id=1, event_type="a", value=0.0),
        Row(event_id=3, ts=_day(10), user_id=2, event_type="a", value=0.0),
    ]
    out = {str(r["day"]): r for r in active_user_curves(
        spark.createDataFrame(rows)).collect()}
    assert out["2024-01-01"]["dau"] == 1 and out["2024-01-01"]["wau"] == 1
    d10 = out["2024-01-10"]
    assert d10["dau"] == 2
    assert d10["wau"] == 2   # day 1 is outside the trailing 7 days
    assert d10["mau"] == 2   # user 1 counted once despite two active days
    assert len(out) == 2     # only real activity days emit rows


def test_containment_catches_excerpt_jaccard_misses(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        containment_pairs,
    )

    long_text = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10))  # fully contained
    rows = [
        Row(doc_id=1, text=long_text),
        Row(doc_id=2, text=excerpt),
        Row(doc_id=3, text="completely different words entirely here now"),
    ]
    out = {(r["id_a"], r["id_b"]): r for r in containment_pairs(
        spark.createDataFrame(rows), threshold=0.8).collect()}
    pair = out[(1, 2)]
    assert pair["containment"] == 1.0       # excerpt fully contained
    assert pair["jaccard"] < 0.2            # Jaccard would have missed it
    assert all(3 not in k for k in out)
