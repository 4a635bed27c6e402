"""Unit tests for the round-6 operators on small planted fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- graph: modularity + bridges -------------------------------------------


def test_modularity_two_cliques_vs_random(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        modularity,
    )

    # two 4-cliques joined by one bridge edge; true communities
    c1 = [f"a{i}" for i in range(4)]
    c2 = [f"b{i}" for i in range(4)]
    edges = (
        [(x, y) for i, x in enumerate(c1) for y in c1[i + 1 :]]
        + [(x, y) for i, x in enumerate(c2) for y in c2[i + 1 :]]
        + [("a0", "b0")]
    )
    edf = spark.createDataFrame(edges, "src string, dst string")
    good = spark.createDataFrame(
        [(n, "A") for n in c1] + [(n, "B") for n in c2], "node string, label string"
    )
    row = modularity(edf, good).collect()[0]
    assert row["n_communities"] == 2
    assert row["n_edges"] == 13
    # hand-computed: e2=2*12, rows2=2*13, sd2=13^2+13^2
    expected = (24 / 26) - (169 + 169) / (26 * 26)
    assert abs(row["modularity"] - expected) < 1e-6

    # everything-one-community scores exactly 0
    allone = good.select("node", F.lit("X").alias("label"))
    assert modularity(edf, allone).collect()[0]["modularity"] == 0.0


def test_bridge_edges_detects_the_bridge(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        bridge_edges,
    )

    # triangle a-b-c plus pendant chain c-d
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    rows = {(r["node_a"], r["node_b"]): r for r in bridge_edges(edf).collect()}
    assert rows[("a", "b")]["n_common"] == 1 and not rows[("a", "b")]["is_bridge"]
    assert rows[("c", "d")]["n_common"] == 0 and rows[("c", "d")]["is_bridge"]


def test_bridge_edges_hub_cap_excludes_center(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        bridge_edges,
    )

    # hub h adjacent to x and y; edge x-y would have common neighbor h,
    # but with cap below h's degree the wedge is excluded -> bridge
    edges = [("x", "y")] + [("h", n) for n in ("x", "y", "z1", "z2", "z3")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    rows = {(r["node_a"], r["node_b"]): r for r in bridge_edges(edf, max_center_degree=3).collect()}
    assert rows[("x", "y")]["is_bridge"]
    uncapped = {
        (r["node_a"], r["node_b"]): r for r in bridge_edges(edf, max_center_degree=100).collect()
    }
    assert uncapped[("x", "y")]["n_common"] == 1


# --- statistics -------------------------------------------------------------


def test_gini_extremes(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        gini_concentration,
    )

    even = spark.createDataFrame(
        [(f"k{i}", 10.0) for i in range(5)], "k string, v double"
    )
    assert gini_concentration(even, "k", "v").collect()[0]["gini"] == 0.0

    skew = spark.createDataFrame(
        [("k0", 1000.0)] + [(f"k{i}", 0.001) for i in range(1, 5)],
        "k string, v double",
    )
    g = gini_concentration(skew, "k", "v").collect()[0]["gini"]
    assert g > 0.75  # max for n=5 is (n-1)/n = 0.8


def test_winsorized_mean_bounds_outlier(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        winsorized_stats,
    )

    rows = [("t", float(i)) for i in range(1, 100)] + [("t", 1_000_000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = winsorized_stats(df, "k", "v").collect()[0]
    # raw mean ≈ 10050; winsorized mean stays near the bulk
    assert out["winsorized_mean"] < 100
    assert out["winsorized_max"] < 1_000_000.0


def test_ks_drift_same_vs_shifted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        ks_drift,
    )

    same = spark.createDataFrame(
        [(i % 50, i < 1000) for i in range(2000)], "v long, s boolean"
    )
    d0 = ks_drift(same, "v", F.col("s")).collect()[0]
    assert d0["ks_stat"] == 0.0
    shifted = spark.createDataFrame(
        [(i % 50, True) for i in range(1000)]
        + [(i % 50 + 25, False) for i in range(1000)],
        "v long, s boolean",
    )
    d1 = ks_drift(shifted, "v", F.col("s")).collect()[0]
    assert d1["ks_stat"] == 0.5


def test_chi2_independent_is_zero(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        chi2_association,
    )

    # perfectly independent 2x2 grid
    rows = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 30
        + [("r2", "c1")] * 20 + [("r2", "c2")] * 60
    )
    df = spark.createDataFrame(rows, "r string, c string")
    cells = chi2_association(df, "r", "c").collect()
    assert len(cells) == 4
    assert all(r["chi2_cell"] == 0.0 for r in cells)
    assert {(r["r"], r["c"]): r["expected"] for r in cells}[("r1", "c1")] == 10.0


def test_mutual_information_zero_and_positive(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        mutual_information,
    )

    indep = spark.createDataFrame(
        [("r1", "c1")] * 10 + [("r1", "c2")] * 10
        + [("r2", "c1")] * 10 + [("r2", "c2")] * 10,
        "r string, c string",
    )
    assert mutual_information(indep, "r", "c").collect()[0]["mutual_information"] == 0.0

    # perfectly dependent: MI = H(X) = ln 2
    dep = spark.createDataFrame(
        [("r1", "c1")] * 10 + [("r2", "c2")] * 10, "r string, c string"
    )
    mi = mutual_information(dep, "r", "c").collect()[0]["mutual_information"]
    assert abs(mi - math.log(2)) < 1e-6


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "v long")
    r1 = bootstrap_mean_ci(df, "v").collect()[0]
    r2 = bootstrap_mean_ci(df.repartition(7), "v").collect()[0]
    assert r1 == r2  # partition-independent (md5-derandomized)
    assert r1["n_boot"] == 32
    assert r1["ci_lo"] <= 249.5 <= r1["ci_hi"]
    assert r1["ci_hi"] - r1["ci_lo"] < 60  # sane width for n=500


# --- similarity: semdedup + knn agreement -----------------------------------


def _vec_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_semdedup_prunes_near_twin_keeps_min(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        semdedup_prune,
    )

    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    other = [0.0, 1.0, 0.0, 0.0]
    rows = [(0, base, 0), (1, near, 0), (2, other, 1), (3, near, 0)]
    out = {r["pruned_id"]: r for r in semdedup_prune(
        _vec_df(spark, rows), n_cells=2, threshold=0.95
    ).collect()}
    # cells: centroids are vecs 0 and 1, so 3 (identical to 1) lands in
    # 1's cell and prunes to keeper 1; 0 sits alone in its own cell —
    # cross-cell twins are out of scope by SemDeDup design
    assert set(out) == {3}
    assert out[3]["kept_id"] == 1
    assert out[3]["cosine"] == 1.0


def test_knn_label_agreement_separable(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        knn_label_agreement,
    )

    # two well-separated clusters of 6, labels match clusters
    rows = []
    for i in range(6):
        rows.append((i, [1.0, float(i) * 0.01, 0.0, 0.0], 0))
    for i in range(6):
        rows.append((6 + i, [0.0, 0.0, 1.0, float(i) * 0.01], 1))
    out = {r["label"]: r for r in knn_label_agreement(
        _vec_df(spark, rows), k=3, n_queries=12
    ).collect()}
    assert out[0]["mean_agreement"] == 1.0
    assert out[1]["mean_agreement"] == 1.0
    assert out[0]["n_queries"] == 6


# --- retrieval: tf-idf cosine pairs -----------------------------------------


def test_tfidf_cosine_pairs_weights_rare_overlap(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )

    rows = [
        (0, "zeta quark flux omega kappa"),
        (1, "zeta quark flux sigma tau"),     # shares 3 rare terms with 0
        (2, "alpha beta gamma delta epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["tfidf_cosine"] for r in tfidf_cosine_pairs(
        df, threshold=0.1
    ).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.4
    assert not any(2 in p for p in pairs)


def test_tfidf_cosine_df_cap_drops_boilerplate(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )

    # 10 docs all share 'common'; only 0/1 share rare terms
    rows = [(i, f"common uniq{i}a uniq{i}b") for i in range(2, 10)]
    rows += [(0, "common zeta quark"), (1, "common zeta quark")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {(r["id_a"], r["id_b"]) for r in tfidf_cosine_pairs(
        df, threshold=0.3, max_df=5
    ).collect()}
    assert capped == {(0, 1)}  # 'common' dropped; boilerplate pairs gone


# --- windows: EWMA ----------------------------------------------------------


def test_ewma_daily_weights_recent_days(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        ewma_daily,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(5):
        for _ in range(2):
            rows.append((base + datetime.timedelta(days=d), "t", float(d * 10)))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {str(r["day"]): r for r in ewma_daily(df, alpha=0.3, window_days=14).collect()}
    assert len(out) == 5
    d0 = out["2024-01-01"]
    assert d0["n_days_in_window"] == 1 and d0["ewma_value"] == 0.0
    d4 = out["2024-01-05"]
    assert d4["n_days_in_window"] == 5
    # EWMA of [0,10,20,30,40] weighted (0.7^4..0.7^0): between mean and last
    assert 20.0 < d4["ewma_value"] < 40.0
    # hand value: sum(0.7^(4-d)*10d)/sum(0.7^k)
    num = sum(0.7 ** (4 - d) * 10 * d for d in range(5))
    den = sum(0.7 ** k for k in range(5))
    assert abs(d4["ewma_value"] - num / den) < 1e-4


def test_ewma_daily_partition_independent(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        ewma_daily,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=i % 9, hours=i % 23), "x", float(i % 37) / 7)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    a = sorted(tuple(r) for r in ewma_daily(df).collect())
    b = sorted(tuple(r) for r in ewma_daily(df.repartition(11)).collect())
    assert a == b


# --- batch 2: skyline, concentration, seasonal, sessions, dedup-rate --------


def test_pareto_skyline_basic(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        pareto_skyline_2d,
    )

    pts = [(1.0, 5.0), (2.0, 3.0), (3.0, 4.0), (4.0, 1.0), (5.0, 0.5),
           (2.5, 3.0), (1.0, 6.0)]
    df = spark.createDataFrame(pts, "x double, y double")
    sky = sorted((r["x"], r["y"]) for r in pareto_skyline_2d(df, "x", "y").collect())
    # (3,4) dominated by (2,3); (2.5,3) dominated by (2,3); (1,6) by (1,5)
    assert sky == [(1.0, 5.0), (2.0, 3.0), (4.0, 1.0), (5.0, 0.5)]


def test_pareto_skyline_matches_bruteforce_random(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        pareto_skyline_2d,
    )

    import hashlib

    pts = []
    for i in range(500):
        h = hashlib.md5(str(i).encode()).hexdigest()
        pts.append((int(h[:4], 16) / 100.0, int(h[4:8], 16) / 100.0))
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted((r["x"], r["y"]) for r in pareto_skyline_2d(df, "x", "y").collect())
    uniq = sorted(set(pts))
    brute = [
        p for p in uniq
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in uniq
        )
    ]
    assert got == sorted(brute)


def test_top_percentile_contribution_concentrated(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        top_percentile_contribution,
    )

    rows = [(f"k{i}", 1.0) for i in range(99)] + [("big", 901.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = top_percentile_contribution(df, "k", "v", pct=0.99).collect()[0]
    assert out["n_keys"] == 100
    assert out["n_top_keys"] == 1
    assert out["top_share"] == 0.901  # 901 / 1000


def test_seasonal_anomalies_weekly_pattern(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        seasonal_adjusted_anomalies,
    )

    # strong hour-of-week seasonality + one planted spike
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(28):
        for h in (9, 21):
            ts = base + datetime.timedelta(days=d, hours=h)
            season = 100.0 if h == 9 else 10.0
            rows.append((ts, "t", season + (d % 3)))
    rows.append((base + datetime.timedelta(days=10, hours=9), "t", 5000.0))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = seasonal_adjusted_anomalies(df).collect()[0]
    assert out["n_anomalies"] == 1
    assert out["max_abs_resid"] > 4000


def test_session_conversion_counts_sessions(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        session_conversion,
    )

    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1: two sessions (65-min gap); second converts
        (1, t0, "view"), (1, t0 + 5 * m, "click"),
        (1, t0 + 70 * m, "view"), (1, t0 + 72 * m, "purchase"),
        # user 2: one session, no conversion
        (2, t0, "view"), (2, t0 + 10 * m, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = session_conversion(df).collect()[0]
    assert out["n_sessions"] == 3
    assert out["n_converted"] == 1
    assert abs(out["conversion_rate"] - 1 / 3) < 1e-5


def test_dedup_rate_by_key_cross_source_counts(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        dedup_rate_by_key,
    )

    rows = [
        (0, "same text", "A"), (1, "same text", "B"),  # cross-source dup
        (2, "unique a", "A"), (3, "unique b", "B"), (4, "also b", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in dedup_rate_by_key(df).collect()}
    assert out["A"]["n_docs"] == 2 and out["A"]["n_dup_docs"] == 1
    assert out["B"]["n_docs"] == 3 and out["B"]["n_dup_docs"] == 1
    assert out["A"]["dup_rate"] == 0.5


# --- batch 3 ----------------------------------------------------------------


def test_linear_attribution_splits_credit(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        linear_attribution,
    )

    t0 = datetime.datetime(2024, 6, 1)
    s = datetime.timedelta(seconds=1)
    rows = [
        # user 1: view, view, click then purchase -> 2/3 view, 1/3 click
        (1, t0, 1, "view"), (1, t0 + s, 2, "view"), (1, t0 + 2 * s, 3, "click"),
        (1, t0 + 3 * s, 4, "purchase"),
        # user 2: cold purchase -> (none)
        (2, t0, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r["channel"]: r["credit"] for r in linear_attribution(df).collect()}
    assert abs(out["view"] - 2 / 3) < 1e-5
    assert abs(out["click"] - 1 / 3) < 1e-5
    assert out["signup"] == 0.0
    assert out["(none)"] == 1.0


def test_monthly_seasonality_flat_series(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        monthly_seasonality,
    )

    rows = []
    for m in range(1, 13):
        for _ in range(10):
            rows.append((datetime.datetime(2023, m, 15),))
    df = spark.createDataFrame(rows, "o_orderdate timestamp")
    out = {r["month"]: r for r in monthly_seasonality(df).collect()}
    assert len(out) == 12
    # flat series: every seasonal index is exactly 1
    assert all(r["seasonal_index"] == 1.0 for r in out.values())
    # 12-month series: June sees 5 before + self + 6 after = 12
    assert out["2023-06"]["n_window"] == 12
    assert out["2023-01"]["n_window"] == 7


def test_burst_days_flags_planted_spike(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        burst_days,
    )

    base = datetime.datetime(2024, 2, 1)
    rows = []
    for d in range(15):
        n = 100 if d != 10 else 400  # 4x spike on day 10
        for i in range(n):
            rows.append((base + datetime.timedelta(days=d, seconds=i), "t"))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = burst_days(df).collect()
    assert len(out) == 1
    assert str(out[0]["day"]) == "2024-02-11"
    assert out[0]["burst_ratio"] == 4.0


def test_churn_hazard_shape(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        churn_hazard,
    )

    t0 = datetime.datetime(2024, 1, 1)
    wk = datetime.timedelta(days=7)
    rows = []
    # 3 users with 0-week tenure, 2 with 2-week tenure
    for u in range(3):
        rows.append((u, t0))
    for u in range(3, 5):
        rows.append((u, t0))
        rows.append((u, t0 + 2 * wk))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["tenure_week"]: r for r in churn_hazard(df).collect()}
    assert out[0]["n_churned"] == 3 and out[0]["n_at_risk"] == 5
    assert out[2]["n_churned"] == 2 and out[2]["n_at_risk"] == 2
    assert out[0]["hazard"] == 0.6 and out[2]["hazard"] == 1.0


def test_benford_on_benford_like_data(spark):
    # powers spread log-uniformly follow Benford closely
    import math

    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        benford_audit,
    )

    vals = [(math.exp(i / 100.0),) for i in range(1, 2000)]
    df = spark.createDataFrame(vals, "v double")
    out = {r["leading_digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(out) == {str(d) for d in range(1, 10)}
    # digit 1 most common, near log10(2) = 0.301
    assert abs(out["1"]["observed_share"] - 0.301) < 0.02
    assert out["1"]["benford_share"] == 0.30103
    assert sum(r["n_obs"] for r in out.values()) == 1999


def test_grouped_bootstrap_partition_independent(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        grouped_bootstrap_mean_ci,
    )

    rows = [("a", i) for i in range(300)] + [("b", i * 2) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long")
    r1 = sorted(tuple(r) for r in grouped_bootstrap_mean_ci(df, "g", "v").collect())
    r2 = sorted(tuple(r) for r in grouped_bootstrap_mean_ci(df.repartition(9), "g", "v").collect())
    assert r1 == r2
    d = {r[0]: r for r in r1}
    assert d["a"][2] <= 149.5 <= d["a"][4]  # ci_lo <= true mean <= ci_hi


def test_centroid_split_drift_identical_halves(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        centroid_split_drift,
    )

    # vectors in two tight clusters; both split sides see both clusters,
    # so side centroids are near-identical -> cosine ~ 1
    rows = []
    for i in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        v = [x + (i % 7) * 1e-3 for x in base]
        rows.append((i, v, i % 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = centroid_split_drift(df, n_cells=2).collect()
    assert out
    assert all(r["centroid_cosine"] > 0.999 for r in out)
    assert all(r["n_a"] + r["n_b"] >= 2 for r in out)


def test_powerlaw_fit_on_star_vs_ring(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        degree_powerlaw_fit,
    )

    # ring: every degree == 2 -> ln(2/1.5) terms, alpha finite & large
    ring = [(f"n{i}", f"n{(i + 1) % 50}") for i in range(50)]
    rdf = spark.createDataFrame(ring, "src string, dst string")
    r = degree_powerlaw_fit(rdf).collect()[0]
    assert r["n_nodes_fit"] == 50 and r["max_degree"] == 2
    import math

    expected = 1 + 50 / (50 * round(math.log(2 / 1.5), 9))
    assert abs(r["alpha"] - round(math.floor(expected * 1e6 + 0.5) / 1e6, 6)) < 1e-6


def test_calibration_bins_perfectly_calibrated_score(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        score_calibration_bins,
    )
    from pyspark.sql import functions as F

    # score == label -> bins 0 and 9, positive_rate == mean_score
    rows = [(0.0, 0)] * 30 + [(1.0, 1)] * 20
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["bin"]: r for r in score_calibration_bins(
        df, F.col("s"), F.col("y") == 1
    ).collect()}
    assert set(out) == {0, 9}
    assert out[0]["positive_rate"] == 0.0 and out[0]["mean_score"] == 0.0
    assert out[9]["positive_rate"] == 1.0 and out[9]["mean_score"] == 1.0
    assert out[9]["n"] == 20


def test_kmv_set_intersection_accuracy_and_determinism(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        kmv_set_intersection,
    )

    # A = 0..399, B = 200..599 -> exact intersection 200
    rows = [("A", i) for i in range(400)] + [("B", i) for i in range(200, 600)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    # k=256 keeps the Jaccard-in-window std near 3% so the band is tight
    r1 = kmv_set_intersection(df, k=256).collect()
    assert len(r1) == 1
    row = r1[0]
    assert row["exact_intersection"] == 200
    assert 140 <= row["kmv_intersection"] <= 260
    r2 = kmv_set_intersection(df.repartition(13), k=256).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_kmv_set_intersection_small_sets_exact(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        kmv_set_intersection,
    )

    # both sets smaller than k=32 -> sketches are exact
    rows = [("A", i) for i in range(10)] + [("B", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    row = kmv_set_intersection(df).collect()[0]
    assert row["exact_intersection"] == 5
    assert row["kmv_intersection"] == 5


# --- batch 4 ----------------------------------------------------------------


def test_tokenizer_fertility_punct_heavy_scores_higher(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        tokenizer_fertility,
    )

    rows = [
        ("plain", "simple words only here"),
        ("punct", "a,b,c! d.e.f? (g)"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    assert out["plain"]["fertility"] == 1.0
    assert out["punct"]["fertility"] > 2.0
    assert out["plain"]["n_ws_tokens"] == 4


def test_cluster_size_histogram_bands(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        cluster_size_histogram,
    )

    rows = (
        [(i, f"uniq {i}") for i in range(3)]          # 3 singletons
        + [(10, "pair"), (11, "pair")]                  # one 2-cluster
        + [(20 + i, "big") for i in range(12)]          # one 11+ cluster
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["cluster_size_band"]: r for r in cluster_size_histogram(df).collect()}
    assert out["1"]["n_clusters"] == 3 and out["1"]["n_docs"] == 3
    assert out["2"]["n_clusters"] == 1 and out["2"]["n_docs"] == 2
    assert out["11+"]["n_clusters"] == 1 and out["11+"]["n_docs"] == 12


def test_transition_entropy_deterministic_vs_uniform(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        transition_entropy,
    )

    t0 = datetime.datetime(2024, 7, 1)
    s = datetime.timedelta(seconds=1)
    rows = []
    eid = 0
    # from 'a' always to 'b' (entropy 0); from 'b' to c/d evenly (ln 2)
    for u in range(8):
        seq = ["a", "b", "c" if u % 2 == 0 else "d", "a", "b", "d" if u % 2 == 0 else "c"]
        for i, t in enumerate(seq):
            rows.append((u, t0 + i * s, eid, t)); eid += 1
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = {r["from_type"]: r for r in transition_entropy(df).collect()}
    assert out["a"]["entropy_nats"] == 0.0 and out["a"]["perplexity"] == 1.0
    import math

    assert abs(out["b"]["entropy_nats"] - math.log(2)) < 1e-5
    assert abs(out["b"]["perplexity"] - 2.0) < 1e-4


def test_oneway_anova_separated_groups(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        oneway_anova,
    )

    rows = [("a", 10.0 + i % 3) for i in range(30)] + [
        ("b", 100.0 + i % 3) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = oneway_anova(df, "g", "v").collect()[0]
    assert out["n"] == 60 and out["k"] == 2
    assert out["f_stat"] > 1000  # massively separated means
    assert out["eta_squared"] > 0.99

    same = spark.createDataFrame(
        [("a", float(i % 5)) for i in range(30)]
        + [("b", float(i % 5)) for i in range(30)],
        "g string, v double",
    )
    assert oneway_anova(same, "g", "v").collect()[0]["f_stat"] == 0.0


def test_char_entropy_extremes(spark):
    import math

    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        char_entropy,
    )

    rows = [(0, "aaaaaaaa"), (1, "abcdefgh"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[0]["char_entropy"] == 0.0 and out[0]["n_distinct_chars"] == 1
    assert abs(out[1]["char_entropy"] - math.log(8)) < 1e-5
    # empty doc: the greatest(len,1) guard yields one empty-string char
    assert out[2]["char_entropy"] == 0.0


# --- batch 5 ----------------------------------------------------------------


def test_rich_club_complete_core(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        rich_club_coefficient,
    )

    # 4-clique core, each core node also pends 3 leaves -> deg(core)=6
    core = [f"c{i}" for i in range(4)]
    edges = [(x, y) for i, x in enumerate(core) for y in core[i + 1 :]]
    for i, c in enumerate(core):
        for j in range(3):
            edges.append((c, f"leaf{i}_{j}"))
    edf = spark.createDataFrame(edges, "src string, dst string")
    out = {r["k"]: r for r in rich_club_coefficient(edf, ks=(2, 5)).collect()}
    # k=5: only the 4 core nodes qualify; they form a complete club
    assert out[5]["n_rich"] == 4 and out[5]["phi"] == 1.0
    # k=2: still only core (leaves have degree 1)
    assert out[2]["n_rich"] == 4


def test_intrinsic_dimension_line_vs_volume(spark):
    import hashlib

    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        intrinsic_dimension_twonn,
    )

    import math

    def h(i, j):
        return int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:6], 16) / 0xFFFFFF

    # 1-d manifold: jittered points on a circle (angular gaps large
    # enough that the 6-dp cosine rounding is immaterial; jitter breaks
    # the equal-spacing r1 == r2 degeneracy)
    rows1 = []
    for i in range(120):
        th = (i + 0.5 * h(i, 0)) * 0.1
        v = [math.cos(th), math.sin(th), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        rows1.append((i, v, 0))
    d1 = spark.createDataFrame(rows1, "vec_id long, embedding array<float>, label int")
    id1 = intrinsic_dimension_twonn(d1, n_queries=60).collect()[0]

    # full-rank cloud in 8-d
    rows8 = [(i, [h(i, j) for j in range(8)], 0) for i in range(120)]
    d8 = spark.createDataFrame(rows8, "vec_id long, embedding array<float>, label int")
    id8 = intrinsic_dimension_twonn(d8, n_queries=60).collect()[0]

    assert id1["intrinsic_dim"] < id8["intrinsic_dim"]
    assert id1["intrinsic_dim"] < 3.0  # true dim 1 (+ rounding bias)
    assert id8["intrinsic_dim"] > 4.0


def test_weekly_autocorrelation_periodic_vs_flat(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        weekly_autocorrelation,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(28):
        n = 10 + (50 if d % 7 == 0 else 0)  # weekly spike
        for i in range(n):
            rows.append((base + datetime.timedelta(days=d, seconds=i), "weekly"))
        for i in range(10 + d % 2):  # near-flat control
            rows.append((base + datetime.timedelta(days=d, seconds=i), "flat"))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r["event_type"]: r for r in weekly_autocorrelation(df).collect()}
    assert out["weekly"]["lag_autocorr"] > 0.95
    assert out["weekly"]["n_pairs"] == 21
    # parity-alternating control at an ODD lag is perfectly
    # anti-correlated — a deterministic behavior check, not noise
    assert out["flat"]["lag_autocorr"] == -1.0


def test_token_budget_plan_temperature_flattens(spark):
    from neo4j_database_to_data_importer_package_spark.operators.mixing import (
        token_budget_plan,
    )

    rows = [("big", "w " * 900), ("small", "w " * 100)]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r for r in token_budget_plan(
        df, budget_tokens=1000, temperature=0.5
    ).collect()}
    # natural share 0.9/0.1 -> sqrt shares 0.948/0.316 -> ~0.75/0.25
    assert 0.70 < out["big"]["weight"] < 0.80
    assert 0.20 < out["small"]["weight"] < 0.30
    assert out["big"]["alloc_tokens"] + out["small"]["alloc_tokens"] in (999, 1000, 1001)
    # the small lang is over-sampled (epochs > big's)
    assert out["small"]["epochs"] > out["big"]["epochs"]


# --- batch 6 ----------------------------------------------------------------


def test_funnel_steps_ordered_cascade(spark):
    import datetime

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        funnel_steps,
    )

    t0 = datetime.datetime(2024, 8, 1)
    m = datetime.timedelta(minutes=1)
    rows = [
        # u1 completes the full ordered funnel
        (1, t0, "view"), (1, t0 + m, "click"), (1, t0 + 2 * m, "signup"),
        (1, t0 + 3 * m, "purchase"),
        # u2: purchase BEFORE view — must not count past step 1
        (2, t0, "purchase"), (2, t0 + m, "view"),
        # u3: view then click only
        (3, t0, "view"), (3, t0 + m, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r for r in funnel_steps(df).collect()}
    assert out[1]["n_users"] == 3
    assert out[2]["n_users"] == 2
    assert out[3]["n_users"] == 1
    assert out[4]["n_users"] == 1
    assert out[4]["conv_from_first"] == round(1 / 3, 6) or abs(out[4]["conv_from_first"] - 1/3) < 1e-5


def test_js_divergence_extremes(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        js_divergence_sources,
    )

    import math

    same = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], "source string, text string"
    )
    r0 = js_divergence_sources(same, "a", "b").collect()[0]
    assert r0["js_divergence"] == 0.0

    disjoint = spark.createDataFrame(
        [("a", "x y z"), ("b", "p q r")], "source string, text string"
    )
    r1 = js_divergence_sources(disjoint, "a", "b").collect()[0]
    assert abs(r1["js_divergence"] - math.log(2)) < 1e-5


def test_ann_recall_curve_monotone_and_top1(spark):
    import hashlib

    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        ann_recall_curve,
    )

    rows = []
    for i in range(200):
        h = hashlib.md5(str(i).encode()).hexdigest()
        v = [int(h[j * 2 : j * 2 + 2], 16) / 255.0 for j in range(8)]
        rows.append((i, v, 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["k"]: r["mean_recall"] for r in ann_recall_curve(
        df, ks=(1, 5, 10), n_cells=8, nprobe=8, n_queries=8
    ).collect()}
    # nprobe == n_cells -> exhaustive search -> recall 1.0 everywhere
    assert out[1] == 1.0 and out[5] == 1.0 and out[10] == 1.0


# --- batch 7 ----------------------------------------------------------------


def test_fd_violations_finds_broken_dependency(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        fd_violations,
    )

    rows = [
        ("k1", "a"), ("k1", "a"), ("k1", "b"),     # violated: 1 row off-majority
        ("k2", "x"), ("k2", "x"),                     # holds
        ("k3", "p"), ("k3", "q"), ("k3", "q"), ("k3", "r"),  # 2 off-majority
    ]
    df = spark.createDataFrame(rows, "l string, r string")
    out = {r["lhs_value"]: r for r in fd_violations(df, "l", "r").collect()}
    assert set(out) == {"k1", "k3"}
    assert out["k1"]["n_distinct_rhs"] == 2 and out["k1"]["n_violating_rows"] == 1
    assert out["k3"]["n_distinct_rhs"] == 3 and out["k3"]["n_violating_rows"] == 2


def test_streaming_zscore_state_is_commutative(spark):
    """The stateful fold over shuffled input equals the direct batch
    computation — the property the oracle relies on."""
    import math

    import pandas as pd

    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        _update_zscore,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    vals = [(i * 37) % 100 + 0.25 for i in range(500)]
    milli = [math.floor(v * 1e3 + 0.5) for v in vals]

    def run(order):
        st = FakeState()
        out = None
        for chunk_start in range(0, len(order), 120):
            chunk = order[chunk_start:chunk_start + 120]
            pdf = pd.DataFrame({"v_milli": pd.Series(chunk, dtype="int64")})
            out = next(_update_zscore(("k",), iter([pdf]), st))
        return out.iloc[0].to_dict()

    fwd = run(milli)
    rev = run(list(reversed(milli)))
    assert fwd == rev
    n = len(milli)
    mean_u = sum(milli) / n
    assert fwd["mean_value"] == math.floor(mean_u / 1e3 * 1e6 + 0.5) / 1e6


# --- batch 8: truss support, lexical diversity, rank test, paths, skew ------


def test_edge_triangle_support_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        edge_triangle_support,
    )

    # K4 on {a,b,c,d}: every edge sits in exactly 2 triangles; a
    # pendant edge (d,e) sits in none and must not appear.
    k4 = ["a", "b", "c", "d"]
    edges = [(x, y) for i, x in enumerate(k4) for y in k4[i + 1 :]] + [("d", "e")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    out = {(r["u"], r["v"]): r["support"] for r in edge_triangle_support(edf).collect()}
    assert len(out) == 6
    assert all(s == 2 for s in out.values())
    assert ("d", "e") not in out

    # one triangle + one wedge: triangle edges support 1, wedge edge absent
    edf2 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], "src string, dst string"
    )
    out2 = {(r["u"], r["v"]): r["support"] for r in edge_triangle_support(edf2).collect()}
    assert out2 == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}


def test_lexical_diversity_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        lexical_diversity,
    )

    df = spark.createDataFrame(
        [
            ("s1", "the cat sat"),          # 3 tokens, 3 types, 3 hapax
            ("s1", "the cat ran"),          # s1 total: 6 tok, 4 types, hapax {sat,ran}
            ("s2", "go go go go"),          # 4 tok, 1 type, 0 hapax
        ],
        "source string, text string",
    )
    out = {r["source"]: r for r in lexical_diversity(df).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1["n_tokens"], s1["n_types"], s1["n_hapax"]) == (6, 4, 2)
    assert abs(s1["type_token_ratio"] - 0.666667) < 1e-9
    assert s1["hapax_ratio"] == 0.5
    assert (s2["n_tokens"], s2["n_types"], s2["n_hapax"]) == (4, 1, 0)
    assert s2["type_token_ratio"] == 0.25 and s2["hapax_ratio"] == 0.0


def test_mann_whitney_u_against_scipy_formula(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        mann_whitney_u,
    )

    # hand-checkable with ties: A = [1,2,2,5], B = [2,3,4]
    rows = [("a", v) for v in (1, 2, 2, 5)] + [("b", v) for v in (2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # midranks: v=1→1; v=2 (t=3)→3; v=3→5; v=4→6; v=5→7
    # R_A = 1 + 3 + 3 + 7 = 14 ; U_A = 14 - 4*5/2 = 4
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["u_stat"] == 4.0
    # tie-corrected var = (4*3/12) * ((8) - (27-3)/(7*6)) = 1*(8-24/42)
    var = 4 * 3 * (8.0 - 24 / 42.0) / 12.0
    z = (4.0 - 6.0) / math.sqrt(var)
    assert abs(r["z_score"] - z) < 1e-6
    # rank-biserial r = 1 - 2U/(n_a n_b) = 1 - 8/12
    assert abs(r["rank_biserial"] - (1 - 8 / 12)) < 1e-6


def test_top_event_paths_planted(spark):
    import datetime as dt

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        top_event_paths,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: A B C D  -> paths ABC, BCD ; user 2: A B C -> ABC
    for u, seq in ((1, "ABCD"), (2, "ABC")):
        for i, e in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, e))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = [(r["step1"], r["step2"], r["step3"], r["n_paths"])
           for r in top_event_paths(df).collect()]
    assert out[0] == ("A", "B", "C", 2)
    assert ("B", "C", "D", 1) in out
    assert len(out) == 2


def test_join_key_skew_profile_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        join_key_skew_profile,
    )

    # key 7 is hot: 6 of 10 rows over 5 distinct keys
    rows = [(7,)] * 6 + [(1,), (2,), (3,), (4,)]
    df = spark.createDataFrame(rows, "k long")
    out = join_key_skew_profile(df, "k", top_k=3).collect()
    assert out[0]["key"] == 7 and out[0]["n_rows"] == 6
    assert out[0]["total_rows"] == 10 and out[0]["n_keys"] == 5
    assert out[0]["share"] == 0.6
    assert out[0]["skew_factor"] == 3.0  # 6 / (10/5)
    # remaining rows tie at n=1 -> key asc tiebreak
    assert [r["key"] for r in out[1:]] == [1, 2]


# --- batch 9: silhouette, Davies-Bouldin, nDCG, reconciliation, HHI --------


def test_simplified_silhouette_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        simplified_silhouette,
    )

    # centroids are vec_id 0 and 1 (k=2): [0,0] and [10,0]; the two
    # other points sit exactly on a centroid -> s = 1 - 0/dist = 1.0
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 0.0]),
        (2, [0.0, 0.0]),   # a=0, b=10  -> s=1
        (3, [10.0, 0.0]),  # a=0, b=10 -> s=1
        (4, [4.0, 0.0]),   # a=4 (c0), b=6 (c1) -> s=(6-4)/6
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["cluster_id"]: r for r in simplified_silhouette(df, k=2).collect()}
    assert out[0]["n_members"] == 3 and out[1]["n_members"] == 2
    # cluster 0 members: vec 0 (s=1), vec 2 (s=1), vec 4 (s=1/3)
    assert abs(out[0]["mean_silhouette"] - (1.0 + 1.0 + round(1 / 3, 6)) / 3) < 1e-6
    assert out[1]["mean_silhouette"] == 1.0


def test_davies_bouldin_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        davies_bouldin,
    )

    # 3 clusters on a line at 0, 10, 100; member spread 1.0 around each
    rows = [
        (0, [0.0]), (1, [10.0]), (2, [100.0]),
        (3, [1.0]), (4, [11.0]), (5, [101.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["cluster_id"]: r for r in davies_bouldin(df, k=3).collect()}
    # scatter per cluster = mean(0, 1) = 0.5; worst neighbor of 0 is 1
    for cid in (0, 1, 2):
        assert out[cid]["scatter"] == 0.5 and out[cid]["n_members"] == 2
    assert out[0]["worst_other"] == 1 and abs(out[0]["db_ratio"] - 0.1) < 1e-6
    assert out[1]["worst_other"] == 0
    assert out[2]["worst_other"] == 1  # 90 < 100 away
    assert abs(out[2]["db_ratio"] - 1.0 / 90.0) < 1e-5


def test_ndcg_eval_perfect_and_inverted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        ndcg_eval,
    )

    # single term; BM25 with b=0.75 penalizes long docs, so a long
    # high-tf doc can rank below a short low-tf doc -> nDCG < 1
    docs = [
        (1, "x " * 50 + "pad " * 200),   # tf=50, long
        (2, "x x x"),                      # tf=3, short
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in docs],
                               "doc_id long, text string")
    row = ndcg_eval(df, ["x"], k=10).collect()[0]
    assert row["term"] == "x" and row["n_matched"] == 2
    assert 0.0 < row["ndcg_at_k"] <= 1.0
    # and a clean case: equal lengths, tf decides -> ideal ranking, nDCG=1
    df2 = spark.createDataFrame(
        [(1, "x x x y"), (2, "x y y y")], "doc_id long, text string"
    )
    assert ndcg_eval(df2, ["x"], k=10).collect()[0]["ndcg_at_k"] == 1.0


def test_order_total_reconciliation_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        order_total_reconciliation,
    )

    orders = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 50.0)],
        "o_orderkey long, o_totalprice double",
    )
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.0),            # exact match -> ratio 1.0
            (2, 100.0, 0.0, 0.0),
            (2, 120.0, 0.5, 0.0),            # 100+60=160 -> ratio 0.8
            (3, 100.0, 0.0, 0.1),            # 110 -> ratio 2.2
        ],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )
    out = {r["ratio_bucket"]: r for r in
           order_total_reconciliation(orders, li).collect()}
    assert out[1.0]["n_orders"] == 1 and out[1.0]["min_ratio"] == 1.0
    assert out[0.8]["n_orders"] == 1 and out[0.8]["max_ratio"] == 0.8
    assert out[2.2]["n_orders"] == 1


def test_hhi_concentration_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        hhi_concentration,
    )

    # group g1: shares 0.5/0.5 -> HHI 0.5; g2: monopoly -> HHI 1.0
    rows = [
        ("g1", "a", 50.0), ("g1", "b", 25.0), ("g1", "b", 25.0),
        ("g2", "z", 42.0),
    ]
    df = spark.createDataFrame(rows, "g string, k string, v double")
    out = {r["g"]: r for r in
           hhi_concentration(df, "g", "k", F.col("v")).collect()}
    assert out["g1"]["n_keys"] == 2 and out["g1"]["hhi"] == 0.5
    assert out["g1"]["top_share"] == 0.5
    assert out["g2"]["n_keys"] == 1 and out["g2"]["hhi"] == 1.0
    assert out["g2"]["top_share"] == 1.0


# --- batch 10: silent keys, GoF, JL, k-anonymity, Jaccard -------------------


def test_streaming_last_seen_state_is_commutative():
    import pandas as pd

    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        _update_last_seen,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    vals = [(i * 37) % 1000 for i in range(300)]

    def run(order):
        st = FakeState()
        out = None
        for i in range(0, len(order), 70):
            pdf = pd.DataFrame({"t_us": pd.Series(order[i:i + 70], dtype="int64")})
            out = next(_update_last_seen(("u",), iter([pdf]), st))
        return out.iloc[0]["last_epoch_us"]

    assert run(vals) == run(list(reversed(vals))) == max(vals)


def test_gap_exponential_gof_uniform_vs_exponential(spark):
    import datetime as dt

    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        gap_exponential_gof,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # type "clock": perfectly periodic gaps (60 s) -> all mass lands in
    # one CDF bin -> chi2 near the 9x expected-count maximum
    for i in range(101):
        rows.append((eid, t0 + dt.timedelta(seconds=60 * i), 1, "clock", 0.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["event_type"]: r for r in gap_exponential_gof(df).collect()}
    clock = out["clock"]
    assert clock["n_gaps"] == 100
    assert clock["lambda_per_hour"] == 60.0  # 1/60s = 60/hour
    # all 100 gaps identical -> one bin holds all: chi2 = 9*10 + ... = 900
    assert clock["chi2_gof"] == 900.0


def test_jl_distortion_bounds(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        jl_sign_matrix,
        random_projection_distortion,
    )

    m = jl_sign_matrix(64, 16)
    assert len(m) == 16 and all(len(r) == 64 for r in m)
    assert all(v in (1.0, -1.0) for r in m for v in r)
    # deterministic: same call, same matrix
    assert m == jl_sign_matrix(64, 16)

    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(64)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = random_projection_distortion(df, d_out=16).collect()[0]
    assert r["n_pairs"] == 39
    # JL: ratios concentrate around 1 (loose bounds for d_out=16)
    assert 0.3 < r["min_ratio"] and r["max_ratio"] < 2.0
    assert 0.7 < r["mean_ratio"] < 1.3


def test_k_anonymity_classes_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        k_anonymity_classes,
    )

    rows = [("US", "A")] * 3 + [("US", "B")] * 3 + [("FR", "A")]
    df = spark.createDataFrame(rows, "nat string, seg string")
    out = {r["class_size"]: r for r in
           k_anonymity_classes(df, ["nat", "seg"]).collect()}
    assert out[3]["n_classes"] == 2 and out[3]["n_individuals"] == 6
    assert out[1]["n_classes"] == 1 and out[1]["n_individuals"] == 1


def test_neighbor_jaccard_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        neighbor_jaccard,
    )

    # K4: every edge has 2 common neighbors, deg 3 each ->
    # jaccard = 2/(3+3-2) = 0.5
    k4 = ["a", "b", "c", "d"]
    edges = [(x, y) for i, x in enumerate(k4) for y in k4[i + 1 :]]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = neighbor_jaccard(df).collect()
    assert len(out) == 6
    assert all(r["n_common"] == 2 and r["jaccard"] == 0.5 for r in out)


# --- batch 11: readability, Fisher, changepoint, l-diversity, bloom ---------


def test_readability_orders_prose_vs_wall(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        readability_stats,
    )

    prose = "The cat sat. It was happy. The sun shone. All was well."
    wall = ("polysyllabic incomprehensibility notwithstanding "
            "interdisciplinary organizational responsibilities") * 3
    df = spark.createDataFrame(
        [("a", prose), ("b", wall.strip())], "source string, text string"
    )
    out = {r["source"]: r for r in readability_stats(df).collect()}
    assert out["a"]["n_docs"] == 1 and out["b"]["n_docs"] == 1
    # short sentences + short words read far easier than the wall
    assert out["a"]["mean_flesch"] > out["b"]["mean_flesch"] + 50


def test_fisher_dims_separable_vs_noise(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        fisher_discriminant_dims,
    )

    # dim 0 separates labels perfectly; dim 1 is identical noise
    rows = []
    for i in range(20):
        lbl = i % 2
        rows.append((i, [float(lbl * 10), float(i % 5)], lbl))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["dim"]: r for r in fisher_discriminant_dims(df).collect()}
    assert out[0]["within_var"] == 0.0 and out[0]["f_ratio"] is None
    assert out[1]["between_var"] == 0.0
    assert out[0]["n_labels"] == 2


def test_changepoint_finds_level_shift(spark):
    import datetime as dt

    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        changepoint_day,
    )

    rows = []
    d0 = dt.datetime(2024, 1, 1)
    for day in range(20):
        level = 100.0 if day < 12 else 500.0
        for _ in range(5):
            rows.append((d0 + dt.timedelta(days=day), level))
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    r = changepoint_day(df).collect()[0]
    assert r["split_day"] == "2024-01-12"  # last day of the low segment
    assert r["n_before"] == 60 and r["n_after"] == 40
    assert r["mean_before"] == 100.0 and r["mean_after"] == 500.0


def test_l_diversity_uniform_class_flagged(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        l_diversity_classes,
    )

    # class (US,1): 4 rows but ONE sensitive value -> l=1
    rows = [("US", 1, "A")] * 4 + [("FR", 1, "A"), ("FR", 1, "B")]
    df = spark.createDataFrame(rows, "nat string, b int, seg string")
    out = {r["l_diversity"]: r for r in
           l_diversity_classes(df, ["nat", "b"], "seg").collect()}
    assert out[1]["n_classes"] == 1 and out[1]["n_individuals"] == 4
    assert out[2]["n_classes"] == 1 and out[2]["n_individuals"] == 2


def test_bloom_fp_audit_members_always_hit(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        bloom_fp_audit,
    )

    keys = spark.createDataFrame([(i,) for i in range(200)], "k long")
    # probing with the MEMBERS themselves: every probe must hit (FP
    # definition aside, the filter can never miss a member)
    r = bloom_fp_audit(keys, "k", keys, "k", m=4096, k=3).collect()[0]
    assert r["n_keys"] == 200 and r["n_probes"] == 200
    assert r["n_false_positives"] == 200  # all members "hit"
    assert r["n_bits_set"] <= 600
    # disjoint probes: rate should be near the prediction, both small
    probes = spark.createDataFrame([(-i,) for i in range(1, 2001)], "p long")
    r2 = bloom_fp_audit(keys, "k", probes, "p", m=4096, k=3).collect()[0]
    assert r2["fp_rate"] < 0.05
    assert abs(r2["fp_rate"] - r2["predicted_fp_rate"]) < 0.02


# --- batch 12: anisotropy, backlog, median, trend, Wilson -------------------


def test_pair_cosine_histogram_collapsed_space(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        pair_cosine_histogram,
    )

    # all vectors identical -> every pair cosine exactly 1.0
    rows = [(i, [3.0, 4.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pair_cosine_histogram(df, offset=5).collect()
    assert len(out) == 1
    assert out[0]["cos_bucket"] == 1.0 and out[0]["n_pairs"] == 5

    # orthogonal alternating -> bucket 0
    rows2 = [(i, [1.0, 0.0] if i < 5 else [0.0, 1.0]) for i in range(10)]
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>")
    out2 = pair_cosine_histogram(df2, offset=5).collect()
    assert len(out2) == 1 and out2[0]["cos_bucket"] == 0.0


def test_daily_backlog_planted(spark):
    import datetime as dt

    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        daily_order_backlog,
    )

    d = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    orders = spark.createDataFrame(
        [(1, d("2024-01-01")), (2, d("2024-01-01")), (3, d("2024-01-02"))],
        "o_orderkey long, o_orderdate timestamp",
    )
    # order 1 ships fully on the 2nd (last item), order 2 on the 1st
    li = spark.createDataFrame(
        [(1, d("2024-01-01")), (1, d("2024-01-02")), (2, d("2024-01-01"))],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = {r["day"]: r for r in daily_order_backlog(orders, li).collect()}
    assert out["2024-01-01"]["n_opened"] == 2
    assert out["2024-01-01"]["n_closed"] == 1
    assert out["2024-01-01"]["backlog"] == 1
    assert out["2024-01-02"]["backlog"] == 1  # +1 opened, +1 closed


def test_exact_group_median_odd_even(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        exact_group_median,
    )

    rows = (
        [("g1", k, float(v)) for k, v in [("a", 10), ("b", 20), ("c", 90)]]
        + [("g2", k, float(v)) for k, v in [("a", 10), ("b", 20), ("c", 30), ("d", 100)]]
    )
    df = spark.createDataFrame(rows, "g string, k string, v double")
    out = {r["g"]: r for r in
           exact_group_median(df, "g", "k", F.col("v")).collect()}
    assert out["g1"]["n_keys"] == 3 and out["g1"]["median_total"] == 20.0
    assert out["g2"]["n_keys"] == 4 and out["g2"]["median_total"] == 25.0


def test_supplier_delay_trend_planted(spark):
    import datetime as dt

    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        supplier_delay_trend,
    )

    d0 = dt.datetime(2024, 1, 1)
    orders, li, ok = [], [], 0
    # supplier 1: delay grows 1 day per order-day; supplier 2: constant
    for day in range(10):
        ok += 1
        orders.append((ok, d0 + dt.timedelta(days=day)))
        li.append((ok, 1, d0 + dt.timedelta(days=day + day)))   # delay=day
        ok += 1
        orders.append((ok, d0 + dt.timedelta(days=day)))
        li.append((ok, 2, d0 + dt.timedelta(days=day + 3)))     # delay=3
    odf = spark.createDataFrame(orders, "o_orderkey long, o_orderdate timestamp")
    ldf = spark.createDataFrame(li, "l_orderkey long, l_suppkey long, l_shipdate timestamp")
    out = supplier_delay_trend(odf, ldf, top_k=2).collect()
    assert out[0]["l_suppkey"] == 1
    assert out[0]["delay_trend_days_per_year"] == 365.0  # slope 1/day
    assert out[1]["l_suppkey"] == 2
    assert out[1]["delay_trend_days_per_year"] == 0.0


def test_brand_return_wilson_small_n_demoted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        brand_return_wilson,
    )

    # brand A: 2/2 returns (rate 1.0); brand B: 90/100 returns
    li = spark.createDataFrame(
        [(1, "R")] * 2 + [(2, "R")] * 90 + [(2, "N")] * 10,
        "l_partkey long, l_returnflag string",
    )
    part = spark.createDataFrame(
        [(1, "A"), (2, "B")], "p_partkey long, p_brand string"
    )
    out = {r["p_brand"]: r for r in brand_return_wilson(li, part).collect()}
    assert out["A"]["return_rate"] == 1.0
    # Wilson lower bound demotes the n=2 brand below the n=100 brand
    assert out["A"]["wilson_lower_bound"] < out["B"]["wilson_lower_bound"]
    assert 0.8 < out["B"]["wilson_lower_bound"] < 0.9


# --- batch 13: boilerplate grams, Theil–Sen, t-closeness, Adamic–Adar,
# --- histogram Spearman ----------------------------------------------------


def test_boilerplate_grams_flags_shared_template(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        boilerplate_grams,
    )

    tpl = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [
            (1, tpl + " alpha beta gamma delta", "s1"),
            (2, tpl + " epsilon zeta eta theta", "s1"),
            (3, "iota kappa lambda mu nu xi omicron pi", "s1"),
            (4, "one two three four five six seven", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = boilerplate_grams(docs, n=5, min_ratio=0.5, top_k=10).collect()
    # the 5-gram template appears in 2 of 3 s1 docs (ratio 2/3 >= 0.5);
    # s2 has no repeated grams
    assert all(r["source"] == "s1" for r in out)
    assert out and max(r["df_docs"] for r in out) == 2
    assert all(r["df_ratio"] == pytest.approx(2 / 3, abs=1e-6) for r in out)


def test_theil_sen_robust_to_outlier(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        theil_sen_trend,
    )

    # y = 2x except one wild outlier; OLS would be dragged, the
    # pairwise-slope median is not
    rows = [(x, 2.0 * x) for x in range(1, 12)] + [(12, 1000.0)]
    df = spark.createDataFrame(rows, "xi long, yi double")
    out = theil_sen_trend(df, "xi", "yi").collect()[0]
    assert out["n_points"] == 12
    assert out["n_pairs"] == 66
    assert out["median_slope"] == pytest.approx(2.0, abs=1e-6)
    assert 0.9 <= out["pct_positive"] <= 1.0


def test_t_closeness_uniform_class_is_zero(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        t_closeness_classes,
    )

    # class A mirrors the global bucket distribution exactly -> t = 0;
    # class B holds only bucket 0 -> maximal skew
    rows = (
        [("A", 0)] * 2 + [("A", 1)] * 2
        + [("B", 0)] * 4
    )
    df = spark.createDataFrame(rows, "grp string, b long")
    out = {r["grp"]: r for r in t_closeness_classes(df, ["grp"], "b").collect()}
    # global: bucket0 6/8, bucket1 2/8. Class A: 1/2, 1/2.
    # K=2 -> t = |cp*N - cq*nc| / (nc*N*(K-1)) summed over buckets
    # class A bucket0: |2*8 - 6*4| = 8; bucket1: 0 -> t = 8/(4*8*1) = 0.25
    assert out["A"]["t_closeness"] == pytest.approx(0.25, abs=1e-6)
    # class B bucket0: |4*8 - 6*4| = 8 -> t = 8/(4*8) = 0.25
    assert out["B"]["t_closeness"] == pytest.approx(0.25, abs=1e-6)
    # a class that mirrors the global distribution exactly
    rows2 = [("A", 0)] * 3 + [("A", 1)] + [("B", 0)] * 3 + [("B", 1)]
    df2 = spark.createDataFrame(rows2, "grp string, b long")
    out2 = {r["grp"]: r for r in t_closeness_classes(df2, ["grp"], "b").collect()}
    assert out2["A"]["t_closeness"] == 0.0
    assert out2["B"]["t_closeness"] == 0.0


def test_adamic_adar_scores_and_exclusions(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        adamic_adar_topk,
    )

    # path a-c-b plus c-d: (a,b), (a,d), (b,d) share the center c
    # (deg 3); a-c edge means (a,c) must NOT appear
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    out = {(r["u"], r["v"]): r for r in adamic_adar_topk(edges).collect()}
    w = 1.0 / math.log(3.0)
    assert set(out) == {("a", "b"), ("a", "d"), ("b", "d")}
    for r in out.values():
        assert r["n_common"] == 1
        assert r["aa_score"] == pytest.approx(w, abs=1e-6)


def test_adamic_adar_hub_cap_drops_center(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        adamic_adar_topk,
    )

    # hub h connects x1..x5 (deg 5 > cap 4) -> no wedges survive
    edges = spark.createDataFrame(
        [("h", f"x{i}") for i in range(5)], "src string, dst string"
    )
    out = adamic_adar_topk(edges, max_center_degree=4).collect()
    assert out == []


def test_spearman_monotone_and_inverse(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        spearman_by_group,
    )

    rows = [("up", x, x * 10) for x in range(1, 8)] + [
        ("down", x, -x) for x in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r["grp"]: r for r in spearman_by_group(df, "grp", "x", "y").collect()}
    assert out["up"]["rho"] == pytest.approx(1.0, abs=1e-6)
    assert out["down"]["rho"] == pytest.approx(-1.0, abs=1e-6)


def test_spearman_ties_average_rank(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        spearman_by_group,
    )

    # x = [1,1,2,2], y = [1,2,1,2] -> rho = 0 (independent with ties)
    rows = [("g", 1, 1), ("g", 1, 2), ("g", 2, 1), ("g", 2, 2)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = spearman_by_group(df, "grp", "x", "y").collect()[0]
    assert out["n"] == 4
    assert out["rho"] == pytest.approx(0.0, abs=1e-6)


# --- batch 14: MRR, posting lists, Mann–Kendall, Kendall tau, hubness ------


def test_mrr_first_relevant_rank(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        mrr_eval,
    )

    # doc 1: "spark" x3 (relevant, highest tf -> rank 1);
    # doc 2: "spark" x1 (matched, not relevant under rel_tf=2)
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark alpha"),
            (2, "spark beta gamma delta"),
            (3, "unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in mrr_eval(docs, ["spark"], k=10).collect()}
    r = out["spark"]
    assert r["n_matched"] == 2
    assert r["n_relevant"] == 1
    assert r["first_rel_rank"] == 1
    assert r["rr"] == 1.0
    assert r["precision_at_k"] == pytest.approx(0.1, abs=1e-6)


def test_mrr_no_relevant_is_zero(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        mrr_eval,
    )

    docs = spark.createDataFrame(
        [(1, "spark alpha"), (2, "spark beta")], "doc_id long, text string"
    )
    r = mrr_eval(docs, ["spark"], k=5, rel_tf=2).collect()[0]
    assert r["n_relevant"] == 0
    assert r["first_rel_rank"] == 0
    assert r["rr"] == 0.0


def test_posting_list_histogram_buckets(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        posting_list_stats,
    )

    # "a" in 4 docs (bucket log2(4)=2), "b" in 2 (bucket 1),
    # "c" in 1 (bucket 0)
    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b"),
            (3, "a"),
            (4, "a"),
        ],
        "doc_id long, text string",
    )
    out = {r["log2_df_bucket"]: r for r in posting_list_stats(docs).collect()}
    assert out[2]["n_terms"] == 1 and out[2]["n_postings"] == 4
    assert out[1]["n_terms"] == 1 and out[1]["n_postings"] == 2
    assert out[0]["n_terms"] == 1 and out[0]["n_postings"] == 1
    assert out[2]["postings_share"] == pytest.approx(4 / 7, abs=1e-6)


def test_mann_kendall_monotone_series(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        mann_kendall_trend,
    )

    # strictly increasing: S = C(10,2) = 45, no ties
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "xi long, yi double"
    )
    r = mann_kendall_trend(df, "xi", "yi").collect()[0]
    assert r["n_points"] == 10
    assert r["s_stat"] == 45
    # var = 10*9*25/18 = 125; z = 44/sqrt(125)
    assert r["var_s"] == pytest.approx(125.0, abs=1e-6)
    assert r["z_score"] == pytest.approx(44 / math.sqrt(125.0), abs=1e-6)


def test_mann_kendall_constant_series_zero(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        mann_kendall_trend,
    )

    df = spark.createDataFrame(
        [(i, 5.0) for i in range(6)], "xi long, yi double"
    )
    r = mann_kendall_trend(df, "xi", "yi").collect()[0]
    assert r["s_stat"] == 0
    assert r["z_score"] == 0.0
    # all 6 tied: var = (6*5*17 - 6*5*17)/18 = 0
    assert r["var_s"] == 0.0


def test_kendall_tau_perfect_and_inverse(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        kendall_tau_by_group,
    )

    rows = [("up", x, x * 2) for x in range(1, 6)] + [
        ("down", x, -x) for x in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {
        r["grp"]: r for r in kendall_tau_by_group(df, "grp", "x", "y").collect()
    }
    assert out["up"]["tau_b"] == pytest.approx(1.0, abs=1e-6)
    assert out["up"]["n_concordant"] == 10
    assert out["up"]["n_discordant"] == 0
    assert out["down"]["tau_b"] == pytest.approx(-1.0, abs=1e-6)


def test_kendall_tau_ties_against_known_value(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        kendall_tau_by_group,
    )

    # x = [1,1,2,3], y = [1,2,2,3]:
    # pairs with x1<x2: (1,.)->(2,2): y 1<2 C, y 2=2 tie; (1,.)->(3,3):
    # 1<3 C, 2<3 C; (2,2)->(3,3): 2<3 C  => P=4, Q=0
    # n=4, n0=6, tx=C(2,2)=1, ty=1 -> tau = 4/sqrt(5*5) = 0.8
    rows = [("g", 1, 1), ("g", 1, 2), ("g", 2, 2), ("g", 3, 3)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r = kendall_tau_by_group(df, "grp", "x", "y").collect()[0]
    assert r["n_concordant"] == 4
    assert r["n_discordant"] == 0
    assert r["tau_b"] == pytest.approx(0.8, abs=1e-6)


def test_hubness_histogram_star_geometry(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        hubness_audit,
    )

    # hub vector [1,0]; three satellites close to it; one orthogonal
    # antihub [0,1]-ish vectors chosen so the hub is everyone's 1-NN
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.9, -0.1]),
        (3, [0.95, 0.05]),
        (4, [-1.0, 0.001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["n_appearances"]: r["n_vectors"]
        for r in hubness_audit(df, k=1).collect()
    }
    # with k=1 there are 5 list slots; the antihub appears in none
    assert out.get(0, 0) >= 1
    assert sum(k * v for k, v in out.items()) == 5
    assert sum(out.values()) == 5


# --- batch 15: burstiness, Heaps fit, correlation matrix, Cramér's V,
# --- functional SCC --------------------------------------------------------


def test_burstiness_content_term_beats_uniform(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        term_burstiness_topk,
    )

    # "topic" hits 2 docs 5x each (bursty); "the" hits 5 docs once each
    docs = spark.createDataFrame(
        [
            (1, "topic topic topic topic topic the"),
            (2, "topic topic topic topic topic the"),
            (3, "the filler words"),
            (4, "the filler words"),
            (5, "the filler words"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["term"]: r
        for r in term_burstiness_topk(docs, min_df=2, top_k=10).collect()
    }
    assert out["topic"]["burstiness"] == 5.0
    assert out["the"]["burstiness"] == 1.0
    assert out["topic"]["fano_factor"] == 0.0  # constant tf -> zero variance
    assert out["topic"]["df"] == 2 and out["topic"]["total_tf"] == 10


def test_heaps_fit_recovers_power_law(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        heaps_law_fit,
    )

    # every doc introduces exactly one new term and repeats an old one:
    # V grows linearly with docs, N = 2 tokens/doc -> beta ~ 1
    rows = [(i, f"t{i} t0") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_law_fit(docs, n_buckets=10).collect()[0]
    assert r["n_buckets_used"] == 10
    assert 0.9 <= r["beta"] <= 1.1
    assert r["r2"] > 0.99


def test_correlation_matrix_known_pairs(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        correlation_matrix,
    )

    # y = 2x (corr 1), z = -x (corr -1 with x), w independent-ish
    rows = [(float(i), 2.0 * i, float(-i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"], scale=2).collect()
    }
    assert out[("x", "y")] == pytest.approx(1.0, abs=1e-6)
    assert out[("x", "z")] == pytest.approx(-1.0, abs=1e-6)
    assert out[("y", "z")] == pytest.approx(-1.0, abs=1e-6)


def test_cramers_v_perfect_association(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        cramers_v,
    )

    # perfectly associated 2x2 -> V = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = cramers_v(df, "r", "c").collect()[0]
    assert out["cramers_v"] == pytest.approx(1.0, abs=1e-6)
    # independent 2x2 -> V = 0
    rows2 = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 5
    out2 = cramers_v(
        spark.createDataFrame(rows2, "r string, c string"), "r", "c"
    ).collect()[0]
    assert out2["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_functional_scc_cycle_and_tail(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        functional_scc,
    )

    # a -> b -> c -> a (3-cycle); d -> a (tail, own SCC, not in cycle);
    # e -> e (self-loop: own SCC, in cycle)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("e", "e")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in functional_scc(edges).collect()}
    assert out["a"]["scc_id"] == out["b"]["scc_id"] == out["c"]["scc_id"] == "a"
    assert out["a"]["scc_size"] == 3 and out["a"]["in_cycle"]
    assert out["d"]["scc_size"] == 1 and not out["d"]["in_cycle"]
    assert out["e"]["scc_size"] == 1 and out["e"]["in_cycle"]


def test_functional_scc_long_path_closure(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        functional_scc,
    )

    # a 12-node directed cycle needs paths up to length 11 — closed by
    # 5 doublings (2^5 = 32 >= 11)
    n = 12
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{(i + 1) % n:02d}") for i in range(n)],
        "src string, dst string",
    )
    out = functional_scc(edges).collect()
    assert all(r["scc_size"] == n and r["in_cycle"] for r in out)


# --- batch 16: position attribution, Levene, Holt, weekday index, funnel ---


def test_position_attribution_u_shape(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        position_attribution,
    )

    # user 1: view -> click -> signup -> purchase
    #   first=view (.4), last=signup (.4), middle=click (.2)
    # user 2: view -> purchase (single touch -> view gets 1.0)
    # user 3: purchase with no touches -> (none)
    rows = [
        (1, "view", 1, 1),
        (1, "click", 2, 2),
        (1, "signup", 3, 3),
        (1, "purchase", 4, 4),
        (2, "view", 1, 5),
        (2, "purchase", 2, 6),
        (3, "purchase", 1, 7),
    ]
    ev = spark.createDataFrame(
        [
            (u, t, f"2024-01-01 00:0{s}:00", i)
            for u, t, s, i in rows
        ],
        "user_id long, event_type string, ts string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["channel"]: r["credit"] for r in position_attribution(ev).collect()}
    assert out["view"] == pytest.approx(1.4, abs=1e-6)
    assert out["click"] == pytest.approx(0.2, abs=1e-6)
    assert out["signup"] == pytest.approx(0.4, abs=1e-6)
    assert out["(none)"] == pytest.approx(1.0, abs=1e-6)
    # total credit = one per converting-with-touch conversion + none bucket
    assert sum(out.values()) == pytest.approx(3.0, abs=1e-5)


def test_levene_equal_vs_unequal_variance(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        levene_brown_forsythe,
    )

    # group a: tight around 100; group b: wide spread
    rows = [("a", v) for v in [99, 100, 100, 101] * 5] + [
        ("b", v) for v in [50, 100, 100, 150] * 5
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    r = levene_brown_forsythe(df, "g", "v").collect()[0]
    assert r["n_groups"] == 2
    assert r["n_total"] == 40
    assert r["w_stat"] > 10  # clearly unequal variances
    # identical groups -> W = 0
    rows2 = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [1, 2, 3, 4]]
    r2 = levene_brown_forsythe(
        spark.createDataFrame(rows2, "g string, v long"), "g", "v"
    ).collect()[0]
    assert r2["w_stat"] == pytest.approx(0.0, abs=1e-6)


def test_holt_tracks_linear_series(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        holt_linear_backtest,
    )

    # exactly linear y = 3 + 2x: Holt locks on, MAE = 0, forecast exact
    df = spark.createDataFrame(
        [(x, 3.0 + 2.0 * x) for x in range(20)], "xi long, yi double"
    )
    r = holt_linear_backtest(df, "xi", "yi").collect()[0]
    assert r["n_points"] == 20
    assert r["mae"] == pytest.approx(0.0, abs=1e-6)
    assert r["forecast_next"] == pytest.approx(3.0 + 2.0 * 20, abs=1e-4)


def test_weekday_index_uniform_is_one(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        weekday_index,
    )

    # 2024-01-01 is a Monday; 14 consecutive days = 2 of each weekday
    import datetime

    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), 100.0)
        for i in range(14)
    ]
    df = spark.createDataFrame(rows, "o_orderdate date, o_totalprice double")
    out = weekday_index(df).collect()
    assert len(out) == 7
    for r in out:
        assert r["n_orders"] == 2
        assert r["order_index"] == pytest.approx(1.0, abs=1e-6)
        assert r["revenue_index"] == pytest.approx(1.0, abs=1e-6)


def test_corpus_filter_funnel_monotone(spark, sf_dir):
    from neo4j_database_to_data_importer_package_spark import registry

    out = registry.QUERIES["corpus_filter_funnel"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert (
            r["n_raw"]
            >= r["n_after_dedup"]
            >= r["n_after_lang"]
            >= r["n_after_quality"]
            >= 0
        )
        assert r["tokens_raw"] >= r["tokens_kept"]
        assert 0.0 <= r["keep_rate"] <= 1.0


# --- batch 17: bot screen, disorder audit, cohort LTV, reciprocity, aHash --


def test_bot_score_flags_metronome_user(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        bot_score_histogram,
    )

    # bot: 12 events exactly every 10s, one type, night hours
    # human: 12 events at irregular gaps, mixed types, daytime
    bot = [
        (1, "click", f"2024-01-01 02:00:{10 * i // 60:01d}{10 * i % 60:02d}"[:19], i)
        for i in range(12)
    ]
    bot = [
        (1, "click", f"2024-01-01 02:{(10 * i) // 60:02d}:{(10 * i) % 60:02d}", i)
        for i in range(12)
    ]
    import random

    gaps = [5, 90, 33, 800, 12, 420, 66, 240, 7, 1300, 55]
    t = 0
    human = []
    types = ["view", "click", "purchase", "signup"]
    for i, g in enumerate([0] + gaps):
        t += g
        human.append(
            (2, types[i % 4], f"2024-01-01 12:{t // 60:02d}:{t % 60:02d}", 100 + i)
        )
    ev = spark.createDataFrame(
        bot + human, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["bot_score"]: r["n_users"] for r in bot_score_histogram(ev).collect()}
    # the metronome user scores >= 3 (cv=0, rate 6/min, entropy 0, night)
    assert any(k >= 3 and v >= 1 for k, v in out.items())
    assert sum(out.values()) == 2


def test_out_of_order_buckets(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        out_of_order_audit,
    )

    # arrival order (event_id) vs event time: third event is 2 min late
    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (1, "2024-01-01 10:05:00", 2),
        (1, "2024-01-01 10:03:00", 3),  # 120 s behind the watermark
        (1, "2024-01-01 10:06:00", 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["lateness_bucket"]: r["n_events"] for r in out_of_order_audit(ev).collect()}
    assert out["0_on_time"] == 3
    assert out["2_under_5m"] == 1


def test_cohort_ltv_cumulative(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        cohort_ltv_curve,
    )

    import datetime

    rows = [
        (1, datetime.date(2024, 1, 5), 100.0),
        (1, datetime.date(2024, 2, 10), 50.0),
        (2, datetime.date(2024, 1, 20), 200.0),
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = {
        (r["cohort_month"], r["age_months"]): r
        for r in cohort_ltv_curve(orders).collect()
    }
    jan = 2024 * 12 + 1
    assert out[(jan, 0)]["cohort_size"] == 2
    assert out[(jan, 0)]["revenue"] == 300.0
    assert out[(jan, 0)]["cum_ltv_per_customer"] == 150.0
    assert out[(jan, 1)]["cum_ltv_per_customer"] == 175.0


def test_reciprocity_symmetric_vs_oneway(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        weighted_reciprocity,
    )

    sym = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 5)], "src string, dst string, n long"
    )
    r = weighted_reciprocity(sym).collect()[0]
    assert r["reciprocity"] == 1.0
    oneway = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 3)], "src string, dst string, n long"
    )
    r2 = weighted_reciprocity(oneway).collect()[0]
    assert r2["reciprocity"] == 0.0
    # asymmetric: 5 forward, 2 back -> 2*min/total = (2+2)/7
    asym = spark.createDataFrame(
        [("a", "b", 5), ("b", "a", 2)], "src string, dst string, n long"
    )
    r3 = weighted_reciprocity(asym).collect()[0]
    assert r3["reciprocity"] == pytest.approx(4 / 7, abs=1e-6)


def test_ahash_near_dup_identical_payloads(spark):
    from neo4j_database_to_data_importer_package_spark.operators.multimodal import (
        ahash_near_dup,
        extract_features,
    )

    # two identical payloads (hamming 0) and one very different
    rows = [
        (1, bytes([10, 200] * 24)),
        (2, bytes([10, 200] * 24)),
        (3, bytes(range(48))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = extract_features(media, fake=True)
    out = {(r["id_a"], r["id_b"]): r for r in ahash_near_dup(feats).collect()}
    assert (1, 2) in out
    assert out[(1, 2)]["hamming"] == 0


# --- batch 18: tier migration, lang margin, dwell, latency, ABC ------------


def test_tier_migration_matrix(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        value_tier_migration,
    )

    import datetime

    # 4 customers in both years; customer 1 jumps from bottom to top
    rows = []
    for cust, (va, vb) in enumerate(
        [(10.0, 900.0), (200.0, 200.0), (500.0, 60.0), (900.0, 800.0)], 1
    ):
        rows.append((cust, datetime.date(1995, 3, 1), va))
        rows.append((cust, datetime.date(1996, 3, 1), vb))
    rows.append((9, datetime.date(1996, 5, 1), 50.0))  # new in year B
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = {
        (r["tier_from"], r["tier_to"]): r["n_customers"]
        for r in value_tier_migration(orders).collect()
    }
    assert out[("T1_low", "T4_top")] == 1
    assert out[("(absent)", "T1_low")] == 1
    assert sum(out.values()) == 5


def test_language_margin_zero_on_tie(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        language_id_margin,
    )

    # pure English stopwords -> positive margin; gibberish -> und margin 0
    docs = spark.createDataFrame(
        [(1, "the of and to in is it the of"), (2, "zzz qqq xxx yyy")],
        "doc_id long, text string",
    )
    out = {r["detected_lang"]: r for r in language_id_margin(docs).collect()}
    assert out["en"]["margin"] > 0
    assert out["und"]["margin"] == 0


def test_dwell_by_transition_gaps(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        dwell_by_transition,
    )

    rows = [
        (1, "view", "2024-01-01 10:00:00", 1),
        (1, "click", "2024-01-01 10:00:30", 2),
        (1, "view", "2024-01-01 10:01:30", 3),
        (1, "click", "2024-01-01 10:02:40", 4),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {
        (r["from_type"], r["to_type"]): r
        for r in dwell_by_transition(ev).collect()
    }
    # view->click gaps: 30 s and 70 s
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "click")]["avg_dwell_s"] == 50.0
    assert out[("view", "click")]["max_dwell_s"] == 70
    assert out[("click", "view")]["n_transitions"] == 1


def test_conversion_latency_first_pair(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        conversion_latency,
    )

    rows = [
        (1, "view", "2024-01-01 10:00:00", 1),
        (1, "purchase", "2024-01-01 10:10:00", 2),   # 600 s
        (1, "purchase", "2024-01-01 11:00:00", 3),   # later, ignored
        (2, "view", "2024-01-01 09:00:00", 4),        # never converts
        (3, "purchase", "2024-01-01 08:00:00", 5),    # converts pre-view
        (3, "view", "2024-01-01 09:00:00", 6),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    r = conversion_latency(ev).collect()[0]
    assert r["n_users_exposed"] == 3
    assert r["n_converted"] == 1
    assert r["conversion_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["avg_latency_s"] == 600.0


def test_abc_classes_pareto(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        revenue_abc_classes,
    )

    # one whale part (80% of revenue) and many minnows
    rows = [(1, 8000.0, 0.0)] + [(k, 25.0, 0.0) for k in range(2, 82)]
    li = spark.createDataFrame(
        rows, "l_partkey long, l_extendedprice double, l_discount double"
    )
    out = {r["abc_class"]: r for r in revenue_abc_classes(li).collect()}
    assert out["A"]["n_keys"] == 1
    assert out["A"]["revenue_share"] == pytest.approx(0.8, abs=1e-3)
    assert out["B"]["n_keys"] + out["C"]["n_keys"] == 80


# --- batch 19: quality sweep, centrality corr, rank agreement, YoY ---------


def test_quality_sweep_monotone_and_exact_buckets(spark):
    from neo4j_database_to_data_importer_package_spark.operators.mixing import (
        quality_threshold_sweep,
    )

    rows = [
        ("s1", 0.30, 100),  # exactly on the 0.3 boundary: kept at 0.3
        ("s1", 0.75, 200),
        ("s1", 0.10, 50),
    ]
    df = spark.createDataFrame(rows, "source string, q double, toks long")
    out = {
        r["threshold"]: r
        for r in quality_threshold_sweep(
            df, F.col("q"), F.col("toks")
        ).collect()
    }
    assert out[0.0]["n_docs_kept"] == 3
    # the 0.3-exact doc SURVIVES threshold 0.3 (integer path, no IEEE slip)
    assert out[0.3]["n_docs_kept"] == 2
    assert out[0.3]["n_tokens_kept"] == 300
    assert out[0.8]["n_docs_kept"] == 0
    # monotone decreasing
    ks = sorted(out)
    kept = [out[k]["n_docs_kept"] for k in ks]
    assert kept == sorted(kept, reverse=True)


def test_centrality_length_correlation_sign(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        centrality_length_correlation,
    )

    # centroid ~ [1, 0]; long docs aligned with centroid, short ones
    # orthogonal -> strong positive correlation
    docs = spark.createDataFrame(
        [(1, 1000), (2, 1000), (3, 10), (4, 10)],
        "doc_id long, n_chars long",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.1]),
            (2, [1.0, -0.1]),
            (3, [0.1, 1.0]),
            (4, [0.1, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    r = centrality_length_correlation(docs, emb).collect()[0]
    assert r["n"] == 4
    assert r["corr"] > 0.9


def test_rank_agreement_identical_scorers(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        bm25_tfidf_rank_agreement,
    )

    # docs of EQUAL length: BM25 and TF-IDF are both monotone in tf,
    # so the orderings agree exactly -> rho = 1
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad1 pad2"),
            (2, "spark spark pad1 pad2 pad3"),
            (3, "spark pad1 pad2 pad3 pad4"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in bm25_tfidf_rank_agreement(docs, ["spark"]).collect()}
    assert out["spark"]["n_matched"] == 3
    assert out["spark"]["rho"] == pytest.approx(1.0, abs=1e-6)


def test_yoy_growth_join(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        quarterly_yoy_growth,
    )

    import datetime

    orders = spark.createDataFrame(
        [
            (1, datetime.date(1995, 2, 1), 100.0),
            (1, datetime.date(1996, 2, 1), 150.0),
            (1, datetime.date(1996, 8, 1), 70.0),
        ],
        "o_custkey long, o_orderdate date, o_totalprice double",
    )
    cust = spark.createDataFrame([(1, 7)], "c_custkey long, c_nationkey long")
    nat = spark.createDataFrame([(7, "GERMANY")], "n_nationkey long, n_name string")
    out = {
        (r["year"], r["quarter"]): r
        for r in quarterly_yoy_growth(orders, cust, nat).collect()
    }
    assert out[(1995, 1)]["yoy_growth"] is None
    assert out[(1996, 1)]["yoy_growth"] == pytest.approx(0.5, abs=1e-6)
    assert out[(1996, 3)]["yoy_growth"] is None  # no 1995-Q3 baseline


# --- batch 20: type mixing, reorder intervals, token lengths, share shift,
# --- session bounce --------------------------------------------------------


def test_type_mixing_bipartite_negative_r(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        type_mixing_matrix,
    )

    # perfectly bipartite A-B graph: no same-type edges -> r < 0
    edges = spark.createDataFrame(
        [("A1", "B1"), ("A1", "B2"), ("A2", "B1"), ("A2", "B2")],
        "src string, dst string",
    )
    out = type_mixing_matrix(edges).collect()
    r = out[0]["assortativity_r"]
    assert all(row["assortativity_r"] == r for row in out)
    assert r < 0
    cells = {(row["type_a"], row["type_b"]): row["n_ends"] for row in out}
    assert ("A", "A") not in cells
    assert cells[("A", "B")] == 4 and cells[("B", "A")] == 4


def test_type_mixing_homophilous_positive_r(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        type_mixing_matrix,
    )

    # two same-type cliques + one cross edge -> r near 1
    edges = spark.createDataFrame(
        [("A1", "A2"), ("A2", "A3"), ("B1", "B2"), ("B2", "B3"), ("A1", "B1")],
        "src string, dst string",
    )
    out = type_mixing_matrix(edges).collect()
    assert out[0]["assortativity_r"] > 0.5


def test_reorder_intervals_known_gaps(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        reorder_interval_profile,
    )

    import datetime

    d = datetime.date
    rows = [
        (1, d(2024, 1, 1)), (1, d(2024, 1, 8)), (1, d(2024, 1, 15)),  # 7, 7
        (2, d(2024, 1, 1)), (2, d(2024, 2, 1)),                       # 31
    ]
    orders = spark.createDataFrame(rows, "o_custkey long, o_orderdate date")
    out = reorder_interval_profile(orders).collect()
    r = out[0]
    assert r["n_intervals"] == 3
    assert r["mean_gap_d"] == pytest.approx((7 + 7 + 31) / 3, abs=0.01)
    assert r["median_gap_d"] == 7.0
    buckets = {row["log2_gap_bucket"]: row["n_intervals_bucket"] for row in out}
    assert buckets[3] == 2  # gap 7 -> log2(8) = 3
    assert buckets[5] == 1  # gap 31 -> log2(32) = 5


def test_token_length_histogram_shares(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        token_length_histogram,
    )

    docs = spark.createDataFrame(
        [(1, "a bb bb cccc")], "doc_id long, text string"
    )
    out = {r["tok_len"]: r for r in token_length_histogram(docs).collect()}
    assert out[1]["n_tokens"] == 1
    assert out[2]["n_tokens"] == 2
    assert out[2]["share"] == pytest.approx(0.5, abs=1e-6)
    assert out[4]["n_tokens"] == 1


def test_share_shift_top_mover(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        share_shift_leaderboard,
    )

    import datetime

    rows = [
        # 1995: supplier 1 has 90%, supplier 2 has 10%
        (1, datetime.date(1995, 5, 1), 900.0, 0.0),
        (2, datetime.date(1995, 5, 1), 100.0, 0.0),
        # 1996: flipped
        (1, datetime.date(1996, 5, 1), 100.0, 0.0),
        (2, datetime.date(1996, 5, 1), 900.0, 0.0),
    ]
    li = spark.createDataFrame(
        rows,
        "l_suppkey long, l_shipdate date, l_extendedprice double, "
        "l_discount double",
    )
    out = {r["l_suppkey"]: r for r in share_shift_leaderboard(li).collect()}
    assert out[1]["share_delta"] == pytest.approx(-0.8, abs=1e-6)
    assert out[2]["share_delta"] == pytest.approx(0.8, abs=1e-6)


def test_session_bounce_counts(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        session_bounce_stats,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),  # session 1: two events (no bounce)
        (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 14:00:00"),  # session 2: bounce
        (2, "2024-01-01 09:00:00"),  # session 3: bounce
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    r = session_bounce_stats(ev).collect()[0]
    assert r["n_sessions"] == 3
    assert r["n_bounces"] == 2
    assert r["bounce_rate"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["max_events_per_session"] == 2


# --- batch 21: CCNet buckets / DSIR / Katz / growth curve / MMR -------------


def test_perplexity_terciles_routing(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        perplexity_tercile_buckets,
    )

    # 6 docs, one language: docs of common words score higher logprob
    # (head) than docs of rare words (tail); ntile(3) puts 2 per bucket
    docs = [
        (1, "the the the the", "en"),
        (2, "the the the cat", "en"),
        (3, "the the cat cat", "en"),
        (4, "the cat dog dog", "en"),
        (5, "cat dog rare1 rare2", "en"),
        (6, "rare3 rare4 rare5 rare6", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = {r["bucket"]: r for r in perplexity_tercile_buckets(df).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    assert all(r["n_docs"] == 2 for r in rows.values())
    assert rows["head"]["min_logprob"] >= rows["middle"]["max_logprob"]
    assert rows["middle"]["min_logprob"] >= rows["tail"]["max_logprob"]


def test_dsir_weights_favor_target_like_docs(spark):
    from neo4j_database_to_data_importer_package_spark.operators.mixing import (
        dsir_importance_weights,
    )

    # target domain speaks "alpha beta"; raw pool doc 10 mimics it,
    # doc 11 does not — DSIR must rank 10 above 11
    docs = [(i, "alpha beta alpha beta", "tgt") for i in range(5)] + [
        (10, "alpha beta alpha beta", "raw"),
        (11, "gamma delta gamma delta", "raw"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_importance_weights(df, target_source="tgt").collect()
    }
    assert set(got) == {10, 11}  # target docs are never scored
    assert got[10] > got[11]


def test_katz_centrality_star_exact(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        katz_centrality,
    )

    # star: hub h with 4 leaves; alpha = 1/20, integer micro-units.
    # c0 = 1e6 each. c1(h) = 1e6 + 4e6//20 = 1.2e6; c1(leaf) = 1.05e6
    # c2(h) = 1e6 + 4*1.05e6//20 = 1_210_000
    # c2(leaf) = 1e6 + 1.2e6//20 = 1_060_000
    # c3(h) = 1e6 + 4*1_060_000//20 = 1_212_000
    # c3(leaf) = 1e6 + 1_210_000//20 = 1_060_500
    edges = [("h", f"l{i}") for i in range(4)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["katz_micro"] for r in katz_centrality(edf, rounds=3).collect()}
    assert got["h"] == 1_212_000
    assert all(got[f"l{i}"] == 1_060_500 for i in range(4))


def test_cumulative_distinct_customers_curve(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        cumulative_distinct_customers,
    )
    import datetime

    rows = [
        (1, 100, datetime.datetime(1995, 1, 5)),
        (2, 100, datetime.datetime(1995, 2, 5)),  # repeat customer
        (3, 200, datetime.datetime(1995, 2, 6)),  # new in Feb
        (4, 300, datetime.datetime(1995, 4, 1)),  # new in Apr (gap month)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    got = {r["month"]: r for r in cumulative_distinct_customers(df).collect()}
    assert got["1995-01"]["n_active"] == 1 and got["1995-01"]["cum_customers"] == 1
    assert got["1995-02"]["n_active"] == 2 and got["1995-02"]["n_new"] == 1
    assert got["1995-02"]["cum_customers"] == 2
    assert got["1995-04"]["cum_customers"] == 3  # repeat never double-counted


def test_mmr_penalizes_redundant_candidate(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        mmr_topk,
    )

    # query q=[1,0]; a and b nearly coincide at +26° (rel ≈ 0.9), c
    # mirrors them at −26° (rel ≈ 0.9 too, but nearly orthogonal-ish to
    # a: sim ≈ 0.62). Plain top-2 by relevance picks {a, b}; MMR must
    # pick a then c, because b is redundant with a (sim ≈ 1).
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.436]),
        (2, [0.9, 0.437]),
        (3, [0.9, -0.436]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = mmr_topk(df, query_id=0, pool=3, k=2, lam=0.5).collect()
    assert [r["vec_id"] for r in got] == [1, 3]
    assert got[0]["rank"] == 1 and got[1]["rank"] == 2


# --- batch 22: A/B lift / KN bigram / link-pred / Mahalanobis / packing -----


def test_ab_variant_lift_algebra(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        ab_variant_lift,
    )

    # 8 users, conversion = purchase with value >= 150; arms split by
    # md5 parity — recompute expected arms in-test from the same hash
    import hashlib

    rows = []
    conv_users = {1, 2, 3}
    for u in range(1, 9):
        rows.append((u, "purchase", 200.0 if u in conv_users else 10.0))
        rows.append((u, "view", 0.0))
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    got = {r["variant"]: r for r in ab_variant_lift(df).collect()}

    def variant(u):
        return "A" if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2 == 0 else "B"

    na = sum(1 for u in range(1, 9) if variant(u) == "A")
    ca = sum(1 for u in conv_users if variant(u) == "A")
    assert got["A"]["n_users"] == na and got["A"]["n_converted"] == ca
    assert got["B"]["n_users"] == 8 - na and got["B"]["n_converted"] == 3 - ca
    assert abs(got["A"]["lift"] - (ca / na - (3 - ca) / (8 - na))) < 1e-5
    assert got["A"]["lift"] == got["B"]["lift"]  # experiment-level columns repeat


def test_kneser_ney_discount_and_continuation(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        kneser_ney_bigram_score,
    )
    import math

    # train: "a b a b" (bigrams ab, ba, ab) and "c b" — heldout "a b"
    # c12(a,b)=2, c1(a)=2, n1f(a)=1; n1b(b)=2 (follows a and c), T=3
    # types, V=3 vocab. P(b|a) = (2-.75)/2 + .75*1/2 * (2+1)/(3+3+1)
    docs = [
        (1, "a b a b", "tr"),
        (2, "c b", "tr"),
        (3, "a b", "ho"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = kneser_ney_bigram_score(df, heldout_source="ho").collect()
    assert len(got) == 1 and got[0]["n_bigrams"] == 1
    p = (2 - 0.75) / 2 + 0.75 * 1 / 2 * ((2 + 1) / (3 + 3 + 1))
    expected_nll = -math.log2(p)
    assert abs(got[0]["avg_nll"] - expected_nll) < 1e-5


def test_link_prediction_separates_pos_from_neg(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        link_prediction_eval,
    )

    # dense-ish community graph: positives (held-out edges) should have
    # more common neighbors than random non-edges from two samples
    edges = [
        (f"n{i}", f"n{j}")
        for i in range(12)
        for j in range(i + 1, 12)
        if (i + j) % 3 != 0
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["cls"]: r for r in link_prediction_eval(edf, neg_sample=5).collect()}
    assert got["pos"]["n_pairs"] > 0
    assert got["pos"]["mean_cn"] > 0


def test_mahalanobis_flags_planted_outlier(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        diag_mahalanobis_outliers,
    )

    rows = [(i, 100.0 + (i % 5), 10 + (i % 3)) for i in range(40)]
    rows.append((99, 500.0, 90))  # extreme on both axes
    df = spark.createDataFrame(rows, "id long, bal double, cnt long")
    got = [r["id"] for r in diag_mahalanobis_outliers(df, "id", ["bal", "cnt"]).collect()]
    assert got == [99]


def test_token_budget_packing_boundaries(spark):
    from neo4j_database_to_data_importer_package_spark.operators.mixing import (
        token_budget_packing,
    )

    # each doc = 4 tokens; budget 8 → shards of exactly 2 docs in id order
    docs = [(i, "w x y z", "s1") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = sorted(
        token_budget_packing(df, budget=8).collect(), key=lambda r: r["shard"]
    )
    assert [r["shard"] for r in got] == [0, 1, 2]
    assert all(r["n_docs"] == 2 and r["sum_tokens"] == 8 for r in got)
    assert got[0]["first_doc"] == 0 and got[0]["last_doc"] == 1
    assert got[2]["first_doc"] == 4 and got[2]["last_doc"] == 5


# --- batch 23: entropy rate / dispersion / spectral / audio / recs eval -----


def test_entropy_rate_deterministic_text_zero_conditional(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        bigram_entropy_rate,
    )
    import math

    # "a b a b a b": every context fully determines the next token →
    # conditional entropy 0, redundancy 1. Unigram entropy = 1 bit.
    df = spark.createDataFrame(
        [(1, "a b a b a b", "en")], "doc_id long, text string, lang string"
    )
    row = bigram_entropy_rate(df).collect()[0]
    assert row["h_bigram_cond"] == 0.0
    assert abs(row["h_unigram"] - 1.0) < 1e-6
    assert row["redundancy"] == 1.0

    # uniform random-ish: "a b c d" once — every bigram unique, H2 = 0
    # too (each context seen once); two docs of shuffled pairs raise it
    df2 = spark.createDataFrame(
        [(1, "a b", "en"), (2, "a c", "en")], "doc_id long, text string, lang string"
    )
    row2 = bigram_entropy_rate(df2).collect()[0]
    # contexts: a→b, a→c each p=1/2 given a → H(W2|W1) = 1 bit
    assert abs(row2["h_bigram_cond"] - 1.0) < 1e-6


def test_dispersion_index_poisson_vs_bursty(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        dispersion_index,
    )
    import datetime

    rows = []
    # "steady": 5 events every day for 4 days → var 0, VMR 0
    for d in range(4):
        for i in range(5):
            rows.append(("steady", datetime.datetime(2024, 1, 1 + d, 10, i)))
    # "bursty": 17 events day 1, 1 event each other day
    for i in range(17):
        rows.append(("bursty", datetime.datetime(2024, 1, 1, 10, i)))
    for d in range(1, 4):
        rows.append(("bursty", datetime.datetime(2024, 1, 1 + d, 10, 0)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: r for r in dispersion_index(df).collect()}
    assert got["steady"]["var_daily"] == 0.0 and got["steady"]["vmr"] == 0.0
    assert got["bursty"]["vmr"] > 5  # mean 5, var ((17-5)^2+3*16)/3 = 64
    assert abs(got["bursty"]["var_daily"] - 64.0) < 1e-6


def test_spectral_radius_complete_graph(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        spectral_radius_estimate,
    )

    # K5: adjacency eigenvalue is exactly n-1 = 4; the all-ones vector
    # is the exact eigenvector, so 3 iterations give λ exactly
    edges = [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = spectral_radius_estimate(edf, rounds=3, top_k=3).collect()
    assert len(got) == 3
    assert all(r["lambda_est"] == 4.0 for r in got)
    assert all(abs(r["x_share"] - 0.2) < 1e-9 for r in got)


def test_audio_energy_windows_known_bytes(spark):
    from neo4j_database_to_data_importer_package_spark.operators.multimodal import (
        audio_energy_windows,
    )
    import math

    # payload: 256 bytes of 128 (silence, rms 0) + 4 bytes of 138
    # (rms sqrt(100) = 10 over the 4-sample tail window)
    payload = bytes([128] * 256 + [138] * 4)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    got = {r["w"]: r for r in audio_energy_windows(df).collect()}
    assert got[0]["n_samples"] == 256 and got[0]["rms"] == 0.0
    assert got[1]["n_samples"] == 4 and abs(got[1]["rms"] - 10.0) < 1e-9


def test_recs_coverage_diversity_bounds(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        recs_coverage_diversity,
    )
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        load_graph_view,
    )

    view = load_graph_view(spark, "/root/testdata/sf0.001")
    row = recs_coverage_diversity(view).collect()[0]
    assert 0.0 < row["coverage"] <= 1.0
    assert 0.0 < row["mean_brand_diversity"] <= 1.0
    assert 0 < row["mean_list_len"] <= 5
    assert row["n_recommended"] <= row["n_catalog"]


# --- batch 24: RAKE / Kaplan-Meier / PRF / two-way ANOVA / entropy trend ----


def test_rake_prefers_long_phrases(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        rake_keywords,
    )

    # "deep neural network" appears as a 3-word phrase; "cat" alone.
    docs = [
        (1, "the deep neural network of the cat", "en"),
        (2, "a deep neural network", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = rake_keywords(df, stopwords=["the", "a", "of"], k=5).collect()
    assert got[0]["phrase"] == "deep neural network"
    assert got[0]["n_occurrences"] == 2
    # each word: freq 2, deg 6 → score 3 each → phrase score 9
    assert abs(got[0]["rake_score"] - 9.0) < 1e-6


def test_kaplan_meier_known_curve(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        kaplan_meier_curve,
    )
    import datetime

    # 4 customers: lifetimes 0, 12, 24, 24 months; corpus end = 1998-01.
    # censor window 6mo: last orders at 1996-01 (t=0, event), 1997-01
    # (t=12, event), 1998-01 ×2 (t=24, censored).
    rows = []
    rows += [(1, datetime.datetime(1996, 1, 1))]
    rows += [(2, datetime.datetime(1996, 1, 1)), (2, datetime.datetime(1997, 1, 1))]
    rows += [(3, datetime.datetime(1996, 1, 1)), (3, datetime.datetime(1998, 1, 1))]
    rows += [(4, datetime.datetime(1996, 1, 1)), (4, datetime.datetime(1998, 1, 1))]
    df = spark.createDataFrame(
        [(c, c, d) for c, d in rows], "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    got = {r["t_months"]: r for r in kaplan_meier_curve(df).collect()}
    # t=0: n_risk 4, d 1 → S = 3/4; t=12: n_risk 3, d 1 → S = 1/2
    assert got[0]["n_at_risk"] == 4 and got[0]["n_events"] == 1
    assert abs(got[0]["survival"] - 0.75) < 1e-5
    assert abs(got[12]["survival"] - 0.5) < 1e-5
    # t=24 both censored: survival unchanged
    assert abs(got[24]["survival"] - 0.5) < 1e-5 and got[24]["n_events"] == 0


def test_prf_expansion_surfaces_cooccurring_terms(spark):
    from neo4j_database_to_data_importer_package_spark.operators.retrieval import (
        prf_expansion_terms,
    )

    # docs about "spark" also say "shuffle"; unrelated docs say "cow"
    docs = [(i, "spark shuffle cluster", "en") for i in range(5)] + [
        (i + 10, "cow barn hay", "en") for i in range(5)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = prf_expansion_terms(df, ["spark"], n_rel=5, k=3).collect()
    terms = [r["term"] for r in got]
    assert "shuffle" in terms and "cluster" in terms
    assert "spark" not in terms  # query terms excluded
    byt = {r["term"]: r for r in got}
    assert byt["shuffle"]["rsj_weight"] > (byt.get("cow").rsj_weight if "cow" in byt else -99)


def test_two_way_anova_planted_main_effect(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        two_way_anova,
    )

    # y depends only on factor A (+10 for a2); B and interaction are 0
    rows = []
    for rep in range(5):
        for b in ["x", "y"]:
            rows.append(("a1", b, 10 + rep))
            rows.append(("a2", b, 20 + rep))
    df = spark.createDataFrame(rows, "fa string, fb string, y long")
    got = {r["term"]: r for r in two_way_anova(df, "fa", "fb", "y").collect()}
    assert got["a"]["df"] == 1 and got["b"]["df"] == 1
    assert got["a"]["ss"] == 500.0  # n_a*(5)^2 * 2 groups = 10*25*2
    assert got["b"]["ss"] == 0.0 and got["interaction"]["ss"] == 0.0
    assert got["a"]["f"] > 100
    assert got["residual"]["df"] == 20 - 4


def test_daily_entropy_trend_detects_concentration(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        daily_entropy_trend,
    )
    import datetime

    # day 1: 50/50 two types (H=1); day 2: 75/25 (H≈0.811); day 3: all
    # one type (H=0) — strictly falling entropy, slope ≈ -0.5/day
    rows = []
    for i in range(2):
        rows.append(("a", datetime.datetime(2024, 1, 1, 10, i)))
        rows.append(("b", datetime.datetime(2024, 1, 1, 11, i)))
    rows += [("a", datetime.datetime(2024, 1, 2, 10, i)) for i in range(3)]
    rows.append(("b", datetime.datetime(2024, 1, 2, 11, 0)))
    rows += [("a", datetime.datetime(2024, 1, 3, 10, i)) for i in range(4)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    row = daily_entropy_trend(df).collect()[0]
    assert row["n_days"] == 3
    assert row["slope_per_day"] < -0.4
    assert abs(row["mean_entropy"] - (1.0 + 0.811278 + 0.0) / 3) < 1e-3


# --- batch 25: streaming dispersion / diameter / margin / CUPED -------------


def test_effective_diameter_path_graph(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        effective_diameter_sampled,
    )

    # path a-b-c-d-e, seed {a}: dists 1,2,3,4 → 90% cut at dist 4
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["dist"]: r for r in effective_diameter_sampled(edf, seeds, max_hops=6).collect()}
    assert got[1]["n_pairs"] == 1 and got[4]["cum_share"] == 1.0
    assert all(r["eff_diameter"] == 4 for r in got.values())
    # 50% cut: 2 of 4 pairs at dist <= 2
    got50 = effective_diameter_sampled(edf, seeds, max_hops=6, q_tenths=5).collect()
    assert all(r["eff_diameter"] == 2 for r in got50)


def test_quality_margin_sample_orders_by_closeness(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        quality_margin_sample,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again", "en"),
        (2, "a a a a a a a a", "en"),
        (3, "completely different words entirely here now then", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = quality_margin_sample(df, k=3).collect()
    margins = [r["margin"] for r in got]
    assert margins == sorted(margins)
    assert all(abs(abs(r["quality"] - 0.5) - r["margin"]) < 1e-9 for r in got)


def test_cuped_reduces_known_covariate_variance(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        cuped_adjusted_lift,
    )
    import datetime

    # users with heterogeneous budgets: post spend = pre spend exactly
    # (perfect covariate, rho2 → 1); budgets vary wildly by user
    rows = []
    for u in range(1, 21):
        budget = 10.0 * u
        rows.append((u, "purchase", budget, datetime.datetime(2024, 1, 5)))
        rows.append((u, "purchase", budget, datetime.datetime(2024, 1, 20)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double, ts timestamp")
    got = cuped_adjusted_lift(df).collect()
    assert len(got) == 2
    r = got[0]
    assert abs(r["theta"] - 1.0) < 1e-6 and abs(r["rho2"] - 1.0) < 1e-6
    # Y' = Y - (X - mean X) → identical for every user → adjusted lift 0
    assert abs(r["lift_cuped"]) < 1e-6
    assert all(x["mean_adjusted"] == got[0]["mean_adjusted"] for x in got)


def test_streaming_dispersion_matches_batch(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        dispersion_index,
    )
    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        streaming_dispersion_monitor,
    )
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        run_stream_to_memory,
    )
    import datetime, tempfile

    rows = []
    for d in range(4):
        for i in range(3 + 2 * d):  # growing daily counts → dispersion
            rows.append(("x", datetime.datetime(2024, 2, 1 + d, 9, i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    tmp = tempfile.mkdtemp(prefix="disp_stream_")
    df.repartition(3).write.mode("overwrite").parquet(tmp)
    stream = (
        spark.readStream.schema(spark.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    got = run_stream_to_memory(
        streaming_dispersion_monitor(stream), "t_disp_stream", output_mode="update",
        state_partitions=4,
    )
    final = (
        got.orderBy(got["n_obs"].desc()).limit(1).collect()[0]
    )
    batch = dispersion_index(df).collect()[0]
    assert final["n_days"] == batch["n_days"] == 4
    assert final["vmr"] == batch["vmr"]
    assert final["chi2"] == batch["chi2"]


# --- batch 26: Markov stationary / IVM / OOD histogram / node2vec -----------


def test_markov_stationary_two_state_chain(spark):
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        markov_stationary_distribution,
    )
    import datetime

    # chain a→b→a→b... for one user: P(b|a)=1, P(a|b)=1; after an even
    # number of iterations from uniform, pi stays (0.5, 0.5)
    rows = []
    for i in range(10):
        rows.append((i, 1, "a" if i % 2 == 0 else "b", datetime.datetime(2024, 3, 1, 9, i)))
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts timestamp")
    got = {r["event_type"]: r for r in markov_stationary_distribution(df, iterations=8).collect()}
    assert abs(got["a"]["stationary_prob"] - 0.5) < 1e-6
    assert abs(got["b"]["stationary_prob"] - 0.5) < 1e-6
    assert got["a"]["n_out"] == 5 and got["b"]["n_out"] == 4


def test_incremental_rollup_always_consistent(spark):
    from neo4j_database_to_data_importer_package_spark.operators.profiling import (
        incremental_rollup_check,
    )

    docs = [(i, f"s{i % 3}", 100 + i) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, source string, n_chars long")
    got = incremental_rollup_check(df, split_id=15).collect()
    assert len(got) == 3
    assert all(r["consistent"] == 1 for r in got)
    assert sum(r["n_docs_full"] for r in got) == 30


def test_ood_histogram_far_point_lands_high(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        ood_centroid_distance_histogram,
    )

    # 2 centroids (ids 0, 1) at e1/e2; id 2 on a centroid (d2=0, bin 0);
    # id 3 far away (d2 >> 2.0 → clamped to top bin)
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),
        (3, [10.0, 10.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["bin"]: r for r in ood_centroid_distance_histogram(df, n_cells=2).collect()}
    assert got[0]["n_vectors"] >= 1  # the on-centroid point
    assert 19 in got  # the far point clamps into the top bin
    assert got[19]["mean_min_d2"] > 2.0


def test_node2vec_classes_on_triangle_plus_pendant(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        node2vec_transition_weights,
    )

    # triangle a-b-c plus pendant c-d. For the pair (prev=a, cur=b):
    # neighbors of b = {a: return, c: common}; masses 1/3 and 2/3
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = node2vec_transition_weights(edf, n_pairs=100).collect()
    ab = {r["nbr_class"]: r for r in got if r["prev"] == "a" and r["cur"] == "b"}
    assert set(ab) == {"return", "common"}
    assert abs(ab["return"]["prob_mass"] - 1 / 3) < 1e-6
    assert abs(ab["common"]["prob_mass"] - 2 / 3) < 1e-6
    # pair (prev=a, cur=c): nbrs {a: return, b: common, d: far} → 1:2:4
    ac = {r["nbr_class"]: r for r in got if r["prev"] == "a" and r["cur"] == "c"}
    assert abs(ac["far"]["prob_mass"] - 4 / 7) < 1e-6


# --- batch 27: cluster reps / chargram lang-ID / funnel z / dual sourcing ---


def test_cluster_representatives_picks_best_quality(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        cluster_representatives,
    )

    docs = spark.createDataFrame(
        [(1, 100), (2, 80), (3, 50)], "doc_id long, n_chars long"
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, component long"
    )
    quality = spark.createDataFrame(
        [(1, 0.4), (2, 0.9), (3, 0.9)], "doc_id long, quality double"
    )
    got = cluster_representatives(docs, comp, quality).collect()
    assert len(got) == 1
    r = got[0]
    assert r["rep_doc"] == 2  # max quality, tie broken on smaller id
    assert r["n_docs"] == 3 and r["chars_total"] == 230
    assert r["chars_dropped"] == 150  # 230 - rep's 80


def test_chargram_lang_id_separates_scripts(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        chargram_lang_id_confusion,
    )

    # two "languages" with disjoint character inventories
    docs = [
        (1, "aaab aabb abab aabb", "xx"),
        (2, "abab aaab bbba baba", "xx"),
        (3, "zzzy zzyy zyzy yzzz", "yy"),
        (4, "yzyz zzzy yyyz zyyy", "yy"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {(r["tagged"], r["predicted"]): r["n_docs"]
           for r in chargram_lang_id_confusion(df).collect()}
    assert got[("xx", "xx")] == 2 and got[("yy", "yy")] == 2
    assert ("xx", "yy") not in got and ("yy", "xx") not in got


def test_funnel_ab_z_null_when_degenerate(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        funnel_step_ab_significance,
    )

    # every user completes 'view' (pool=1 → z NULL); purchase split
    rows = []
    for u in range(1, 9):
        rows.append((u, "view", 100.0))
        if u <= 3:
            rows.append((u, "purchase", 200.0))
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    got = {r["step"]: r for r in funnel_step_ab_significance(df).collect()}
    assert got["view"]["z_score"] is None
    assert got["view"]["rate_a"] == 1.0 and got["view"]["rate_b"] == 1.0
    assert got["signup"]["n_completed_a"] == 0  # nobody signs up
    assert got["purchase"]["n_completed_a"] + got["purchase"]["n_completed_b"] == 3


def test_dual_sourcing_overlap_jaccard(spark):
    from neo4j_database_to_data_importer_package_spark.operators.analytics import (
        dual_sourcing_overlap,
    )
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        load_graph_view,
    )

    view = load_graph_view(spark, "/root/testdata/sf0.001")
    got = dual_sourcing_overlap(view, k=10).collect()
    assert len(got) == 10
    shared = [r["n_shared"] for r in got]
    assert shared == sorted(shared, reverse=True)
    for r in got:
        expect = r["n_shared"] / (r["n1"] + r["n2"] - r["n_shared"])
        assert abs(r["jaccard"] - expect) < 1e-5


# --- batch 28: backtest / triplet margin / lead-lag / dedup projection ------


def test_seasonal_naive_beats_naive_on_seasonal_series(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        seasonal_naive_backtest,
    )
    import datetime

    # 3 years, strong monthly seasonality: revenue = 100*(1 + (month==12)).
    # Seasonal-naive is exact (MAPE 0); naive misses every Dec/Jan edge.
    rows = []
    k = 0
    for y in (1995, 1996, 1997):
        for m in range(1, 13):
            k += 1
            amount = 200.0 if m == 12 else 100.0
            rows.append((k, amount, datetime.datetime(y, m, 15)))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    )
    got = {r["method"]: r for r in seasonal_naive_backtest(df).collect()}
    assert got["seasonal_naive"]["mape"] == 0.0
    assert got["naive"]["mape"] > 0.0
    assert got["seasonal_naive"]["n_months"] == 24  # 36 - 12 lag
    assert got["naive"]["n_months"] == 35


def test_triplet_margin_separable_labels(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        triplet_margin_audit,
    )

    # two tight, well-separated clusters → no violated triplets
    vecs = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(5)] + [
        (10 + i, [0.0, 1.0 + 0.01 * i], 1) for i in range(5)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    got = triplet_margin_audit(df, n_anchors=10).collect()
    assert len(got) == 10
    assert all(r["violated"] == 0 and r["margin"] > 0 for r in got)


def test_lead_lag_detects_shifted_series(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        lead_lag_correlation,
    )
    import datetime

    # b's daily count = a's count shifted one day later → r_lag1(a,b)=1
    counts = [3, 7, 2, 9, 4, 8, 1, 6]
    rows = []
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append(("a", datetime.datetime(2024, 5, 1 + d, 9, i)))
        for i in range(c):
            rows.append(("b", datetime.datetime(2024, 5, 2 + d, 9, i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {(r["ka"], r["kb"]): r for r in lead_lag_correlation(df).collect()}
    assert got[("a", "b")]["r_lag1"] == 1.0
    assert abs(got[("a", "b")]["r_lag0"]) < 1.0


def test_dedup_projection_monotone_and_superlinear_capable(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        dedup_rate_projection,
    )

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    # every pair among ids 0..9 is a dup pair (dense cluster)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(10) for b in range(a + 1, 10)],
        "id_a long, id_b long",
    )
    got = sorted(dedup_rate_projection(docs, pairs).collect(), key=lambda r: r["share"])
    assert [r["share"] for r in got] == [0.25, 0.5, 0.75, 1.0]
    nd = [r["n_docs"] for r in got]
    np_ = [r["n_pairs"] for r in got]
    assert nd == sorted(nd) and np_ == sorted(np_)
    assert nd[-1] == 100 and np_[-1] == 45


# --- batch 29: streaming quantiles / binary recall / gini drift / burstiness


def test_streaming_histogram_quantiles_matches_batch_readoff(spark):
    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        streaming_histogram_quantiles,
    )
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        run_stream_to_memory,
    )
    import tempfile

    # values 1..100 → unit bins 1..100; p50 cut at bin 50 → estimate 51
    rows = [("x", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    tmp = tempfile.mkdtemp(prefix="histq_stream_")
    df.repartition(4).write.mode("overwrite").parquet(tmp)
    stream = (
        spark.readStream.schema(spark.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    got = run_stream_to_memory(
        streaming_histogram_quantiles(stream), "t_histq", output_mode="update",
        state_partitions=4,
    )
    final = {
        r["quantile"]: r
        for r in got.orderBy(got["n_events"].desc()).limit(3).collect()
    }
    assert final[0.5]["n_events"] == 100
    assert final[0.5]["estimate"] == 51.0
    assert final[0.9]["estimate"] == 91.0
    assert final[0.99]["estimate"] == 100.0


def test_binary_recall_perfect_on_axis_aligned(spark):
    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        binary_quantization_recall,
    )

    # vectors on distinct orthants: sign bits identify each cluster, so
    # Hamming ranking matches cosine ranking exactly → recall 1.0
    import itertools
    vecs = []
    vid = 0
    for signs in itertools.product([1.0, -1.0], repeat=3):
        for j in range(4):
            v = [s * (1.0 + 0.01 * j) for s in signs] + [0.5] * 61
            vecs.append((vid, v))
            vid += 1
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = binary_quantization_recall(df, n_queries=4, k=3).collect()
    assert len(got) == 4
    assert all(r["recall_at_k"] == 1.0 for r in got)


def test_gini_by_group_even_vs_concentrated(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        gini_by_group,
    )

    rows = [("even", f"k{i}", 10.0) for i in range(10)] + [
        ("conc", f"k{i}", 0.01) for i in range(9)
    ] + [("conc", "k9", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, key string, v double")
    got = {r["grp"]: r for r in gini_by_group(df, "grp", "key", "v").collect()}
    assert abs(got["even"]["gini"]) < 1e-6
    assert got["conc"]["gini"] > 0.85


def test_burstiness_periodic_vs_bursty(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        gap_burstiness,
    )
    import datetime

    rows = []
    # periodic: one event exactly every 60s → sigma 0 → B = -1
    for i in range(20):
        rows.append((i, 1, "tick", datetime.datetime(2024, 6, 1, 9, 0, 0)
                     + datetime.timedelta(seconds=60 * i)))
    # bursty: 10 events in 10s, then a 10000s silence, repeated
    t = datetime.datetime(2024, 6, 1, 9, 0, 0)
    k = 100
    for rep in range(3):
        for i in range(10):
            rows.append((k, 2, "burst", t)); k += 1
            t += datetime.timedelta(seconds=1)
        t += datetime.timedelta(seconds=10000)
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts timestamp")
    got = {r["event_type"]: r for r in gap_burstiness(df).collect()}
    assert got["tick"]["burstiness"] == -1.0
    assert got["burst"]["burstiness"] > 0.5


# --- batch 30: circular hour stats / Burrows delta ---------------------------


def test_circular_mean_wraps_midnight(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        circular_hour_stats,
    )
    import datetime

    # events at 23:00 and 01:00 — circular mean is MIDNIGHT (0h), and
    # the resultant length is high (tight cluster); an arithmetic mean
    # would say noon.
    rows = [
        ("night", datetime.datetime(2024, 7, 1, 23, 0, 0)),
        ("night", datetime.datetime(2024, 7, 2, 1, 0, 0)),
        ("uniform", datetime.datetime(2024, 7, 1, 0, 0, 0)),
        ("uniform", datetime.datetime(2024, 7, 1, 6, 0, 0)),
        ("uniform", datetime.datetime(2024, 7, 1, 12, 0, 0)),
        ("uniform", datetime.datetime(2024, 7, 1, 18, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: r for r in circular_hour_stats(df).collect()}
    assert abs(got["night"]["mean_hour"] - 0.0) < 1e-4 or abs(got["night"]["mean_hour"] - 24.0) < 1e-4
    assert got["night"]["resultant_length"] > 0.9
    assert got["uniform"]["resultant_length"] < 1e-6  # perfectly spread


def test_burrows_delta_separates_styles(spark):
    from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
        burrows_delta,
    )

    # s1/s2 use the vocabulary with IDENTICAL relative frequencies
    # (delta 0 by construction); s3 inverts the proportions
    docs = [
        (1, "the the the the cat dog", "s1"),
        (2, "the the the the cat dog the the the the cat dog", "s2"),
        (3, "cat cat cat cat the dog", "s3"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {(r["ga"], r["gb"]): r["delta"] for r in burrows_delta(df, top_k=10).collect()}
    assert got[("s1", "s2")] == 0.0
    assert got[("s1", "s3")] > 0.5 and got[("s2", "s3")] > 0.5


# --- batch 31: Hill tail index / percolation robustness ---------------------


def test_hill_estimator_on_known_pareto(spark):
    from neo4j_database_to_data_importer_package_spark.operators.statistics import (
        hill_tail_index,
    )

    # exact Pareto(alpha=2) quantiles: x_i = (i/n)^(-1/2) — Hill over
    # the top-k should recover alpha ≈ 2
    n = 2000
    rows = [((i + 1) / n) ** (-0.5,)[0] for i in range(n)]
    df = spark.createDataFrame([(float(x),) for x in rows], "v double")
    got = hill_tail_index(df, "v", k=200).collect()[0]
    assert 1.7 < got["alpha"] < 2.3
    assert got["k"] <= 200 and got["x_min"] > 1.0


def test_percolation_hub_removal_shatters_star(spark):
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        percolation_robustness,
    )

    # two stars joined at a bridge: removing the 2 hubs isolates leaves
    edges = [("h1", f"a{i}") for i in range(5)] + [
        ("h2", f"b{i}") for i in range(5)
    ] + [("h1", "h2")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["variant"]: r for r in percolation_robustness(edf, n_hubs=2).collect()}
    full = got["full"]
    assert full["n_components"] == 1 and full["largest_share"] == 1.0
    cut = got["hubs_removed"]
    # both hubs gone → every edge is gone → clean zeros
    assert cut["n_nodes"] == 0 and cut["n_components"] == 0
    assert cut["largest_cc"] == 0 and cut["largest_share"] == 0.0

    # removing only the bigger hub keeps the h2 star intact
    got1 = {r["variant"]: r for r in percolation_robustness(edf, n_hubs=1).collect()}
    cut1 = got1["hubs_removed"]
    assert cut1["n_components"] == 1 and cut1["n_nodes"] == 6
