"""Semantics tests for the round-4 fifth batch: personalized PageRank,
the per-domain quality-signal ensemble, and the hourly seasonal profile.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
    pagerank,
    personalized_pagerank,
)
from neo4j_database_to_data_importer_package_spark.operators.text_analysis import (
    quality_signal_ensemble,
)
from neo4j_database_to_data_importer_package_spark.operators.windows import (
    hourly_seasonal_profile,
)


def test_ppr_concentrates_mass_near_seeds(spark):
    # chain s -> a -> b and an off-seed island x -> y
    edges = spark.createDataFrame(
        [
            Row(src="s", dst="a"),
            Row(src="a", dst="b"),
            Row(src="x", dst="y"),
        ]
    )
    seeds = spark.createDataFrame([Row(node="s")])
    out = {r["node"]: r["ppr"] for r in personalized_pagerank(edges, seeds).collect()}
    # the seed keeps restart mass; downstream nodes get walk mass;
    # the island never receives anything
    assert out["s"] > 0 and out["a"] > 0 and out["b"] > 0
    assert out["x"] == 0.0 and out["y"] == 0.0
    assert out["s"] > out["b"]


def test_ppr_with_all_nodes_seeded_matches_uniform_restart_shape(spark):
    # seeding EVERY node makes the restart vector uniform — the ranking
    # (not the values, which normalize differently) must match pagerank
    edges = spark.createDataFrame(
        [Row(src=f"n{i}", dst=f"n{(i * 3 + 1) % 7}") for i in range(7)]
    )
    seeds = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    ppr = personalized_pagerank(edges, seeds, iterations=10)
    pr = pagerank(edges, iterations=10)
    order_a = [r["node"] for r in ppr.orderBy(F.desc("ppr"), "node").collect()]
    order_b = [r["node"] for r in pr.orderBy(F.desc("pagerank"), "node").collect()]
    assert order_a == order_b


def test_quality_ensemble_blend_law(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = quality_signal_ensemble(docs).collect()
    assert rows
    for r in rows[:50]:
        assert 0.0 <= r["clf_rank"] <= 1.0 and 0.0 <= r["lm_rank"] <= 1.0
        assert r["blended_rank"] == pytest.approx(
            (r["clf_rank"] + r["lm_rank"]) / 2.0, abs=2e-6
        )
    # within every domain, some doc sits at rank 0 (the percent_rank floor)
    lows = {}
    for r in rows:
        lows.setdefault(r["source"], []).append(r["clf_rank"])
    assert all(min(v) == 0.0 for v in lows.values())


def test_hourly_profile_load_ratio_averages_to_one(spark):
    rows = []
    eid = 0
    # 'flat' type: uniform across 4 hours; 'spiky': all in one hour
    for h in range(4):
        for _ in range(10):
            rows.append(
                Row(
                    event_id=eid,
                    event_type="flat",
                    ts=f"2024-01-01 {h:02d}:15:00",
                    value=1.0,
                )
            )
            eid += 1
    for _ in range(12):
        rows.append(
            Row(event_id=eid, event_type="spiky", ts="2024-01-01 09:30:00", value=2.0)
        )
        eid += 1
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    out = hourly_seasonal_profile(df).collect()
    flat = [r for r in out if r["event_type"] == "flat"]
    spiky = [r for r in out if r["event_type"] == "spiky"]
    assert all(r["load_ratio"] == 6.0 for r in flat)  # 1/4 of traffic x 24
    (s,) = spiky
    assert s["hour"] == 9 and s["load_ratio"] == 24.0 and s["mean_value"] == 2.0


def test_ppr_off_graph_seeds_do_not_deflate_ranks(spark):
    """ADVICE r04: seeds absent from the edge list carry no mass, so
    they must not be counted in the restart denominator — seeding
    {s, ghost} must equal seeding {s} exactly."""
    edges = spark.createDataFrame(
        [Row(src="s", dst="a"), Row(src="a", dst="b")]
    )
    only_s = spark.createDataFrame([Row(node="s")])
    with_ghost = spark.createDataFrame([Row(node="s"), Row(node="ghost")])
    a = {r["node"]: r["ppr"] for r in personalized_pagerank(edges, only_s).collect()}
    b = {r["node"]: r["ppr"] for r in personalized_pagerank(edges, with_ghost).collect()}
    assert a == b


def test_ppr_no_effective_seeds_raises(spark):
    edges = spark.createDataFrame([Row(src="s", dst="a")])
    ghosts = spark.createDataFrame([Row(node="ghost")])
    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(edges, ghosts)
    empty = ghosts.filter(F.lit(False))
    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(edges, empty)
