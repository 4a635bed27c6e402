#!/usr/bin/env python
"""Hub-skew stressor for the round-5 graph operators (VERDICT r05 #6).

``graph_closeness_sampled`` and ``graph_walk_corpus`` were swept at 8×
uniform; this probe turns the skew UP instead (the round-3 method,
SCALING.md "Fifth batch"): same edge count, but ONE hub node holds 50%
of all edges, so the per-hop frontier⋈edges equi-join concentrates the
hub's entire adjacency in one shuffle partition. Measures uniform vs
hub wall time for both operators; a blow-up means the salted-join shape
(partitioning.salted_join) must be applied to the frontier expansion.

Usage: PYTHONPATH=. python tools/hub_skew_stressor.py [n_edges]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_graphs(spark, n_edges: int):
    n_nodes = n_edges // 4
    uniform = spark.range(n_edges).select(
        F.concat(F.lit("u"), (F.xxhash64("id") % n_nodes)).alias("src"),
        F.concat(F.lit("u"), (F.xxhash64("id", F.lit(1)) % n_nodes)).alias("dst"),
    ).localCheckpoint(eager=True)
    half = n_edges // 2
    hub = (
        spark.range(half)
        .select(
            F.lit("hub").alias("src"),
            F.concat(F.lit("u"), (F.xxhash64("id") % n_nodes)).alias("dst"),
        )
        .unionAll(
            spark.range(half).select(
                F.concat(F.lit("u"), (F.xxhash64("id", F.lit(2)) % n_nodes)).alias("src"),
                F.concat(F.lit("u"), (F.xxhash64("id", F.lit(3)) % n_nodes)).alias("dst"),
            )
        )
        .localCheckpoint(eager=True)
    )
    return uniform, hub


def seeds_for(spark, edges, k: int):
    return (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(k)
    )


def run(name, fn):
    t0 = time.time()
    n = fn().count()
    dt = time.time() - t0
    print(f"RESULT {name}: {n} rows in {dt:.1f}s", flush=True)
    return dt


def main():
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        closeness_sampled,
        walk_corpus,
    )

    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    uniform, hub = build_graphs(spark, n_edges)
    print(
        f"edges={n_edges}; hub degree="
        f"{hub.filter((F.col('src') == 'hub') | (F.col('dst') == 'hub')).count()}"
    )

    for label, g in [("uniform", uniform), ("hub50", hub)]:
        s = seeds_for(spark, g, 8)
        run(f"closeness_{label}", lambda g=g, s=s: closeness_sampled(g, s, max_hops=4))
        s2 = seeds_for(spark, g, 25)
        run(f"walks_{label}", lambda g=g, s2=s2: walk_corpus(g, s2, steps=4, n_walks=2))


if __name__ == "__main__":
    main()
