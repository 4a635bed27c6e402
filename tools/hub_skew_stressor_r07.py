#!/usr/bin/env python
"""Hub-skew stressor for the round-6 heavy graph operators (VERDICT
r06 directive #3).

``graph_adamic_adar``, ``graph_katz_centrality``,
``graph_spectral_radius`` and ``graph_percolation_robustness`` were
swept at 8x uniform in round 6 but never under the hub-skew harness
that exposed ``graph_walk_corpus``'s 24x blow-up. Same probe as
``tools/hub_skew_stressor.py``: identical edge count, but ONE hub node
holds 50% of all edges, so any per-round edges⋈scores equi-join
concentrates the hub's adjacency in one shuffle partition. A ratio
>~3x vs the uniform graph means the salted two-level-aggregate shape
(the walk_corpus fix) must be applied.

Expected shapes:
- adamic_adar_topk: the hub exceeds max_center_degree=1024 and is
  excluded from wedge enumeration with a logged count — wall must NOT
  blow up (the cap is the defense).
- katz / spectral_radius: per-round neighbor-sum joins; the hub's
  in-edges hash to one reducer — the candidate skew point.
- percolation_robustness: hub removal happens BEFORE propagation; the
  full-graph CC still propagates through the hub (hash-min is
  min-aggregated per node, map-side combinable).

Usage: PYTHONPATH=. python tools/hub_skew_stressor_r07.py [n_edges]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from tools.hub_skew_stressor import build_graphs, run  # noqa: E402


def main():
    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        adamic_adar_topk,
        katz_centrality,
        percolation_robustness,
        spectral_radius_estimate,
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
    ratios = {}
    for op_name, fn in [
        ("adamic_adar", lambda g: adamic_adar_topk(g)),
        ("katz", lambda g: katz_centrality(g)),
        ("spectral_radius", lambda g: spectral_radius_estimate(g)),
        ("percolation", lambda g: percolation_robustness(g)),
    ]:
        t = {}
        for label, g in [("uniform", uniform), ("hub50", hub)]:
            t[label] = run(f"{op_name}_{label}", lambda g=g, fn=fn: fn(g))
        ratios[op_name] = t["hub50"] / t["uniform"]
    for op_name, r in ratios.items():
        print(f"RATIO {op_name}: hub50/uniform = {r:.1f}", flush=True)


if __name__ == "__main__":
    main()
