#!/usr/bin/env python
"""Capture the PRE-checkpoint physical plan of each superstep of an
iterative query (r14 optimization evidence).

A loop query's final DataFrame plans as a scan of its last
localCheckpoint, so `explain()` on the query result hides the superstep
plan the optimization round actually changed. This tool monkeypatches
``DataFrame.localCheckpoint`` to dump the captured plan of its input
right before the real checkpoint runs — every superstep's true executed
shape, no reimplementation drift.

Usage:
    python tools/capture_superstep_plans.py --tag after \
        --queries graph_pagerank,graph_katz_centrality [--step -1]

Writes plans/r14/<query>_superstep_<tag>.txt (the --step'th captured
plan, default the LAST superstep; a header records how many were seen).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--step", type=int, default=-1)
    ap.add_argument("--out-dir", default=os.path.join(REPO, "plans", "r14"))
    args = ap.parse_args()

    # Spark 4 splits the API: pyspark.sql.dataframe.DataFrame is the
    # facade; instances are pyspark.sql.classic.dataframe.DataFrame —
    # patch the concrete class or the tap never fires.
    try:
        from pyspark.sql.classic import dataframe as _df_mod
    except ImportError:  # Spark 3.x
        from pyspark.sql import dataframe as _df_mod
    from neo4j_database_to_data_importer_package_spark.session import get_spark
    from neo4j_database_to_data_importer_package_spark import registry

    spark = get_spark(app_name="superstep_plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")

    captured: list[str] = []
    orig = _df_mod.DataFrame.localCheckpoint

    def tapped(self, eager=True):
        plan = self._sc._jvm.PythonSQLUtils.explainString(
            self._jdf.queryExecution(), "formatted"
        )
        captured.append(plan)
        return orig(self, eager=eager)

    os.makedirs(args.out_dir, exist_ok=True)
    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    _df_mod.DataFrame.localCheckpoint = tapped
    try:
        for name in names:
            captured.clear()
            df = registry.QUERIES[name](spark, SF_DIR)
            df.count()
            if not captured:
                print(f"{name}: no localCheckpoint calls — skipped")
                continue
            plan = captured[args.step]
            path = os.path.join(
                args.out_dir, f"{name}_superstep_{args.tag}.txt"
            )
            with open(path, "w") as f:
                f.write(
                    f"== {name}: pre-checkpoint plan of superstep "
                    f"{args.step} of {len(captured)} captured "
                    f"localCheckpoint calls (sf dir {SF_DIR}) ==\n"
                )
                f.write(plan)
            print(f"{name}: {len(captured)} checkpoints, wrote {path}")
            spark.catalog.clearCache()
    finally:
        _df_mod.DataFrame.localCheckpoint = orig


if __name__ == "__main__":
    main()
