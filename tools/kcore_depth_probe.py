#!/usr/bin/env python
"""k-core peel-depth probe (VERDICT r03 #7).

`graph_k_core`'s wall-clock is dominated by O(peel-depth) driver-
synchronized supersteps, not by edge volume. This probe measures that
claim: run the same 4-core pipeline on the sf0.1 one-year lineitem graph
at 1x and at 8x (key-offset replication, component structure preserved
per copy — the SCALING.md methodology) and report wall-time,
rounds-to-fixpoint, and seconds/round. If the claim holds, rounds stay
~flat under 8x volume and s/round moves far less than 8x.

Run: ``python tools/kcore_depth_probe.py`` (exclusive — no concurrent
Spark jobs), then paste the printed row into SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_8x(out_dir: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW li AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    # Disjoint order/part/supp keys per copy: 8 disconnected copies of the
    # same co-occurrence graph — peel depth is a per-component property,
    # so the ideal outcome is identical rounds at 8x volume.
    con.execute(
        f"""
        COPY (
          SELECT li.* REPLACE (
            l_orderkey + c.i * 100000000 AS l_orderkey,
            l_partkey + c.i * 100000000 AS l_partkey,
            l_suppkey + c.i * 100000000 AS l_suppkey
          )
          FROM li, range(0, 8) c(i)
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "events", "documents", "embeddings",
    ]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    con.close()


def run_kcore(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from neo4j_database_to_data_importer_package_spark.operators.graph_algos import (
        k_core,
    )
    from neo4j_database_to_data_importer_package_spark.registry import _view

    li = _view(spark, sf_dir).tables["lineitem"].filter(
        F.year("l_shipdate") == 1998
    )
    e = (
        li.select(
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
        )
        .unionByName(
            li.select(
                F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
        .unionByName(
            li.select(
                F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
    )
    stats: list[int] = []
    t0 = time.perf_counter()
    n = k_core(e, k=4, round_stats=stats).count()
    secs = time.perf_counter() - t0
    return secs, stats, n


def main() -> None:
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="kcore-depth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="kcore8x_")
    try:
        build_8x(tmp)
        for label, d in (("1x", SF_DIR), ("8x", tmp)):
            run_kcore(spark, d)  # warm
            spark.catalog.clearCache()
            secs, stats, n = run_kcore(spark, d)
            rounds = len(stats)  # incl. the final zero-drop probe round
            print(
                f"{label}: {secs:.2f}s, rounds={rounds} "
                f"(drops per round: {stats}), s/round={secs / rounds:.2f}, "
                f"core nodes={n}"
            )
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
