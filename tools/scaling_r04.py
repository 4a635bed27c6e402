#!/usr/bin/env python
"""8x scale-up sweep for the round-4 operators (SCALING.md batch 7).

Replication scheme (same methodology as tools/scaling_sweep.py):
- documents 8x: disjoint doc ids, per-copy text tag (so dedup/LM stats
  don't degenerate into pure copies);
- lineitem 8x: disjoint order keys, part/supp keys preserved (so
  co-purchase pair counts grow with orders, not with synthetic keys);
- events 8x: disjoint user ids and event ids, timestamps preserved
  (8x the cohort population, same weeks);
- dims 1:1.

Run: ``python tools/scaling_r04.py`` (exclusive — no concurrent Spark).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "bpe_apply_merge_stats",
    "vocab_growth_curve",
    "bigram_perplexity_heldout",
    "dedup_incremental_near_dup",
    "cms_term_estimates",
    "part_copurchase_topk",
    "events_retention_cohorts",
    "customer_rfm_segments",
]


def build_8x(out_dir: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW li AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    con.execute(
        f"CREATE VIEW ev AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    con.execute(
        f"CREATE VIEW o AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    con.execute(
        f"""
        COPY (
          SELECT docs.* REPLACE (
            doc_id + c.i * 100000000 AS doc_id,
            'copy' || c.i || ' ' || text AS text)
          FROM docs, range(0, 8) c(i)
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""
        COPY (
          SELECT li.* REPLACE (l_orderkey + c.i * 100000000 AS l_orderkey)
          FROM li, range(0, 8) c(i)
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""
        COPY (
          SELECT ev.* REPLACE (
            event_id + c.i * 100000000 AS event_id,
            user_id + c.i * 100000000 AS user_id)
          FROM ev, range(0, 8) c(i)
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""
        COPY (
          SELECT o.* REPLACE (o_orderkey + c.i * 100000000 AS o_orderkey)
          FROM o, range(0, 8) c(i)
        ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)"""
    )
    for t in ["region", "nation", "customer", "supplier", "part", "embeddings"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    con.close()


def main() -> None:
    from neo4j_database_to_data_importer_package_spark import registry
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="scaling-r04")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r04_8x_")
    try:
        build_8x(tmp)
        for name in QUERIES:
            fn = registry.QUERIES[name]
            row = {}
            for label, d in (("1x", SF_DIR), ("8x", tmp)):
                fn(spark, d).count()  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                row[label] = (time.perf_counter() - t0, n)
                spark.catalog.clearCache()
            r1, r8 = row["1x"][0], row["8x"][0]
            print(
                f"{name}: 1x {r1:.2f}s ({row['1x'][1]} rows) | "
                f"8x {r8:.2f}s ({row['8x'][1]} rows) | ratio {r8 / r1:.1f}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
