#!/usr/bin/env python
"""Skewed 8x scale-up sweep for the shuffle-heavy round-2 operators.

Builds an 8x-replicated copy of the sf0.1 tables in a temp dir, with the
skew turned UP rather than diluted:

- ``lineitem``: 8 copies with disjoint order keys (component structure
  preserved per copy), but 2% of every copy's part keys remapped to ONE
  hot part — a single graph node whose degree grows with the corpus.
  Stress for ``graph_triangle_counts``'s degree-ordered orientation.
- ``documents``: 8 copies with disjoint doc ids and per-copy perturbed
  text, plus one fixed 12-token phrase injected into 30% of all docs —
  a planet-hot n-gram key shared by every copy. Stress for
  ``dedup_span_stats``'s gram-hash shuffles and
  ``contamination_check``'s eval-gram join.
- all other tables copied 1:1.

Run: ``python tools/scaling_sweep.py`` — prints 1x vs 8x timings.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["graph_triangle_counts", "dedup_span_stats", "contamination_check"]
HOT_PHRASE = "the quick brown fox jumps over the lazy dog again and again"


def build_skewed_8x(out_dir: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW li AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')")
    con.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    hot_part = con.execute("SELECT min(l_partkey) FROM li").fetchone()[0]

    # lineitem: disjoint order keys per copy; 2% of part keys -> the hot part
    con.execute(
        f"""
        COPY (
          SELECT li.* REPLACE (
            l_orderkey + c.i * 100000000 AS l_orderkey,
            CASE WHEN hash(l_orderkey * 31 + l_linenumber) % 50 = 0
                 THEN {hot_part} ELSE l_partkey END AS l_partkey
          )
          FROM li, range(0, 8) c(i)
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    # documents: disjoint ids, per-copy text tag, hot phrase in 30% of docs
    con.execute(
        f"""
        COPY (
          SELECT docs.* REPLACE (
            doc_id + c.i * 100000000 AS doc_id,
            CASE WHEN hash(doc_id) % 10 < 3
                 THEN 'copy' || c.i || ' ' || text || ' {HOT_PHRASE}'
                 ELSE 'copy' || c.i || ' ' || text END AS text
          )
          FROM docs, range(0, 8) c(i)
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "events", "embeddings"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    con.close()


def main() -> None:
    from neo4j_database_to_data_importer_package_spark import registry
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="scaling-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ndip_scale8x_")
    print(f"building skewed 8x dataset in {tmp} ...", flush=True)
    build_skewed_8x(tmp)

    for name in QUERIES:
        fn = registry.QUERIES[name]
        for label, d in [("1x", SF_DIR), ("8x", tmp)]:
            fn(spark, d).count()  # warm codegen + footers
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            print(f"{name} {label}: {time.perf_counter() - t0:.2f}s rows={n}", flush=True)
            spark.catalog.clearCache()

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
