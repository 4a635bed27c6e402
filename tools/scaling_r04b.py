#!/usr/bin/env python
"""8x scale-up sweep for the round-4 batch-2/3/4 operators (SCALING.md).

Same replication methodology as tools/scaling_r04.py, extended to the
tables these operators stress:

- documents / events 8x: disjoint ids (per-copy text tag on documents);
- part 8x: disjoint p_partkey, **names preserved** — the record-linkage
  stressor (record count grows 8x, name vocabulary does not: the
  distinct-name kernel should stay flat);
- embeddings 8x: disjoint vec_id, labels and vectors preserved;
- customer 8x: disjoint c_custkey, nation keys preserved (8x the
  C->N fan-in for HITS);
- other dims 1:1.

Run: ``python tools/scaling_r04b.py`` (exclusive — no concurrent Spark).
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
    "part_name_linkage",
    "pmi_collocations",
    "quality_classifier_score",
    "dedup_prefix_survivorship",
    "dedup_minhash_calibration",
    "split_leakage_check",
    "language_confusion_matrix",
    "weighted_corpus_sample",
    "doc_length_buckets",
    "events_scd2_state",
    "events_mad_outliers",
    "embedding_dim_stats",
    "embedding_norm_outliers",
    "embedding_centroid_outliers",
    "graph_hits_scores",
]

_OFF = 100000000


def build_8x(out_dir: str) -> None:
    import duckdb

    con = duckdb.connect()
    reps = {
        "documents": (
            "SELECT d.* REPLACE (doc_id + c.i * {o} AS doc_id, "
            "'copy' || c.i || ' ' || text AS text) FROM t d, range(0, 8) c(i)"
        ),
        "events": (
            "SELECT e.* REPLACE (event_id + c.i * {o} AS event_id, "
            "user_id + c.i * {o} AS user_id) FROM t e, range(0, 8) c(i)"
        ),
        "part": (
            "SELECT p.* REPLACE (p_partkey + c.i * {o} AS p_partkey) "
            "FROM t p, range(0, 8) c(i)"
        ),
        "embeddings": (
            "SELECT v.* REPLACE (vec_id + c.i * {o} AS vec_id) "
            "FROM t v, range(0, 8) c(i)"
        ),
        "customer": (
            "SELECT cu.* REPLACE (c_custkey + c.i * {o} AS c_custkey) "
            "FROM t cu, range(0, 8) c(i)"
        ),
    }
    for table, sql in reps.items():
        con.execute(
            f"CREATE OR REPLACE VIEW t AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{table}.parquet')"
        )
        con.execute(
            f"COPY ({sql.format(o=_OFF)}) TO '{out_dir}/{table}.parquet' "
            f"(FORMAT PARQUET)"
        )
    for t in ["region", "nation", "supplier", "orders", "lineitem"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    con.close()


def main() -> None:
    from neo4j_database_to_data_importer_package_spark import registry
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="scaling-r04b")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r04b_8x_")
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
                f"8x {r8:.2f}s ({row['8x'][1]} rows) | ratio {r8 / r1:.1f}",
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
