#!/usr/bin/env python
"""8x scale-up sweep for the round-5 operator batch (SCALING.md).

Same replication methodology as tools/scaling_r04b.py: documents /
events / embeddings / customer / supplier replicated 8x with disjoint
ids (documents get a per-copy text tag so near-dup structure is
realistic, not 8 exact mirrors of everything); dimension tables 1:1.

The interesting per-operator expectations at 8x:
- term_zipf_fit / language_script_stats / domain_term_entropy /
  dataset_card_stats: scan-dominated, near-linear.
- events_cusum_drift: the window input is (type, day) cells — day count
  is unchanged by replication, so only the daily-count aggregate grows.
- curriculum_order_plan: range-repartition rank arithmetic — linear,
  no global window to collapse.
- cross_domain_neardup_matrix: banded LSH candidates grow with genuine
  near-dup mass (the 'copyN' tag bounds cross-copy matches).
- embedding_dim_quantiles: per-dimension exact percentile buffers grow
  8x per group — the documented exact-vs-sketch trade.
- graph_closeness_sampled: frontier joins grow with edges; superstep
  count (diameter) unchanged.

Run: ``python tools/scaling_r05.py`` (exclusive — no concurrent Spark).
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
    "term_zipf_fit",
    "language_script_stats",
    "domain_term_entropy",
    "events_cusum_drift",
    "curriculum_order_plan",
    "cross_domain_neardup_matrix",
    "embedding_dim_quantiles",
    "dataset_card_stats",
    "graph_closeness_sampled",
    "model_v3_table_schemas",
    "bpe_train_merges",
    "embedding_ivf_pq_topk",
    "copurchase_recommendations",
    "events_markov_transitions",
    "events_first_touch_attribution",
    "data_quality_checks",
    "user_sequence_anomaly",
    "embedding_matryoshka_audit",
    "embedding_pca_power_iteration",
    "vocab_coverage_curve",
    "graph_walk_corpus",
    "brand_price_qty_regression",
    "embedding_cluster_purity",
    "graph_assortativity",
    "graph_clustering_coefficients",
    "events_active_user_curves",
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
        "embeddings": (
            "SELECT v.* REPLACE (vec_id + c.i * {o} AS vec_id) "
            "FROM t v, range(0, 8) c(i)"
        ),
        "customer": (
            "SELECT cu.* REPLACE (c_custkey + c.i * {o} AS c_custkey) "
            "FROM t cu, range(0, 8) c(i)"
        ),
        "supplier": (
            "SELECT su.* REPLACE (s_suppkey + c.i * {o} AS s_suppkey) "
            "FROM t su, range(0, 8) c(i)"
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
    for t in ["region", "nation", "part", "orders", "lineitem"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    con.close()


def main() -> None:
    from neo4j_database_to_data_importer_package_spark import registry
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="scaling-r05")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r05_8x_")
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
