#!/usr/bin/env python
"""8x scale-up sweep for round-7 changes (SCALING.md).

Reuses the round-6 replication methodology (``tools/scaling_r06.py::
build_8x`` — 8 disjoint, key-consistent copies of every fact table).
For the embedding queries the 8x corpus is special: each vector gains 7
EXACT duplicates (identical components, shifted vec_id), so true
near-dup volume is known by construction — 28 cross-copy pairs per
original vector at cosine 1.0 (rounded) plus 8x the within-copy pairs.
That makes it the right probe for VERDICT r06 directive #2: a healthy
LSH's candidate count must track that near-dup volume, not n²/8.

Beyond wall-clock, this sweep prints the LSH candidate-pair count
(pre-verification) next to the true near-dup count so the "no all-pairs
in LSH costume" claim is a measured number, not an assertion.

Run: ``python tools/scaling_r07.py [<query> ...]`` (exclusive — no
concurrent Spark).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_r06 import SF_DIR, build_8x  # noqa: E402

QUERIES = [
    "embedding_lsh_pairs",
    "embedding_near_dup_clusters",
    "model_v24_table_schemas",
    "model_v01_file_schemas",
    "streaming_daily_rollup_evicted",
]


def lsh_candidate_count(spark, sf_dir: str) -> int:
    """Candidate pairs BEFORE cosine verification (the join-volume the
    scale trap inflates), measured with the registered defaults."""
    from pyspark.sql import functions as F

    from neo4j_database_to_data_importer_package_spark.operators.similarity import (
        embedding_lsh_pairs,
    )
    from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
        read_parquet_table,
    )

    df = read_parquet_table(spark, f"{sf_dir}/embeddings.parquet")
    # threshold -1 keeps every verified candidate => candidate count
    return embedding_lsh_pairs(df, threshold=-1.0).count()


def true_near_dup_count(sf_dir: str, threshold: float = 0.30) -> int:
    """Exact all-pairs count at the registered threshold (DuckDB)."""
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
          FROM read_parquet('{sf_dir}/embeddings.parquet'))
        SELECT count(*) FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= {threshold}
        """
    ).fetchone()[0]
    con.close()
    return n


def main() -> None:
    from neo4j_database_to_data_importer_package_spark import registry
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    queries = QUERIES
    if len(sys.argv) > 1:
        queries = [q for q in queries if q in set(sys.argv[1:])]

    spark = get_spark(app_name="scaling-r07")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r07_8x_")
    try:
        build_8x(tmp)
        for label, d in (("1x", SF_DIR), ("8x", tmp)):
            cands = lsh_candidate_count(spark, d)
            true_nd = true_near_dup_count(d)
            import duckdb

            nvec = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{d}/embeddings.parquet')"
            ).fetchone()[0]
            print(
                f"lsh_candidates {label}: n={nvec} candidates={cands} "
                f"true_neardups(cos>=0.30)={true_nd} "
                f"allpairs_trap(n^2/8)={nvec * nvec // 8}",
                flush=True,
            )
        for name in queries:
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
