#!/usr/bin/env python
"""64x corpus probe for the round-5 vocabulary-state and rank-arithmetic
claims (SCALING.md).

The 8x sweep showed bpe_train_merges near-flat; this probe pushes the
corpus to 64x (320k documents at sf0.1 base) to separate the two
hypotheses: if training cost scales with CORPUS volume the wall should
grow ~8x from the 8x point; if it scales with VOCABULARY (the design
claim), it stays near-flat because 64 copy tags are the only new words.
curriculum_order_plan and dataset_card_stats ride along as the
linear-scan controls.

Run: ``python tools/scaling_r05_64x.py`` (exclusive).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["bpe_train_merges", "curriculum_order_plan", "dataset_card_stats"]
_OFF = 100000000


def build(out_dir: str, copies: int) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        f"COPY (SELECT d.* REPLACE (doc_id + c.i * {_OFF} AS doc_id, "
        f"'copy' || c.i || ' ' || text AS text) FROM t d, range(0, {copies}) c(i)) "
        f"TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")


def main() -> None:
    from neo4j_database_to_data_importer_package_spark import registry
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="scaling-r05-64x")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {"1x": SF_DIR}
    tmps = []
    try:
        for label, copies in (("8x", 8), ("64x", 64)):
            d = tempfile.mkdtemp(prefix=f"r05_{label}_")
            tmps.append(d)
            build(d, copies)
            dirs[label] = d
        for name in QUERIES:
            fn = registry.QUERIES[name]
            parts = []
            for label, d in dirs.items():
                fn(spark, d).count()  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                parts.append(f"{label} {time.perf_counter() - t0:.2f}s ({n} rows)")
                spark.catalog.clearCache()
            print(f"{name}: " + " | ".join(parts), flush=True)
    finally:
        for d in tmps:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
