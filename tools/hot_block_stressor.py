#!/usr/bin/env python
"""Hot-BLOCK stressor for blocked_name_linkage (SCALING.md, round 5).

The round-4 hot-NAME stressor proved record concentration is harmless
(the kernel runs on distinct names). The remaining pathological axis —
VERDICT r04 "what's wrong" #3 — is a hot BLOCK: many DISTINCT names
sharing one first token ("The ..."), where a bare-first-token block key
degenerates to |block-vocab|² candidate pairs. The round-5 compound key
(first token, length bucket of width max_dist+1) caps each join group at
one length band.

Three inputs, same machine, one session:
- base:      20k records, 64 distinct names, spread first tokens
- hot-block: 20k records, 20k DISTINCT names, ONE first token, lengths
             spread 10..110 (realistic "The ..." catalog)
- hot-band:  4k records, 4k distinct names, one first token AND one
             length band (the irreducible worst case: every name really
             is every other name's candidate — no blocking scheme can
             shrink it, so it runs at reduced n to bound the quadratic
             kernel)

Run: ``python tools/hot_block_stressor.py`` (exclusive).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import Row

    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        blocked_name_linkage,
    )
    from neo4j_database_to_data_importer_package_spark.session import get_spark

    spark = get_spark(app_name="hot_block_stressor")
    spark.sparkContext.setLogLevel("ERROR")

    n = 20_000
    base = spark.createDataFrame(
        [Row(k=i, name=f"tok{i % 64} widget {'x' * (i % 8)}") for i in range(n)]
    )
    hot_block = spark.createDataFrame(
        [Row(k=i, name="the " + "x" * (10 + i % 100) + str(i)) for i in range(n)]
    )
    hot_band = spark.createDataFrame(
        [Row(k=i, name="the " + "x" * 20 + str(i).zfill(5)) for i in range(4_000)]
    )

    for label, df in (("base", base), ("hot-block", hot_block), ("hot-band", hot_band)):
        df = df.repartition(32).cache()
        df.count()
        out = blocked_name_linkage(df, "name", "k", max_dist=2, k=200)
        t0 = time.perf_counter()
        rows = out.count()
        wall = time.perf_counter() - t0
        print(f"{label}: {wall:.2f}s  ({rows} pairs)", flush=True)
        df.unpersist()


if __name__ == "__main__":
    main()
