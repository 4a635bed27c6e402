#!/usr/bin/env python
"""Local replica of the driver's correctness gate, over ALL queries.

The external driver evaluates only the first 50 entries of
``__spark_entry__.queries()`` (see COVERAGE.md); this tool runs the full
registry — every query vs its DuckDB oracle at the driver's scale factor
(sf0.01 by default) with an AT-LEAST-as-strict comparison (row count,
sorted column names, order-insensitive value hash with repr-precision
floats) — and writes a CORRECTNESS-shaped JSON file.

Round-3 postmortem (VERDICT r03 #4): this gate used ``%.6g`` float canon,
which collapses cent-level differences on 7-digit revenues — the local
replica said 122/122 MATCH while the driver said 5 red. Two hardenings:

1. Floats canonicalize via ``repr()`` (shortest round-trip — bit-exact).
2. Any oracle whose DESCRIBE output contains a HUGEINT (int128) column is
   flagged red outright (``err=hugeint_output``): DuckDB's Python fetch
   converts HUGEINT to plain ``int`` so values compare equal locally, but
   every round-3 driver red (and only those) had a HUGEINT output column —
   the driver's hasher canonicalizes int128 differently than Spark's
   bigint. Fix the oracle (``CAST(sum(...) AS BIGINT)``), not the engine.
3. ``decimal.Decimal`` fetch values normalize to int/float before canon so
   an intentional DECIMAL oracle column compares by value.

    python tools/local_gate.py [--sf /root/testdata/sf0.01] [--out CORRECTNESS_local.json]
"""

from __future__ import annotations

import argparse
import decimal
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_local.json")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset, or 'window' for _GATE_FIRST_50",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if args.queries == "window":
        qs = {n: qs[n] for n in entrymod._GATE_FIRST_50}
    elif args.queries:
        wanted = args.queries.split(",")
        missing = [n for n in wanted if n not in qs]
        assert not missing, f"unknown queries: {missing}"
        qs = {n: qs[n] for n in wanted}
    results: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in qs.items():
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
        except Exception as ex:  # noqa: BLE001 — gate records, never raises
            rec["err"] = f"spark: {ex!r}"[:300]
            results[name] = rec
            print(f"{name}: SPARK-ERROR", flush=True)
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            results[name] = rec
            print(f"{name}: rows-only ({len(srows)})", flush=True)
            continue
        try:
            huge = [
                c for c, typ, *_ in con.execute(
                    f"DESCRIBE SELECT * FROM ({oracles[name]}) LIMIT 0"
                ).fetchall()
                if "HUGEINT" in typ.upper()
            ]
            if huge:
                rec["hash_match"] = False
                rec["err"] = f"hugeint_output: {huge}"
                results[name] = rec
                print(f"{name}: HUGEINT-RED {huge}", flush=True)
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"oracle: {ex!r}"[:300]
            results[name] = rec
            print(f"{name}: ORACLE-ERROR", flush=True)
            continue
        rec["rows_match"] = len(srows) == len(drows)
        rec["schema_match"] = sorted(c.lower() for c in scols) == sorted(
            c.lower() for c in dcols
        )
        rec["hash_match"] = canonical_rows(scols, srows) == canonical_rows(dcols, drows)
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)", flush=True)
        spark.catalog.clearCache()

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    n_green = sum(
        1 for r in results.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    print(
        f"\n{n_green}/{len(results)} green in {time.time() - t_start:.0f}s "
        f"→ {args.out}"
    )


if __name__ == "__main__":
    main()
