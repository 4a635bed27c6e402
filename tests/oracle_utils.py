"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side and
compares row count, sorted column names, and an order-insensitive
canonical form of all values (floats rounded) — catching mismatches
before the driver does.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def compare_query(spark, name, query_fn, oracle, sf_dir):
    from pyspark.sql import types as T

    sdf = query_fn(spark, sf_dir)
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: non-scalar gate columns {complex_cols} — the driver's "
        "pandas canon cannot sort them; serialize (F.to_json) first"
    )
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = duckdb_con(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_canon = canonical_rows(spark_cols, spark_rows)
    d_canon = canonical_rows(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b][:3]
    assert s_canon == d_canon, (
        f"{name}: value mismatch, first diffs: "
        + "; ".join(f"spark={s_canon[i]!r} duck={d_canon[i]!r}" for i in mism)
    )
