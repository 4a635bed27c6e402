"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side and
compares row count, sorted column names, and an order-insensitive
canonical form of all values — catching mismatches before the driver
does. The canon is shared with ``tools/local_gate.py`` (single source
of truth): repr-precision floats and Decimal normalization, hardened
after round 3's ``%.6g`` canon let five driver reds through locally
(VERDICT r03 #4).
"""

from __future__ import annotations

import duckdb

from tools.local_gate import canon as _canon
from tools.local_gate import canonical_rows

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
    # HUGEINT (int128) oracle outputs hash differently in the driver than
    # Spark's bigint even when every value is equal (all five round-3
    # driver reds) — DuckDB's Python fetch hides it by converting to int,
    # so screen the declared types, not the fetched values.
    huge = [
        c
        for c, typ, *_ in con.execute(
            f"DESCRIBE SELECT * FROM ({oracle}) LIMIT 0"
        ).fetchall()
        if "HUGEINT" in typ.upper()
    ]
    assert not huge, (
        f"{name}: oracle emits HUGEINT columns {huge} — the driver hashes "
        "int128 differently than Spark bigint; CAST(sum(...) AS BIGINT)"
    )
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
