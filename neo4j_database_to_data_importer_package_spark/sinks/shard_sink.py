"""Corpus shard writer — the "token shards" output step of a training
pipeline (beyond-reference; the reference's sinks are CSV/zip,
``neo4j_export.py:869-930``).

Shard assignment is HASH-based (md5 of the stable doc id, mod n_shards),
not row-number-based: a global row_number needs a total order — one sort
of the entire corpus through a single range boundary computation —
whereas the hash assignment is a pure per-row expression (shuffle-free
until the write repartition), deterministic across runs/engines/retries,
and balances shards to within Poisson noise. The writer repartitions on
the shard id so each output file is exactly one shard.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def shard_assignment(id_col: str = "doc_id", n_shards: int = 16) -> F.Column:
    """Deterministic engine-portable shard id: first 8 md5 hex digits of
    the stringified id, mod ``n_shards``."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(n_shards)
    ).cast("int")


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard audit table: (shard_id, n_docs, n_tokens, min_doc,
    max_doc). This is the plan the writer executes — exposed separately
    so the assignment is testable (and gate-checkable) without I/O."""
    return (
        df.select(
            shard_assignment(id_col, n_shards).alias("shard_id"),
            F.col(id_col),
            F.size(tokens(text_col)).alias("__nt"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
    )


def write_corpus_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> dict:
    """Write the corpus as ``n_shards`` parquet shards plus a manifest.

    One file per shard (repartition on the shard id — at cluster scale
    this is the single shuffle of the job and each task streams one
    shard to storage). Returns {"n_shards", "out_dir", "shards": {id: n_docs}}.
    """
    os.makedirs(out_dir, exist_ok=True)
    sharded = df.withColumn("shard_id", shard_assignment(id_col, n_shards))
    (
        sharded.repartition(n_shards, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(os.path.join(out_dir, "shards"))
    )
    spark = df.sparkSession
    back = spark.read.parquet(os.path.join(out_dir, "shards"))
    counts = {
        int(r["shard_id"]): int(r["n"])
        for r in back.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {"n_shards": n_shards, "out_dir": out_dir, "shards": counts}
