"""Training-data chunking and sequence packing.

The two operators an LLM pre-training pipeline runs between "clean
corpus" and "token shards": split long documents into overlapping
fixed-token chunks, and pack document token counts into fixed-budget
training sequences. Both are pure DataFrame expressions (codegen-side,
no Python UDFs) and both key every shuffle on uniformly distributed
columns, so they survive arbitrary corpus skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_plan(
    df: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into sliding token windows of ``chunk_size``
    with ``overlap`` tokens shared between consecutive chunks.

    A document with n tokens yields ``1 + ceil((n - chunk_size) /
    stride)`` chunks (min 1, even for empty docs), where ``stride =
    chunk_size - overlap``; the last chunk is truncated at n. The
    explode is linear in output tokens and per-row independent — no
    shuffle at all: chunking is a map-side operator that preserves the
    input partitioning.

    Returns (id, chunk_id, token_start, token_end, chunk_text) with
    [token_start, token_end) 0-based exclusive bounds.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - chunk_size + stride - 1) / F.lit(stride)).cast("int")
    )
    start = F.col("chunk_id") * stride
    end = F.least(start + chunk_size, F.col("n"))
    return (
        df.select(
            F.col(id_col),
            toks.alias("t"),
            n.alias("n"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            start.alias("token_start"),
            end.alias("token_end"),
            F.array_join(
                F.slice(F.col("t"), start + 1, end - start), " "
            ).alias("chunk_text"),
        )
    )


def sequence_packs(
    df: DataFrame,
    budget: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each shard, documents
    are laid out in ``id_col`` order and cut into ``budget``-token packs
    at their running-token offset (a document whose span crosses a pack
    boundary is assigned to the pack where it starts — the standard
    approximation used when sequences are later chunked anyway).

    The running offset is a window over (shard, id) — partitioned by the
    shard column, NOT global, so no single task ever sees more than one
    shard's documents. At 100 TB the shard column is whatever unit the
    corpus is already bucketed by (dump file, crawl segment, source);
    packing is then embarrassingly parallel per shard.

    Returns one row per (shard, pack_id): n_docs, total_tokens,
    first_doc, last_doc.
    """
    n_tok = F.size(tokens(text_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(F.col(shard_col), F.col(id_col), n_tok.alias("n_tokens"))
        .withColumn("pack_id", F.floor(offset / F.lit(budget)))
        .groupBy(shard_col, "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def length_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 2048,
) -> DataFrame:
    """Length-bucketed batching audit: assign every document to the
    power-of-two token bucket that covers it (16, 32, …, ``max_len``;
    longer docs truncate into the top bucket) and report, per bucket,
    how many padding tokens pad-to-bucket batching would burn. This is
    the accounting step behind bucketed batching in a training loader —
    the waste ratio tells you whether the bucket grid is worth its
    complexity vs pack-to-max.

    The bucket is a chain of integer comparisons (no log2 — float logs
    disagree across engines exactly at powers of two), token count is
    the same whitespace tokenizer as every text operator, and the whole
    thing is one scan + a ≤9-row aggregate: map-side partials, no
    skew-able key.
    """
    toks = F.size(tokens(text_col))
    capped = F.least(toks, F.lit(max_len))
    bucket = F.lit(16)
    b = 16
    while b < max_len:
        b *= 2
        bucket = F.when(capped > F.lit(b // 2), F.lit(b)).otherwise(bucket)
    agg = (
        df.select(capped.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )
    padded = F.col("n_docs") * F.col("bucket")
    from ..functions.numeric import round_half_up

    return agg.select(
        "bucket",
        "n_docs",
        "total_tokens",
        padded.cast("bigint").alias("padded_tokens"),
        round_half_up(
            (padded - F.col("total_tokens")) / padded.cast("double"), 6
        ).alias("pad_waste_ratio"),
    )
