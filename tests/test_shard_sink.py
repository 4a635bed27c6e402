"""Corpus shard writer: hash assignment determinism + written files."""

from __future__ import annotations

from neo4j_database_to_data_importer_package_spark.sinks.shard_sink import (
    shard_assignment,
    shard_manifest,
    write_corpus_shards,
)


def test_manifest_covers_all_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = shard_manifest(docs, n_shards=8).collect()
    assert sum(r["n_docs"] for r in m) == docs.count()
    assert {r["shard_id"] for r in m} <= set(range(8))


def test_write_round_trips_and_matches_manifest(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards_out")
    res = write_corpus_shards(docs, out, n_shards=8)
    m = {r["shard_id"]: r["n_docs"] for r in shard_manifest(docs, 8).collect()}
    assert res["shards"] == m
    # read-back preserves every doc exactly once
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


def test_assignment_is_stable_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"]: r["s"] for r in docs.select("doc_id", shard_assignment().alias("s")).collect()}
    b = {
        r["doc_id"]: r["s"]
        for r in docs.repartition(13).select("doc_id", shard_assignment().alias("s")).collect()
    }
    assert a == b
