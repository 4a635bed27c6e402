"""Streaming twins vs batch oracles: replay the events parquet as a
stream and compare against the batch window operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators.windows import (
    tumbling_window_agg,
)
from neo4j_database_to_data_importer_package_spark.sources.star_schema import (
    read_parquet_table,
)
from neo4j_database_to_data_importer_package_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    streaming_dedup,
    streaming_session_windows,
    streaming_tumbling_counts,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return read_parquet_table(spark, f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def events_stream_path(spark, events_batch, tmp_path_factory):
    # Re-write with Spark (micro-precision) so the stream source schema is
    # plain timestamps; split into several files to exercise triggers.
    p = tmp_path_factory.mktemp("events_stream")
    events_batch.repartition(4).write.mode("overwrite").parquet(str(p / "data"))
    return str(p / "data")


def test_streaming_tumbling_matches_batch(spark, events_batch, events_stream_path):
    schema = spark.read.parquet(events_stream_path).schema
    stream = read_events_stream(spark, events_stream_path, schema, max_files_per_trigger=2)
    got = run_stream_to_memory(
        streaming_tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    batch = tumbling_window_agg(events_batch).select(
        "window_start", "event_type", "n_events", "sum_value"
    )
    g = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in batch.collect()}
    assert g == b


def test_streaming_sessions_run(spark, events_stream_path):
    schema = spark.read.parquet(events_stream_path).schema
    stream = read_events_stream(spark, events_stream_path, schema)
    got = run_stream_to_memory(
        streaming_session_windows(stream), "t_sessions", output_mode="complete"
    )
    assert got.count() > 0


def test_streaming_dedup_bounded_state(spark, events_stream_path, events_batch):
    schema = spark.read.parquet(events_stream_path).schema
    stream = read_events_stream(spark, events_stream_path, schema, max_files_per_trigger=4)
    got = run_stream_to_memory(streaming_dedup(stream), "t_dedup")
    n_distinct = events_batch.select("event_id").distinct().count()
    assert got.count() == n_distinct


def test_stateful_running_totals_matches_batch(spark, events_stream_path, events_batch):
    """applyInPandasWithState running totals: the LAST emission per key
    must equal the batch lifetime aggregate, independent of file/batch
    arrival order (the update is commutative)."""
    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        streaming_running_totals,
    )

    schema = spark.read.parquet(events_stream_path).schema
    stream = read_events_stream(spark, events_stream_path, schema, max_files_per_trigger=1)
    got = run_stream_to_memory(
        streaming_running_totals(stream), "t_running", output_mode="update"
    ).toPandas()
    # last emission per key = the row with max n_events
    last = got.loc[got.groupby("key")["n_events"].idxmax()]
    batch = (
        events_batch.groupBy(F.col("event_type").cast("string").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .toPandas()
    )
    g = {r.key: (r.n_events, round(r.sum_value, 4), r.min_ts, r.max_ts) for r in last.itertuples()}
    b = {r.key: (r.n_events, round(r.sum_value, 4), r.min_ts, r.max_ts) for r in batch.itertuples()}
    assert g == b


def test_streaming_checkpoint_resume_exactly_once(spark, events_batch, tmp_path):
    """Checkpointed file-source stream: a restarted query must process
    ONLY files that arrived after the first run — no reprocessing, no
    loss (exactly-once sink contents across restarts)."""
    src = tmp_path / "incoming"
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    first = events_batch.filter(F.col("event_id") % 2 == 0)
    second = events_batch.filter(F.col("event_id") % 2 == 1)
    first.repartition(2).write.mode("overwrite").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    def run_once():
        q = (
            read_events_stream(spark, str(src), schema, max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    run_once()
    n_first = spark.read.parquet(sink).count()
    assert n_first == first.count()
    # New files arrive; restart from the same checkpoint.
    second.repartition(2).write.mode("append").parquet(str(src))
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == events_batch.count()          # no loss, no dups
    assert out.select("event_id").distinct().count() == events_batch.count()


def test_streaming_kmv_matches_batch_sketch(spark, events_stream_path, events_batch):
    """The streaming KMV's final emission per key must equal the batch
    KMV computed from the same deterministic hash fractions, regardless
    of micro-batch split (set-union + k-smallest is order-independent);
    state is bounded at k doubles per key."""
    import math

    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        read_events_stream,
    )
    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        KMV_K,
        streaming_kmv_distinct,
    )

    schema = spark.read.parquet(events_stream_path).schema
    stream = read_events_stream(spark, events_stream_path, schema, max_files_per_trigger=1)
    frac = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(4294967296.0)
    )
    hashed = stream.select(F.col("event_type").cast("string").alias("key"), frac.alias("frac"))
    got = run_stream_to_memory(
        streaming_kmv_distinct(hashed), "t_kmv", output_mode="update"
    ).toPandas()
    last = got.loc[got.groupby("key")["n_batches"].idxmax()]
    assert (last["n_mins"] <= KMV_K).all()

    batch = (
        events_batch.select(F.col("event_type").cast("string").alias("key"), frac.alias("frac"))
        .distinct()
        .toPandas()
    )
    for r in last.itertuples():
        fracs = sorted(batch[batch["key"] == r.key]["frac"])
        if len(fracs) >= KMV_K:
            exp = int(math.floor((KMV_K - 1) / fracs[KMV_K - 1] + 0.5))
        else:
            exp = len(fracs)
        assert r.kmv_estimate == exp, r.key


def test_streaming_cusum_matches_batch(spark, events_stream_path, events_batch):
    """The streaming CUSUM monitor's last emission per key must equal the
    batch cusum_drift result regardless of micro-batch arrival order —
    the per-day count-map state is commutative."""
    from neo4j_database_to_data_importer_package_spark.operators.windows import (
        cusum_drift,
    )
    from neo4j_database_to_data_importer_package_spark.streaming.events import (
        read_events_stream,
    )
    from neo4j_database_to_data_importer_package_spark.streaming.stateful import (
        streaming_cusum_monitor,
    )

    schema = spark.read.parquet(events_stream_path).schema
    stream = read_events_stream(
        spark, events_stream_path, schema, max_files_per_trigger=1
    )
    got = run_stream_to_memory(
        streaming_cusum_monitor(stream), "t_cusum", output_mode="update"
    ).toPandas()
    last = got.loc[got.groupby("key")["n_events"].idxmax()]
    g = {
        r.key: (r.n_days, r.max_cusum, r.peak_day, round(r.drift_stat, 4))
        for r in last.itertuples()
    }
    batch = cusum_drift(events_batch).toPandas()
    b = {
        r.event_type: (r.n_days, r.max_cusum, str(r.peak_day), round(r.drift_stat, 4))
        for r in batch.itertuples()
    }
    assert g == b
