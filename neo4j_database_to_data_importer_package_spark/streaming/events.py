"""Structured Streaming operators (beyond-reference, SURVEY.md §2.9).

The reference is batch-only; these are the streaming twins of the batch
window operators in ``operators/windows.py`` — same aggregation logic,
same output schema, expressed over an unbounded source with watermarks
for late data. A parquet directory of events can be replayed as a stream
(``read_events_stream``) so batch results are the oracle for streaming
results (run both, compare — see tests/test_streaming.py).

Scale notes: watermark bounds state (old windows evicted); the shuffle
key is (window, keys) exactly as in batch; ``withWatermark`` + append
mode emits each window once when it finalizes. For exactly-once sinks
use checkpointed writeStream into parquet/Delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, round_half_up


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay a parquet directory as a file-source stream."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _as_event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require LTZ TIMESTAMP (instants). Pin NTZ wall times to
    the instants whose UTC rendering equals them, via pure wall-clock
    arithmetic from the NTZ epoch — NOT a cast or to_utc_timestamp, both
    of which interpret NTZ in the session timezone and would shift every
    window edge when the driver session is not UTC."""
    if dict(events.dtypes).get(ts_col) != "timestamp_ntz":
        return events
    return events.withColumn(
        ts_col,
        F.expr(
            f"timestamp_micros(timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`))"
        ),
    )


def _fmt_utc(col, fmt: str = "yyyy-MM-dd HH:mm:ss"):
    """Render an instant as its UTC wall time, independent of the session
    timezone (plain date_format follows spark.sql.session.timeZone)."""
    return F.date_format(F.convert_timezone(None, F.lit("UTC"), col), fmt)


def streaming_interval_join_pairs(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "24 hours",
    watermark: str = "3650 days",
) -> DataFrame:
    """Stream-stream inner equi-join with an event-time range condition
    (right event strictly after the left event, within ``upper``).

    Both sides are watermarked — Structured Streaming uses the watermark
    plus the time-range condition to bound the join state (each side's
    buffered rows are evicted once no future match is possible). The
    default ``watermark`` here is deliberately enormous so a finite
    replay emits exactly the batch-join answer for the correctness gate;
    a production deployment sets it to its actual late-data bound (e.g.
    '1 hour') and gets bounded state for free — the plan is identical.
    """
    l = _as_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = _as_event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] > l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner")


def streaming_session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "3650 days",
    keys: tuple = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked session-window aggregation — the streaming twin of
    ``operators.windows.session_window_agg``. Sessions merge while events
    arrive within ``gap`` of the session end; the state store merges
    overlapping sessions across triggers. The oversized default watermark
    makes a finite replay emit the exact batch answer; production uses the
    real late-data bound and gets session-state eviction for free."""
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("window"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(dsum(value_col), 4).alias("sum_value"),
        )
        .select(
            _fmt_utc(F.col("window.start")).alias("session_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (append-mode compatible)."""
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("window"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(dsum(value_col), 4).alias("sum_value"),
        )
        .select(
            _fmt_utc(F.col("window.start")).alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def streaming_sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked hopping (sliding) windows: each event lands in
    duration/slide overlapping windows. Same bounded-state contract as
    the tumbling variant — the watermark evicts closed windows — with
    duration/slide times the window state."""
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), duration, slide).alias("window"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(dsum(value_col), 4).alias("sum_value"),
        )
        .select(
            _fmt_utc(F.col("window.start")).alias("window_start"),
            _fmt_utc(F.col("window.end")).alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def streaming_session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple = ("user_id",),
) -> DataFrame:
    """Watermarked session windows (gap-merged, append mode)."""
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("window"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            _fmt_utc(F.col("window.start")).alias("session_start"),
            *keys,
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    id_cols: tuple = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key streaming dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps keys only while they can
    still collide under the watermark (vs unbounded dropDuplicates)."""
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(id_cols))
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_sec: int = 600,
    state_partitions: int | None = None,
):
    """Drive a streaming query to completion against a finite file source
    (test/bench helper) and return the in-memory table's contents.

    A timeout MUST surface as an error, never as data: returning whatever
    the memory sink holds when ``awaitTermination`` times out silently
    yields a partial (wrong) answer — observed when dozens of batch
    queries share the JVM and push a stream past a short guard.

    ``state_partitions`` sets ``spark.sql.shuffle.partitions`` for THIS
    query's state stores (restored afterwards). State sharding is
    invisible to results — it only chooses how many per-partition state
    stores each micro-batch commits, and each store carries fixed
    checkpoint/snapshot I/O. Locally that fixed cost dominates (a
    stream-stream join at sf0.1 dropped 11.8s → 3.5s going 32 → 8
    stores, bit-identical output); on a cluster size it like any shuffle
    (~2-3× total executor cores), and note a streaming query PINS the
    value from its first start — changing it requires a new checkpoint.
    """
    spark = stream_df.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            terminated = q.awaitTermination(timeout_sec)
            if not terminated:
                raise TimeoutError(
                    f"streaming query {query_name!r} still active after "
                    f"{timeout_sec}s — refusing to return a partial result"
                )
        finally:
            if q.isActive:
                q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_until_count(
    stream_df: DataFrame,
    query_name: str,
    target_rows: int,
    timeout_sec: int = 600,
    state_partitions: int | None = None,
    poll_sec: float = 0.1,
):
    """Drive a ProcessingTimeTimeout stream to a KNOWN emission count.

    ``availableNow`` cannot self-terminate such a query:
    FlatMapGroupsWithStateExec's shouldRunAnotherBatch is unconditionally
    true under processing-time timeouts (advancing wall-clock may always
    fire more timers), so after the file source drains the engine keeps
    scheduling empty batches forever — which is exactly what lets
    dormant keys evict. Completion is therefore detected at the SINK:
    poll the memory table until it holds ``target_rows`` rows (the
    caller knows the deterministic emission count — e.g. one flush per
    closed day), then stop. A timeout still surfaces as an error, never
    as a partial result (same contract as ``run_stream_to_memory``).
    """
    import time

    spark = stream_df.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            deadline = time.time() + timeout_sec
            while True:
                try:
                    n = spark.sql(f"SELECT count(*) FROM {query_name}").first()[0]
                except Exception:
                    # memory-sink view not registered yet (first-batch race)
                    n = 0
                if n >= target_rows:
                    break
                if time.time() > deadline:
                    raise TimeoutError(
                        f"streaming query {query_name!r} emitted {n}/"
                        f"{target_rows} rows after {timeout_sec}s — refusing "
                        f"to return a partial result"
                    )
                if not q.isActive:
                    raise RuntimeError(
                        f"streaming query {query_name!r} died at {n}/"
                        f"{target_rows} rows: {q.exception()}"
                    )
                time.sleep(poll_sec)
        finally:
            if q.isActive:
                q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.sql(f"SELECT * FROM {query_name}")
