"""Registry section split from the former monolithic registry.py
(round 6, VERDICT r05 #7); registration order is preserved by the
import order in ``__init__.py``."""

from __future__ import annotations

from ._core import (  # noqa: F401  (full monolith-global namespace)
    Callable,
    DataFrame,
    F,
    ORACLES,
    QUERIES,
    SparkSession,
    TPCH_GRAPH_SPEC,
    _TS_FMT_DUCK,
    _TS_FMT_SPARK,
    _VIEW_CACHE,
    _dsum,
    _fmt_ts,
    _view,
    detect_identifiers,
    discover_patterns_map,
    dsum,
    export_node_table,
    export_relationship_table,
    infer_type_col,
    load_graph_view,
    nodes_from_view,
    register,
    schema_union_map,
    uniqueness_profile,
)

# Structured Streaming, driven to completion (availableNow) so the batch
# SQL is the oracle: the parquet events are replayed as a file-source
# stream, processed with watermarks / applyInPandasWithState, and the
# final materialized result is returned as a batch DataFrame.
# ---------------------------------------------------------------------------

_STREAM_SEQ = [0]

# The replay directory is immutable once written — materialize it once
# per (session, sf_dir) instead of re-writing the events parquet for
# every streaming query (six gate queries replay the same files).
_STREAM_DIR_CACHE: dict[tuple[str, str], tuple[str, object]] = {}


def _replayed_events_stream(spark, sf_dir, max_files_per_trigger=2):
    import tempfile

    from ..streaming.events import read_events_stream

    # applicationId, not id(spark) — see registry/_core.py::_view.
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _STREAM_DIR_CACHE:
        view = _view(spark, sf_dir)
        tmp = tempfile.mkdtemp(prefix="ndip_events_stream_")
        import atexit
        import shutil

        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        view.tables["events"].repartition(4).write.mode("overwrite").parquet(tmp)
        _STREAM_DIR_CACHE[key] = (tmp, spark.read.parquet(tmp).schema)
    tmp, schema = _STREAM_DIR_CACHE[key]
    return read_events_stream(spark, tmp, schema, max_files_per_trigger)


@register(
    "streaming_tumbling_events",
    f"""SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
               event_type, count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM events GROUP BY 1, 2""",
)
def streaming_tumbling_events(spark, sf_dir):
    from ..streaming.events import run_stream_to_memory, streaming_tumbling_counts

    stream = _replayed_events_stream(spark, sf_dir)
    _STREAM_SEQ[0] += 1
    return run_stream_to_memory(
        streaming_tumbling_counts(stream),
        f"q_stream_tumbling_{_STREAM_SEQ[0]}",
        output_mode="complete",
        state_partitions=8,
    )


@register(
    "streaming_running_totals",
    """SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n_events,
              floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
       FROM events GROUP BY event_type""",
)
def streaming_running_totals(spark, sf_dir):
    """applyInPandasWithState lifetime totals; last emission per key ==
    the batch aggregate (the update is commutative, so arrival order
    cannot change the fixed point)."""
    from pyspark.sql import Window

    from ..functions.numeric import round_half_up
    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_running_totals as op

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream), f"q_stream_running_{_STREAM_SEQ[0]}", output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_events"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "key",
            "n_events",
            round_half_up(F.col("sum_value"), 4).alias("sum_value"),
            F.date_format("min_ts", _TS_FMT_SPARK).alias("min_ts"),
            F.date_format("max_ts", _TS_FMT_SPARK).alias("max_ts"),
        )
    )


# ---------------------------------------------------------------------------
