"""Batch time-window aggregation over event streams (beyond-reference,
SURVEY.md §2.9/§7 Phase E).

The reference has no streaming/window surface; these are the batch
equivalents of the Structured Streaming operators in ``streaming/``:
tumbling and sliding windows via ``window()``, session windows via
``session_window()`` — all JVM-side, partial-aggregated map-side, one
shuffle on (window, keys). At 100 TB: events partitioned by date land as
partition-pruned scans; window aggregation shuffles only (key, window)
groups, and AQE coalesces small output partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _win_cols(prefix: str = "window") -> list[Column]:
    return [
        F.date_format(F.col(f"{prefix}.start"), _TS_FMT).alias("window_start"),
        F.date_format(F.col(f"{prefix}.end"), _TS_FMT).alias("window_end"),
    ]


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: tuple = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Fixed non-overlapping windows: count + sum/avg of ``value_col``."""
    g = events.groupBy(F.window(F.col(ts_col), duration).alias("window"), *keys)
    out = g.agg(
        F.count(F.lit(1)).alias("n_events"),
        round_half_up(F.sum(value_col), 4).alias("sum_value"),
        round_half_up(F.avg(value_col), 6).alias("avg_value"),
    )
    return out.select(*_win_cols(), *keys, "n_events", "sum_value", "avg_value")


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Overlapping hopping windows (each event lands in duration/slide windows)."""
    g = events.groupBy(F.window(F.col(ts_col), duration, slide).alias("window"), *keys)
    out = g.agg(
        F.count(F.lit(1)).alias("n_events"),
        round_half_up(F.sum(value_col), 4).alias("sum_value"),
    )
    return out.select(*_win_cols(), *keys, "n_events", "sum_value")


def session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: tuple = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the time since
    the previous event reaches ``gap`` (window end = last event + gap)."""
    g = events.groupBy(F.session_window(F.col(ts_col), gap).alias("window"), *keys)
    out = g.agg(
        F.count(F.lit(1)).alias("n_events"),
        round_half_up(F.sum(value_col), 4).alias("sum_value"),
    )
    return out.select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("session_start"),
        *keys,
        "n_events",
        "sum_value",
    )
