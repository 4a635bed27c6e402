"""As-of (point-in-time) join — a custom operator Spark lacks natively
(beyond-reference; the reference has exactly one join shape, SURVEY.md
§2.3).

``as_of_join(left, right, on, ...)`` attaches, to every left row, the
latest right row of the same key with ``right_ts <= left_ts``
(inclusive) — the temporal lookup behind "state as of event time"
(prices, config versions, feature snapshots).

Implementation is the classic single-shuffle union-sort plan, not a
range self-join: tag both sides, union, and run
``last(value, ignorenulls) OVER (PARTITION BY key ORDER BY ts, side)``
so each left row picks up the most recent right payload carried forward
within its partition. Cost is one shuffle on the key + a per-partition
sort — the same physical plan a database ASOF JOIN executes, and it
scales with the usual groupBy-key story (AQE skew split / salting for
hot keys). A broadcast range-join would replicate the right side per
task; this stays shuffle-bound and handles both sides large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_RV = "__asof_payload"


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: latest right row with ``right_ts <= left_ts``.

    ``right``'s non-key, non-ts columns become ``{payload_prefix}{col}``
    on the output, plus ``{payload_prefix}{right_ts}`` (the matched
    timestamp); all NULL when no right row precedes the left row.

    ``right`` must be unique per (key, ts) — pre-aggregate if not (ties
    at identical timestamps would otherwise be arrival-order dependent).
    """
    payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(right_ts).alias(right_ts), *[F.col(c) for c in payload_cols]
        ).alias(_RV),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts → inclusive (<=) match.
    w = (
        Window.partitionBy(on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_RV, ignorenulls=True).over(w)
    out = (
        u.withColumn(_RV, carried)
        .filter(F.col(_SIDE) == 1)
        .drop(_TS, _SIDE)
    )
    return out.select(
        *[c for c in left.columns],
        F.col(f"{_RV}.{right_ts}").alias(f"{payload_prefix}{right_ts}"),
        *[F.col(f"{_RV}.{c}").alias(f"{payload_prefix}{c}") for c in payload_cols],
    )


def _epoch_s(col: F.Column) -> F.Column:
    # tz-free epoch seconds from NTZ wall time (see star_schema notes on
    # why no cast/unix_timestamp: those consult the session timezone).
    return F.timestamp_diff(
        "SECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"), col
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = 0,
    upper_s: int = 86400,
    bucket_s: int | None = None,
) -> DataFrame:
    """Range (interval) join: pairs where
    ``left_ts + lower_s < right_ts <= left_ts + upper_s`` and keys match.

    The naive formulation is a theta join (cross product per key); this
    is the scalable shape: both sides bucket time by ``bucket_s``
    (default = window width), the left row explodes over the 2-3 buckets
    its window covers, candidates come from an EQUI-join on
    (key, bucket), and the exact interval predicate filters the rest.
    Shuffle cost is that of a plain equi-join with a small constant
    replication factor — no per-key cross product.

    Right columns are suffixed ``_r`` on name collisions.
    """
    bucket_s = bucket_s or max(upper_s - lower_s, 1)
    l_ts = _epoch_s(F.col(left_ts))
    r_ts = _epoch_s(F.col(right_ts))
    lo = l_ts + F.lit(lower_s)
    hi = l_ts + F.lit(upper_s)
    lb = left.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(lo / bucket_s), F.floor(hi / bucket_s))),
    )
    rename = {
        c: f"{c}_r" for c in right.columns if c in left.columns and c != on
    }
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rb = r.withColumn(
        "__bucket", F.floor(_epoch_s(F.col(rename.get(right_ts, right_ts))) / bucket_s)
    )
    rt = _epoch_s(F.col(rename.get(right_ts, right_ts)))
    out = lb.join(rb, [on, "__bucket"]).filter(
        (rt > _epoch_s(F.col(left_ts)) + F.lit(lower_s))
        & (rt <= _epoch_s(F.col(left_ts)) + F.lit(upper_s))
    )
    return out.drop("__bucket")
