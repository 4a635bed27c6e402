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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, round_half_up

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
    """Fixed non-overlapping windows: count + sum/avg of ``value_col``.

    Sums/averages accumulate in exact decimal (``dsum``) so the rounded
    outputs are partition-order-independent — see functions/numeric.py.
    """
    g = events.groupBy(F.window(F.col(ts_col), duration).alias("window"), *keys)
    out = g.agg(
        F.count(F.lit(1)).alias("n_events"),
        round_half_up(dsum(value_col), 4).alias("sum_value"),
        round_half_up(dsum(value_col) / F.count(F.lit(1)), 6).alias("avg_value"),
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
        round_half_up(dsum(value_col), 4).alias("sum_value"),
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
        round_half_up(dsum(value_col), 4).alias("sum_value"),
    )
    return out.select(
        F.date_format(F.col("window.start"), _TS_FMT).alias("session_start"),
        *keys,
        "n_events",
        "sum_value",
    )


def _epoch_seconds(ts_col: str) -> Column:
    """Wall-clock seconds since the NTZ epoch — session-timezone-proof
    (never casts NTZ to an instant; see streaming/events.py)."""
    return F.expr(
        f"timestampdiff(SECOND, timestamp'1970-01-01 00:00:00', {ts_col})"
    )


def rolling_range_activity(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    window_seconds: int = 3 * 24 * 3600,
) -> DataFrame:
    """Per-key peak trailing-window activity: a RANGE frame over event-time
    seconds ([-window, now] per row, peers included), then the per-key
    maximum — the rolling-feature shape (trailing 3-day activity) used for
    time-series featurization.

    The RANGE window shuffles once on the key and sorts within key — the
    same cost as any per-key sequence operator; no global sort. The frame
    is on an integer seconds column, so Spark and any SQL engine agree on
    peer handling exactly.
    """
    secs = _epoch_seconds(ts_col)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(secs.alias("__secs"))
        .rangeBetween(-window_seconds, 0)
    )
    rolled = events.select(
        F.col(key_col),
        F.count(F.lit(1)).over(w).alias("__n"),
        # decimal accumulation: every trailing-window sum is exact, so the
        # per-key max (and its rounding) is frame-order-independent
        F.sum(F.col(value_col).cast("decimal(27,4)")).over(w).alias("__v"),
    )
    return rolled.groupBy(key_col).agg(
        F.max("__n").alias("peak_window_events"),
        round_half_up(F.max("__v").cast("double"), 4).alias("peak_window_value"),
    )


def zscore_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group anomaly accounting: population z-score of ``value_col``
    against the group's mean/stddev, counting |z| > threshold.

    Two aggregations over the same grouping key (stats, then a broadcast
    join back for the scoring pass) — the group stats table is tiny, so
    the second pass is a map-side broadcast join, not a re-shuffle.

    mean/stddev come from exact decimal first/second moments (not the
    built-in Welford-merge ``stddev_pop``) so both stats — and therefore
    every z-score and the >threshold counts — are identical under any
    partitioning and in the SQL oracle.
    """
    n = F.count(F.lit(1))
    m = dsum(value_col) / n
    m2 = dsum(F.col(value_col) * F.col(value_col), 8) / n
    stats = events.groupBy(key_col).agg(
        m.alias("__mean"),
        F.sqrt(F.greatest(m2 - m * m, F.lit(0.0))).alias("__sd"),
    )
    z = (F.col(value_col) - F.col("__mean")) / F.col("__sd")
    scored = events.join(F.broadcast(stats), key_col).select(
        F.col(key_col),
        F.when(F.col("__sd") > 0, F.abs(z)).otherwise(F.lit(0.0)).alias("__az"),
    )
    return scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("__az") > threshold).cast("long")).alias("n_outliers"),
        round_half_up(F.max("__az"), 4).alias("max_abs_z"),
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    signup_type: str = "signup",
    type_col: str = "event_type",
    max_weeks: int = 5,
    epoch: str = "2024-01-01",
) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-signup
    week (weeks counted from ``epoch``), counted distinct in each
    subsequent week they show ANY activity — the (cohort_week,
    week_offset, n_active_users) table behind every retention curve.

    Two shuffles (first-signup per user, then the distinct cohort cell
    count); all date math on DATE values derived from the NTZ event
    time, so the matrix is session-timezone-independent.
    """
    signups = (
        events.filter(F.col(type_col) == signup_type)
        .groupBy(user_col)
        .agg(F.min(F.to_date(ts_col)).alias("signup_date"))
    )
    activity = events.select(
        F.col(user_col), F.to_date(ts_col).alias("activity_date")
    ).distinct()
    joined = activity.join(signups, user_col)
    cell = joined.select(
        F.col(user_col),
        F.floor(
            F.datediff("signup_date", F.lit(epoch).cast("date")) / 7
        ).cast("int").alias("cohort_week"),
        F.floor(F.datediff("activity_date", "signup_date") / 7).cast("int").alias(
            "week_offset"
        ),
    ).filter((F.col("week_offset") >= 0) & (F.col("week_offset") < max_weeks))
    return cell.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct(user_col).alias("n_active_users")
    )


def scd2_states(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    key's event stream into contiguous state intervals — one row per
    state *run* with ``valid_from``/``valid_to`` (NULL = current) and a
    per-key version number. This is the CDC-to-dimension-table step of a
    warehouse load: the importer's per-entity event feed becomes a
    point-in-time joinable history.

    Run-length collapsing is the lag≠current trick: keep rows where the
    state differs from the previous row, then stitch ``valid_to`` from
    the NEXT kept row's timestamp. Both windows share one partitioning
    (key, ordered by ts/id) — a single shuffle keyed on the entity id,
    state bounded by a row per partition per window; no global sort at
    any scale.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    changed = (
        events.select(key_col, state_col, ts_col, id_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(
            F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    return changed.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.date_format(ts_col, _TS_FMT).alias("valid_from"),
        F.date_format(F.lead(ts_col).over(w2), _TS_FMT).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def mad_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group anomaly screen: flag values whose modified
    z-score |x - median| / (1.4826·MAD) exceeds ``threshold``. Unlike
    ``zscore_outliers``, the median/MAD stats are themselves immune to
    the outliers being hunted — the estimator of choice for value
    columns with heavy tails.

    Three passes over a two-column projection: group medians, MAD
    (median of absolute deviations), then the flagging aggregate; the
    stats tables are dimension-sized, so passes 2–3 join them broadcast.
    Group medians use exact ``percentile`` (sorted-middle semantics,
    identical to the oracle's quantile_cont) — exact per-group medians
    buffer the group in one aggregation buffer, so at 100 TB swap in
    ``approx_percentile`` or ``histogram_quantiles`` (the mergeable
    sketch path); kept exact here to stay bit-comparable in SQL.
    """
    slim = events.select(F.col(key_col), F.col(value_col).cast("double").alias("v"))
    med = slim.groupBy(key_col).agg(
        F.expr("percentile(v, 0.5)").alias("__med"),
        F.count(F.lit(1)).alias("n_events"),
    )
    dev = slim.join(F.broadcast(med), key_col).select(
        F.col(key_col), F.col("n_events"), F.col("__med"),
        F.abs(F.col("v") - F.col("__med")).alias("__ad"),
    )
    mad = dev.groupBy(key_col).agg(
        F.expr("percentile(__ad, 0.5)").alias("__mad")
    )
    scored = dev.join(F.broadcast(mad), key_col).select(
        F.col(key_col), F.col("n_events"), F.col("__med"), F.col("__mad"),
        (F.col("__ad") > F.lit(threshold) * F.lit(1.4826) * F.col("__mad")).alias(
            "__out"
        ),
    )
    return scored.groupBy(key_col, "n_events").agg(
        round_half_up(F.first("__med"), 6).alias("median_val"),
        round_half_up(F.first("__mad"), 6).alias("mad_val"),
        F.sum(F.col("__out").cast("long")).alias("n_outliers"),
    )


def hourly_seasonal_profile(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day seasonal baseline per event type: event share and
    mean value for each of the 24 wall-clock hours, with each hour's
    deviation from the type's flat-profile expectation (share × 24 — a
    ratio of 1.0 means no seasonality in that hour). The time-dimension
    complement of the value-dimension anomaly screens
    (``zscore_outliers`` / ``mad_outliers``): together they answer
    "is this hour's traffic unusual" and "are these values unusual".

    One scan, one (type, hour) aggregate (≤ 24·|types| rows), exact
    decimal value sums; hour comes from the NTZ wall time, so the
    profile is session-timezone-independent.
    """
    hr = F.hour(ts_col)
    cell = events.groupBy(F.col(key_col), hr.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        round_half_up(dsum(value_col) / F.count(F.lit(1)), 6).alias(
            "mean_value"
        ),
    )
    tot = cell.groupBy(key_col).agg(F.sum("n_events").alias("__tot"))
    return cell.join(F.broadcast(tot), key_col).select(
        key_col,
        "hour",
        "n_events",
        "mean_value",
        round_half_up(
            F.col("n_events") / F.col("__tot") * F.lit(24.0), 6
        ).alias("load_ratio"),
    )


def cusum_drift(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key CUSUM change-point screen over the daily event-count
    series: S_i = Σ_{j≤i} (x_j − x̄). The day where |S| peaks is the
    most likely level-shift point, and max|S| / (σ·√n) is the
    scale-free drift statistic (≳1.36 ≈ the 95% Kolmogorov–Smirnov
    band) — the monitoring twin of ``length_drift_psi`` for volume
    rather than distribution shape.

    Shape: one (key, day) count aggregate (map-side combined), per-key
    mean/σ broadcast back, then ONE ordered cumulative-sum window
    PARTITIONED BY KEY — the window input is days-per-key rows (≤ a few
    thousand for years of data), never event rows, so the sort is
    bounded regardless of event volume.
    """
    daily = events.groupBy(
        F.col(key_col), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    stats = daily.groupBy(key_col).agg(
        F.avg("x").alias("__mean"),
        F.stddev_pop("x").alias("__sd"),
        F.count(F.lit(1)).alias("n_days"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("day")
    cum = (
        daily.join(F.broadcast(stats), key_col)
        .withColumn("__s", F.sum(F.col("x") - F.col("__mean")).over(w))
    )
    peak = F.struct(
        F.abs(F.col("__s")).alias("a"), F.col("day").alias("d")
    )
    sd = F.first("__sd")
    return cum.groupBy(key_col, "n_days").agg(
        round_half_up(F.max(F.abs(F.col("__s"))), 4).alias("max_cusum"),
        F.max(peak).getField("d").alias("peak_day"),
        round_half_up(
            F.when(
                sd > 0,
                F.max(F.abs(F.col("__s")))
                / (sd * F.sqrt(F.first("n_days").cast("double"))),
            ),
            4,
        ).alias("drift_stat"),
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next = b | current = a) with counts — the behavioral-sequence
    model behind session simulation, anomaly screens ("this transition
    never happens"), and next-event prediction baselines.

    One ``lead`` window PARTITIONED BY USER (per-user streams are
    shuffle-group-sized, never a global sort), ordered by (ts, event_id)
    so simultaneous events have an engine-independent order; then two
    dimension-sized aggregates (|types|² cells). Stream ends contribute
    no transition (lead is NULL).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    seq = events.select(
        F.col(user_col),
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        round_half_up(F.col("n") / F.col("tot"), digits).alias("prob"),
    )


def first_touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    digits: int = 6,
) -> DataFrame:
    """First-touch conversion attribution: every conversion event is
    credited to the CHANNEL (event type) of the user's first-ever
    non-conversion touch before it; conversions with no prior touch
    credit the '(none)' channel. Output per channel: conversions
    attributed and share — the classic marketing-attribution rollup,
    and the template for last-touch/linear variants (swap the running
    aggregate).

    One running ``first`` window per user ordered by (ts, event_id) with
    rows BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING — the prefix
    aggregate form, per-user partitions, no self-join against the
    event history. Channel rollup is dimension-sized.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    attributed = (
        events.select(
            F.col(user_col),
            F.col(type_col),
            F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        )
        .filter(F.col(type_col) == conversion_type)
        .select(F.coalesce(F.col("first_touch"), F.lit("(none)")).alias("channel"))
    )
    counts = attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )
    total = counts.agg(F.sum("n_conversions").alias("tot"))
    return counts.crossJoin(F.broadcast(total)).select(
        "channel",
        "n_conversions",
        round_half_up(F.col("n_conversions") / F.col("tot"), digits).alias("share"),
    )


def sequence_anomaly_scores(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    digits: int = 4,
) -> DataFrame:
    """Per-user sequence anomaly score under the corpus' own first-order
    Markov model: each user's mean transition log-likelihood and their
    rarest transition's probability — users doing statistically unusual
    THINGS-IN-ORDER (bot loops, scraping sweeps, broken clients) score
    low even when every individual event looks normal. The direct
    consumer of ``markov_transitions``.

    Shape: the transition matrix is |types|² — broadcast back onto the
    per-user lead-window stream (same window as the matrix build, so
    the tie-break (ts, event_id) is shared); one per-user aggregate.
    Mean log-likelihood rounds to 4 decimals (order-dependent double
    log-sum, the unigram_logprob precedent).
    """
    probs = markov_transitions(
        events, user_col, type_col, ts_col, id_col, digits=10
    ).select("from_type", "to_type", "prob")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    seq = events.select(
        F.col(user_col),
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    scored = seq.join(F.broadcast(probs), ["from_type", "to_type"])
    return scored.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        round_half_up(F.avg(F.log("prob")), digits).alias("mean_logprob"),
        round_half_up(F.min("prob"), 6).alias("min_transition_prob"),
    )


def active_user_curves(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """DAU / WAU / MAU: per calendar day, the EXACT count of distinct
    users active that day, in the trailing 7 days, and in the trailing
    28 days — the product-analytics headline triple.

    Exact trailing-window distincts without a window function or a
    range self-join: each distinct (user, active day) row is exploded
    into the ≤28 observation days it contributes to (a pure map-side
    ``sequence`` fan-out — bounded 28×, no shuffle), then ONE aggregate
    per observation day computes the three conditional distinct counts;
    a semi-join against the real-day set drops the trailing phantom
    days after the last event. At 100 TB this is the standard
    "contribute-forward" reformulation: shuffle keys are calendar days,
    state per day is the distinct-user set of one day's aggregate, and
    no task ever sees a 28-day range join.
    """
    d = (
        events.select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("day")
        )
        .distinct()
    )
    real_days = d.select("day").distinct()
    fan = d.select(
        "u",
        "day",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 27))
        ).alias("obs_day"),
    ).join(F.broadcast(real_days.select(F.col("day").alias("obs_day"))), "obs_day")
    diff = F.datediff("obs_day", "day")
    return (
        fan.groupBy("obs_day")
        .agg(
            F.countDistinct(F.when(diff == 0, F.col("u"))).alias("dau"),
            F.countDistinct(F.when(diff < 7, F.col("u"))).alias("wau"),
            F.countDistinct(F.when(diff < 28, F.col("u"))).alias("mau"),
        )
        .select(F.col("obs_day").alias("day"), "dau", "wau", "mau")
    )


def ewma_daily(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    alpha: float = 0.3,
    window_days: int = 14,
    digits: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average of the daily mean
    value, truncated to a trailing ``window_days`` window — the
    smoothed trend line a monitoring dashboard draws over noisy daily
    metrics (EWMA reacts to level shifts faster than a flat moving
    average while still damping single-day spikes).

    ewma(key, t) = Σ_{o<W} (1−α)^o · x_{t−o} / Σ_{o<W, day present} (1−α)^o
    — the weight-normalized (missing-day-aware) truncated EWMA.
    Computed with the same contribute-forward fan-out as
    ``active_user_curves``: each (key, day) daily mean explodes to the
    ≤``window_days`` observation days it contributes to (bounded
    map-side fan-out, no range self-join, no recursion — the closed
    form is what makes EWMA expressible at 100 TB without a sequential
    scan), then one aggregate per (key, obs day). Daily means and the
    weighted sums are decimal-exact (9-dp-rounded contributions,
    ``dsum``) so the result is identical under any partitioning and in
    the SQL oracle. Phantom days after the last event are dropped by a
    semi-join against the real (key, day) set.
    """
    daily = (
        events.select(
            F.col(key_col),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy(key_col, "day")
        .agg((dsum("v", 6) / F.count(F.lit(1))).alias("x"))
    )
    real = daily.select(F.col(key_col), F.col("day").alias("obs_day"))
    fan = daily.select(
        F.col(key_col),
        "day",
        "x",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
        ).alias("obs_day"),
    ).join(real, [key_col, "obs_day"])
    wgt = round_half_up(
        F.pow(F.lit(1.0 - alpha), F.datediff("obs_day", "day")), 9
    )
    contrib = round_half_up(F.col("x") * wgt, 9)
    return (
        fan.groupBy(key_col, "obs_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_in_window"),
            round_half_up(
                dsum(contrib, 12) / dsum(wgt, 12), digits
            ).alias("ewma_value"),
        )
        .select(
            F.col(key_col),
            F.col("obs_day").alias("day"),
            "n_days_in_window",
            "ewma_value",
        )
    )


def seasonal_adjusted_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.5,
    digits: int = 6,
) -> DataFrame:
    """Seasonality-aware anomaly screen: residual = value − the group's
    (hour-of-week) median, flagged by the modified z-score
    |residual| > threshold·1.4826·MAD(residuals) — the upgrade over the
    plain MAD screen for metrics with strong weekly rhythm, where a
    Sunday-3am lull would otherwise read as an anomaly and a
    Monday-9am spike would hide inside the global spread.

    Three bounded aggregates: per-(key, hour-of-week) exact medians
    (≤ |keys|·168 groups — the seasonal profile), residuals via a
    broadcast join of that profile, then per-key MAD + the flag count.
    Same exact-``percentile`` determinism contract as ``mad_outliers``.
    """
    slim = events.select(
        F.col(key_col),
        (F.dayofweek(ts_col) * 24 + F.hour(ts_col)).alias("how"),
        F.col(value_col).cast("double").alias("v"),
    )
    prof = slim.groupBy(key_col, "how").agg(
        F.expr("percentile(v, 0.5)").alias("__season")
    )
    resid = slim.join(F.broadcast(prof), [key_col, "how"]).select(
        F.col(key_col), (F.col("v") - F.col("__season")).alias("__r")
    )
    mad = resid.groupBy(key_col).agg(
        F.expr("percentile(abs(__r), 0.5)").alias("__mad"),
        F.count(F.lit(1)).alias("n_events"),
    )
    flagged = resid.join(F.broadcast(mad), key_col).select(
        F.col(key_col),
        F.col("n_events"),
        F.col("__mad"),
        (F.abs(F.col("__r")) > F.lit(threshold * 1.4826) * F.col("__mad")).alias(
            "__out"
        ),
        F.abs(F.col("__r")).alias("__ar"),
    )
    return flagged.groupBy(key_col, "n_events").agg(
        round_half_up(F.first("__mad"), digits).alias("resid_mad"),
        F.sum(F.col("__out").cast("long")).alias("n_anomalies"),
        round_half_up(F.max("__ar"), digits).alias("max_abs_resid"),
    )


def session_conversion(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
    convert_type: str = "purchase",
) -> DataFrame:
    """Gap-based sessionization + conversion: split each user's event
    stream into sessions at >``gap_minutes`` silences, then report how
    many sessions contain a ``convert_type`` event — the canonical
    product-analytics funnel denominator ("conversion per session",
    not per user or per event).

    One lag window PARTITIONED PER USER assigns session ids (running
    sum of gap-breaks — no global ordering anywhere), then a per-
    session any() aggregate and one final bounded rollup. At 100 TB the
    state is each user's events in one partition — the same
    partitioning every per-user operator here shuffles to, so
    consecutive session operators reuse it.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(type_col))
    es = _epoch_seconds(ts_col)  # NTZ-safe wall-clock seconds
    with_gap = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(type_col),
        (
            F.coalesce(es - F.lag(es).over(w), F.lit(0))
            > gap_minutes * 60
        ).cast("long").alias("__brk"),
    )
    sess = with_gap.select(
        F.col(user_col),
        F.col(type_col),
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__sid"),
    )
    per_sess = sess.groupBy(user_col, "__sid").agg(
        F.max((F.col(type_col) == convert_type).cast("int")).alias("__conv"),
        F.count(F.lit(1)).alias("__n"),
    )
    return per_sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("__conv").cast("long").alias("n_converted"),
        round_half_up(F.sum("__conv") / F.count(F.lit(1)), 6).alias(
            "conversion_rate"
        ),
        round_half_up(F.avg("__n"), 6).alias("avg_session_events"),
    )


def linear_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    channels: tuple = ("view", "click", "signup", "error"),
    digits: int = 6,
) -> DataFrame:
    """Linear (fractional-credit) conversion attribution: each
    conversion splits one unit of credit across the user's PRIOR
    touches in proportion to per-channel touch counts — the standard
    upgrade over first-touch when mid-funnel channels deserve credit;
    conversions with no prior touch credit '(none)'.

    Shape: one prefix-count window PER CHANNEL per user (channels are a
    BOUNDED enum, so this is a fixed handful of running sums over the
    same per-user sort — Spark evaluates them in one window pass), then
    a per-channel rollup. No join against the event history, no
    per-(conversion, touch) pair materialization — the trick that keeps
    linear attribution one-pass at 100 TB.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = {
        ch: F.sum((F.col(type_col) == ch).cast("long")).over(w)
        for ch in channels
    }
    conv = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(type_col),
        *[prior[ch].alias(f"__n_{i}") for i, ch in enumerate(channels)],
    ).filter(F.col(type_col) == conversion_type)
    tot = sum(
        (F.coalesce(F.col(f"__n_{i}"), F.lit(0)) for i in range(len(channels))),
        F.lit(0),
    )
    per_channel = []
    for i, ch in enumerate(channels):
        share = F.when(
            tot > 0, F.coalesce(F.col(f"__n_{i}"), F.lit(0)) / tot
        ).otherwise(F.lit(0.0))
        per_channel.append(
            conv.agg(
                round_half_up(dsum(round_half_up(share, 9), 9), digits).alias(
                    "credit"
                )
            ).select(F.lit(ch).alias("channel"), "credit")
        )
    none_credit = conv.agg(
        F.sum((tot == 0).cast("long")).cast("double").alias("credit")
    ).select(F.lit("(none)").alias("channel"), round_half_up(F.col("credit"), digits).alias("credit"))
    out = per_channel[0]
    for p in per_channel[1:]:
        out = out.unionByName(p)
    return out.unionByName(none_credit)


def monthly_seasonality(
    orders: DataFrame,
    ts_col: str = "o_orderdate",
    digits: int = 6,
) -> DataFrame:
    """Classic seasonal decomposition read-out on monthly order volume:
    per calendar month the order count, a centered 13-month moving-
    average trend, and the seasonal index count/trend — the first chart
    of any demand-planning review, and the deseasonalization factor a
    forecasting pipeline divides by.

    One month-grain aggregate (bounded: one row per month in the data),
    then a rows-frame window over the BOUNDED month table. Months at
    the series edges (incomplete ±6 window) report the partial-window
    average — flagged by n_window.
    """
    monthly = orders.groupBy(
        F.date_format(F.col(ts_col), "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("month").rowsBetween(-6, 6)
    with_trend = monthly.select(
        "month",
        "n_orders",
        F.count(F.lit(1)).over(w).alias("n_window"),
        (F.sum("n_orders").over(w) / F.count(F.lit(1)).over(w)).alias("__ma"),
    )
    return with_trend.select(
        "month",
        "n_orders",
        "n_window",
        round_half_up(F.col("__ma"), digits).alias("trend_ma"),
        round_half_up(F.col("n_orders") / F.col("__ma"), digits).alias(
            "seasonal_index"
        ),
    )


def burst_days(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    multiplier: float = 3.0,
    digits: int = 6,
) -> DataFrame:
    """Burst detection on daily counts: a (key, day) is a burst when its
    count exceeds ``multiplier`` × the median of the TRAILING 7
    observed days — the spike screen that a plain z-score misses when
    the history itself is spiky (median base, not mean).

    One daily aggregate, then a per-key rows(-7, -1) frame collecting
    the ≤7 trailing counts and taking their exact middle (sorted-array
    median — identical interpolation to the oracle's windowed
    quantile_cont). Windows partition per key over day-grain rows —
    bounded rows per key by the calendar, never by event volume.
    Output only the burst rows (day, count, trailing median, ratio).
    """
    daily = events.groupBy(
        F.col(key_col), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    arr = F.array_sort(F.collect_list(F.col("n").cast("double")).over(w))
    k = F.size(arr)
    mid_hi = ((k + 2) / 2).cast("int")  # ceil((k+1)/2) for even k
    med = F.when(
        k % 2 == 1, F.element_at(arr, ((k + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(arr, (k / 2).cast("int"))
            + F.element_at(arr, mid_hi)
        )
        / 2.0
    )
    scored = daily.select(
        F.col(key_col),
        "day",
        "n",
        F.when(k >= 3, med).alias("__med"),
    )
    return (
        scored.filter(
            F.col("__med").isNotNull()
            & (F.col("n") > F.lit(multiplier) * F.col("__med"))
        )
        .select(
            F.col(key_col),
            "day",
            F.col("n").alias("n_events"),
            round_half_up(F.col("__med"), digits).alias("trailing_median"),
            round_half_up(F.col("n") / F.col("__med"), digits).alias("burst_ratio"),
        )
    )


def churn_hazard(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Discrete (weekly) churn-hazard curve: for each tenure week w,
    the fraction of users whose LAST activity fell in their w-th week
    among users who survived AT LEAST to week w — the retention team's
    hazard table (where in the lifecycle do we lose people), the
    per-user twin of the document survival curve.

    Per-user first/last timestamps (one aggregate), tenure week, one
    bounded per-week rollup, and a reverse cumulative sum over the
    BOUNDED week table for the at-risk denominators.
    """
    from ..functions.numeric import round_half_up

    es = _epoch_seconds(ts_col)
    per_user = events.groupBy(user_col).agg(
        F.min(es).alias("first_s"), F.max(es).alias("last_s")
    )
    tenure = per_user.select(
        F.floor((F.col("last_s") - F.col("first_s")) / (7 * 24 * 3600))
        .cast("long")
        .alias("tenure_week")
    )
    per_week = tenure.groupBy("tenure_week").agg(
        F.count(F.lit(1)).alias("n_churned")
    )
    w = (
        Window.orderBy(F.desc("tenure_week"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_week.select(
            "tenure_week",
            "n_churned",
            F.sum("n_churned").over(w).alias("n_at_risk"),
        )
        .select(
            "tenure_week",
            "n_churned",
            "n_at_risk",
            round_half_up(F.col("n_churned") / F.col("n_at_risk"), 6).alias(
                "hazard"
            ),
        )
    )


def transition_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    digits: int = 6,
) -> DataFrame:
    """Per-state predictability of the behavioral Markov chain: Shannon
    entropy (nats) and perplexity of each state's next-event
    distribution — the one-number "how deterministic is behavior after
    X" readout on top of ``markov_transitions`` (low-entropy states are
    funnels; high-entropy states are navigation hubs).

    Same per-user lead window and |types|² aggregate as the transition
    matrix; the entropy fold uses 9-dp-rounded −p·ln p terms summed
    exactly over the bounded (from, to) cells.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    seq = events.select(
        F.col(user_col),
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("tot"))
    term = round_half_up(
        -(F.col("n") / F.col("tot")) * F.log(F.col("n") / F.col("tot")), 9
    )
    ent = (
        counts.join(F.broadcast(totals), "from_type")
        .groupBy("from_type", "tot")
        .agg(dsum(term, 9).alias("__h"))
    )
    return ent.select(
        "from_type",
        F.col("tot").cast("long").alias("n_transitions"),
        round_half_up(F.col("__h"), digits).alias("entropy_nats"),
        round_half_up(F.exp(F.col("__h")), digits).alias("perplexity"),
    )


def weekly_autocorrelation(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    lag_days: int = 7,
    digits: int = 6,
) -> DataFrame:
    """Lag-k autocorrelation of the daily count series per key (default
    lag 7 — the weekly rhythm test): Pearson r between day t and day
    t−lag over all aligned day pairs — >0 confirms weekly seasonality
    worth modeling (and justifies the hour-of-week anomaly profile);
    ≈0 says the daily series is memoryless at that lag.

    One daily aggregate, one EQUI-join of the day series against
    itself shifted by ``lag_days`` (no window), then a closed-form
    Pearson over integer count sums — every moment is an exact integer,
    so r is engine-deterministic bit-for-bit.
    """
    daily = events.groupBy(
        F.col(key_col), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    cur = daily.select(
        F.col(key_col), F.col("day"), F.col("n").alias("x")
    )
    prev = daily.select(
        F.col(key_col),
        F.date_add("day", lag_days).alias("day"),
        F.col("n").alias("y"),
    )
    pairs = cur.join(prev, [key_col, "day"])
    n = F.count(F.lit(1))
    num = n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")
    den = F.sqrt(
        (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        * (n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y"))
    )
    return pairs.groupBy(key_col).agg(
        n.cast("long").alias("n_pairs"),
        round_half_up(num / den, digits).alias("lag_autocorr"),
    )


def funnel_steps(
    events: DataFrame,
    steps: tuple = ("view", "click", "signup", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """N-step ORDERED funnel: per user, step i counts only if it
    happens strictly AFTER the user's step-(i−1) completion time — the
    multi-stage generalization of the 2-step view→purchase funnel,
    reported as (step, users reached, conversion from previous step,
    conversion from step 1).

    Implemented as a fixed cascade of per-user min-aggregates: r₁ =
    min ts of step 1; rᵢ = min ts of step i AFTER rᵢ₋₁ (one aggregate
    + one per-user join per step — len(steps) bounded passes, each a
    per-user hash aggregate; no per-user sequence materialization, no
    window over the raw stream). Exact under out-of-order data by
    construction (min-after is order-free).
    """
    reach = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("r"))
    )
    counts = [reach.count()]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(reach, user_col)
            .filter(F.col(ts_col) > F.col("r"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("r"))
        )
        reach = nxt.localCheckpoint(eager=True)  # bounded cascade state
        counts.append(reach.count())
    import math

    def r6(x):  # round-half-up, identical to the SQL oracle's formula
        s = 10 ** digits
        return math.floor(x * s + 0.5) / s

    spark = events.sparkSession
    rows = []
    for i, (step, n) in enumerate(zip(steps, counts)):
        prev = counts[i - 1] if i else counts[0]
        rows.append(
            (
                i + 1,
                step,
                n,
                r6(n / prev) if prev else None,
                r6(n / counts[0]) if counts[0] else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "step int, step_name string, n_users long, "
        "conv_from_prev double, conv_from_first double",
    )


def top_event_paths(
    events: DataFrame,
    path_len: int = 3,
    top_k: int = 10,
) -> DataFrame:
    """Top-k most common length-3 event-type journeys (consecutive
    per-user trigrams ordered by time) — the path-mining summary
    behind "what do users actually do", one level deeper than the
    Markov transition matrix (which only sees bigrams and therefore
    cannot distinguish view→cart→purchase from view→cart→view).

    Two leads over the per-user time window (partitioned by user_id —
    never a global order), a hash aggregate on the bounded
    event-type³ path domain, then TakeOrderedAndProject for the
    top-k (count desc, path asc — deterministic). ``path_len`` is
    fixed at 3; the parameter documents the shape.
    """
    assert path_len == 3, "trigram paths only (lead-window shape)"
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        events.select(
            "user_id",
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
        )
        .where(F.col("step3").isNotNull())
    )
    return (
        tri.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(
            F.desc("n_paths"), F.asc("step1"), F.asc("step2"), F.asc("step3")
        )
        .limit(top_k)
    )


def gap_exponential_gof(
    events: DataFrame,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Exponential goodness-of-fit for inter-event gaps per event type:
    fit λ by maximum likelihood (n/Σgap), then a probability-integral-
    transform chi-square — bin each gap by its fitted CDF decile and
    compare observed counts to the uniform n/10 expectation. A Poisson
    process scores low; bursty or periodic traffic (which breaks
    capacity models that assume exponential arrivals) scores high.
    The companion to ``burst_days``: that one finds WHEN, this one
    quantifies HOW non-Poisson the whole process is.

    Gaps come from one per-(user, type) lag window (never global);
    λ is a per-type aggregate joined back (type-bounded); the CDF
    binning is map-side arithmetic and the final grid is the DENSE
    type × n_bins cross join (zero-observed bins still contribute
    expected mass). χ² terms are 9-dp rounded and decimal-summed.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    t_us = F.expr(
        "timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00', ts)"
    )
    gaps = (
        events.select(
            "event_type",
            (t_us - F.lag(t_us).over(w)).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
        .select("event_type", F.expr("gap_us div 1000000").alias("g"))
    )
    lam = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        (
            F.count(F.lit(1)) / F.sum("g")
        ).alias("lam"),
    )
    binned = (
        gaps.join(lam, "event_type")
        .select(
            "event_type",
            F.least(
                F.floor(
                    n_bins * (1.0 - F.exp(-F.col("lam") * F.col("g")))
                ).cast("int"),
                F.lit(n_bins - 1),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    bins = lam.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    grid = lam.crossJoin(F.broadcast(bins)).join(
        binned, ["event_type", "bin"], "left"
    )
    e = F.col("n_gaps") / F.lit(float(n_bins))
    term = round_half_up(
        (F.coalesce(F.col("o"), F.lit(0)) - e) * (F.coalesce(F.col("o"), F.lit(0)) - e) / e,
        9,
    )
    return (
        grid.groupBy("event_type", "n_gaps", "lam")
        .agg(round_half_up(dsum(term, 9), digits).alias("chi2_gof"))
        .select(
            "event_type",
            "n_gaps",
            round_half_up(F.col("lam") * 3600.0, digits).alias("lambda_per_hour"),
            "chi2_gof",
        )
    )


def position_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    channels: tuple = ("view", "click", "signup", "error"),
    digits: int = 6,
) -> DataFrame:
    """Position-based (U-shaped) conversion attribution: each
    conversion gives 40% of the credit to the user's FIRST prior
    touch, 40% to the LAST touch before converting, and splits the
    remaining 20% across the middle touches — the industry-standard
    compromise between first-touch ("what introduced them") and
    last-touch ("what closed them"). One touch → 100%; two touches →
    50/50; none → '(none)'.

    Same one-pass shape as [linear_attribution]: per-channel prefix
    counts PLUS first/last channel via first_value/last_value (ignore
    nulls) over the same per-user prefix frame — still zero joins
    against history, zero per-(conversion, touch) pairs. Credits are
    9-dp rounded and decimal-summed per channel.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col).isin(list(channels)), F.col(type_col))
    prior = {
        ch: F.sum((F.col(type_col) == ch).cast("long")).over(w)
        for ch in channels
    }
    conv = events.select(
        F.col(user_col),
        F.col(type_col),
        F.first(touch, ignorenulls=True).over(w).alias("__first"),
        F.last(touch, ignorenulls=True).over(w).alias("__last"),
        *[prior[ch].alias(f"__n_{i}") for i, ch in enumerate(channels)],
    ).filter(F.col(type_col) == conversion_type)
    tot = sum(
        (F.coalesce(F.col(f"__n_{i}"), F.lit(0)) for i in range(len(channels))),
        F.lit(0),
    )
    per_channel = []
    for i, ch in enumerate(channels):
        is_first = (F.col("__first") == ch).cast("long")
        is_last = (F.col("__last") == ch).cast("long")
        n_c = F.coalesce(F.col(f"__n_{i}"), F.lit(0))
        credit = (
            F.when(tot == 0, F.lit(0.0))
            .when(tot == 1, is_first.cast("double"))
            .when(
                tot == 2,
                0.5 * is_first.cast("double") + 0.5 * is_last.cast("double"),
            )
            .otherwise(
                0.4 * is_first.cast("double")
                + 0.4 * is_last.cast("double")
                + 0.2 * (n_c - is_first - is_last).cast("double") / (tot - 2)
            )
        )
        per_channel.append(
            conv.agg(
                round_half_up(
                    dsum(round_half_up(credit, 9), 9), digits
                ).alias("credit")
            ).select(F.lit(ch).alias("channel"), "credit")
        )
    none_credit = conv.agg(
        F.sum((tot == 0).cast("long")).cast("double").alias("credit")
    ).select(
        F.lit("(none)").alias("channel"),
        round_half_up(F.col("credit"), digits).alias("credit"),
    )
    out = per_channel[0]
    for p in per_channel[1:]:
        out = out.unionByName(p)
    return out.unionByName(none_credit)


def weekday_index(
    df: DataFrame,
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    digits: int = 6,
) -> DataFrame:
    """Day-of-week seasonal index on order volume and revenue: each
    ISO weekday's share of orders/revenue against the uniform 1/7
    baseline (index > 1 = over-indexed day) — the weekly-grain
    companion to [monthly_seasonality] every staffing / capacity
    review starts from.

    One 7-row aggregate (decimal-exact revenue) plus a 1-row totals
    broadcast. ISO weekday (0 = Monday) so both engines agree on the
    labels without locale state.
    """
    from ..functions.numeric import dsum, round_half_up

    per_dow = df.groupBy(F.weekday(ts_col).alias("iso_weekday")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum(value_col, 4).alias("revenue"),
    )
    tot = per_dow.agg(
        F.sum("n_orders").alias("__tn"),
        F.sum(
            F.col("revenue").cast("decimal(27,4)")
        ).cast("double").alias("__tr"),
    )
    return (
        per_dow.crossJoin(F.broadcast(tot))
        .select(
            "iso_weekday",
            "n_orders",
            round_half_up(F.col("revenue"), 2).alias("revenue"),
            round_half_up(
                F.col("n_orders") / F.col("__tn") * 7.0, digits
            ).alias("order_index"),
            round_half_up(
                F.col("revenue") / F.col("__tr") * 7.0, digits
            ).alias("revenue_index"),
        )
    )


def bot_score_histogram(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_events: int = 10,
) -> DataFrame:
    """Heuristic bot screen over per-user behavior — the traffic-
    quality gate a training-data pipeline runs before user-generated
    text enters a corpus. Four standard signals, each a boolean flag:
    (1) metronome regularity (second-grain inter-event gap CV < 0.5 —
    humans are bursty), (2) sustained rate (> 1 event/minute across
    the whole span), (3) low action diversity (type entropy < 0.5 nats), and
    (4) night-heavy activity (> 30% of events in the 00:00–05:59
    wall-clock hours). The score is how many flags fire; output is
    the score → user-count histogram over users with >=
    ``min_events``.

    One lag window per user (gap moments as exact integer µs sums),
    one (user, type) count for entropy, one hash rollup — all keyed
    by user, no cross-user state. Flag metrics are 9-dp rounded
    BEFORE thresholding so both engines compare identical doubles.
    """
    from ..functions.numeric import round_half_up

    # gap moments in SECONDS: Σgap² at µs grain overflows BIGINT for
    # month-long spans (1e13² ≫ 2⁶³); CV is unit-invariant
    secs = F.expr(
        f"timestampdiff(SECOND, timestamp'1970-01-01 00:00:00', {ts_col})"
    )
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gaps = events.select(
        F.col(user_col),
        (secs - F.lag(secs).over(w)).alias("gap_s"),
    )
    gap_m = gaps.where(F.col("gap_s").isNotNull()).groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_s").cast("long").alias("g1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("long").alias("g2"),
    )
    per_type = events.groupBy(user_col, type_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot_u = per_type.groupBy(user_col).agg(
        F.sum("c").cast("long").alias("n_events")
    )
    # entropy terms are 12-dp rounded then decimal-summed so the ≤
    # |event types| additions are order- and engine-independent before
    # the threshold compare
    ent_term = round_half_up(
        (F.col("c") / F.col("n_events"))
        * F.log(F.col("c") / F.col("n_events")),
        12,
    )
    ent = (
        per_type.join(tot_u, user_col)
        .groupBy(user_col, "n_events")
        .agg(
            round_half_up(-dsum(ent_term, 12), 9).alias("entropy")
        )
    )
    night = events.groupBy(user_col).agg(
        F.sum((F.hour(ts_col) < 6).cast("long")).alias("n_night"),
        (F.max(secs) - F.min(secs)).alias("span_s"),
    )
    j = gap_m.join(ent, user_col).join(night, user_col).where(
        F.col("n_events") >= min_events
    )
    mean_gap = F.col("g1").cast("double") / F.col("n_gaps").cast("double")
    var_gap = (
        F.col("g2").cast("double")
        - F.col("g1").cast("double")
        * F.col("g1").cast("double")
        / F.col("n_gaps").cast("double")
    ) / F.col("n_gaps").cast("double")
    cv = round_half_up(F.sqrt(var_gap) / mean_gap, 9)
    rate_per_min = F.when(
        F.col("span_s") > 0,
        round_half_up(
            F.col("n_events").cast("double")
            / (F.col("span_s").cast("double") / 60.0),
            9,
        ),
    ).otherwise(F.lit(0.0))
    night_share = round_half_up(
        F.col("n_night") / F.col("n_events"), 9
    )
    score = (
        (cv < 0.5).cast("int")
        + (rate_per_min > 1.0).cast("int")
        + (F.col("entropy") < 0.5).cast("int")
        + (night_share > 0.3).cast("int")
    )
    return (
        j.select(score.alias("bot_score"))
        .groupBy("bot_score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("bot_score").cast("long").alias("bot_score"), "n_users")
    )


def out_of_order_audit(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Stream disorder audit: treating ``id_col`` as ARRIVAL order,
    how late does each event land behind the running per-key
    event-time high-water mark? The resulting lateness histogram is
    the exact input for choosing a Structured-Streaming watermark
    delay (pick the bucket that keeps the loss you can tolerate) —
    measured BEFORE deploying the stream, from the same log.

    One running-max window per user over arrival order (NTZ-safe µs),
    then a fixed 5-bucket rollup with a 1-row total for shares.
    """
    from ..functions.numeric import round_half_up

    us = F.expr(
        f"timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00', {ts_col})"
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # first-arrival rows have an empty prefix frame (NULL running max):
    # explicitly on-time, not engine-dependent NULL-in-greatest behavior
    late = events.select(
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce((F.max(us).over(w) - us), F.lit(0)).cast("long"),
        ).alias("late_us")
    )
    bucket = (
        F.when(F.col("late_us") == 0, "0_on_time")
        .when(F.col("late_us") <= 60 * 1000000, "1_under_1m")
        .when(F.col("late_us") <= 300 * 1000000, "2_under_5m")
        .when(F.col("late_us") <= 3600 * 1000000, "3_under_1h")
        .otherwise("4_over_1h")
    )
    hist = late.groupBy(bucket.alias("lateness_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    tot = hist.agg(F.sum("n_events").alias("__t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "lateness_bucket",
        "n_events",
        round_half_up(F.col("n_events") / F.col("__t"), 6).alias("share"),
    )


def dwell_by_transition(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Dwell-time profile per behavioral transition: for every
    consecutive (from → to) event pair within a user's stream, the
    count and mean/max gap in seconds — "how long do users sit on a
    view before they click vs before they bail to an error" — the
    timing layer on top of the Markov transition matrix.

    One lead window per user (the same sort every sequence operator
    reuses), then an integer-exact (from, to) rollup over the
    bounded type-pair domain.
    """
    from ..functions.numeric import round_half_up

    secs = F.expr(
        f"timestampdiff(SECOND, timestamp'1970-01-01 00:00:00', {ts_col})"
    )
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
        (F.lead(secs).over(w) - secs).alias("gap_s"),
    ).where(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        round_half_up(
            F.sum("gap_s").cast("double") / F.count(F.lit(1)), 2
        ).alias("avg_dwell_s"),
        F.max("gap_s").cast("long").alias("max_dwell_s"),
    )


def conversion_latency(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    from_type: str = "view",
    to_type: str = "purchase",
) -> DataFrame:
    """First-exposure → first-conversion latency: per user, the time
    from their FIRST ``from_type`` to the first ``to_type`` at or
    after it, summarized as conversion rate and latency stats — the
    "how long does the funnel take" number next to the funnel's
    "how many make it".

    Two per-user min-aggregates (no windows), one join, then a
    1-row summary; the median uses the exact percentile aggregate
    (scalar — the winsorized_stats contract).
    """
    from ..functions.numeric import round_half_up

    secs = F.expr(
        f"timestampdiff(SECOND, timestamp'1970-01-01 00:00:00', {ts_col})"
    )
    first_from = (
        events.where(F.col(type_col) == from_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(secs).alias("t_from"))
    )
    conv = (
        events.where(F.col(type_col) == to_type)
        .select(F.col(user_col).alias("u"), secs.alias("t_to"))
        .join(first_from, "u")
        .where(F.col("t_to") >= F.col("t_from"))
        .groupBy("u", "t_from")
        .agg(F.min("t_to").alias("t_conv"))
        .select("u", (F.col("t_conv") - F.col("t_from")).alias("lat_s"))
    )
    n_exposed = first_from.agg(
        F.count(F.lit(1)).cast("long").alias("n_users_exposed")
    )
    agg = conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.sum("lat_s").cast("long").alias("__s"),
        F.expr("percentile(lat_s, 0.5)").alias("__p50"),
    )
    return n_exposed.crossJoin(agg).select(
        "n_users_exposed",
        "n_converted",
        round_half_up(
            F.col("n_converted") / F.col("n_users_exposed"), 6
        ).alias("conversion_rate"),
        round_half_up(
            F.col("__s").cast("double") / F.col("n_converted"), 2
        ).alias("avg_latency_s"),
        round_half_up(F.col("__p50"), 2).alias("p50_latency_s"),
    )


def session_bounce_stats(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    user_col: str = "user_id",
) -> DataFrame:
    """Session bounce accounting over gap-based sessions: how many
    sessions contain exactly ONE event (the bounce), the bounce
    rate, and the session-depth profile — the engagement headline
    every funnel report opens with.

    One session_window aggregate (the built-in gap-based session
    operator — partial-aggregated, one shuffle on (user, session)),
    then a bounded rollup over session sizes. Returns one row:
    (n_sessions, n_bounces, bounce_rate, avg_events_per_session,
    max_events_per_session).
    """
    from ..functions.numeric import round_half_up

    sess = events.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long"))
        .cast("long")
        .alias("n_bounces"),
    ).select(
        "n_sessions",
        "n_bounces",
        round_half_up(
            F.col("n_bounces") / F.col("n_sessions"), 6
        ).alias("bounce_rate"),
    ).crossJoin(
        sess.agg(
            round_half_up(
                F.sum("n_events").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_events_per_session"),
            F.max("n_events").cast("long").alias("max_events_per_session"),
        )
    )


def markov_stationary_distribution(
    events: DataFrame,
    iterations: int = 8,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    digits: int = 6,
) -> DataFrame:
    """Stationary distribution of the behavioral Markov chain: iterate
    π ← πP ``iterations`` times from uniform over the (bounded,
    |event types|²) transition matrix of ``markov_transitions`` — the
    "where does a user session spend its time in the long run" summary
    that a single-step transition table can't answer.

    The matrix is BOUNDED STATE (type-vocabulary sized), so collecting
    it to the driver is the manifest-scalar class of fetch (same
    contract as BPE's per-round argmax); the power iteration runs in
    Python with π rounded to 9 dp per step, replayable exactly by an
    unrolled SQL recurrence. Transition probabilities are exact
    integer-count ratios.

    Output: one row per state — stationary_prob plus the state's total
    outgoing transition count.
    """
    import math

    counts = (
        markov_transitions(
            events, user_col, type_col, ts_col, id_col, digits=9
        )
        .select("from_type", "to_type", "n")
        .collect()  # bounded: |event types|² rows
    )
    states = sorted({r["from_type"] for r in counts} | {r["to_type"] for r in counts})
    tot = {s: 0 for s in states}
    for r in counts:
        tot[r["from_type"]] += r["n"]
    p = {
        (r["from_type"], r["to_type"]): r["n"] / tot[r["from_type"]]
        for r in counts
    }

    def r9(x: float) -> float:
        return math.floor(x * 1e9 + 0.5) / 1e9

    pi = {s: r9(1.0 / len(states)) for s in states}
    for _ in range(iterations):
        nxt = {}
        for b in states:
            acc = 0.0
            for a in states:  # fixed sorted-state fold order
                acc += pi[a] * p.get((a, b), 0.0)
            nxt[b] = r9(acc)
        pi = nxt
    rows = [
        (s, math.floor(pi[s] * 10**digits + 0.5) / 10**digits, tot.get(s, 0))
        for s in states
    ]
    return events.sparkSession.createDataFrame(
        rows, "event_type string, stationary_prob double, n_out bigint"
    )
