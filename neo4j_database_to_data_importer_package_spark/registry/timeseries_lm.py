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
from .dedup import _TOKS_DUCK

# Time-series features over events: trailing RANGE-frame activity and
# per-group z-score anomaly accounting.
# ---------------------------------------------------------------------------

@register(
    "rolling_user_activity",
    """WITH s AS (
         SELECT user_id, value, epoch_us(ts) AS us FROM events),
       r AS (
         SELECT user_id,
                count(*) OVER w AS n,
                sum(CAST(value AS DECIMAL(27,4))) OVER w AS v
         FROM s
         WINDOW w AS (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW))
       SELECT user_id,
              CAST(max(n) AS BIGINT) AS peak_window_events,
              floor(CAST(max(v) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS peak_window_value
       FROM r GROUP BY 1""",
)
def rolling_user_activity(spark, sf_dir):
    """Per-user peak trailing-3-day activity via an event-time RANGE
    frame on integer microseconds (identical peer semantics in any
    engine); one shuffle on user_id."""
    from ..operators.windows import rolling_range_activity

    view = _view(spark, sf_dir)
    return rolling_range_activity(view.tables["events"])


@register(
    "events_zscore_outliers",
    f"""WITH st AS (
         SELECT event_type,
                {_dsum('value')} / count(*) AS m,
                sqrt(greatest({_dsum('value * value', 8)} / count(*)
                              - ({_dsum('value')} / count(*))
                                * ({_dsum('value')} / count(*)), 0.0)) AS sd
         FROM events GROUP BY 1),
       sc AS (
         SELECT e.event_type,
                CASE WHEN sd > 0 THEN abs((value - m) / sd) ELSE 0.0 END AS az
         FROM events e JOIN st USING (event_type))
       SELECT event_type, count(*) AS n_events,
              CAST(sum(CASE WHEN az > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
              floor(max(az) * 10000.0 + 0.5) / 10000.0 AS max_abs_z
       FROM sc GROUP BY 1""",
)
def events_zscore_outliers(spark, sf_dir):
    """Population z-score anomaly counts per event_type: tiny stats agg
    broadcast back over the events scan — no second shuffle."""
    from ..operators.windows import zscore_outliers

    view = _view(spark, sf_dir)
    return zscore_outliers(view.tables["events"])


# ---------------------------------------------------------------------------
# Corpus bigram LM read-out (top next-tokens per frequent prefix).
# ---------------------------------------------------------------------------

@register(
    "bigram_next_token_topk",
    f"""WITH tok AS (SELECT {_TOKS_DUCK} AS t FROM documents),
        pairs AS (
          SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> {{'w1': t[i], 'w2': t[i + 1]}}), recursive := true)
          FROM tok),
        pc AS (SELECT w1, w2, count(*) AS pair_count FROM pairs GROUP BY 1, 2),
        pt AS (SELECT w1,
                      row_number() OVER (ORDER BY sum(pair_count) DESC, w1) AS pr
               FROM pc GROUP BY 1),
        ranked AS (
          SELECT c.w1, c.w2, CAST(c.pair_count AS BIGINT) AS pair_count,
                 CAST(row_number() OVER (PARTITION BY c.w1
                      ORDER BY c.pair_count DESC, c.w2) AS INT) AS rnk
          FROM pc c JOIN pt ON pt.w1 = c.w1 AND pt.pr <= 20)
        SELECT w1, w2, pair_count, rnk FROM ranked WHERE rnk <= 3""",
)
def bigram_next_token_topk(spark, sf_dir):
    """Bigram LM over the corpus: top-3 next tokens for the 20 most
    frequent prefixes. Map-side-combined (w1, w2) counts; rankings run
    on vocabulary-sized data with the prefix set broadcast back."""
    from ..operators.text_analysis import bigram_next_token_topk as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


# ---------------------------------------------------------------------------
