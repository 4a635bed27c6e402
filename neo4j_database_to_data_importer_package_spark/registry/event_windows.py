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

# Batch window aggregation over events (tumbling / sliding / session)
# ---------------------------------------------------------------------------

@register(
    "window_tumbling_events",
    f"""SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
               strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '{_TS_FMT_DUCK}') AS window_end,
               event_type, count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value,
               floor(({_dsum('value')} / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
        FROM events GROUP BY 1, 2, 3""",
)
def window_tumbling_events(spark, sf_dir):
    from ..operators.windows import tumbling_window_agg

    view = _view(spark, sf_dir)
    return tumbling_window_agg(view.tables["events"])


@register(
    "window_sliding_events",
    f"""WITH grid AS (
          SELECT *, date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS s1
          FROM events
        ), expanded AS (
          SELECT event_type, value, s1 AS ws FROM grid
          UNION ALL
          SELECT event_type, value, s1 - INTERVAL 30 MINUTE AS ws FROM grid
        )
        SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start,
               strftime(ws + INTERVAL 1 HOUR, '{_TS_FMT_DUCK}') AS window_end,
               event_type, count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM expanded GROUP BY 1, 2, 3""",
)
def window_sliding_events(spark, sf_dir):
    from ..operators.windows import sliding_window_agg

    view = _view(spark, sf_dir)
    return sliding_window_agg(view.tables["events"])


@register(
    "window_session_events",
    f"""WITH o AS (
          SELECT user_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
          FROM events
        ), m AS (
          SELECT *, CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM o
        ), g AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS grp
          FROM m
        )
        SELECT strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start, user_id,
               count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM g GROUP BY user_id, grp""",
)
def window_session_events(spark, sf_dir):
    from ..operators.windows import session_window_agg

    view = _view(spark, sf_dir)
    return session_window_agg(view.tables["events"])


# ---------------------------------------------------------------------------
