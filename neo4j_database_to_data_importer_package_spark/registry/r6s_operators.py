"""Round-6 batch 30: circular time-of-day statistics and Burrows'
Delta stylometry — oracle-backed registry entries per the standing
gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)
from .dedup import _TOKS_DUCK


@register(
    "events_circular_hour_stats",
    """WITH t AS (
         SELECT event_type AS key,
                (CAST(strftime(ts, '%H') AS INT) * 3600
                 + CAST(strftime(ts, '%M') AS INT) * 60
                 + CAST(strftime(ts, '%S') AS INT))
                  * (2 * pi() / 86400.0) AS theta
         FROM events),
       agg AS (
         SELECT key, count(*) AS n_events,
                CAST(sum(CAST(floor(cos(theta) * 1000000000.0 + 0.5)
                     / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) AS sc,
                CAST(sum(CAST(floor(sin(theta) * 1000000000.0 + 0.5)
                     / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) AS ss
         FROM t GROUP BY 1)
       SELECT key AS event_type, n_events,
              floor(sqrt(sc * sc + ss * ss) / n_events
                    * 1000000.0 + 0.5) / 1000000.0 AS resultant_length,
              floor(((atan2(ss, sc) / (2 * pi()) * 24.0 + 24.0) % 24.0)
                    * 1000000.0 + 0.5) / 1000000.0 AS mean_hour
       FROM agg""",
)
def events_circular_hour_stats(spark, sf_dir):
    """Circular mean / resultant length of event time-of-day per type —
    the directionally-correct way to average clock times (23:00 and
    01:00 average to midnight, not noon). See
    statistics.circular_hour_stats."""
    from ..operators.statistics import circular_hour_stats

    view = _view(spark, sf_dir)
    return circular_hour_stats(view.tables["events"])


@register(
    "source_burrows_delta",
    f"""WITH terms AS (
         SELECT source AS grp, unnest({_TOKS_DUCK}) AS w FROM documents),
       gt AS (SELECT grp, w, count(*) AS c FROM terms GROUP BY 1, 2),
       gtot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS tot
                FROM gt GROUP BY 1),
       vocab AS (
         SELECT w FROM (SELECT w, CAST(sum(c) AS BIGINT) AS cw
                        FROM gt GROUP BY 1)
         ORDER BY cw DESC, w LIMIT 50),
       ng AS (SELECT count(*) AS k FROM gtot),
       rel AS (
         SELECT gtot.grp, v.w,
                floor(coalesce(gt.c, 0) / CAST(tot AS DOUBLE)
                      * 1000000000.0 + 0.5) / 1000000000.0 AS f
         FROM gtot CROSS JOIN vocab v
         LEFT JOIN gt ON gt.grp = gtot.grp AND gt.w = v.w),
       stats AS (
         SELECT w,
                CAST(sum(CAST(f AS DECIMAL(28,9))) AS DOUBLE)
                  / (SELECT k FROM ng) AS mu,
                CAST(sum(CAST(floor(f * f * 100000000000000.0 + 0.5)
                     / 100000000000000.0 AS DECIMAL(32,14)))
                     AS DOUBLE) AS s2
         FROM rel GROUP BY 1),
       z AS (
         SELECT grp, rel.w,
                (f - mu) / sqrt((s2 - (SELECT k FROM ng) * mu * mu)
                                / ((SELECT k FROM ng) - 1)) AS z
         FROM rel JOIN stats ON rel.w = stats.w)
       SELECT a.grp AS ga, b.grp AS gb, count(*) AS n_terms,
              floor(CAST(sum(CAST(floor(abs(a.z - b.z)
                    * 1000000000.0 + 0.5) / 1000000000.0
                  AS DECIMAL(28,9))) AS DOUBLE) / count(*)
                    * 1000000.0 + 0.5) / 1000000.0 AS delta
       FROM z a JOIN z b ON a.w = b.w AND a.grp < b.grp
       GROUP BY 1, 2""",
)
def source_burrows_delta(spark, sf_dir):
    """Burrows' Delta style distance between every source pair (top-50
    corpus words, z-scored relative frequencies) — the stylometry
    screen for by-source voice differences. See
    text_analysis.burrows_delta."""
    from ..operators.text_analysis import burrows_delta

    view = _view(spark, sf_dir)
    return burrows_delta(view.tables["documents"])
