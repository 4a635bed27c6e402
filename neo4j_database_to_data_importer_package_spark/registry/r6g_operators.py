"""Round-6 batch 18: customer value-tier migration, language-ID
confidence margins, transition dwell times, funnel conversion latency,
and ABC (Pareto) revenue classification — each an oracle-backed
registry entry per the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)
from .dedup import _TOKS_DUCK
from .text import _LANG_LISTS_DUCK

_SECS = "date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)"


@register(
    "customer_value_tier_migration",
    """WITH a AS (
         SELECT o_custkey AS cust,
                CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                  AS v
         FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
       qa AS (SELECT quantile_cont(v, 0.25) AS q1,
                     quantile_cont(v, 0.50) AS q2,
                     quantile_cont(v, 0.75) AS q3 FROM a),
       ta AS (
         SELECT cust,
                CASE WHEN v <= q1 THEN 'T1_low'
                     WHEN v <= q2 THEN 'T2'
                     WHEN v <= q3 THEN 'T3'
                     ELSE 'T4_top' END AS tier_from
         FROM a, qa),
       b AS (
         SELECT o_custkey AS cust,
                CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                  AS v
         FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
       qb AS (SELECT quantile_cont(v, 0.25) AS q1,
                     quantile_cont(v, 0.50) AS q2,
                     quantile_cont(v, 0.75) AS q3 FROM b),
       tb AS (
         SELECT cust,
                CASE WHEN v <= q1 THEN 'T1_low'
                     WHEN v <= q2 THEN 'T2'
                     WHEN v <= q3 THEN 'T3'
                     ELSE 'T4_top' END AS tier_to
         FROM b, qb),
       j AS (
         SELECT coalesce(tier_from, '(absent)') AS tier_from,
                coalesce(tier_to, '(absent)') AS tier_to
         FROM ta FULL OUTER JOIN tb USING (cust)),
       cell AS (
         SELECT tier_from, tier_to,
                CAST(count(*) AS BIGINT) AS n_customers
         FROM j GROUP BY 1, 2),
       t AS (SELECT sum(n_customers) AS tt FROM cell)
       SELECT tier_from, tier_to, n_customers,
              floor(n_customers / (tt * 1.0) * 1000000.0 + 0.5)
                / 1000000.0 AS share
       FROM cell, t""",
)
def customer_value_tier_migration(spark, sf_dir):
    """Customer revenue-quartile migration matrix 1995 → 1996
    (within-period percentile thresholds, '(absent)' for one-sided
    activity) — the segment-migration churn/upsell table. See
    analytics.value_tier_migration."""
    from ..operators.analytics import value_tier_migration

    view = _view(spark, sf_dir)
    return value_tier_migration(view.tables["orders"])


@register(
    "language_id_margin",
    f"""WITH lscore AS (
          SELECT doc_id,
                 {", ".join(f"len(list_intersect(list_distinct({_TOKS_DUCK}), {lst})) AS score_{lang}" for lang, lst in _LANG_LISTS_DUCK.items())}
          FROM documents),
        scored AS (
          SELECT CASE WHEN greatest(score_de, score_en, score_es,
                                    score_fr, score_zh) = 0 THEN 'und'
                      WHEN score_de = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'de'
                      WHEN score_en = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'en'
                      WHEN score_es = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'es'
                      WHEN score_fr = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'fr'
                      ELSE 'zh' END AS detected_lang,
                 CAST(list_reverse_sort([score_de, score_en, score_es,
                                         score_fr, score_zh])[1]
                      - list_reverse_sort([score_de, score_en, score_es,
                                           score_fr, score_zh])[2]
                      AS BIGINT) AS margin
          FROM lscore)
        SELECT detected_lang, margin,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM scored GROUP BY 1, 2""",
)
def language_id_margin(spark, sf_dir):
    """Language-ID confidence margins (best minus second-best
    stopword score) per detected language — which docs the cheap
    classifier basically guessed on. See
    text_analysis.language_id_margin."""
    from ..operators.text_analysis import language_id_margin as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "events_dwell_by_transition",
    f"""WITH seq AS (
         SELECT event_type AS from_type,
                lead(event_type) OVER w AS to_type,
                lead({_SECS}) OVER w - {_SECS} AS gap_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT from_type, to_type,
              CAST(count(*) AS BIGINT) AS n_transitions,
              floor(CAST(sum(gap_s) AS DOUBLE) / count(*) * 100.0 + 0.5)
                / 100.0 AS avg_dwell_s,
              CAST(max(gap_s) AS BIGINT) AS max_dwell_s
       FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2""",
)
def events_dwell_by_transition(spark, sf_dir):
    """Mean/max dwell seconds per behavioral (from → to) transition —
    the timing layer over the Markov matrix. See
    windows.dwell_by_transition."""
    from ..operators.windows import dwell_by_transition

    view = _view(spark, sf_dir)
    return dwell_by_transition(view.tables["events"])


@register(
    "events_conversion_latency",
    f"""WITH ff AS (
         SELECT user_id AS u, min({_SECS}) AS t_from
         FROM events WHERE event_type = 'view' GROUP BY 1),
       conv AS (
         SELECT e.user_id AS u, ff.t_from,
                min({_SECS}) AS t_conv
         FROM events e JOIN ff ON e.user_id = ff.u
         WHERE e.event_type = 'purchase'
           AND {_SECS} >= ff.t_from
         GROUP BY 1, 2),
       lat AS (SELECT t_conv - t_from AS lat_s FROM conv),
       ne AS (SELECT CAST(count(*) AS BIGINT) AS n_users_exposed FROM ff),
       ag AS (
         SELECT CAST(count(*) AS BIGINT) AS n_converted,
                CAST(sum(lat_s) AS BIGINT) AS s,
                quantile_cont(lat_s, 0.5) AS p50
         FROM lat)
       SELECT n_users_exposed, n_converted,
              floor(n_converted / (n_users_exposed * 1.0)
                    * 1000000.0 + 0.5) / 1000000.0 AS conversion_rate,
              floor(CAST(s AS DOUBLE) / n_converted * 100.0 + 0.5)
                / 100.0 AS avg_latency_s,
              floor(p50 * 100.0 + 0.5) / 100.0 AS p50_latency_s
       FROM ne, ag""",
)
def events_conversion_latency(spark, sf_dir):
    """First-view → first-purchase latency: conversion rate, mean and
    exact median seconds — the funnel's "how long" next to its "how
    many". See windows.conversion_latency."""
    from ..operators.windows import conversion_latency

    view = _view(spark, sf_dir)
    return conversion_latency(view.tables["events"])


@register(
    "part_revenue_abc",
    """WITH rev AS (
         SELECT l_partkey AS key,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(27,4))) AS DOUBLE) AS rev
         FROM lineitem GROUP BY 1),
       t AS (SELECT CAST(sum(CAST(rev AS DECIMAL(27,4))) AS DOUBLE)
               AS tt FROM rev),
       ranked AS (
         SELECT key, rev,
                CAST(sum(CAST(rev AS DECIMAL(27,4))) OVER (
                       ORDER BY rev DESC, key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE) / tt AS cum_share
         FROM rev, t),
       cls AS (
         SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
                     WHEN cum_share <= 0.95 THEN 'B'
                     ELSE 'C' END AS abc_class, rev
         FROM ranked),
       agg AS (
         SELECT abc_class, CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(CAST(rev AS DECIMAL(27,4))) AS DOUBLE) AS r
         FROM cls GROUP BY 1),
       t2 AS (SELECT sum(r) AS tt2 FROM agg)
       SELECT abc_class, n_keys,
              floor(r * 100.0 + 0.5) / 100.0 AS revenue,
              floor(r / tt2 * 1000000.0 + 0.5) / 1000000.0
                AS revenue_share
       FROM agg, t2""",
)
def part_revenue_abc(spark, sf_dir):
    """ABC (Pareto 80/15/5) revenue classification over parts — the
    classic inventory split, with the cumulative window over the
    per-part aggregate (dimension-sized, deciles precedent). See
    analytics.revenue_abc_classes."""
    from ..operators.analytics import revenue_abc_classes

    view = _view(spark, sf_dir)
    return revenue_abc_classes(view.tables["lineitem"])
