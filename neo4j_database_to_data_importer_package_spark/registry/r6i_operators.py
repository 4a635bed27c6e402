"""Round-6 batch 20: graph type-mixing matrix, purchase-cadence
profile, token-length histogram, market-share movers, and session
bounce stats — each an oracle-backed registry entry per the standing
gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)


@register(
    "graph_type_mixing_matrix",
    """WITH li AS (SELECT * FROM lineitem WHERE year(l_shipdate) = 1998),
       raw AS (
         SELECT 'O' || l_orderkey AS a, 'P' || l_partkey AS b FROM li
         UNION ALL SELECT 'O' || l_orderkey, 'S' || l_suppkey FROM li
         UNION ALL SELECT 'P' || l_partkey, 'S' || l_suppkey FROM li),
       und AS (
         SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
         FROM raw WHERE a != b),
       sym AS (
         SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
       cell AS (
         SELECT substr(u, 1, 1) AS type_a, substr(v, 1, 1) AS type_b,
                CAST(count(*) AS BIGINT) AS n_ends
         FROM sym GROUP BY 1, 2),
       tot AS (SELECT sum(n_ends) AS m2 FROM cell),
       am AS (SELECT type_a, sum(n_ends) AS na FROM cell GROUP BY 1),
       bm AS (SELECT type_b, sum(n_ends) AS nb FROM cell GROUP BY 1),
       tr AS (
         SELECT coalesce(sum(n_ends), 0) AS diag
         FROM cell WHERE type_a = type_b),
       ab AS (
         SELECT sum(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ab_num
         FROM am JOIN bm ON am.type_a = bm.type_b),
       stats AS (
         SELECT (CAST(diag AS DOUBLE) / CAST(m2 AS DOUBLE)
                 - ab_num / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)))
                / (1.0 - ab_num
                         / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)))
                  AS r
         FROM tr, tot, ab)
       SELECT type_a, type_b, n_ends,
              floor(n_ends / (m2 * 1.0) * 1000000.0 + 0.5) / 1000000.0
                AS share,
              floor(r * 1000000.0 + 0.5) / 1000000.0 AS assortativity_r
       FROM cell, tot, stats""",
)
def graph_type_mixing_matrix(spark, sf_dir):
    """Categorical mixing matrix of the one-ship-year graph's node
    types (order / part / supplier) with Newman's discrete
    assortativity — type-homophily in one number. See
    graph_algos.type_mixing_matrix."""
    from ..operators.graph_algos import type_mixing_matrix
    from .r6_operators import _shipyear_graph

    view = _view(spark, sf_dir)
    return type_mixing_matrix(_shipyear_graph(view))


@register(
    "customer_reorder_intervals",
    """WITH g AS (
         SELECT date_diff('day',
                          lag(o_orderdate) OVER (
                            PARTITION BY o_custkey ORDER BY o_orderdate),
                          o_orderdate) AS gap_d
         FROM orders),
       gg AS (SELECT gap_d FROM g WHERE gap_d IS NOT NULL),
       by_gap AS (SELECT gap_d, count(*) AS c FROM gg GROUP BY 1),
       tot AS (
         SELECT CAST(sum(c) AS BIGINT) AS n_intervals,
                CAST(sum(c * gap_d) AS BIGINT) AS sum_d
         FROM by_gap),
       cum AS (
         SELECT gap_d, c,
                sum(c) OVER (ORDER BY gap_d ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum
         FROM by_gap),
       med AS (
         SELECT (m1.gap_d + m2.gap_d) / 2.0 AS median_gap_d
         FROM (SELECT gap_d FROM cum, tot
               WHERE cum - c < floor((n_intervals + 1) / 2)
                 AND floor((n_intervals + 1) / 2) <= cum) m1,
              (SELECT gap_d FROM cum, tot
               WHERE cum - c < floor((n_intervals + 2) / 2)
                 AND floor((n_intervals + 2) / 2) <= cum) m2),
       hist AS (
         SELECT CAST(floor(log2(gap_d + 1)) AS BIGINT)
                  AS log2_gap_bucket,
                CAST(sum(c) AS BIGINT) AS n_intervals_bucket
         FROM by_gap GROUP BY 1)
       SELECT log2_gap_bucket, n_intervals_bucket, n_intervals,
              floor(CAST(sum_d AS DOUBLE) / n_intervals * 100.0 + 0.5)
                / 100.0 AS mean_gap_d,
              floor(median_gap_d * 10.0 + 0.5) / 10.0 AS median_gap_d
       FROM hist, tot, med""",
)
def customer_reorder_intervals(spark, sf_dir):
    """Purchase-cadence profile: log2-bucketed histogram of days
    between consecutive orders per customer, with exact overall
    mean/median from the bounded gap-domain histogram. See
    analytics.reorder_interval_profile."""
    from ..operators.analytics import reorder_interval_profile

    view = _view(spark, sf_dir)
    return reorder_interval_profile(view.tables["orders"])


@register(
    "token_length_histogram",
    """WITH tok AS (
         SELECT unnest(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) AS t
         FROM documents),
       h AS (
         SELECT length(t) AS tok_len,
                CAST(count(*) AS BIGINT) AS n_tokens
         FROM tok GROUP BY 1),
       tot AS (SELECT sum(n_tokens) AS tt FROM h)
       SELECT CAST(tok_len AS BIGINT) AS tok_len, n_tokens,
              floor(n_tokens / (tt * 1.0) * 1000000.0 + 0.5) / 1000000.0
                AS share
       FROM h, tot""",
)
def token_length_histogram(spark, sf_dir):
    """Token character-length histogram by occurrence with shares —
    the tokenizer-planning companion to fertility (a 20+-char tail is
    the URL/hash contamination tell). See
    text_analysis.token_length_histogram."""
    from ..operators.text_analysis import token_length_histogram as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "supplier_share_shift",
    """WITH a AS (
         SELECT l_suppkey AS key,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(27,4))) AS DOUBLE) AS rev
         FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1),
       ta AS (SELECT CAST(sum(CAST(rev AS DECIMAL(27,4))) AS DOUBLE)
                AS t FROM a),
       sa AS (
         SELECT key, floor(rev / t * 1000000000.0 + 0.5) / 1000000000.0
                  AS share_a
         FROM a, ta),
       b AS (
         SELECT l_suppkey AS key,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(27,4))) AS DOUBLE) AS rev
         FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
       tb AS (SELECT CAST(sum(CAST(rev AS DECIMAL(27,4))) AS DOUBLE)
                AS t FROM b),
       sb AS (
         SELECT key, floor(rev / t * 1000000000.0 + 0.5) / 1000000000.0
                  AS share_b
         FROM b, tb),
       j AS (
         SELECT coalesce(sa.key, sb.key) AS key,
                coalesce(share_a, 0.0) AS share_a,
                coalesce(share_b, 0.0) AS share_b
         FROM sa FULL OUTER JOIN sb ON sa.key = sb.key)
       SELECT CAST(key AS BIGINT) AS l_suppkey,
              floor(share_a * 1000000.0 + 0.5) / 1000000.0 AS share_a,
              floor(share_b * 1000000.0 + 0.5) / 1000000.0 AS share_b,
              floor((share_b - share_a) * 1000000.0 + 0.5) / 1000000.0
                AS share_delta
       FROM j ORDER BY abs(share_b - share_a) DESC, key LIMIT 20""",
)
def supplier_share_shift(spark, sf_dir):
    """Top-20 suppliers by absolute revenue-share change 1995 → 1996
    (share-based, market-growth-immune; TakeOrdered, no windows).
    See analytics.share_shift_leaderboard."""
    from ..operators.analytics import share_shift_leaderboard

    view = _view(spark, sf_dir)
    return share_shift_leaderboard(view.tables["lineitem"])


@register(
    "events_session_bounce",
    """WITH o AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
          FROM events),
        m AS (
          SELECT *, CASE WHEN pts IS NULL
                          OR ts - pts >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS brk
          FROM o),
        g AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS grp
          FROM m),
        sess AS (
          SELECT user_id, grp, count(*) AS n_events
          FROM g GROUP BY 1, 2),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                 CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_bounces,
                 CAST(sum(n_events) AS BIGINT) AS tot_ev,
                 CAST(max(n_events) AS BIGINT) AS max_events_per_session
          FROM sess)
        SELECT n_sessions, n_bounces,
               floor(n_bounces / (n_sessions * 1.0) * 1000000.0 + 0.5)
                 / 1000000.0 AS bounce_rate,
               floor(CAST(tot_ev AS DOUBLE) / n_sessions * 10000.0 + 0.5)
                 / 10000.0 AS avg_events_per_session,
               max_events_per_session
        FROM agg""",
)
def events_session_bounce(spark, sf_dir):
    """Session bounce accounting over 30-minute-gap sessions: bounce
    count/rate and the session-depth profile — the engagement
    headline. See windows.session_bounce_stats."""
    from ..operators.windows import session_bounce_stats

    view = _view(spark, sf_dir)
    return session_bounce_stats(view.tables["events"])
