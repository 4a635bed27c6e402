"""Round-6 batch 24: RAKE keyword extraction, Kaplan–Meier retention,
RSJ pseudo-relevance-feedback expansion, two-way ANOVA, and the daily
mix-entropy trend — each an oracle-backed registry entry per the
standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)
from .dedup import _TOKS_DUCK

_EN_STOPS = ["the", "a", "of", "and", "to", "in", "is", "it"]
_EN_STOPS_SQL = ", ".join(f"'{w}'" for w in _EN_STOPS)


@register(
    "text_rake_keywords",
    f"""WITH tokd AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
       pos AS (SELECT doc_id, i AS pos, t[i] AS tok
               FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
                     FROM tokd)),
       flag AS (SELECT doc_id, pos, tok,
                       CASE WHEN tok IN ({_EN_STOPS_SQL}) THEN 1 ELSE 0 END
                         AS stop
                FROM pos),
       runs AS (SELECT doc_id, pos, tok, stop,
                       sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS run
                FROM flag),
       phr AS (SELECT doc_id, run,
                      string_agg(tok, ' ' ORDER BY pos) AS phrase,
                      count(*) AS plen
               FROM runs WHERE stop = 0 GROUP BY doc_id, run),
       words AS (SELECT phrase, plen, unnest(string_split(phrase, ' ')) AS w
                 FROM phr),
       wstats AS (SELECT w, count(*) AS freq,
                         CAST(sum(plen) AS BIGINT) AS deg
                  FROM words GROUP BY 1),
       uniqp AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w
                 FROM (SELECT DISTINCT phrase FROM phr)),
       ps AS (SELECT phrase,
                     CAST(sum(CAST(floor(deg / CAST(freq AS DOUBLE)
                          * 1000000000.0 + 0.5) / 1000000000.0
                        AS DECIMAL(28,9))) AS DOUBLE) AS s
              FROM uniqp JOIN wstats USING (w) GROUP BY 1),
       pf AS (SELECT phrase, count(*) AS n_occurrences FROM phr GROUP BY 1)
       SELECT phrase, n_occurrences,
              floor(s * 1000000.0 + 0.5) / 1000000.0 AS rake_score
       FROM ps JOIN pf USING (phrase)
       ORDER BY rake_score DESC, phrase LIMIT 30""",
)
def text_rake_keywords(spark, sf_dir):
    """RAKE top-30 keywords of the document corpus under the English
    stopword separators. See text_analysis.rake_keywords."""
    from ..operators.text_analysis import rake_keywords

    view = _view(spark, sf_dir)
    return rake_keywords(view.tables["documents"], stopwords=_EN_STOPS, k=30)


@register(
    "customer_kaplan_meier",
    """WITH per AS (
         SELECT o_custkey,
                min(CAST(strftime(o_orderdate, '%Y') AS INT) * 12
                    + CAST(strftime(o_orderdate, '%m') AS INT)) AS first_m,
                max(CAST(strftime(o_orderdate, '%Y') AS INT) * 12
                    + CAST(strftime(o_orderdate, '%m') AS INT)) AS last_m
         FROM orders GROUP BY 1),
       endm AS (SELECT max(last_m) AS end_m FROM per),
       life AS (
         SELECT last_m - first_m AS t,
                CASE WHEN last_m <= end_m - 6 THEN 1 ELSE 0 END AS event
         FROM per, endm),
       at_t AS (
         SELECT t, count(*) AS n_at_t, CAST(sum(event) AS BIGINT) AS d
         FROM life GROUP BY 1),
       risk AS (
         SELECT t, d,
                CAST(sum(n_at_t) OVER (ORDER BY t
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS n_risk
         FROM at_t),
       curve AS (
         SELECT t, n_risk, d,
                max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                  OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS dead,
                sum(CASE WHEN d > 0 AND d < n_risk
                         THEN CAST(floor(ln(1 - d / CAST(n_risk AS DOUBLE))
                              * 1000000000.0 + 0.5) / 1000000000.0
                            AS DECIMAL(28,9))
                         ELSE CAST(0 AS DECIMAL(28,9)) END)
                  OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS logs
         FROM risk)
       SELECT t AS t_months, n_risk AS n_at_risk, d AS n_events,
              CASE WHEN dead = 1 THEN 0.0
                   ELSE floor(exp(CAST(logs AS DOUBLE)) * 1000000.0 + 0.5)
                        / 1000000.0 END AS survival
       FROM curve""",
)
def customer_kaplan_meier(spark, sf_dir):
    """Kaplan–Meier customer-lifetime survival curve (month
    granularity, 6-month right-censoring window). See
    statistics.kaplan_meier_curve."""
    from ..operators.statistics import kaplan_meier_curve

    view = _view(spark, sf_dir)
    return kaplan_meier_curve(view.tables["orders"])


@register(
    "bm25_prf_expansion",
    """WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) AS term
         FROM documents),
       q AS (SELECT doc_id, term FROM tok
             WHERE term IN ('spark', 'hash', 'join')),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2),
       dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
       dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       g AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                    (SELECT avg(dl * 1.0) FROM dl) AS avgdl),
       scored AS (
         SELECT tf.doc_id,
                floor(sum(ln(1.0 + (g.n_docs - dfq.doc_freq + 0.5)
                             / (dfq.doc_freq + 0.5))
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl)))
                      * 1000000.0 + 0.5) / 1000000.0 AS bm25
         FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g
         GROUP BY tf.doc_id),
       rel AS (SELECT doc_id FROM scored ORDER BY bm25 DESC, doc_id LIMIT 10),
       stream AS (SELECT DISTINCT doc_id, term FROM tok),
       dfreq AS (SELECT term, count(*) AS n FROM stream GROUP BY 1),
       rfreq AS (SELECT term, count(*) AS r FROM stream
                 WHERE doc_id IN (SELECT doc_id FROM rel) GROUP BY 1),
       nd AS (SELECT count(*) AS nd FROM documents),
       cand AS (SELECT term, n, r, nd
                FROM rfreq JOIN dfreq USING (term) CROSS JOIN nd
                WHERE term NOT IN ('spark', 'hash', 'join'))
       SELECT term, CAST(n AS BIGINT) AS doc_freq,
              CAST(r AS BIGINT) AS n_rel_docs,
              floor(ln(((r + 0.5) * (nd - n - 10 + r + 0.5))
                       / ((n - r + 0.5) * (10 - r + 0.5)))
                    * 1000000.0 + 0.5) / 1000000.0 AS rsj_weight
       FROM cand
       ORDER BY rsj_weight DESC, doc_freq DESC, term LIMIT 20""",
)
def bm25_prf_expansion(spark, sf_dir):
    """Robertson–Sparck Jones query expansion from the BM25 top-10
    pseudo-relevant set for ('spark', 'hash', 'join'). See
    retrieval.prf_expansion_terms."""
    from ..operators.retrieval import prf_expansion_terms

    view = _view(spark, sf_dir)
    return prf_expansion_terms(
        view.tables["documents"], ["spark", "hash", "join"], n_rel=10, k=20
    )


@register(
    "lineitem_two_way_anova",
    """WITH cells AS (
         SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS s,
                CAST(sum(l_quantity * l_quantity) AS BIGINT) AS q
         FROM lineitem GROUP BY 1, 2),
       am AS (SELECT a, CAST(sum(n) AS BIGINT) AS n,
                     CAST(sum(s) AS BIGINT) AS s FROM cells GROUP BY 1),
       bm AS (SELECT b, CAST(sum(n) AS BIGINT) AS n,
                     CAST(sum(s) AS BIGINT) AS s FROM cells GROUP BY 1),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                      CAST(sum(s) AS BIGINT) AS st,
                      CAST(sum(q) AS BIGINT) AS qt,
                      count(*) AS n_cells,
                      count(DISTINCT a) AS ka, count(DISTINCT b) AS kb
               FROM cells),
       ssa AS (SELECT CAST(sum(CAST(floor(
                 n * (s / CAST(n AS DOUBLE) - st / CAST(nt AS DOUBLE))
                   * (s / CAST(n AS DOUBLE) - st / CAST(nt AS DOUBLE))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(38,9)))
                 AS DOUBLE) AS ss_a FROM am, tot),
       ssb AS (SELECT CAST(sum(CAST(floor(
                 n * (s / CAST(n AS DOUBLE) - st / CAST(nt AS DOUBLE))
                   * (s / CAST(n AS DOUBLE) - st / CAST(nt AS DOUBLE))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(38,9)))
                 AS DOUBLE) AS ss_b FROM bm, tot),
       ssc AS (SELECT CAST(sum(CAST(floor(
                 n * (s / CAST(n AS DOUBLE) - st / CAST(nt AS DOUBLE))
                   * (s / CAST(n AS DOUBLE) - st / CAST(nt AS DOUBLE))
                 * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(38,9)))
                 AS DOUBLE) AS ss_cells FROM cells, tot),
       wide AS (
         SELECT nt, st, qt, n_cells, ka, kb, ss_a, ss_b, ss_cells,
                qt - st * (st / CAST(nt AS DOUBLE)) AS ss_tot
         FROM tot, ssa, ssb, ssc),
       terms AS (
         SELECT 'a' AS term, CAST(ka - 1 AS BIGINT) AS df, ss_a AS ss,
                ss_a / (ka - 1) AS ms,
                (ss_a / (ka - 1))
                  / ((ss_tot - ss_cells) / (nt - n_cells)) AS f
         FROM wide
         UNION ALL
         SELECT 'b', CAST(kb - 1 AS BIGINT), ss_b, ss_b / (kb - 1),
                (ss_b / (kb - 1))
                  / ((ss_tot - ss_cells) / (nt - n_cells))
         FROM wide
         UNION ALL
         SELECT 'interaction', CAST(n_cells - ka - kb + 1 AS BIGINT),
                ss_cells - ss_a - ss_b,
                (ss_cells - ss_a - ss_b) / (n_cells - ka - kb + 1),
                ((ss_cells - ss_a - ss_b) / (n_cells - ka - kb + 1))
                  / ((ss_tot - ss_cells) / (nt - n_cells))
         FROM wide
         UNION ALL
         SELECT 'residual', CAST(nt - n_cells AS BIGINT),
                ss_tot - ss_cells,
                (ss_tot - ss_cells) / (nt - n_cells), NULL
         FROM wide)
       SELECT term, df,
              floor(ss * 1000000.0 + 0.5) / 1000000.0 AS ss,
              floor(ms * 1000000.0 + 0.5) / 1000000.0 AS ms,
              floor(f * 1000000.0 + 0.5) / 1000000.0 AS f
       FROM terms""",
)
def lineitem_two_way_anova(spark, sf_dir):
    """Two-way factorial ANOVA (returnflag × linestatus on quantity)
    with interaction — the crossed-design variance decomposition. See
    statistics.two_way_anova."""
    from ..operators.statistics import two_way_anova

    view = _view(spark, sf_dir)
    return two_way_anova(
        view.tables["lineitem"], "l_returnflag", "l_linestatus", "l_quantity"
    )


@register(
    "events_daily_entropy_trend",
    """WITH daily AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS k,
                count(*) AS c
         FROM events GROUP BY 1, 2),
       dtot AS (SELECT day, CAST(sum(c) AS BIGINT) AS n
                FROM daily GROUP BY 1),
       ent AS (
         SELECT day,
                floor(CAST(sum(CAST(floor(
                  -(c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE))
                  * 1000000000.0 + 0.5) / 1000000000.0
                AS DECIMAL(28,9))) AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS h
         FROM daily JOIN dtot USING (day) GROUP BY day),
       xy AS (SELECT h, CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                       AS x
              FROM ent),
       reg AS (
         SELECT count(*) AS n_days, CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(CAST(h AS DECIMAL(28,9))) AS DOUBLE) AS sy,
                CAST(sum(CAST(x * h AS DECIMAL(28,9))) AS DOUBLE) AS sxy
         FROM xy)
       SELECT n_days,
              floor(sy / n_days * 1000000.0 + 0.5) / 1000000.0
                AS mean_entropy,
              floor(((n_days * sxy - sx * sy)
                     / (n_days * sxx - sx * sx)) * 1000000.0 + 0.5)
                / 1000000.0 AS slope_per_day,
              floor(((sy - ((n_days * sxy - sx * sy)
                            / (n_days * sxx - sx * sx)) * sx) / n_days)
                    * 1000000.0 + 0.5) / 1000000.0 AS intercept
       FROM reg""",
)
def events_daily_entropy_trend(spark, sf_dir):
    """Daily event-type-mix entropy and its OLS slope over the day
    index — the concentration-drift monitor. See
    statistics.daily_entropy_trend."""
    from ..operators.statistics import daily_entropy_trend

    view = _view(spark, sf_dir)
    return daily_entropy_trend(view.tables["events"])
