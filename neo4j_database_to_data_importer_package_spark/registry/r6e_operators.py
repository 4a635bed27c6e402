"""Round-6 batch 16: position-based (U-shaped) attribution, the
Brown–Forsythe variance-equality test, Holt linear forecast backtest,
day-of-week seasonal index, and the corpus filter funnel — each an
oracle-backed registry entry per the standing gate discipline
(COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)
from .dedup import _NORM_DUCK, _TOKS_DUCK
from .text import _LANG_LISTS_DUCK

_TOUCH_DUCK = (
    "CASE WHEN event_type IN ('view','click','signup','error') "
    "THEN event_type END"
)


def _pos_credit_duck(ch: str, n: str) -> str:
    fcb = f"CASE WHEN fc = '{ch}' THEN 1 ELSE 0 END"
    lcb = f"CASE WHEN lc = '{ch}' THEN 1 ELSE 0 END"
    return f"""CASE WHEN tot = 0 THEN 0.0
         WHEN tot = 1 THEN CAST({fcb} AS DOUBLE)
         WHEN tot = 2 THEN 0.5 * CAST({fcb} AS DOUBLE)
                           + 0.5 * CAST({lcb} AS DOUBLE)
         ELSE 0.4 * CAST({fcb} AS DOUBLE)
              + 0.4 * CAST({lcb} AS DOUBLE)
              + 0.2 * CAST({n} - {fcb} - {lcb} AS DOUBLE) / (tot - 2)
       END"""


@register(
    "events_position_attribution",
    f"""WITH seq AS (
         SELECT user_id, ts, event_id, event_type,
                sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  OVER w AS n0,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  OVER w AS n1,
                sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  OVER w AS n2,
                sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  OVER w AS n3,
                first_value({_TOUCH_DUCK} IGNORE NULLS) OVER w AS fc,
                last_value({_TOUCH_DUCK} IGNORE NULLS) OVER w AS lc
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       conv AS (
         SELECT coalesce(n0, 0) AS n0, coalesce(n1, 0) AS n1,
                coalesce(n2, 0) AS n2, coalesce(n3, 0) AS n3, fc, lc,
                coalesce(n0, 0) + coalesce(n1, 0) + coalesce(n2, 0)
                  + coalesce(n3, 0) AS tot
         FROM seq WHERE event_type = 'purchase'),
       credits AS (
         SELECT 'view' AS channel,
                CAST(sum(CAST(floor(({_pos_credit_duck('view', 'n0')})
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE) AS credit
         FROM conv
         UNION ALL
         SELECT 'click',
                CAST(sum(CAST(floor(({_pos_credit_duck('click', 'n1')})
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE)
         FROM conv
         UNION ALL
         SELECT 'signup',
                CAST(sum(CAST(floor(({_pos_credit_duck('signup', 'n2')})
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE)
         FROM conv
         UNION ALL
         SELECT 'error',
                CAST(sum(CAST(floor(({_pos_credit_duck('error', 'n3')})
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE)
         FROM conv
         UNION ALL
         SELECT '(none)',
                CAST(sum(CASE WHEN tot = 0 THEN 1 ELSE 0 END) AS DOUBLE)
         FROM conv)
       SELECT channel,
              floor(credit * 1000000.0 + 0.5) / 1000000.0 AS credit
       FROM credits""",
)
def events_position_attribution(spark, sf_dir):
    """Position-based (U-shaped 40/20/40) conversion attribution —
    first and last touches carry the weight, middles split the rest;
    completes the first-touch / linear / position trio. See
    windows.position_attribution."""
    from ..operators.windows import position_attribution

    view = _view(spark, sf_dir)
    return position_attribution(view.tables["events"])


@register(
    "doc_length_levene",
    """WITH h AS (
         SELECT lang AS g, n_chars AS v, count(*) AS c
         FROM documents GROUP BY 1, 2),
       ng AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM h GROUP BY 1),
       cum AS (
         SELECT h.g, v, c, n_g,
                sum(c) OVER (PARTITION BY h.g ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
         FROM h JOIN ng ON h.g = ng.g),
       m1 AS (
         SELECT g, v AS m1 FROM cum
         WHERE cum - c < floor((n_g + 1) / 2)
           AND floor((n_g + 1) / 2) <= cum),
       m2 AS (
         SELECT g, v AS m2 FROM cum
         WHERE cum - c < floor((n_g + 2) / 2)
           AND floor((n_g + 2) / 2) <= cum),
       med AS (
         SELECT m1.g, CAST(m1 + m2 AS BIGINT) AS med2
         FROM m1 JOIN m2 ON m1.g = m2.g),
       z AS (
         SELECT h.g, c, abs(2 * CAST(v AS BIGINT) - med2) AS z2
         FROM h JOIN med ON h.g = med.g),
       per_g AS (
         SELECT g, CAST(sum(c) AS BIGINT) AS n_g,
                CAST(sum(c * z2) AS BIGINT) AS s1,
                CAST(sum(c * z2 * z2) AS BIGINT) AS s2
         FROM z GROUP BY 1),
       tot AS (
         SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(n_g) AS BIGINT) AS n_tot,
                CAST(sum(s1) AS BIGINT) AS s1_tot
         FROM per_g),
       terms AS (
         SELECT k, n_tot,
                CAST(sum(CAST(floor(CAST(n_g AS DOUBLE)
                                    * (CAST(s1 AS DOUBLE)
                                       / CAST(n_g AS DOUBLE)
                                       - CAST(s1_tot AS DOUBLE)
                                         / CAST(n_tot AS DOUBLE))
                                    * (CAST(s1 AS DOUBLE)
                                       / CAST(n_g AS DOUBLE)
                                       - CAST(s1_tot AS DOUBLE)
                                         / CAST(n_tot AS DOUBLE))
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE) AS between_,
                CAST(sum(CAST(floor((CAST(s2 AS DOUBLE)
                                     - CAST(s1 AS DOUBLE)
                                       * CAST(s1 AS DOUBLE)
                                       / CAST(n_g AS DOUBLE))
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE) AS within_
         FROM per_g, tot GROUP BY 1, 2)
       SELECT k AS n_groups, n_tot AS n_total,
              floor(CAST(n_tot - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                    * between_ / within_ * 1000000.0 + 0.5) / 1000000.0
                AS w_stat
       FROM terms""",
)
def doc_length_levene(spark, sf_dir):
    """Brown–Forsythe variance-equality test on document length
    across languages (robust Levene: ANOVA on |x − group median|,
    all from the bounded value histogram) — the assumption check
    behind doc_length_lang_anova. See
    statistics.levene_brown_forsythe."""
    from ..operators.statistics import levene_brown_forsythe

    view = _view(spark, sf_dir)
    return levene_brown_forsythe(
        view.tables["documents"], "lang", "n_chars"
    )


@register(
    "events_holt_forecast",
    """WITH RECURSIVE daily AS (
         SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS xi,
                count(*) AS yi
         FROM events GROUP BY 1),
       d AS (
         SELECT row_number() OVER (ORDER BY xi) AS i,
                CAST(yi AS DOUBLE) AS y
         FROM daily),
       nn AS (SELECT CAST(max(i) AS BIGINT) AS n FROM d),
       rec(i, l, b, serr, cnt) AS (
         SELECT 2,
                (SELECT y FROM d WHERE i = 2),
                (SELECT y FROM d WHERE i = 2)
                  - (SELECT y FROM d WHERE i = 1),
                CAST(0.0 AS DOUBLE), CAST(0 AS BIGINT)
         UNION ALL
         SELECT rec.i + 1,
                0.5 * d.y + (1 - 0.5) * (rec.l + rec.b),
                0.3 * ((0.5 * d.y + (1 - 0.5) * (rec.l + rec.b)) - rec.l)
                  + (1 - 0.3) * rec.b,
                rec.serr + abs(d.y - (rec.l + rec.b)),
                rec.cnt + 1
         FROM rec JOIN d ON d.i = rec.i + 1),
       fin AS (SELECT * FROM rec, nn WHERE rec.i = nn.n)
       SELECT n AS n_points,
              floor(serr / cnt * 1000000.0 + 0.5) / 1000000.0 AS mae,
              floor(l * 1000000.0 + 0.5) / 1000000.0 AS level,
              floor(b * 1000000.0 + 0.5) / 1000000.0 AS trend,
              floor((l + b) * 1000000.0 + 0.5) / 1000000.0
                AS forecast_next
       FROM fin""",
)
def events_holt_forecast(spark, sf_dir):
    """Holt's linear smoothing over the daily event-count series with
    a one-step-ahead MAE backtest — the sequential recursion runs as
    one Arrow-batched applyInPandas over the bounded daily aggregate
    (the DuckDB oracle replays the identical IEEE sequence via a
    recursive CTE). See statistics.holt_linear_backtest."""
    from ..operators.statistics import holt_linear_backtest

    view = _view(spark, sf_dir)
    daily = (
        view.tables["events"]
        .groupBy(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("xi")
        )
        .agg(F.count(F.lit(1)).alias("yi"))
    )
    return holt_linear_backtest(daily, "xi", "yi", alpha=0.5, beta=0.3)


@register(
    "orders_weekday_index",
    """WITH per_dow AS (
         SELECT isodow(o_orderdate) - 1 AS iso_weekday,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                  AS revenue
         FROM orders GROUP BY 1),
       tot AS (
         SELECT sum(n_orders) AS tn,
                CAST(sum(CAST(revenue AS DECIMAL(27,4))) AS DOUBLE) AS tr
         FROM per_dow)
       SELECT iso_weekday, n_orders,
              floor(revenue * 100.0 + 0.5) / 100.0 AS revenue,
              floor(n_orders / (tn * 1.0) * 7.0 * 1000000.0 + 0.5)
                / 1000000.0 AS order_index,
              floor(revenue / tr * 7.0 * 1000000.0 + 0.5) / 1000000.0
                AS revenue_index
       FROM per_dow, tot""",
)
def orders_weekday_index(spark, sf_dir):
    """ISO day-of-week seasonal index on order count and revenue
    (share vs the uniform 1/7 baseline) — the weekly-grain companion
    to orders_monthly_seasonality. See windows.weekday_index."""
    from ..operators.windows import weekday_index

    view = _view(spark, sf_dir)
    return weekday_index(view.tables["orders"])


@register(
    "corpus_filter_funnel",
    f"""WITH base AS (
          SELECT doc_id, source, text, {_TOKS_DUCK} AS t,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   AS alpha_chars
          FROM documents),
        feat AS (
          SELECT doc_id, source, len(t) AS n_tokens, n_chars,
                 floor((len(list_filter(t, x -> list_contains(
                          ['the','a','of','and','to','in','is','it'], x)))
                        * 1.0 / len(t)) * 1000000.0 + 0.5) / 1000000.0
                   AS stopword_ratio,
                 floor((alpha_chars * 1.0 / n_chars) * 1000000.0 + 0.5)
                   / 1000000.0 AS alpha_ratio,
                 (n_chars - (len(t) - 1)) * 1.0 / len(t) AS mean_wlen
          FROM base),
        qual AS (
          SELECT doc_id, source, n_tokens,
                 floor(((CASE WHEN n_chars >= 50 AND n_chars <= 20000
                              THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN mean_wlen >= 2.0 AND mean_wlen <= 12.0
                           THEN 0.25 ELSE 0.0 END)
                   + least(stopword_ratio * 2.5, 0.25)
                   + alpha_ratio * 0.25) * 1000000.0 + 0.5) / 1000000.0
                   AS quality
          FROM feat),
        lscore AS (
          SELECT doc_id,
                 {", ".join(f"len(list_intersect(list_distinct({_TOKS_DUCK}), {lst})) AS score_{lang}" for lang, lst in _LANG_LISTS_DUCK.items())}
          FROM documents),
        lang AS (
          SELECT doc_id,
                 CASE WHEN greatest(score_de, score_en, score_es,
                                    score_fr, score_zh) = 0 THEN 'und'
                      WHEN score_de = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'de'
                      WHEN score_en = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'en'
                      WHEN score_es = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'es'
                      WHEN score_fr = greatest(score_de, score_en,
                            score_es, score_fr, score_zh) THEN 'fr'
                      ELSE 'zh' END AS detected_lang
          FROM lscore),
        surv AS (
          SELECT md5({_NORM_DUCK}) AS fp, min(doc_id) AS keep_id
          FROM documents GROUP BY 1),
        flags AS (
          SELECT q.source, q.n_tokens,
                 CASE WHEN s.keep_id IS NOT NULL THEN 1 ELSE 0 END
                   AS f_surv,
                 CASE WHEN l.detected_lang = 'en' THEN 1 ELSE 0 END
                   AS f_lang,
                 CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS f_qual
          FROM qual q
          JOIN lang l ON l.doc_id = q.doc_id
          LEFT JOIN surv s ON s.keep_id = q.doc_id)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_raw,
               CAST(sum(f_surv) AS BIGINT) AS n_after_dedup,
               CAST(sum(f_surv * f_lang) AS BIGINT) AS n_after_lang,
               CAST(sum(f_surv * f_lang * f_qual) AS BIGINT)
                 AS n_after_quality,
               CAST(sum(n_tokens) AS BIGINT) AS tokens_raw,
               CAST(sum(f_surv * f_lang * f_qual * n_tokens) AS BIGINT)
                 AS tokens_kept,
               floor(sum(f_surv * f_lang * f_qual) / (count(*) * 1.0)
                     * 1000000.0 + 0.5) / 1000000.0 AS keep_rate
        FROM flags GROUP BY 1""",
)
def corpus_filter_funnel(spark, sf_dir):
    """Per-source filter-funnel accounting for the standard cleaning
    cascade (exact-dedup survivorship → language = en → quality >=
    0.5): stage-by-stage doc and token counts plus the final keep
    rate — the report a data-curation review reads before shipping a
    mixture, and the composition proof that the cleaning operators
    fuse into one scan + one survivorship shuffle."""
    from ..functions.text import fingerprint_md5, tokens
    from ..operators.text_analysis import language_columns, quality_columns
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    base = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).alias("n_tokens"),
        quality_columns("text")["quality"].alias("quality"),
        language_columns("text")["detected_lang"].alias("detected_lang"),
        fingerprint_md5("text").alias("fingerprint"),
    )
    surv = base.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_id")
    )
    flags = base.join(
        surv,
        (base["fingerprint"] == surv["fingerprint"])
        & (base["doc_id"] == surv["keep_id"]),
        "left",
    ).select(
        "source",
        "n_tokens",
        F.when(F.col("keep_id").isNotNull(), 1).otherwise(0).alias(
            "f_surv"
        ),
        F.when(F.col("detected_lang") == "en", 1).otherwise(0).alias(
            "f_lang"
        ),
        F.when(F.col("quality") >= 0.5, 1).otherwise(0).alias("f_qual"),
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum("f_surv").cast("long").alias("n_after_dedup"),
        F.sum(F.col("f_surv") * F.col("f_lang"))
        .cast("long")
        .alias("n_after_lang"),
        F.sum(F.col("f_surv") * F.col("f_lang") * F.col("f_qual"))
        .cast("long")
        .alias("n_after_quality"),
        F.sum("n_tokens").cast("long").alias("tokens_raw"),
        F.sum(
            F.col("f_surv") * F.col("f_lang") * F.col("f_qual")
            * F.col("n_tokens")
        )
        .cast("long")
        .alias("tokens_kept"),
        round_half_up(
            F.sum(F.col("f_surv") * F.col("f_lang") * F.col("f_qual"))
            / F.count(F.lit(1)),
            6,
        ).alias("keep_rate"),
    )
