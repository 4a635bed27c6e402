"""Round-6 batch 15: term burstiness (Church–Gale), Heaps'-law
exponent fit, one-pass Pearson correlation matrix, Cramér's V
association, and functional-graph SCC over dominant event transitions
— each an oracle-backed registry entry per the standing gate
discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)


@register(
    "term_burstiness",
    """WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) AS term
         FROM documents),
       tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
       m AS (
         SELECT term, CAST(count(*) AS BIGINT) AS df,
                CAST(sum(tf) AS BIGINT) AS s1,
                CAST(sum(tf * tf) AS BIGINT) AS s2
         FROM tf GROUP BY 1),
       f AS (SELECT * FROM m WHERE df >= 5),
       s AS (
         SELECT term, df, s1 AS total_tf,
                floor(CAST(s1 AS DOUBLE) / CAST(df AS DOUBLE)
                      * 1000000.0 + 0.5) / 1000000.0 AS burstiness,
                floor(((CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                          / CAST(df AS DOUBLE)) / CAST(df AS DOUBLE))
                      / (CAST(s1 AS DOUBLE) / CAST(df AS DOUBLE))
                      * 1000000.0 + 0.5) / 1000000.0 AS fano_factor
         FROM f)
       SELECT * FROM s ORDER BY burstiness DESC, term LIMIT 100""",
)
def term_burstiness(spark, sf_dir):
    """Church–Gale burstiness leaderboard: top-100 terms by mean
    within-document frequency E[tf | tf>0], with the Fano factor —
    the stopword-free topical-vocabulary extractor. See
    text_analysis.term_burstiness_topk."""
    from ..operators.text_analysis import term_burstiness_topk

    view = _view(spark, sf_dir)
    return term_burstiness_topk(
        view.tables["documents"], min_df=5, top_k=100
    )


@register(
    "doc_heaps_law_fit",
    """WITH tok AS (
         SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x != '')
                  AS t
         FROM documents),
       mx AS (SELECT max(doc_id) AS m FROM documents),
       firsts AS (
         SELECT term, min(doc_id) AS first_doc
         FROM (SELECT doc_id, unnest(t) AS term FROM tok) GROUP BY 1),
       newt AS (
         SELECT LEAST(19, CAST(floor(first_doc * 20.0 / (m + 1)) AS INT))
                  AS bucket,
                count(*) AS nv
         FROM firsts, mx GROUP BY 1),
       tks AS (
         SELECT LEAST(19, CAST(floor(doc_id * 20.0 / (m + 1)) AS INT))
                  AS bucket,
                sum(len(t)) AS nt
         FROM tok, mx GROUP BY 1),
       j AS (
         SELECT coalesce(tks.bucket, newt.bucket) AS bucket,
                coalesce(nt, 0) AS nt, coalesce(nv, 0) AS nv
         FROM tks FULL OUTER JOIN newt ON tks.bucket = newt.bucket),
       curve AS (
         SELECT sum(nt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS cum_n,
                sum(nv) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW) AS cum_v
         FROM j),
       pts AS (
         SELECT floor(ln(cum_n) * 1000000000.0 + 0.5) / 1000000000.0 AS x,
                floor(ln(cum_v) * 1000000000.0 + 0.5) / 1000000000.0 AS y
         FROM curve WHERE cum_n > 0 AND cum_v > 0),
       s AS (
         SELECT CAST(count(*) AS BIGINT) AS k,
                CAST(sum(CAST(x AS DECIMAL(27,9))) AS DOUBLE) AS sx,
                CAST(sum(CAST(y AS DECIMAL(27,9))) AS DOUBLE) AS sy,
                CAST(sum(CAST(floor(x * x * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS sxx,
                CAST(sum(CAST(floor(y * y * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS syy,
                CAST(sum(CAST(floor(x * y * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS sxy
         FROM pts)
       SELECT k AS n_buckets_used,
              floor((CAST(k AS DOUBLE) * sxy - sx * sy)
                    / (CAST(k AS DOUBLE) * sxx - sx * sx)
                    * 1000000.0 + 0.5) / 1000000.0 AS beta,
              floor(exp((sy - (CAST(k AS DOUBLE) * sxy - sx * sy)
                              / (CAST(k AS DOUBLE) * sxx - sx * sx)
                              * sx) / CAST(k AS DOUBLE))
                    * 1000000.0 + 0.5) / 1000000.0 AS k_coef,
              floor(((CAST(k AS DOUBLE) * sxy - sx * sy)
                     * (CAST(k AS DOUBLE) * sxy - sx * sy))
                    / ((CAST(k AS DOUBLE) * sxx - sx * sx)
                       * (CAST(k AS DOUBLE) * syy - sy * sy))
                    * 1000000.0 + 0.5) / 1000000.0 AS r2
       FROM s""",
)
def doc_heaps_law_fit(spark, sf_dir):
    """Heaps'-law exponent β (V = K·N^β) fit by OLS over the bounded
    ingestion-order vocabulary growth curve — the scalar "is more
    crawl still buying vocabulary" read-out. See
    text_analysis.heaps_law_fit."""
    from ..operators.text_analysis import heaps_law_fit

    view = _view(spark, sf_dir)
    return heaps_law_fit(view.tables["documents"], n_buckets=20)


@register(
    "lineitem_correlation_matrix",
    """WITH mom AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE)
                  AS s_q,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2)))
                     AS DOUBLE) AS s_p,
                CAST(sum(CAST(l_discount AS DECIMAL(27,2))) AS DOUBLE)
                  AS s_d,
                CAST(sum(CAST(l_tax AS DECIMAL(27,2))) AS DOUBLE) AS s_t,
                CAST(sum(CAST(floor(l_quantity * l_quantity * 10000.0
                                    + 0.5) / 10000.0 AS DECIMAL(27,4)))
                     AS DOUBLE) AS ss_q,
                CAST(sum(CAST(floor(l_extendedprice * l_extendedprice
                                    * 10000.0 + 0.5) / 10000.0
                              AS DECIMAL(27,4))) AS DOUBLE) AS ss_p,
                CAST(sum(CAST(floor(l_discount * l_discount * 10000.0
                                    + 0.5) / 10000.0 AS DECIMAL(27,4)))
                     AS DOUBLE) AS ss_d,
                CAST(sum(CAST(floor(l_tax * l_tax * 10000.0 + 0.5)
                              / 10000.0 AS DECIMAL(27,4))) AS DOUBLE)
                  AS ss_t,
                CAST(sum(CAST(floor(l_quantity * l_extendedprice
                                    * 10000.0 + 0.5) / 10000.0
                              AS DECIMAL(27,4))) AS DOUBLE) AS sp_q_p,
                CAST(sum(CAST(floor(l_quantity * l_discount * 10000.0
                                    + 0.5) / 10000.0 AS DECIMAL(27,4)))
                     AS DOUBLE) AS sp_q_d,
                CAST(sum(CAST(floor(l_quantity * l_tax * 10000.0 + 0.5)
                              / 10000.0 AS DECIMAL(27,4))) AS DOUBLE)
                  AS sp_q_t,
                CAST(sum(CAST(floor(l_extendedprice * l_discount
                                    * 10000.0 + 0.5) / 10000.0
                              AS DECIMAL(27,4))) AS DOUBLE) AS sp_p_d,
                CAST(sum(CAST(floor(l_extendedprice * l_tax * 10000.0
                                    + 0.5) / 10000.0 AS DECIMAL(27,4)))
                     AS DOUBLE) AS sp_p_t,
                CAST(sum(CAST(floor(l_discount * l_tax * 10000.0 + 0.5)
                              / 10000.0 AS DECIMAL(27,4))) AS DOUBLE)
                  AS sp_d_t
         FROM lineitem)
       SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y, n,
              floor((CAST(n AS DOUBLE) * sp_q_p - s_q * s_p)
                    / sqrt((CAST(n AS DOUBLE) * ss_q - s_q * s_q)
                           * (CAST(n AS DOUBLE) * ss_p - s_p * s_p))
                    * 1000000.0 + 0.5) / 1000000.0 AS corr FROM mom
       UNION ALL
       SELECT 'l_quantity', 'l_discount', n,
              floor((CAST(n AS DOUBLE) * sp_q_d - s_q * s_d)
                    / sqrt((CAST(n AS DOUBLE) * ss_q - s_q * s_q)
                           * (CAST(n AS DOUBLE) * ss_d - s_d * s_d))
                    * 1000000.0 + 0.5) / 1000000.0 FROM mom
       UNION ALL
       SELECT 'l_quantity', 'l_tax', n,
              floor((CAST(n AS DOUBLE) * sp_q_t - s_q * s_t)
                    / sqrt((CAST(n AS DOUBLE) * ss_q - s_q * s_q)
                           * (CAST(n AS DOUBLE) * ss_t - s_t * s_t))
                    * 1000000.0 + 0.5) / 1000000.0 FROM mom
       UNION ALL
       SELECT 'l_extendedprice', 'l_discount', n,
              floor((CAST(n AS DOUBLE) * sp_p_d - s_p * s_d)
                    / sqrt((CAST(n AS DOUBLE) * ss_p - s_p * s_p)
                           * (CAST(n AS DOUBLE) * ss_d - s_d * s_d))
                    * 1000000.0 + 0.5) / 1000000.0 FROM mom
       UNION ALL
       SELECT 'l_extendedprice', 'l_tax', n,
              floor((CAST(n AS DOUBLE) * sp_p_t - s_p * s_t)
                    / sqrt((CAST(n AS DOUBLE) * ss_p - s_p * s_p)
                           * (CAST(n AS DOUBLE) * ss_t - s_t * s_t))
                    * 1000000.0 + 0.5) / 1000000.0 FROM mom
       UNION ALL
       SELECT 'l_discount', 'l_tax', n,
              floor((CAST(n AS DOUBLE) * sp_d_t - s_d * s_t)
                    / sqrt((CAST(n AS DOUBLE) * ss_d - s_d * s_d)
                           * (CAST(n AS DOUBLE) * ss_t - s_t * s_t))
                    * 1000000.0 + 0.5) / 1000000.0 FROM mom""",
)
def lineitem_correlation_matrix(spark, sf_dir):
    """One-pass Pearson correlation matrix across the four lineitem
    measures (decimal-exact moment sums, k² arithmetic on one row) —
    the schema-profiling staple. See profiling.correlation_matrix."""
    from ..operators.profiling import correlation_matrix

    view = _view(spark, sf_dir)
    return correlation_matrix(
        view.tables["lineitem"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        scale=2,
    )


@register(
    "part_brand_type_cramers_v",
    """WITH obs AS (
         SELECT p_brand AS r, p_type AS c, count(*) AS o
         FROM part GROUP BY 1, 2),
       rm AS (SELECT r, sum(o) AS nr FROM obs GROUP BY 1),
       cm AS (SELECT c, sum(o) AS nc FROM obs GROUP BY 1),
       tot AS (SELECT sum(o) AS n FROM obs),
       grid AS (
         SELECT t.n, coalesce(obs.o, 0) AS o,
                rm.nr * cm.nc / t.n AS e
         FROM rm CROSS JOIN cm CROSS JOIN tot t
         LEFT JOIN obs ON obs.r = rm.r AND obs.c = cm.c),
       agg AS (
         SELECT n,
                CAST(sum(CAST(floor(pow(o - e, 2) / e * 1000000000.0
                                    + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE) AS chi2
         FROM grid GROUP BY 1),
       dims AS (
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM rm) AS n_rows,
                (SELECT CAST(count(*) AS BIGINT) FROM cm) AS n_cols)
       SELECT CAST(n AS BIGINT) AS n, n_rows, n_cols,
              floor(chi2 * 1000000.0 + 0.5) / 1000000.0 AS chi2,
              floor(sqrt(chi2 / (CAST(n AS DOUBLE)
                                 * CAST(least(n_rows, n_cols) - 1
                                        AS DOUBLE)))
                    * 1000000.0 + 0.5) / 1000000.0 AS cramers_v
       FROM agg, dims""",
)
def part_brand_type_cramers_v(spark, sf_dir):
    """Cramér's V association strength between part brand and part
    type — the normalized scalar on top of the chi-square grid,
    comparable across categorical pairs. See statistics.cramers_v."""
    from ..operators.statistics import cramers_v

    view = _view(spark, sf_dir)
    return cramers_v(view.tables["part"], "p_brand", "p_type")


@register(
    "events_dominant_transition_scc",
    """WITH RECURSIVE seq AS (
         SELECT event_type AS f,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS t
         FROM events),
       c AS (
         SELECT f, t, count(*) AS n
         FROM seq WHERE t IS NOT NULL GROUP BY 1, 2),
       dom AS (
         SELECT f AS a, t AS b FROM (
           SELECT f, t, row_number() OVER (
                          PARTITION BY f ORDER BY n DESC, t) AS rk
           FROM c)
         WHERE rk = 1),
       nodes AS (
         SELECT a AS node FROM dom UNION SELECT b FROM dom),
       base AS (
         SELECT node AS a, node AS b FROM nodes
         UNION SELECT a, b FROM dom),
       reach(a, b) AS (
         SELECT a, b FROM base
         UNION
         SELECT r.a, d.b FROM reach r JOIN dom d ON r.b = d.a),
       mutual AS (
         SELECT r1.a, r1.b FROM reach r1
         JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
       scc AS (SELECT a AS node, min(b) AS scc_id FROM mutual GROUP BY 1),
       sizes AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
                 FROM scc GROUP BY 1),
       sl AS (SELECT a AS node FROM dom WHERE a = b)
       SELECT scc.node, scc_id, scc_size,
              (scc_size > 1 OR sl.node IS NOT NULL) AS in_cycle
       FROM scc JOIN sizes USING (scc_id)
       LEFT JOIN sl ON sl.node = scc.node""",
)
def events_dominant_transition_scc(spark, sf_dir):
    """Strongly-connected components of the dominant-transition
    functional graph (each event type's most-frequent successor):
    the attractor cycles of the behavioral log, by bounded
    transitive-closure doubling. See graph_algos.functional_scc."""
    from pyspark.sql import Window
    from ..operators.graph_algos import functional_scc

    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    seq = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type")
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("t"),
    )
    counts = (
        seq.where(F.col("t").isNotNull())
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("f").orderBy(F.col("n").desc(), "t")
    dom = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(F.col("f").alias("src"), F.col("t").alias("dst"))
    )
    return functional_scc(dom)
