"""Round-6 batch 19: streaming conversion latency (stateful),
quality-threshold survival curves, cross-modal norm/length
correlation, BM25-vs-TF-IDF rank agreement, and quarterly YoY revenue
growth — each an oracle-backed registry entry per the standing gate
discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _TS_FMT_DUCK,
    _view,
    register,
)
from .streaming import _STREAM_SEQ, _replayed_events_stream
from .dedup import _TOKS_DUCK


@register(
    "streaming_conversion_latency",
    f"""WITH f AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_views,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                               ELSE 0 END) AS BIGINT) AS n_purchases,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
          FROM events WHERE event_type IN ('view', 'purchase')
          GROUP BY 1)
        SELECT user_id, n_views, n_purchases,
               strftime(fv, '{_TS_FMT_DUCK}') AS first_view,
               strftime(fp, '{_TS_FMT_DUCK}') AS first_purchase,
               fv IS NOT NULL AND fp IS NOT NULL AND fp > fv AS converted,
               CASE WHEN fv IS NOT NULL AND fp IS NOT NULL AND fp > fv
                    THEN CAST(date_diff('microsecond', fv, fp) // 1000000
                              AS BIGINT) END AS latency_s
        FROM f""",
)
def streaming_conversion_latency(spark, sf_dir):
    """Stateful first-view → first-purchase latency per user
    (applyInPandasWithState, commutative min/count state) — the
    streaming twin of events_conversion_latency; final emission
    equals the batch aggregate under any micro-batching. See
    streaming/stateful.py::streaming_conversion_latency."""
    from pyspark.sql import Window

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_conversion_latency as op

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream),
        f"q_stream_conv_lat_{_STREAM_SEQ[0]}",
        output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("user_id")
    total = F.col("n_views") + F.col("n_purchases")
    return (
        got.withColumn("__t", total)
        .withColumn("__m", F.max(total).over(w))
        .filter(F.col("__t") == F.col("__m"))
        .select(
            "user_id",
            "n_views",
            "n_purchases",
            F.date_format("first_view", "yyyy-MM-dd HH:mm:ss").alias(
                "first_view"
            ),
            F.date_format("first_purchase", "yyyy-MM-dd HH:mm:ss").alias(
                "first_purchase"
            ),
            "converted",
            "latency_s",
        )
    )


@register(
    "quality_threshold_sweep",
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
          SELECT source, n_tokens,
                 floor(((CASE WHEN n_chars >= 50 AND n_chars <= 20000
                              THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN mean_wlen >= 2.0 AND mean_wlen <= 12.0
                           THEN 0.25 ELSE 0.0 END)
                   + least(stopword_ratio * 2.5, 0.25)
                   + alpha_ratio * 0.25) * 1000000.0 + 0.5) / 1000000.0
                   AS quality
          FROM feat),
        q AS (
          SELECT source,
                 CAST(round(quality * 1000000.0) AS BIGINT) AS q6,
                 n_tokens
          FROM qual),
       cells AS (
         SELECT source, q6 // 100000 AS bucket,
                count(*) AS n_docs, sum(n_tokens) AS n_toks
         FROM q GROUP BY 1, 2),
       tot AS (
         SELECT source, sum(n_docs) AS t_docs, sum(n_toks) AS t_toks
         FROM cells GROUP BY 1),
       grid AS (SELECT unnest(range(0, 10)) AS k),
       kept AS (
         SELECT source, k,
                CAST(sum(n_docs) AS BIGINT) AS n_docs_kept,
                CAST(sum(n_toks) AS BIGINT) AS n_tokens_kept
         FROM cells JOIN grid ON bucket >= k
         GROUP BY 1, 2),
       fullg AS (
         SELECT tot.source, grid.k, t_docs, t_toks,
                coalesce(n_docs_kept, 0) AS n_docs_kept,
                coalesce(n_tokens_kept, 0) AS n_tokens_kept
         FROM tot CROSS JOIN grid
         LEFT JOIN kept ON kept.source = tot.source AND kept.k = grid.k)
       SELECT source,
              floor(k / 10.0 * 100.0 + 0.5) / 100.0 AS threshold,
              CAST(n_docs_kept AS BIGINT) AS n_docs_kept,
              CAST(n_tokens_kept AS BIGINT) AS n_tokens_kept,
              floor(n_docs_kept / (t_docs * 1.0) * 1000000.0 + 0.5)
                / 1000000.0 AS doc_keep_rate,
              floor(n_tokens_kept / (t_toks * 1.0) * 1000000.0 + 0.5)
                / 1000000.0 AS token_keep_rate
       FROM fullg""",
)
def quality_threshold_sweep(spark, sf_dir):
    """Per-source quality-threshold survival curves (docs and tokens
    kept at each θ in 0.0…0.9) — the curve read before fixing the
    filter funnel's cutoff, on an exact scaled-integer path. See
    mixing.quality_threshold_sweep."""
    from ..operators.mixing import quality_threshold_sweep as op
    from ..operators.text_analysis import quality_columns
    from ..functions.text import tokens

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    return op(
        docs,
        quality_columns("text")["quality"],
        F.size(tokens("text")),
    )


@register(
    "embedding_centrality_length_corr",
    """WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
                  AS ed
         FROM embeddings),
       ex AS (
         SELECT vec_id, i - 1 AS pos, ed[i] AS v
         FROM (SELECT vec_id, ed, unnest(range(1, len(ed) + 1)) AS i
               FROM e) t),
       cent AS (
         SELECT pos,
                CAST(sum(CAST(floor(v * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) / count(*) AS c
         FROM ex GROUP BY 1),
       dots AS (
         SELECT vec_id,
                CAST(sum(CAST(floor(v * c * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS dot,
                CAST(sum(CAST(floor(v * v * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS nn
         FROM ex JOIN cent USING (pos) GROUP BY 1),
       ccs AS (
         SELECT CAST(sum(CAST(floor(c * c * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS cc
         FROM cent),
       xs AS (
         SELECT vec_id,
                floor(dot / sqrt(nn * cc) * 1000000000.0 + 0.5)
                  / 1000000000.0 AS x
         FROM dots, ccs),
       j AS (
         SELECT x, CAST(n_chars AS BIGINT) AS y
         FROM documents d JOIN xs ON d.doc_id = xs.vec_id),
       s AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(x AS DECIMAL(27,9))) AS DOUBLE) AS sx,
                CAST(sum(CAST(floor(x * x * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS sxx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(y * y) AS BIGINT) AS syy,
                CAST(sum(CAST(floor(x * y * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9)))
                     AS DOUBLE) AS sxy
         FROM j)
       SELECT n,
              floor((CAST(n AS DOUBLE) * sxy
                     - sx * CAST(sy AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                    * 1000000.0 + 0.5) / 1000000.0 AS corr
       FROM s""",
)
def embedding_centrality_length_corr(spark, sf_dir):
    """Cross-modal drift probe: Pearson correlation of document
    length vs cosine-to-centroid over id-aligned pairs — does the
    embedding stratify by length? (Norm-vs-length is degenerate on
    unit vectors; centroid cosine varies.) See
    similarity.centrality_length_correlation."""
    from ..operators.similarity import centrality_length_correlation

    view = _view(spark, sf_dir)
    return centrality_length_correlation(
        view.tables["documents"], view.tables["embeddings"]
    )


@register(
    "bm25_tfidf_rank_agreement",
    """WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) AS term
         FROM documents),
       tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
              WHERE term IN ('spark', 'hash', 'join') GROUP BY 1, 2),
       dfq AS (SELECT term, count(*) AS n_matched FROM tf GROUP BY 1),
       dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       g AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                    (SELECT avg(dl * 1.0) FROM dl) AS avgdl),
       scored AS (
         SELECT tf.term, tf.doc_id,
                floor(ln(1.0 + (g.n_docs - dfq.n_matched + 0.5)
                               / (dfq.n_matched + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl))
                      * 1000000.0 + 0.5) / 1000000.0 AS s_bm25,
                floor(tf.tf * (ln((g.n_docs + 1.0)
                                  / (dfq.n_matched + 1.0)) + 1.0)
                      * 1000000.0 + 0.5) / 1000000.0 AS s_tfidf
         FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
       ranked AS (
         SELECT term,
                row_number() OVER (PARTITION BY term
                                   ORDER BY s_bm25 DESC, doc_id) AS ra,
                row_number() OVER (PARTITION BY term
                                   ORDER BY s_tfidf DESC, doc_id) AS rb
         FROM scored),
       agg AS (
         SELECT term, CAST(count(*) AS BIGINT) AS n_matched,
                CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sd2
         FROM ranked GROUP BY 1)
       SELECT term, n_matched,
              floor((1.0 - 6.0 * CAST(sd2 AS DOUBLE)
                           / (CAST(n_matched AS DOUBLE)
                              * (CAST(n_matched AS DOUBLE)
                                 * CAST(n_matched AS DOUBLE) - 1.0)))
                    * 1000000.0 + 0.5) / 1000000.0 AS rho
       FROM agg""",
)
def bm25_tfidf_rank_agreement(spark, sf_dir):
    """Spearman agreement between the BM25 and TF-IDF orderings per
    probe term (distinct row_number ranks → exact 1 − 6Σd²/(n(n²−1))
    integer formula). See retrieval.bm25_tfidf_rank_agreement."""
    from ..operators.retrieval import bm25_tfidf_rank_agreement as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"], ["spark", "hash", "join"])


@register(
    "nation_quarter_yoy",
    """WITH j AS (
         SELECT n_name, year(o_orderdate) AS yr,
                quarter(o_orderdate) AS qt, o_totalprice
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey),
       cell AS (
         SELECT n_name, yr, qt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                  AS revenue
         FROM j GROUP BY 1, 2, 3)
       SELECT a.n_name AS nation, CAST(a.yr AS BIGINT) AS year,
              CAST(a.qt AS BIGINT) AS quarter,
              floor(a.revenue * 100.0 + 0.5) / 100.0 AS revenue,
              floor((a.revenue / b.revenue - 1.0) * 1000000.0 + 0.5)
                / 1000000.0 AS yoy_growth
       FROM cell a
       LEFT JOIN cell b
         ON a.n_name = b.n_name AND a.qt = b.qt AND a.yr = b.yr + 1""",
)
def nation_quarter_yoy(spark, sf_dir):
    """Year-over-year quarterly revenue growth per nation (same-
    quarter keyed self-join over the bounded quarterly aggregate —
    no windows). See analytics.quarterly_yoy_growth."""
    from ..operators.analytics import quarterly_yoy_growth

    view = _view(spark, sf_dir)
    return quarterly_yoy_growth(
        view.tables["orders"],
        view.tables["customer"],
        view.tables["nation"],
    )
