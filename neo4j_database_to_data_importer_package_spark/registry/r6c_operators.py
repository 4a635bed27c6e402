"""Round-6 batch 14: MRR/precision retrieval eval, posting-list
histogram, Mann–Kendall trend significance, Kendall τ-b from the joint
histogram, and the k-NN hubness audit — each an oracle-backed registry
entry per the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)


@register(
    "retrieval_mrr_eval",
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
         SELECT tf.term, tf.doc_id, tf.tf,
                floor(ln(1.0 + (g.n_docs - dfq.n_matched + 0.5)
                               / (dfq.n_matched + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl))
                      * 1000000.0 + 0.5) / 1000000.0 AS score
         FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
       ranked AS (
         SELECT term, tf,
                row_number() OVER (PARTITION BY term
                                   ORDER BY score DESC, doc_id) AS rank
         FROM scored),
       agg AS (
         SELECT term,
                CAST(sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_relevant,
                CAST(coalesce(min(CASE WHEN tf >= 2 THEN rank END), 0)
                     AS BIGINT) AS first_rel_rank,
                sum(CASE WHEN rank <= 10 AND tf >= 2 THEN 1 ELSE 0 END)
                  AS rel_in_k
         FROM ranked GROUP BY 1)
       SELECT term, CAST(n_matched AS BIGINT) AS n_matched, n_relevant,
              first_rel_rank,
              floor(CASE WHEN first_rel_rank > 0
                         THEN 1.0 / first_rel_rank ELSE 0.0 END
                    * 1000000.0 + 0.5) / 1000000.0 AS rr,
              floor(rel_in_k / 10.0 * 1000000.0 + 0.5) / 1000000.0
                AS precision_at_k
       FROM dfq JOIN agg USING (term)""",
)
def retrieval_mrr_eval(spark, sf_dir):
    """MRR / precision@10 of the single-term BM25 ranking with
    tf >= 2 as the binary relevance label, for the standing probe
    terms — the binary companion to retrieval_ndcg_eval. See
    retrieval.mrr_eval."""
    from ..operators.retrieval import mrr_eval

    view = _view(spark, sf_dir)
    return mrr_eval(
        view.tables["documents"], ["spark", "hash", "join"], k=10, rel_tf=2
    )


@register(
    "posting_list_stats",
    """WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) AS term
         FROM documents),
       p AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
       d AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
       t AS (SELECT count(*) AS n_terms_total, sum(df) AS n_postings_total
             FROM d),
       h AS (
         SELECT CAST(floor(log2(df)) AS BIGINT) AS log2_df_bucket,
                CAST(count(*) AS BIGINT) AS n_terms,
                CAST(sum(df) AS BIGINT) AS n_postings
         FROM d GROUP BY 1)
       SELECT log2_df_bucket, n_terms, n_postings,
              floor(n_postings / (n_postings_total * 1.0)
                    * 1000000.0 + 0.5) / 1000000.0 AS postings_share,
              floor(n_terms / (n_terms_total * 1.0)
                    * 1000000.0 + 0.5) / 1000000.0 AS terms_share
       FROM h, t""",
)
def posting_list_stats(spark, sf_dir):
    """Inverted-index posting-list length histogram in log2 buckets
    (index-capacity planning: dictionary-bloating tail vs hot lists).
    See retrieval.posting_list_stats."""
    from ..operators.retrieval import posting_list_stats as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "events_mann_kendall",
    """WITH d AS (
         SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS xi,
                count(*) AS yi
         FROM events GROUP BY 1),
       s AS (
         SELECT CAST(sum(CASE WHEN b.yi > a.yi THEN 1
                              WHEN b.yi < a.yi THEN -1 ELSE 0 END)
                     AS BIGINT) AS s_stat
         FROM d a JOIN d b ON a.xi < b.xi),
       n AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM d),
       tt AS (
         SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                     AS BIGINT) AS tie_term
         FROM (SELECT count(*) AS t FROM d GROUP BY yi)),
       j AS (SELECT * FROM s, n, tt)
       SELECT n_points, s_stat,
              floor((n_points * (n_points - 1) * (2 * n_points + 5)
                     - tie_term) / 18.0 * 1000000.0 + 0.5) / 1000000.0
                AS var_s,
              floor(CASE
                      WHEN s_stat > 0 THEN (s_stat - 1)
                        / sqrt((n_points * (n_points - 1)
                                * (2 * n_points + 5) - tie_term) / 18.0)
                      WHEN s_stat < 0 THEN (s_stat + 1)
                        / sqrt((n_points * (n_points - 1)
                                * (2 * n_points + 5) - tie_term) / 18.0)
                      ELSE 0.0
                    END * 1000000.0 + 0.5) / 1000000.0 AS z_score
       FROM j""",
)
def events_mann_kendall(spark, sf_dir):
    """Mann–Kendall trend significance over the daily event-count
    series — the nonparametric "is traffic trending" z-score pairing
    with orders_theil_sen_trend's magnitude estimate. See
    statistics.mann_kendall_trend."""
    from ..operators.statistics import mann_kendall_trend

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
    return mann_kendall_trend(daily, "xi", "yi")


@register(
    "returnflag_qty_discount_kendall",
    """WITH cells AS (
         SELECT l_returnflag AS grp, l_quantity AS xv, l_discount AS yv,
                count(*) AS n_cell
         FROM lineitem GROUP BY 1, 2, 3),
       pairs AS (
         SELECT a.grp,
                sum(CASE WHEN b.yv > a.yv
                         THEN a.n_cell * b.n_cell ELSE 0 END)
                  AS n_concordant,
                sum(CASE WHEN b.yv < a.yv
                         THEN a.n_cell * b.n_cell ELSE 0 END)
                  AS n_discordant
         FROM cells a JOIN cells b
           ON a.grp = b.grp AND a.xv < b.xv
         GROUP BY 1),
       totals AS (SELECT grp, CAST(sum(n_cell) AS BIGINT) AS n
                  FROM cells GROUP BY 1),
       tx AS (
         SELECT grp, CAST(sum(t * (t - 1)) AS BIGINT) AS tx2
         FROM (SELECT grp, xv, sum(n_cell) AS t FROM cells GROUP BY 1, 2)
         GROUP BY 1),
       ty AS (
         SELECT grp, CAST(sum(t * (t - 1)) AS BIGINT) AS ty2
         FROM (SELECT grp, yv, sum(n_cell) AS t FROM cells GROUP BY 1, 2)
         GROUP BY 1)
       SELECT p.grp AS l_returnflag, n,
              CAST(n_concordant AS BIGINT) AS n_concordant,
              CAST(n_discordant AS BIGINT) AS n_discordant,
              floor(CAST(n_concordant - n_discordant AS DOUBLE)
                    / sqrt((CAST(n * (n - 1) - tx2 AS DOUBLE) / 2.0)
                           * (CAST(n * (n - 1) - ty2 AS DOUBLE) / 2.0))
                    * 1000000.0 + 0.5) / 1000000.0 AS tau_b
       FROM pairs p JOIN totals USING (grp)
       JOIN tx USING (grp) JOIN ty USING (grp)""",
)
def returnflag_qty_discount_kendall(spark, sf_dir):
    """Kendall τ-b of quantity vs discount per return flag from the
    joint value histogram (cell-pair algebra, never row pairs) — the
    concordance companion to returnflag_qty_discount_spearman. See
    statistics.kendall_tau_by_group."""
    from ..operators.statistics import kendall_tau_by_group

    view = _view(spark, sf_dir)
    return kendall_tau_by_group(
        view.tables["lineitem"], "l_returnflag", "l_quantity", "l_discount"
    )


@register(
    "embedding_hubness_histogram",
    """WITH emb AS (SELECT * FROM embeddings WHERE vec_id < 2000),
       nrm AS (
         SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[])) AS nrm
         FROM emb),
       scored AS (
         SELECT a.vec_id AS qid, b.vec_id AS nid,
                floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
                      * 1000000.0 + 0.5) / 1000000.0 AS cosine
         FROM nrm a JOIN nrm b ON a.vec_id != b.vec_id),
       topk AS (
         SELECT nid FROM (
           SELECT nid,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY cosine DESC, nid) AS rank
           FROM scored)
         WHERE rank <= 10),
       occ AS (SELECT nid, count(*) AS n_appearances FROM topk GROUP BY 1),
       per_vec AS (
         SELECT coalesce(o.n_appearances, 0) AS n_appearances
         FROM emb e LEFT JOIN occ o ON e.vec_id = o.nid)
       SELECT CAST(n_appearances AS BIGINT) AS n_appearances,
              CAST(count(*) AS BIGINT) AS n_vectors
       FROM per_vec GROUP BY 1""",
)
def embedding_hubness_histogram(spark, sf_dir):
    """k-occurrence (hubness) histogram of the exact 10-NN cosine
    graph over the FIRST 2000 vectors — an explicitly bounded audit
    sample (the all-pairs graph is the O(n²) correctness baseline;
    the 8× sweep measured 39× unbounded, so the registered audit
    declares its window, per the zipf-slice precedent). At corpus
    scale the same rollup runs over IVF candidate lists — see
    similarity.hubness_audit."""
    from ..operators.similarity import hubness_audit

    view = _view(spark, sf_dir)
    emb = view.tables["embeddings"].where(F.col("vec_id") < 2000)
    return hubness_audit(emb, k=10)
