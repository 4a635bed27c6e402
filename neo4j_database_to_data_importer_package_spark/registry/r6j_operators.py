"""Round-6 batch 21: CCNet perplexity terciles, DSIR importance
weights, Katz centrality, the cumulative-distinct-customers growth
curve, and MMR diversified retrieval — each an oracle-backed registry
entry per the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)


@register(
    "ccnet_perplexity_buckets",
    """WITH terms AS (
         SELECT doc_id, lang,
                unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
         FROM documents),
       freq AS (SELECT term, count(*) AS c FROM terms GROUP BY 1),
       tot AS (SELECT sum(c) AS total FROM freq),
       scored AS (
         SELECT doc_id, lang, count(*) AS n_tokens,
                floor(avg(ln(c / total)) * 10000.0 + 0.5) / 10000.0 AS score
         FROM terms JOIN freq USING (term) CROSS JOIN tot
         GROUP BY doc_id, lang),
       b AS (
         SELECT lang, doc_id, n_tokens, score,
                ntile(3) OVER (PARTITION BY lang
                               ORDER BY score DESC, doc_id) AS t
         FROM scored)
       SELECT lang,
              CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS bucket,
              count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
              min(score) AS min_logprob, max(score) AS max_logprob
       FROM b GROUP BY 1, 2""",
)
def ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity routing per language — the
    quality-bucketing decision of the CCNet pipeline as a first-class
    aggregate. See text_analysis.perplexity_tercile_buckets for the
    bounded-window determinism contract."""
    from ..operators.text_analysis import perplexity_tercile_buckets

    view = _view(spark, sf_dir)
    return perplexity_tercile_buckets(view.tables["documents"])


@register(
    "dsir_importance_weights",
    """WITH terms AS (
         SELECT doc_id, source,
                (('0x' || substr(md5(term), 1, 8))::BIGINT % 1024) AS bucket
         FROM (SELECT doc_id, source,
                      unnest(list_filter(string_split(lower(text), ' '),
                                         x -> x != '')) AS term
               FROM documents)),
       counts AS (
         SELECT bucket,
                sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
                sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS cr
         FROM terms GROUP BY 1),
       tots AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
       lm AS (
         SELECT bucket,
                floor((ln((ct + 1) / (tt + 1024.0))
                       - ln((cr + 1) / (tr + 1024.0)))
                      * 1000000000.0 + 0.5) / 1000000000.0 AS llr
         FROM counts CROSS JOIN tots)
       SELECT doc_id, source, count(*) AS n_tokens,
              floor(CAST(sum(CAST(llr AS DECIMAL(28,9))) AS DOUBLE)
                    * 10000.0 + 0.5) / 10000.0 AS dsir_weight
       FROM terms JOIN lm USING (bucket)
       WHERE source != 'src0'
       GROUP BY doc_id, source""",
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR importance weights of every non-src0 document toward the
    src0 target domain (hashed-unigram log-likelihood ratio). See
    mixing.dsir_importance_weights for the broadcast-LM scale shape."""
    from ..operators.mixing import dsir_importance_weights as dsir

    view = _view(spark, sf_dir)
    return dsir(view.tables["documents"], target_source="src0")


_KATZ_ROUND = """SELECT n.node,
           CAST(1000000 + COALESCE(s.s, 0) // 20 AS BIGINT) AS c
         FROM nodes n LEFT JOIN (
           SELECT und.a AS node, sum({prev}.c) AS s
           FROM und JOIN {prev} ON und.b = {prev}.node
           GROUP BY 1) s ON n.node = s.node"""


@register(
    "graph_katz_centrality",
    """WITH e AS (
         SELECT 'O' || l_orderkey AS a, 'P' || l_partkey AS b
         FROM lineitem WHERE year(l_shipdate) = 1998
         UNION ALL
         SELECT 'O' || l_orderkey, 'S' || l_suppkey
         FROM lineitem WHERE year(l_shipdate) = 1998
         UNION ALL
         SELECT 'P' || l_partkey, 'S' || l_suppkey
         FROM lineitem WHERE year(l_shipdate) = 1998),
       und AS (
         SELECT DISTINCT a, b FROM (
           SELECT a, b FROM e UNION ALL SELECT b, a FROM e)
         WHERE a != b),
       nodes AS (SELECT DISTINCT a AS node FROM und),
       c0 AS (SELECT node, CAST(1000000 AS BIGINT) AS c FROM nodes),
       c1 AS (""" + _KATZ_ROUND.format(prev="c0") + """),
       c2 AS (""" + _KATZ_ROUND.format(prev="c1") + """),
       c3 AS (""" + _KATZ_ROUND.format(prev="c2") + """)
       SELECT node, c AS katz_micro FROM c3""",
)
def graph_katz_centrality(spark, sf_dir):
    """3-iteration Katz centrality (α = 1/20) of the one-ship-year
    co-occurrence graph, carried entirely in integer micro-units so
    every engine and partitioning agrees bit-for-bit. See
    graph_algos.katz_centrality."""
    from ..operators.graph_algos import katz_centrality
    from .r6_operators import _shipyear_graph

    return katz_centrality(_shipyear_graph(_view(spark, sf_dir)), rounds=3)


@register(
    "orders_cumulative_distinct_customers",
    """WITH m AS (
         SELECT strftime(o_orderdate, '%Y-%m') AS month, o_custkey
         FROM orders),
       act AS (
         SELECT month, count(DISTINCT o_custkey) AS n_active
         FROM m GROUP BY 1),
       fst AS (SELECT o_custkey, min(month) AS month FROM m GROUP BY 1),
       nw AS (SELECT month, count(*) AS n_new FROM fst GROUP BY 1)
       SELECT a.month, a.n_active,
              CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new,
              CAST(sum(COALESCE(nw.n_new, 0)) OVER (
                ORDER BY a.month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_customers
       FROM act a LEFT JOIN nw ON a.month = nw.month""",
)
def orders_cumulative_distinct_customers(spark, sf_dir):
    """Monthly active / new / cumulative-distinct customer growth
    curve via the first-order decomposition (running distinct as a
    running SUM over the bounded month domain — never a re-scanning
    count(distinct) window). See analytics.cumulative_distinct_customers."""
    from ..operators.analytics import cumulative_distinct_customers

    view = _view(spark, sf_dir)
    return cumulative_distinct_customers(view.tables["orders"])


_MMR_STEP = """SELECT p.vec_id, p.rel,
           floor((0.7 * p.rel - 0.3 * (
             SELECT max(s.sim) FROM sims s
             WHERE s.ia = p.vec_id
               AND s.ib IN (SELECT vec_id FROM {sel}))) * 1000000.0 + 0.5)
           / 1000000.0 AS score
         FROM pool p
         WHERE p.vec_id NOT IN (SELECT vec_id FROM {sel})"""


@register(
    "embedding_mmr_topk",
    """WITH n AS (
         SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[])) AS nrm
         FROM embeddings),
       q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
       rel AS (
         SELECT vec_id, v, nrm,
                floor(list_dot_product(qv, v) / (qn * nrm)
                      * 1000000.0 + 0.5) / 1000000.0 AS rel
         FROM n, q WHERE vec_id != 0),
       pool AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT 20),
       sims AS (
         SELECT a.vec_id AS ia, b.vec_id AS ib,
                floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)
                      * 1000000.0 + 0.5) / 1000000.0 AS sim
         FROM pool a JOIN pool b ON a.vec_id != b.vec_id),
       s1 AS (
         SELECT vec_id, rel,
                floor(0.7 * rel * 1000000.0 + 0.5) / 1000000.0 AS score
         FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
       s2 AS (SELECT vec_id, rel, score FROM (""" + _MMR_STEP.format(sel="s1") + """)
              ORDER BY score DESC, vec_id LIMIT 1),
       u2 AS (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2),
       s3 AS (SELECT vec_id, rel, score FROM (""" + _MMR_STEP.format(sel="u2") + """)
              ORDER BY score DESC, vec_id LIMIT 1),
       u3 AS (SELECT vec_id FROM u2 UNION ALL SELECT vec_id FROM s3),
       s4 AS (SELECT vec_id, rel, score FROM (""" + _MMR_STEP.format(sel="u3") + """)
              ORDER BY score DESC, vec_id LIMIT 1),
       u4 AS (SELECT vec_id FROM u3 UNION ALL SELECT vec_id FROM s4),
       s5 AS (SELECT vec_id, rel, score FROM (""" + _MMR_STEP.format(sel="u4") + """)
              ORDER BY score DESC, vec_id LIMIT 1)
       SELECT CAST(rank AS INT) AS rank, vec_id,
              rel AS relevance, score AS mmr_score
       FROM (SELECT 1 AS rank, * FROM s1
             UNION ALL SELECT 2, * FROM s2
             UNION ALL SELECT 3, * FROM s3
             UNION ALL SELECT 4, * FROM s4
             UNION ALL SELECT 5, * FROM s5)""",
)
def embedding_mmr_topk(spark, sf_dir):
    """MMR diversified top-5 for query vector 0 over a relevance
    top-20 pool (λ = 0.7). The oracle unrolls the greedy selection as
    five chained argmax CTEs; the Spark side replays the identical
    rounded trace. See similarity.mmr_topk."""
    from ..operators.similarity import mmr_topk

    view = _view(spark, sf_dir)
    return mmr_topk(view.tables["embeddings"], query_id=0, pool=20, k=5)
