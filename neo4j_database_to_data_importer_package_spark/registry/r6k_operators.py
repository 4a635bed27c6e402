"""Round-6 batch 22: A/B variant lift, Kneser–Ney bigram scoring,
link-prediction eval, diagonal-Mahalanobis customer outliers, and
token-budget shard packing — each an oracle-backed registry entry per
the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)
from .dedup import _TOKS_DUCK


@register(
    "events_ab_variant_lift",
    """WITH pu AS (
         SELECT user_id AS u,
                max(CASE WHEN event_type = 'purchase' AND value >= 150.0
                         THEN 1 ELSE 0 END) AS converted,
                CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                          % 2 = 0
                     THEN 'A' ELSE 'B' END AS variant
         FROM events GROUP BY user_id),
       arms AS (
         SELECT variant, count(*) AS n_users,
                CAST(sum(converted) AS BIGINT) AS n_converted
         FROM pu GROUP BY 1),
       wide AS (
         SELECT (SELECT n_users FROM arms WHERE variant = 'A') AS na,
                (SELECT n_converted FROM arms WHERE variant = 'A') AS ca,
                (SELECT n_users FROM arms WHERE variant = 'B') AS nb,
                (SELECT n_converted FROM arms WHERE variant = 'B') AS cb),
       calc AS (
         SELECT na, ca, nb, cb,
                ca / CAST(na AS DOUBLE) AS pa,
                cb / CAST(nb AS DOUBLE) AS pb,
                (ca + cb) / CAST(na + nb AS DOUBLE) AS pool
         FROM wide)
       SELECT v.variant,
              CASE v.variant WHEN 'A' THEN na ELSE nb END AS n_users,
              CASE v.variant WHEN 'A' THEN ca ELSE cb END AS n_converted,
              floor((CASE v.variant WHEN 'A' THEN pa ELSE pb END)
                    * 1000000.0 + 0.5) / 1000000.0 AS rate,
              floor((pa - pb) * 1000000.0 + 0.5) / 1000000.0 AS lift,
              floor(((pa - pb) / sqrt(pool * (1 - pool)
                     * (1.0 / na + 1.0 / nb))) * 1000000.0 + 0.5)
                / 1000000.0 AS z_score
       FROM calc, (SELECT 'A' AS variant UNION ALL SELECT 'B') v""",
)
def events_ab_variant_lift(spark, sf_dir):
    """A/B readout over the events stream: md5-parity user bucketing,
    purchase conversion, two-proportion pooled z. See
    statistics.ab_variant_lift for the 4-row-aggregate scale shape."""
    from ..operators.statistics import ab_variant_lift

    view = _view(spark, sf_dir)
    return ab_variant_lift(view.tables["events"])


@register(
    "kneser_ney_bigram_score",
    f"""WITH tokd AS (SELECT doc_id, source, {_TOKS_DUCK} AS t FROM documents),
       tr AS (SELECT doc_id, t FROM tokd WHERE source != 'src0'),
       ho AS (SELECT doc_id, t FROM tokd WHERE source = 'src0'),
       trp AS (SELECT t[i] AS w1, t[i+1] AS w2
               FROM (SELECT t, unnest(range(1, len(t))) AS i FROM tr)),
       c12 AS (SELECT w1, w2, count(*) AS c12 FROM trp GROUP BY 1, 2),
       ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                      count(*) AS n1f
               FROM c12 GROUP BY 1),
       n1b AS (SELECT w2, count(*) AS n1b FROM c12 GROUP BY 1),
       tv AS (SELECT (SELECT count(*) FROM c12) AS bt,
                     (SELECT count(DISTINCT x)
                      FROM (SELECT unnest(t) AS x FROM tr)) AS v),
       hop AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM ho)),
       scored AS (
         SELECT hop.doc_id,
                floor(-log2(
                  CASE WHEN ctx.c1 IS NOT NULL THEN
                    greatest(coalesce(c12.c12, 0) - CAST(0.75 AS DOUBLE),
                             CAST(0 AS DOUBLE)) / ctx.c1
                    + CAST(0.75 AS DOUBLE) * ctx.n1f / ctx.c1
                      * ((coalesce(n1b.n1b, 0) + 1)
                         / CAST(tv.bt + tv.v + 1 AS DOUBLE))
                  ELSE (coalesce(n1b.n1b, 0) + 1)
                       / CAST(tv.bt + tv.v + 1 AS DOUBLE) END
                ) * 1000000.0 + 0.5) / 1000000.0 AS nll
         FROM hop LEFT JOIN c12 USING (w1, w2)
                  LEFT JOIN ctx USING (w1)
                  LEFT JOIN n1b USING (w2)
                  CROSS JOIN tv),
       agg AS (
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(CAST(nll AS DECIMAL(27,6))) AS DOUBLE) / count(*) AS a
         FROM scored GROUP BY doc_id)
       SELECT doc_id, n_bigrams,
              floor(a * 1000000.0 + 0.5) / 1000000.0 AS avg_nll,
              floor(pow(2.0, a) * 10000.0 + 0.5) / 10000.0 AS perplexity
       FROM agg""",
)
def kneser_ney_bigram_score(spark, sf_dir):
    """Interpolated Kneser–Ney bigram perplexity of held-out src0 docs
    (D = 0.75, smoothed continuation backoff) — the estimator upgrade
    over the add-one twin. See text_analysis.kneser_ney_bigram_score."""
    from ..operators.text_analysis import kneser_ney_bigram_score as kn

    view = _view(spark, sf_dir)
    return kn(view.tables["documents"])


@register(
    "graph_link_prediction_eval",
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
       canon AS (SELECT a, b FROM und WHERE a < b),
       tagged AS (
         SELECT a, b,
                (('0x' || substr(md5(a || '|' || b), 1, 8))::BIGINT
                 / 4294967296.0) < 0.2 AS ho
         FROM canon),
       train AS (SELECT a, b FROM tagged WHERE NOT ho),
       pos AS (SELECT a AS x, b AS y, 'pos' AS cls FROM tagged WHERE ho),
       nodes AS (SELECT DISTINCT a AS node FROM und),
       sa AS (SELECT node AS na FROM nodes ORDER BY md5(node) ASC LIMIT 200),
       sb AS (SELECT node AS nb FROM nodes ORDER BY md5(node) DESC LIMIT 200),
       negp AS (
         SELECT DISTINCT least(na, nb) AS x, greatest(na, nb) AS y
         FROM sa, sb WHERE na != nb),
       neg AS (
         SELECT x, y, 'neg' AS cls FROM negp
         WHERE NOT EXISTS (SELECT 1 FROM canon
                           WHERE canon.a = negp.x AND canon.b = negp.y)),
       pairs AS (SELECT * FROM pos UNION ALL SELECT * FROM neg),
       adj AS (SELECT a AS node, b AS nbr FROM train
               UNION ALL SELECT b, a FROM train),
       cn AS (
         SELECT p.x, p.y, count(*) AS cn
         FROM pairs p
         JOIN adj a1 ON a1.node = p.x
         JOIN adj a2 ON a2.node = p.y AND a2.nbr = a1.nbr
         GROUP BY 1, 2),
       scored AS (
         SELECT p.cls, coalesce(cn.cn, 0) AS cn
         FROM pairs p LEFT JOIN cn ON p.x = cn.x AND p.y = cn.y)
       SELECT cls, count(*) AS n_pairs,
              floor(avg(cn) * 1000000.0 + 0.5) / 1000000.0 AS mean_cn,
              floor(avg(CASE WHEN cn > 0 THEN 1 ELSE 0 END)
                    * 1000000.0 + 0.5) / 1000000.0 AS share_cn_pos
       FROM scored GROUP BY cls""",
)
def graph_link_prediction_eval(spark, sf_dir):
    """Common-neighbor link prediction evaluated on an md5-held-out 20%
    edge split vs a 200×200 md5-sampled non-edge control, over the
    one-ship-year co-occurrence graph. See
    graph_algos.link_prediction_eval."""
    from ..operators.graph_algos import link_prediction_eval
    from .r6_operators import _shipyear_graph

    return link_prediction_eval(
        _shipyear_graph(_view(spark, sf_dir)), holdout_frac=0.2, neg_sample=200
    )


@register(
    "customer_mahalanobis_outliers",
    """WITH per AS (
         SELECT o_custkey, count(*) AS n_orders,
                CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(27,2)))
                           AS DOUBLE)) AS BIGINT) AS spent_floor
         FROM orders GROUP BY 1),
       feat AS (
         SELECT c_custkey, c_acctbal,
                CAST(coalesce(per.n_orders, 0) AS BIGINT) AS n_orders,
                CAST(coalesce(per.spent_floor, 0) AS BIGINT) AS spent_floor
         FROM customer LEFT JOIN per ON c_custkey = o_custkey),
       st AS (
         SELECT count(*) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS s1a,
                CAST(sum(CAST(c_acctbal * c_acctbal AS DECIMAL(27,4)))
                     AS DOUBLE) AS s2a,
                CAST(sum(CAST(n_orders AS DECIMAL(27,4))) AS DOUBLE) AS s1o,
                CAST(sum(CAST(n_orders * n_orders AS DECIMAL(27,4)))
                     AS DOUBLE) AS s2o,
                CAST(sum(CAST(spent_floor AS DECIMAL(27,4))) AS DOUBLE) AS s1s,
                CAST(sum(CAST(spent_floor * spent_floor AS DECIMAL(27,4)))
                     AS DOUBLE) AS s2s
         FROM feat),
       m AS (
         SELECT c_custkey,
                pow((c_acctbal - s1a / n)
                    / sqrt((s2a - s1a * (s1a / n)) / (n - 1)), 2.0)
                + pow((n_orders - s1o / n)
                      / sqrt((s2o - s1o * (s1o / n)) / (n - 1)), 2.0)
                + pow((spent_floor - s1s / n)
                      / sqrt((s2s - s1s * (s1s / n)) / (n - 1)), 2.0) AS m2
         FROM feat CROSS JOIN st)
       SELECT c_custkey, floor(m2 * 10000.0 + 0.5) / 10000.0 AS m2
       FROM m WHERE floor(m2 * 10000.0 + 0.5) / 10000.0 > 9.0""",
)
def customer_mahalanobis_outliers(spark, sf_dir):
    """Customers outside the 3σ diagonal-Mahalanobis ellipsoid of
    (account balance, order count, floor(total spend)) — integer/2-dp
    features so every moment is an exact decimal sum. See
    statistics.diag_mahalanobis_outliers."""
    from ..functions.numeric import dsum
    from ..operators.statistics import diag_mahalanobis_outliers

    view = _view(spark, sf_dir)
    per = view.tables["orders"].groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.floor(dsum("o_totalprice", 2)).cast("bigint").alias("spent_floor"),
    )
    feat = (
        view.tables["customer"]
        .join(per, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_acctbal",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.col("spent_floor"), F.lit(0))
            .cast("bigint")
            .alias("spent_floor"),
        )
    )
    return diag_mahalanobis_outliers(
        feat, "c_custkey", ["c_acctbal", "n_orders", "spent_floor"], threshold=9.0
    )


@register(
    "corpus_token_budget_packing",
    f"""WITH toks AS (
         SELECT source, doc_id, len({_TOKS_DUCK}) AS n_tokens
         FROM documents),
       packed AS (
         SELECT source, doc_id, n_tokens,
                CAST(floor(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) / 1000.0) AS BIGINT) AS shard
         FROM toks)
       SELECT source, shard, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
              min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM packed GROUP BY 1, 2""",
)
def corpus_token_budget_packing(spark, sf_dir):
    """Order-preserving token-budget shard packing (1,000-token budget)
    per source — the sequence-packing layout step. See
    mixing.token_budget_packing for the source-partitioned window
    contract."""
    from ..operators.mixing import token_budget_packing

    view = _view(spark, sf_dir)
    return token_budget_packing(view.tables["documents"], budget=1000)
