"""Round-6 batch 28: seasonal-naive forecast backtest, embedding
triplet-margin audit, lead–lag correlation discovery, and the
dedup-rate growth projection — each an oracle-backed registry entry
per the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    ORACLES,
    _dsum,
    _view,
    register,
)

_BACKTEST_ARM = """SELECT '{label}' AS method, count(*) AS n_months,
           floor(CAST(sum(CAST(floor(abs(rev - fc) / rev
                 * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)))
                 AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0
             AS mape,
           floor(CAST(sum(CAST(abs(rev - fc) AS DECIMAL(27,2)))
                 AS DOUBLE) / count(*) * 100.0 + 0.5) / 100.0
             AS mean_abs_err
         FROM (SELECT m.ym, m.rev, f.rev AS fc
               FROM monthly m
               JOIN (SELECT ym + {lag} AS ym, rev FROM monthly) f
                 USING (ym))"""


@register(
    "orders_seasonal_naive_backtest",
    f"""WITH monthly AS (
         SELECT CAST(strftime(o_orderdate, '%Y') AS INT) * 12
                + CAST(strftime(o_orderdate, '%m') AS INT) AS ym,
                {_dsum("o_totalprice", 2)} AS rev
         FROM orders GROUP BY 1)
       {_BACKTEST_ARM.format(label="naive", lag=1)}
       UNION ALL
       {_BACKTEST_ARM.format(label="seasonal_naive", lag=12)}""",
)
def orders_seasonal_naive_backtest(spark, sf_dir):
    """MAPE / MAE of the naive (last month) and seasonal-naive (same
    month last year) baselines on monthly revenue — the bar any
    forecasting model must beat. See statistics.seasonal_naive_backtest."""
    from ..operators.statistics import seasonal_naive_backtest

    view = _view(spark, sf_dir)
    return seasonal_naive_backtest(view.tables["orders"])


@register(
    "embedding_triplet_margin",
    """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
                  FROM embeddings),
       anchors AS (
         SELECT vec_id AS anchor, v AS av, label AS albl FROM n
         ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 20),
       scored AS (
         SELECT anchor, albl, n.vec_id AS cand, n.label AS clbl,
                floor(list_sum(list_transform(list_zip(av, v),
                      x -> (x[1] - x[2]) * (x[1] - x[2])))
                      * 1000000000.0 + 0.5) / 1000000000.0 AS d2
         FROM anchors, n WHERE n.vec_id != anchor),
       pos AS (
         SELECT anchor, albl, cand AS pos_id, d2 AS dp FROM (
           SELECT *, row_number() OVER (PARTITION BY anchor
                       ORDER BY d2, cand) AS rn
           FROM scored WHERE clbl = albl) WHERE rn = 1),
       neg AS (
         SELECT anchor, cand AS neg_id, d2 AS dn FROM (
           SELECT *, row_number() OVER (PARTITION BY anchor
                       ORDER BY d2, cand) AS rn
           FROM scored WHERE clbl != albl) WHERE rn = 1)
       SELECT anchor, albl AS label, pos_id, neg_id,
              floor((dn - dp) * 1000000.0 + 0.5) / 1000000.0 AS margin,
              CAST(CASE WHEN dn - dp < 0 THEN 1 ELSE 0 END AS INT)
                AS violated
       FROM pos JOIN neg USING (anchor)""",
)
def embedding_triplet_margin(spark, sf_dir):
    """Triplet margins (nearest same-label vs nearest other-label) for
    an md5-sampled anchor set — the metric-learning label-consistency
    audit. See similarity.triplet_margin_audit."""
    from ..operators.similarity import triplet_margin_audit

    view = _view(spark, sf_dir)
    return triplet_margin_audit(view.tables["embeddings"])


_LL_ARM = """SELECT a.k AS ka, b.k AS kb, count(*) AS n,
           CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy,
           CAST(sum(a.c * b.c) AS BIGINT) AS sxy,
           CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
           CAST(sum(b.c * b.c) AS BIGINT) AS syy
         FROM daily a JOIN daily b
           ON {join_cond} AND a.k != b.k
         GROUP BY 1, 2"""

_LL_R = """floor(((n * sxy - sx * sy)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)))
           * 1000000.0 + 0.5) / 1000000.0"""


@register(
    "events_lead_lag_correlation",
    f"""WITH daily AS (
         SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS day,
                count(*) AS c
         FROM events GROUP BY 1, 2),
       m0 AS ({_LL_ARM.format(join_cond="a.day = b.day")}),
       m1 AS ({_LL_ARM.format(
           join_cond="CAST(b.day AS DATE) = CAST(a.day AS DATE) + 1")}),
       l0 AS (SELECT ka, kb, n AS n_lag0, {_LL_R} AS r_lag0 FROM m0),
       l1 AS (SELECT ka, kb, n AS n_lag1, {_LL_R} AS r_lag1 FROM m1)
       SELECT l0.ka, l0.kb, n_lag0, r_lag0, n_lag1, r_lag1
       FROM l0 JOIN l1 ON l0.ka = l1.ka AND l0.kb = l1.kb""",
)
def events_lead_lag_correlation(spark, sf_dir):
    """Pearson r between event-type daily series at lag 0 and lag 1
    (does a's volume today predict b's tomorrow). See
    statistics.lead_lag_correlation."""
    from ..operators.statistics import lead_lag_correlation

    view = _view(spark, sf_dir)
    return lead_lag_correlation(view.tables["events"])


@register(
    "dedup_rate_projection",
    f"""WITH pairs AS ({{pairs}}),
       db AS (
         SELECT CAST(floor((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                1, 8))::BIGINT / 4294967296.0) * 4) + 1 AS INT) AS b
         FROM documents),
       dbc AS (SELECT b, count(*) AS nd FROM db GROUP BY 1),
       pb AS (
         SELECT CAST(floor(greatest(
                  ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0,
                  ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0) * 4) + 1 AS INT) AS b
         FROM pairs),
       pbc AS (SELECT b, count(*) AS np FROM pb GROUP BY 1),
       grid AS (SELECT CAST(unnest(range(1, 5)) AS INT) AS b),
       curve AS (
         SELECT g.b, coalesce(nd, 0) AS nd, coalesce(np, 0) AS np
         FROM grid g LEFT JOIN dbc USING (b) LEFT JOIN pbc USING (b)),
       cum AS (
         SELECT b,
                CAST(sum(nd) OVER (ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_docs,
                CAST(sum(np) OVER (ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_pairs
         FROM curve)
       SELECT floor(b / 4.0 * 100.0 + 0.5) / 100.0 AS share,
              n_docs, n_pairs,
              floor(1000 * n_pairs / CAST(n_docs AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS pairs_per_kdoc
       FROM cum""".format(pairs=ORACLES["dedup_minhash_lsh_pairs"]),
)
def dedup_rate_projection(spark, sf_dir):
    """Near-dup pair counts on nested 25/50/75/100% md5-subsamples in
    one pass (pair subsample = max endpoint fraction) — the dedup-cost
    growth forecast. See dedup.dedup_rate_projection."""
    from ..operators.dedup import dedup_rate_projection as op
    from ..operators.dedup import minhash_lsh_pairs

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    return op(docs, minhash_lsh_pairs(docs).select("id_a", "id_b"))
