"""Round-6 batch 13: source boilerplate-gram mining, Theil–Sen robust
trend, t-closeness (completing the k-anonymity / l-diversity privacy
trio), Adamic–Adar link prediction, and histogram-exact Spearman rank
correlation — each an oracle-backed registry entry per the standing
gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)


@register(
    "source_boilerplate_grams",
    """WITH tok AS (
         SELECT doc_id, source,
                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       pos AS (
         SELECT doc_id, source, t, unnest(range(1, len(t) - 4 + 2)) AS i
         FROM tok WHERE len(t) >= 4),
       g AS (
         SELECT DISTINCT doc_id, source,
                md5(array_to_string(list_slice(t, i, i + 3), ' ')) AS gram_h
         FROM pos),
       nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs
              FROM g GROUP BY 1),
       dfq AS (SELECT source, gram_h, count(*) AS df_docs
               FROM g GROUP BY 1, 2),
       s AS (
         SELECT d.source, gram_h, df_docs, n_docs
         FROM dfq d JOIN nd USING (source)
         WHERE df_docs >= n_docs * 0.01 AND df_docs >= 2),
       r AS (
         SELECT *, row_number() OVER (
                     PARTITION BY source
                     ORDER BY df_docs DESC, gram_h) AS rank
         FROM s)
       SELECT source, gram_h, CAST(df_docs AS BIGINT) AS df_docs,
              CAST(n_docs AS BIGINT) AS n_docs,
              floor(df_docs / (n_docs * 1.0) * 1000000.0 + 0.5) / 1000000.0
                AS df_ratio,
              CAST(rank AS BIGINT) AS rank
       FROM r WHERE rank <= 20""",
)
def source_boilerplate_grams(spark, sf_dir):
    """Per-source boilerplate 4-gram mining (the CCNet-style template
    detector): n-grams present in >= 1% of a source's documents (and >= 2
    docs), top-20
    per source. See dedup.boilerplate_grams for the bounded-survivor
    plan shape."""
    from ..operators.dedup import boilerplate_grams

    view = _view(spark, sf_dir)
    return boilerplate_grams(
        view.tables["documents"], n=4, min_ratio=0.01, top_k=20
    )


@register(
    "orders_theil_sen_trend",
    """WITH m AS (
         SELECT year(o_orderdate) * 12 + month(o_orderdate) AS xi,
                CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                  AS yi
         FROM orders GROUP BY 1),
       p AS (
         SELECT a.xi AS xi, b.xi AS xj,
                (b.yi - a.yi) / CAST(b.xi - a.xi AS DOUBLE) AS slope
         FROM m a JOIN m b ON a.xi < b.xi),
       r AS (
         SELECT slope, xi, xj,
                row_number() OVER (ORDER BY slope, xi, xj) AS rn,
                count(*) OVER () AS np,
                CASE WHEN slope > 0 THEN 1 ELSE 0 END AS pos
         FROM p),
       np_tot AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM m)
       SELECT n_points, CAST(np AS BIGINT) AS n_pairs,
              floor(sum(CASE WHEN rn = floor((np + 1) / 2)
                               OR rn = floor((np + 2) / 2)
                             THEN slope END)
                    / sum(CASE WHEN rn = floor((np + 1) / 2)
                                 OR rn = floor((np + 2) / 2)
                               THEN 1 END)
                    * 1000000.0 + 0.5) / 1000000.0 AS median_slope,
              floor(sum(pos) / (max(np) * 1.0) * 1000000.0 + 0.5)
                / 1000000.0 AS pct_positive
       FROM r, np_tot GROUP BY np, n_points""",
)
def orders_theil_sen_trend(spark, sf_dir):
    """Theil–Sen robust trend of monthly order revenue: the median of
    all pairwise month-over-month slopes — outlier-immune drift
    detection over the bounded monthly series. See
    statistics.theil_sen_trend."""
    from ..operators.statistics import theil_sen_trend
    from ..functions.numeric import dsum

    view = _view(spark, sf_dir)
    monthly = (
        view.tables["orders"]
        .groupBy(
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).alias("xi")
        )
        .agg(dsum("o_totalprice", 4).alias("yi"))
    )
    return theil_sen_trend(monthly, "xi", "yi")


@register(
    "customer_t_closeness",
    """WITH g AS (
         SELECT floor(c_acctbal / 1000.0) AS b, count(*) AS qn
         FROM customer GROUP BY 1),
       t AS (SELECT sum(qn) AS N, count(*) AS K FROM g),
       c AS (
         SELECT c_nationkey, c_mktsegment, count(*) AS nc
         FROM customer GROUP BY 1, 2),
       cc AS (
         SELECT c_nationkey, c_mktsegment,
                floor(c_acctbal / 1000.0) AS b, count(*) AS pn
         FROM customer GROUP BY 1, 2, 3),
       grid AS (
         SELECT c.c_nationkey, c.c_mktsegment, c.nc, g.b, g.qn,
                coalesce(cc.pn, 0) AS pn
         FROM c CROSS JOIN g
         LEFT JOIN cc ON cc.c_nationkey = c.c_nationkey
                     AND cc.c_mktsegment = c.c_mktsegment
                     AND cc.b = g.b),
       cum AS (
         SELECT c_nationkey, c_mktsegment, nc,
                sum(pn) OVER (PARTITION BY c_nationkey, c_mktsegment
                              ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cp,
                sum(qn) OVER (PARTITION BY c_nationkey, c_mktsegment
                              ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cq
         FROM grid)
       SELECT c_nationkey, c_mktsegment, CAST(nc AS BIGINT) AS n,
              floor(CAST(sum(abs(cp * N - cq * nc)) AS DOUBLE)
                    / (CAST(nc AS DOUBLE) * CAST(N AS DOUBLE)
                       * CAST(K - 1 AS DOUBLE))
                    * 1000000.0 + 0.5) / 1000000.0 AS t_closeness
       FROM cum, t
       GROUP BY c_nationkey, c_mktsegment, nc, N, K""",
)
def customer_t_closeness(spark, sf_dir):
    """t-closeness audit over the (nation, segment) quasi-identifier
    with the balance-k$-bucket as the ordered sensitive attribute —
    EMD between each class's bucket distribution and the global one,
    completing the k-anonymity / l-diversity release-gate trio. See
    profiling.t_closeness_classes."""
    from ..operators.profiling import t_closeness_classes

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_bucket"),
    )
    return t_closeness_classes(
        cust, ["c_nationkey", "c_mktsegment"], "bal_bucket"
    )


@register(
    "graph_adamic_adar",
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
       deg AS (SELECT u, count(*) AS d FROM sym GROUP BY 1),
       centers AS (
         SELECT u AS c,
                CAST(floor(1.0 / ln(d) * 1000000000.0 + 0.5)
                     / 1000000000.0 AS DECIMAL(20,9)) AS w_c
         FROM deg WHERE d >= 2 AND d <= 1024),
       nb AS (SELECT u AS c, v AS x FROM sym),
       wed AS (
         SELECT n1.x AS u, n2.x AS v, w_c
         FROM nb n1 JOIN centers USING (c) JOIN nb n2 USING (c)
         WHERE n1.x < n2.x),
       sc AS (
         SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
                sum(w_c) AS aa
         FROM wed GROUP BY 1, 2),
       na AS (SELECT * FROM sc ANTI JOIN und USING (u, v))
       SELECT u, v, n_common, CAST(aa AS DOUBLE) AS aa_score
       FROM na ORDER BY aa DESC, u, v LIMIT 100""",
)
def graph_adamic_adar(spark, sf_dir):
    """Adamic–Adar link prediction over the one-ship-year co-occurrence
    graph: the top-100 non-adjacent 2-hop pairs by
    Σ 1/ln(deg(common neighbor)), with the logged hub-center cap. See
    graph_algos.adamic_adar_topk for the wedge-bound analysis."""
    from ..operators.graph_algos import adamic_adar_topk
    from .r6_operators import _shipyear_graph

    view = _view(spark, sf_dir)
    return adamic_adar_topk(
        _shipyear_graph(view), top_k=100, max_center_degree=1024
    )


@register(
    "returnflag_qty_discount_spearman",
    """WITH cells AS (
         SELECT l_returnflag AS grp, l_quantity AS xv, l_discount AS yv,
                count(*) AS n_cell
         FROM lineitem GROUP BY 1, 2, 3),
       xm AS (SELECT grp, xv, sum(n_cell) AS cx FROM cells GROUP BY 1, 2),
       xr AS (
         SELECT grp, xv,
                2 * sum(cx) OVER (PARTITION BY grp ORDER BY xv
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - cx + 1 AS rx2
         FROM xm),
       ym AS (SELECT grp, yv, sum(n_cell) AS cy FROM cells GROUP BY 1, 2),
       yr AS (
         SELECT grp, yv,
                2 * sum(cy) OVER (PARTITION BY grp ORDER BY yv
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - cy + 1 AS ry2
         FROM ym),
       j AS (
         SELECT c.grp, c.n_cell, xr.rx2, yr.ry2
         FROM cells c
         JOIN xr ON c.grp = xr.grp AND c.xv = xr.xv
         JOIN yr ON c.grp = yr.grp AND c.yv = yr.yv),
       s AS (
         SELECT grp,
                CAST(sum(n_cell) AS BIGINT) AS n,
                CAST(sum(n_cell * rx2) AS BIGINT) AS sx,
                CAST(sum(n_cell * ry2) AS BIGINT) AS sy,
                CAST(sum(n_cell * rx2 * rx2) AS BIGINT) AS sxx,
                CAST(sum(n_cell * ry2 * ry2) AS BIGINT) AS syy,
                CAST(sum(n_cell * rx2 * ry2) AS BIGINT) AS sxy
         FROM j GROUP BY 1)
       SELECT grp AS l_returnflag, n,
              floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                    * 1000000.0 + 0.5) / 1000000.0 AS rho
       FROM s""",
)
def returnflag_qty_discount_spearman(spark, sf_dir):
    """Spearman rank correlation of quantity vs discount per return
    flag, computed entirely from the joint value histogram (exact
    integer rank moments — no global sort, the scale-correct rank
    correlation for bounded value domains). See
    statistics.spearman_by_group."""
    from ..operators.statistics import spearman_by_group

    view = _view(spark, sf_dir)
    return spearman_by_group(
        view.tables["lineitem"], "l_returnflag", "l_quantity", "l_discount"
    )
