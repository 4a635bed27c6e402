"""Round-6 batch 31: Hill tail-index estimator and targeted-attack
percolation robustness — oracle-backed registry entries per the
standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)


@register(
    "orders_hill_tail_index",
    """WITH top AS (
         SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
         ORDER BY v DESC LIMIT 501),
       xm AS (SELECT min(v) AS xmin FROM top),
       terms AS (
         SELECT floor(ln(v / xmin) * 1000000000.0 + 0.5) / 1000000000.0
                  AS t, xmin
         FROM top, xm WHERE v > xmin)
       SELECT CAST(count(*) AS BIGINT) AS k, xmin AS x_min,
              floor(count(*) / CAST(sum(CAST(t AS DECIMAL(28,9)))
                    AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS alpha
       FROM terms GROUP BY xmin""",
)
def orders_hill_tail_index(spark, sf_dir):
    """Hill power-law tail index of order values over the top-500
    order statistics — the heavy-tail diagnostic that decides whether
    the mean is even meaningful. See statistics.hill_tail_index."""
    from ..operators.statistics import hill_tail_index

    view = _view(spark, sf_dir)
    return hill_tail_index(view.tables["orders"], "o_totalprice", k=500)


_ROB_SUMMARY = """SELECT '{label}' AS variant,
           CAST(sum(sz) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(max(sz) AS BIGINT) AS largest_cc,
           floor(max(sz) / CAST(sum(sz) AS DOUBLE) * 1000000.0 + 0.5)
             / 1000000.0 AS largest_share
         FROM (SELECT comp, count(*) AS sz FROM {cte} GROUP BY 1)"""


@register(
    "graph_percolation_robustness",
    f"""WITH e AS (
         SELECT 'C' || c_custkey AS a, 'N' || c_nationkey AS b FROM customer
         UNION ALL
         SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b FROM nation),
       und AS (
         SELECT DISTINCT a, b FROM (
           SELECT a, b FROM e UNION ALL SELECT b, a FROM e)
         WHERE a != b),
       deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY 1),
       hubs AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 2),
       cutu AS (
         SELECT a, b FROM und
         WHERE a NOT IN (SELECT node FROM hubs)
           AND b NOT IN (SELECT node FROM hubs)),
       cf AS (
         WITH RECURSIVE r(node, comp) AS (
           SELECT DISTINCT a, a FROM und
           UNION
           SELECT u.b, r.comp FROM r JOIN und u ON u.a = r.node)
         SELECT node, min(comp) AS comp FROM r GROUP BY 1),
       cc AS (
         WITH RECURSIVE r(node, comp) AS (
           SELECT DISTINCT a, a FROM cutu
           UNION
           SELECT u.b, r.comp FROM r JOIN cutu u ON u.a = r.node)
         SELECT node, min(comp) AS comp FROM r GROUP BY 1)
       {_ROB_SUMMARY.format(label="full", cte="cf")}
       UNION ALL
       {_ROB_SUMMARY.format(label="hubs_removed", cte="cc")}""",
)
def graph_percolation_robustness(spark, sf_dir):
    """Component structure of the customer/nation/region FK graph
    before and after removing the 2 highest-degree hubs — the
    targeted-attack (Albert–Barabási) robustness probe. See
    graph_algos.percolation_robustness."""
    from ..operators.graph_algos import percolation_robustness

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    return percolation_robustness(cust.unionByName(nat), n_hubs=2)
