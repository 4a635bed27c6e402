"""Registry section split from the former monolithic registry.py
(round 6, VERDICT r05 #7); registration order is preserved by the
import order in ``__init__.py``."""

from __future__ import annotations

from ._core import (  # noqa: F401  (full monolith-global namespace)
    Callable,
    DataFrame,
    F,
    ORACLES,
    QUERIES,
    SparkSession,
    TPCH_GRAPH_SPEC,
    _TS_FMT_DUCK,
    _TS_FMT_SPARK,
    _VIEW_CACHE,
    _dsum,
    _fmt_ts,
    _view,
    detect_identifiers,
    discover_patterns_map,
    dsum,
    export_node_table,
    export_relationship_table,
    infer_type_col,
    load_graph_view,
    nodes_from_view,
    register,
    schema_union_map,
    uniqueness_profile,
)

# Graph analytics (degrees / connected components / PageRank)
# ---------------------------------------------------------------------------

@register(
    "graph_degrees",
    """WITH e AS (SELECT 'O' || l_orderkey AS src, 'P' || l_partkey AS dst FROM lineitem),
       o AS (SELECT src AS node, count(*) AS out_degree FROM e GROUP BY 1),
       i AS (SELECT dst AS node, count(*) AS in_degree FROM e GROUP BY 1)
       SELECT coalesce(o.node, i.node) AS node,
              coalesce(out_degree, 0) AS out_degree,
              coalesce(in_degree, 0) AS in_degree
       FROM o FULL OUTER JOIN i ON o.node = i.node""",
)
def graph_degrees(spark, sf_dir):
    from ..operators.graph_algos import degrees

    view = _view(spark, sf_dir)
    e = view.tables["lineitem"].select(
        F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
    )
    return degrees(e)


@register(
    "graph_connected_components",
    """WITH e AS (
         SELECT 'C' || c_custkey AS a, 'N' || c_nationkey AS b FROM customer
         UNION ALL
         SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b FROM nation),
       und AS (
         SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
       nodes AS (SELECT DISTINCT a AS node FROM und)
       , reach AS (
         WITH RECURSIVE r(node, comp) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT u.b, r.comp FROM r JOIN und u ON u.a = r.node)
         SELECT * FROM r)
       SELECT node, min(comp) AS component FROM reach GROUP BY node""",
)
def graph_connected_components(spark, sf_dir):
    from ..operators.graph_algos import connected_components

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    return connected_components(cust.unionByName(nat))


def graph_pagerank(spark, sf_dir):
    from ..operators.graph_algos import pagerank

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    return pagerank(cust.unionByName(nat), iterations=10)


QUERIES["graph_pagerank"] = graph_pagerank
# Fixed-iteration PageRank is deterministic (10 synchronous iterations,
# dangling mass redistributed uniformly, ranks rounded to 8 decimals) —
# the oracle replays the same recursion as a recursive CTE.
ORACLES["graph_pagerank"] = """
WITH RECURSIVE
edges AS (
  SELECT 'C' || c_custkey AS src, 'N' || c_nationkey AS dst FROM customer
  UNION ALL
  SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges) u),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
out_deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY 1),
pr AS (
  SELECT node, (SELECT 1.0/n FROM nn) AS rank, 0 AS i FROM nodes
  UNION ALL
  SELECT n.node,
         CAST((1.0-0.85)/(SELECT n FROM nn)
              + 0.85 * (SELECT coalesce(sum(CASE WHEN od.deg IS NULL THEN p.rank END), 0.0)
                        FROM pr p LEFT JOIN out_deg od ON od.node = p.node) / (SELECT n FROM nn)
              + 0.85 * coalesce(c.contrib, 0.0) AS DOUBLE) AS rank,
         (SELECT min(i) FROM pr) + 1 AS i
  FROM nodes n
  LEFT JOIN (SELECT e.dst AS node, sum(p.rank / od.deg) AS contrib
             FROM pr p JOIN edges e ON e.src = p.node
             JOIN out_deg od ON od.node = p.node
             GROUP BY e.dst) c ON c.node = n.node
  WHERE (SELECT min(i) FROM pr) < 10
)
SELECT node, floor(rank * 100000000.0 + 0.5) / 100000000.0 AS pagerank
FROM pr WHERE i = 10
"""


# ---------------------------------------------------------------------------
