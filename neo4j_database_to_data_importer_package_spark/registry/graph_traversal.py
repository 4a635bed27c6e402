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

# Multi-source BFS hop distances over the FK graph
# ---------------------------------------------------------------------------

@register(
    "graph_bfs_hops",
    """WITH e AS (
         SELECT 'C' || c_custkey AS a, 'N' || c_nationkey AS b FROM customer
         UNION ALL
         SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b FROM nation),
       und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
       srcs AS (SELECT DISTINCT 'R' || r_regionkey AS node FROM region),
       reach AS (
         WITH RECURSIVE r(node, dist) AS (
           SELECT node, 0 FROM srcs
           UNION
           SELECT u.b, r.dist + 1 FROM r JOIN und u ON u.a = r.node
           WHERE r.dist < 6)
         SELECT * FROM r)
       SELECT node, min(dist) AS dist FROM reach GROUP BY node""",
)
def graph_bfs_hops(spark, sf_dir):
    """Multi-source BFS from every region over the undirected
    customer→nation→region FK graph (same graph as the CC/PageRank
    queries, recursive-CTE oracle). Frontier-expansion supersteps with an
    anti-join visited set — O(diameter) rounds, state linear in nodes."""
    from ..operators.graph_algos import bfs_distances

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    srcs = view.tables["region"].select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("node")
    )
    return bfs_distances(cust.unionByName(nat), srcs)


@register(
    "graph_shortest_hops",
    """WITH e AS (
         SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b, 1.0 AS w
         FROM nation
         UNION ALL
         SELECT 'C' || c_custkey, 'N' || c_nationkey, 1.0 + (c_custkey % 5)
         FROM customer
         UNION ALL
         SELECT 'O' || o_orderkey, 'C' || o_custkey, 1.0 + (o_orderkey % 3)
         FROM orders
         UNION ALL
         SELECT 'P' || l_partkey, 'O' || l_orderkey,
                0.5 * (1 + (l_linenumber % 4))
         FROM lineitem WHERE l_partkey < 200),
       und AS (
         SELECT a, b, min(w) AS w FROM (
           SELECT a, b, w FROM e UNION ALL SELECT b, a, w FROM e)
         GROUP BY a, b),
       srcs AS (SELECT DISTINCT 'R' || r_regionkey AS node FROM region),
       reach AS (
         WITH RECURSIVE r(node, dist, hops) AS (
           SELECT node, CAST(0.0 AS DOUBLE), 0 FROM srcs
           UNION
           SELECT u.b, r.dist + u.w, r.hops + 1
           FROM r JOIN und u ON u.a = r.node
           WHERE r.hops < 8)
         SELECT node, dist FROM r)
       SELECT node, min(dist) AS dist FROM reach GROUP BY node""",
)
def graph_shortest_hops(spark, sf_dir):
    """Multi-source weighted shortest paths (<=8-edge Bellman-Ford) from
    every region over the weighted FK graph region-nation-customer-order
    -part. Part nodes are reached through MANY order edges (every
    lineitem of that part), so the min-relaxation genuinely competes
    across paths rather than replaying a tree. All weights are multiples
    of 0.5 <= 5 and path sums stay tiny, so every distance is an exact
    binary double — the recursive-CTE oracle reproduces it bit-for-bit
    with no rounding. Plan shape: operators/graph_algos.py::shortest_paths
    (per-superstep edges-by-frontier shuffle join + min-agg, frontier
    shrink, localCheckpoint per round)."""
    from ..operators.graph_algos import shortest_paths

    view = _view(spark, sf_dir)
    t = view.tables
    pfx = lambda p, c: F.concat(F.lit(p), F.col(c))
    edges = (
        t["nation"]
        .select(
            pfx("N", "n_nationkey").alias("src"),
            pfx("R", "n_regionkey").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .unionByName(
            t["customer"].select(
                pfx("C", "c_custkey").alias("src"),
                pfx("N", "c_nationkey").alias("dst"),
                (1.0 + F.col("c_custkey") % 5).cast("double").alias("weight"),
            )
        )
        .unionByName(
            t["orders"].select(
                pfx("O", "o_orderkey").alias("src"),
                pfx("C", "o_custkey").alias("dst"),
                (1.0 + F.col("o_orderkey") % 3).cast("double").alias("weight"),
            )
        )
        .unionByName(
            t["lineitem"]
            .filter(F.col("l_partkey") < 200)
            .select(
                pfx("P", "l_partkey").alias("src"),
                pfx("O", "l_orderkey").alias("dst"),
                (0.5 * (1 + F.col("l_linenumber") % 4)).cast("double").alias(
                    "weight"
                ),
            )
        )
    )
    srcs = t["region"].select(pfx("R", "r_regionkey").alias("node"))
    return shortest_paths(edges, srcs, rounds=8)


# ---------------------------------------------------------------------------
