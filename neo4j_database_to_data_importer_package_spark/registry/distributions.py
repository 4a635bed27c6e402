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

# Distribution / ranking / decorrelation / multi-dimensional shapes
# ---------------------------------------------------------------------------

@register(
    "q13_customer_order_distribution",
    """WITH per_cust AS (
         SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey)
       SELECT n_orders, count(*) AS n_customers
       FROM per_cust GROUP BY n_orders""",
)
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left-outer join preserving zero-order customers,
    then a second aggregation over the first's result (distribution of a
    distribution). Both aggregations are partial-agg friendly; the outer
    join's null side becomes count 0 via count(col)'s null-skipping."""
    view = _view(spark, sf_dir)
    per_cust = (
        view.tables["customer"]
        .join(
            view.tables["orders"],
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "top_parts_per_nation",
    """WITH rev AS (
         SELECT s_nationkey, l_partkey,
                floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey, l_partkey),
       ranked AS (
         SELECT s_nationkey, l_partkey, revenue,
                row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY revenue DESC, l_partkey) AS rnk
         FROM rev)
       SELECT s_nationkey, l_partkey, revenue, rnk
       FROM ranked WHERE rnk <= 3""",
)
def top_parts_per_nation(spark, sf_dir):
    """Top-N per group: rank window over a pre-aggregated join. Ranking is
    on the ROUNDED revenue (both engines round identically before
    ordering) with the part key as tiebreak, so FP summation order cannot
    reorder the top-3. The window partitions by nation — each group sorts
    independently, no global sort."""
    from pyspark.sql import Window

    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    rev = (
        view.tables["lineitem"]
        .join(
            view.tables["supplier"],
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_partkey")
        .agg(
            round_half_up(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("s_nationkey", "l_partkey", "revenue", "rnk")
    )


@register(
    "q2_min_cost_supplier",
    """WITH mn AS (
         SELECT l_partkey, min(l_extendedprice) AS min_price
         FROM lineitem GROUP BY l_partkey)
       SELECT l.l_partkey,
              min(l.l_suppkey) AS best_supp,
              floor((min(mn.min_price)) * 100.0 + 0.5) / 100.0 AS min_price
       FROM lineitem l JOIN mn
         ON l.l_partkey = mn.l_partkey AND l.l_extendedprice = mn.min_price
       GROUP BY l.l_partkey""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated min-subquery decorrelated into a
    grouped-min + equality join back onto the fact (the standard Catalyst
    rewrite, expressed explicitly). The equality is on a double that both
    sides read bit-identical from parquet, so it is exact."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].select("l_partkey", "l_suppkey", "l_extendedprice")
    # Distinct column names on the aggregated side: a self-join on shared
    # lineage would otherwise resolve both sides to the same attribute.
    mn = (
        li.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .select(F.col("l_partkey").alias("mn_partkey"), "min_price")
    )
    return (
        li.join(
            mn,
            (F.col("l_partkey") == F.col("mn_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .groupBy("l_partkey")
        .agg(
            F.min("l_suppkey").alias("best_supp"),
            round_half_up(F.min("min_price"), 2).alias("min_price"),
        )
    )


@register(
    "grouping_sets_revenue",
    """SELECT l_returnflag, l_linestatus,
              floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
              count(*) AS n_items
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
)
def grouping_sets_revenue(spark, sf_dir):
    """Arbitrary GROUPING SETS (finer than ROLLUP/CUBE, SURVEY beyond-ref):
    detail, per-flag subtotal, and grand total in ONE pass — Spark expands
    the sets map-side, so the fact is scanned once, not three times.
    Neither grouping column is ever NULL in the data, so the NULL pattern
    identifies the set without grouping_id."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"]
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            round_half_up(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "pivot_orders_priority_status",
    """SELECT o_orderpriority,
              count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
              count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
              count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
       FROM orders GROUP BY o_orderpriority""",
)
def pivot_orders_priority_status(spark, sf_dir):
    """Pivot (long→wide): order counts by priority × status. The status
    values are pinned explicitly, so Spark skips the extra distinct-values
    job and the plan is a single partial-aggregated groupBy."""
    view = _view(spark, sf_dir)
    piv = (
        view.tables["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@register(
    "q22_rich_inactive_customers",
    """SELECT c_nationkey,
              count(*) AS n_rich_inactive,
              floor((CAST(sum(CAST((c_acctbal) AS DECIMAL(27,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_bal
       FROM customer
       WHERE c_acctbal > (SELECT CAST(sum(CAST((c_acctbal) AS DECIMAL(27,4))) AS DOUBLE) / count(*) FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
       GROUP BY c_nationkey""",
)
def q22_rich_inactive_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar aggregate subquery (broadcast as a 1-row
    frame, same pattern as PageRank's dangling mass) + NOT EXISTS as a
    LEFT ANTI join. No correlated per-row execution anywhere."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    cust = view.tables["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("__avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            view.tables["orders"]
            .filter(F.col("o_orderstatus") == "O")
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rich_inactive"),
            round_half_up(dsum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
