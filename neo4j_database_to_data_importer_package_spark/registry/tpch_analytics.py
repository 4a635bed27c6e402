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

# Relational analytics (headline bench queries)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
              floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
              floor(({_dsum('l_extendedprice')}) * 100.0 + 0.5) / 100.0 AS sum_base_price,
              floor(({_dsum('l_extendedprice * (1 - l_discount)')}) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
              floor(({_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}) * 100.0 + 0.5) / 100.0 AS sum_charge,
              floor((avg(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
              floor(({_dsum('l_extendedprice')} / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
              floor(({_dsum('l_discount')} / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
              count(*) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark, sf_dir):
    from ..operators.analytics import pricing_summary

    view = _view(spark, sf_dir)
    return pricing_summary(view.tables["lineitem"])


@register(
    "q5_revenue_by_segment_nation",
    f"""SELECT c_mktsegment, n_name, r_name,
              floor(({_dsum('l_extendedprice * (1 - l_discount)')}) * 100.0 + 0.5) / 100.0 AS revenue,
              count(*) AS n_lineitems
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY c_mktsegment, n_name, r_name""",
)
def q5_revenue_by_segment_nation(spark, sf_dir):
    from ..operators.analytics import revenue_by_segment_nation

    return revenue_by_segment_nation(_view(spark, sf_dir))


@register(
    "q3_top_orders_by_revenue",
    f"""SELECT o_orderkey, o_orderpriority,
              floor(({_dsum('l_extendedprice * (1 - l_discount)')}) * 100.0 + 0.5) / 100.0 AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderkey, o_orderpriority
       ORDER BY revenue DESC, o_orderkey LIMIT 20""",
)
def q3_top_orders_by_revenue(spark, sf_dir):
    from ..operators.analytics import top_orders_by_revenue

    return top_orders_by_revenue(_view(spark, sf_dir), limit=20)


@register(
    "supplier_part_volume",
    """SELECT p_brand, s_name,
              floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS total_qty, count(*) AS n_items
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY p_brand, s_name""",
)
def supplier_part_volume(spark, sf_dir):
    from ..operators.analytics import supplier_part_volume as op

    return op(_view(spark, sf_dir))


# ---------------------------------------------------------------------------
