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

# TPC-H query-shape coverage, adapted to the reduced star schema (no
# partsupp / commitdate / receiptdate columns in the testdata). Each
# entry exercises a distinct plan shape a warehouse engine must get
# right: EXISTS semi-joins, fact-fact joins with dim broadcasts,
# conditional aggregation, HAVING over exact (integer-valued) sums.
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate)
       GROUP BY o_orderpriority""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H q4 shape: EXISTS correlated subquery. Because the correlated
    predicate is monotone in one lineitem column (exists l with
    l_shipdate > o_orderdate  <=>  max(l_shipdate) > o_orderdate), the
    semi join decorrelates into a per-order max aggregate — lineitem
    collapses to one row per order BEFORE the join, so the join input is
    |orders|, not |lineitem|, and the aggregate is map-side partial."""
    view = _view(spark, sf_dir)
    o, li = view.tables["orders"], view.tables["lineitem"]
    mx = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("max_ship"))
    return (
        o.join(mx, o.o_orderkey == mx.l_orderkey)
        .filter(F.col("max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_nation_volume_shipping",
    f"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
              year(l_shipdate) AS ship_year,
              floor({_dsum('l_extendedprice * (1 - l_discount)')}
                    * 100.0 + 0.5) / 100.0 AS revenue
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       WHERE cn.n_name != sn.n_name
       GROUP BY 1, 2, 3""",
)
def q7_nation_volume_shipping(spark, sf_dir):
    """TPC-H q7 shape: one fact-fact shuffle join (lineitem x orders on
    the order key) and four broadcast dimension joins; cross-nation
    trade volume by ship year."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    t = view.tables
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            # dsum: decimal addition is exact and therefore order-
            # independent — a double sum drifts ~1e-3 at 1e6 magnitude and
            # landed 7 of 4188 groups on the cent boundary in r03.
            round_half_up(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_revenue_by_nation",
    """SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
              floor(CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,4))) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS lost_revenue
       FROM customer
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN orders   ON o_custkey = c_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE l_returnflag = 'R'
       GROUP BY n_name""",
)
def q10_returned_revenue_by_nation(spark, sf_dir):
    """TPC-H q10 shape: returned-item revenue. The returnflag filter is
    pushed into the lineitem scan; customer and nation broadcast."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    t = view.tables
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            round_half_up(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue"),
        )
    )


@register(
    "q12_shipping_delay_class",
    """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                   THEN 'fast' ELSE 'slow' END AS delay_class,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1""",
)
def q12_shipping_delay_class(spark, sf_dir):
    """TPC-H q12 shape: conditional (pivoted) aggregation over a derived
    bucket; single fact-fact join, two-row output."""
    view = _view(spark, sf_dir)
    t = view.tables
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, "fast"
            )
            .otherwise("slow")
            .alias("delay_class"),
            F.when(hi, 1).otherwise(0).alias("is_hi"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum("is_hi").alias("high_line_count"),
            F.sum(1 - F.col("is_hi")).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    """SELECT floor(100.0 * CAST(sum(CAST((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS DECIMAL(27,4))) AS DOUBLE)
                    / CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,4))) AS DOUBLE) * 1000000.0 + 0.5)
              / 1000000.0 AS promo_share_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey""",
)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H q14 shape: ratio of conditional to total aggregate in one
    pass; part broadcasts into the lineitem scan."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    t = view.tables
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round_half_up(
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / dsum(rev),
                6,
            ).alias("promo_share_pct")
        )
    )


@register(
    "q18_large_volume_orders",
    f"""SELECT c_custkey, o.o_orderkey,
               strftime(o_orderdate, '{_TS_FMT_DUCK}') AS o_orderdate,
               o_totalprice,
               CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM orders o
        JOIN customer ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3, 4
        HAVING sum(l_quantity) > 150""",
)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H q18 shape: HAVING over a per-order aggregate, joined back to
    the customer. The quantity sum is integer-valued, so the threshold
    compare is FP-exact in any engine. Aggregates lineitem FIRST (the
    only shuffle on the fact), then joins the shrunken result."""
    view = _view(spark, sf_dir)
    t = view.tables
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", _TS_FMT_SPARK).alias("o_orderdate"),
            "o_totalprice",
            F.col("qty").cast("bigint").alias("total_qty"),
        )
    )


@register(
    "q8_market_share",
    """WITH allrev AS (
         SELECT year(l_shipdate) AS ship_year,
                l_extendedprice * (1 - l_discount) AS rev,
                sn.n_regionkey AS supp_region
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         WHERE cn.n_regionkey = 0)
       SELECT ship_year,
              floor(CAST(sum(CAST((CASE WHEN supp_region = 0 THEN rev ELSE 0 END) AS DECIMAL(27,4))) AS DOUBLE)
                    / CAST(sum(CAST((rev) AS DECIMAL(27,4))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS local_share
       FROM allrev GROUP BY ship_year""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H q8 shape: a region's share of its own customers' purchase
    volume per year (how much region-0 customers buy from region-0
    suppliers). Same join tree as q7; the share is a conditional/total
    ratio per group."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    t = view.tables
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cust_region")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_regionkey").alias("supp_region")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("cust_region") == 0)
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            round_half_up(
                dsum(F.when(F.col("supp_region") == 0, rev).otherwise(0.0))
                / dsum(rev),
                6,
            ).alias("local_share")
        )
    )


@register(
    "q9_product_type_profit",
    """SELECT n_name AS supp_nation, year(l_shipdate) AS ship_year,
              floor(CAST(sum(CAST((l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity) AS DECIMAL(27,4))) AS DOUBLE) * 100.0 + 0.5)
              / 100.0 AS profit
       FROM lineitem
       JOIN part     ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation   ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%red%'
       GROUP BY 1, 2""",
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H q9 shape: profit by supplier nation and year over a
    name-filtered part subset (0.6 x retailprice stands in for the
    missing ps_supplycost). The part filter broadcasts; lineitem is
    scanned once, no fact-fact join needed."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    t = view.tables
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("supp_nation"), F.year("l_shipdate").alias("ship_year"))
        .agg(round_half_up(dsum(profit), 2).alias("profit"))
    )


@register(
    "q15_top_supplier",
    """WITH srev AS (
         SELECT l_suppkey,
                floor(CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,4))) AS DOUBLE) * 100.0 + 0.5)
                / 100.0 AS total_rev
         FROM lineitem GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_rev
       FROM srev JOIN supplier ON l_suppkey = s_suppkey
       WHERE total_rev = (SELECT max(total_rev) FROM srev)""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H q15 shape: argmax against a scalar subquery over an
    aggregate. Revenue is rounded to cents BEFORE the max/equality so
    the compare is engine-stable; the one-row max broadcasts."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    t = view.tables
    srev = (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(
            round_half_up(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        srev.join(F.broadcast(mx), srev.total_rev == mx.mx, "inner")
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q19_disjunctive_predicates",
    """SELECT floor(CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,4))) AS DOUBLE) * 100.0 + 0.5)
              / 100.0 AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
              AND l_quantity BETWEEN 20 AND 30)""",
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H q19 shape: three-armed disjunction mixing build-side (part)
    and probe-side (lineitem) predicates. The part-only arms
    (brand OR brand OR brand) are pushed into the broadcast build scan;
    the mixed residual evaluates post-join."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    t = view.tables
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            arm("Brand#12", 15, 1, 11)
            | arm("Brand#23", 25, 10, 20)
            | arm("Brand#34", 35, 20, 30)
        )
        .agg(
            round_half_up(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q11_part_volume_concentration",
    """WITH pq AS (SELECT l_partkey, sum(l_quantity) AS total_qty
                   FROM lineitem GROUP BY l_partkey)
       SELECT l_partkey AS p_partkey, CAST(total_qty AS BIGINT) AS total_qty
       FROM pq
       WHERE total_qty > (SELECT sum(total_qty) * 0.0005 FROM pq)""",
)
def q11_part_volume_concentration(spark, sf_dir):
    """TPC-H q11 shape: HAVING against a global scalar subquery. Both the
    per-part and corpus-wide quantity sums are integer-valued doubles, so
    the threshold compare is FP-exact; the one-row total broadcasts."""
    view = _view(spark, sf_dir)
    pq = (
        view.tables["lineitem"]
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("tq"))
    )
    total = pq.agg((F.sum("tq") * 0.0005).alias("threshold"))
    return (
        pq.join(F.broadcast(total), pq.tq > total.threshold, "inner")
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("tq").cast("bigint").alias("total_qty"),
        )
    )


@register(
    "q16_supplier_counts_by_part",
    """SELECT p_brand, p_type, p_size,
              count(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand != 'Brand#45'
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
       GROUP BY 1, 2, 3""",
)
def q16_supplier_counts_by_part(spark, sf_dir):
    """TPC-H q16 shape: NOT IN exclusion subquery -> broadcast left-anti
    join, then a distinct-count per part attribute triple."""
    view = _view(spark, sf_dir)
    t = view.tables
    excluded = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(t["part"].filter(F.col("p_brand") != "Brand#45")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_heavy_shippers_of_small_parts",
    """WITH pq AS (
         SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_name LIKE 'small%'
         GROUP BY 1, 2),
       avgq AS (SELECT l_partkey, avg(sq) AS av FROM pq GROUP BY 1)
       SELECT DISTINCT s_suppkey, s_name
       FROM pq JOIN avgq USING (l_partkey)
       JOIN supplier ON l_suppkey = s_suppkey
       WHERE sq > 0.5 * av""",
)
def q20_heavy_shippers_of_small_parts(spark, sf_dir):
    """TPC-H q20 shape: nested correlated subqueries decorrelated into
    two aggregates over the same filtered fact -- suppliers who shipped a
    'small %' part at more than half that part's per-supplier average.
    Quantity sums are exact; avg is one exact-operand IEEE division, so
    the predicate is engine-stable."""
    view = _view(spark, sf_dir)
    t = view.tables
    pq = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("small%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    avgq = pq.groupBy("l_partkey").agg(F.avg("sq").alias("av"))
    return (
        pq.join(avgq, "l_partkey")
        .filter(F.col("sq") > 0.5 * F.col("av"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_sole_late_supplier",
    """WITH ls AS (
         SELECT l_orderkey, l_suppkey,
                max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS is_late
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2)
       SELECT s_suppkey, s_name, count(*) AS numwait
       FROM ls a JOIN supplier ON a.l_suppkey = s_suppkey
       WHERE a.is_late = 1
         AND EXISTS (SELECT 1 FROM ls b
                     WHERE b.l_orderkey = a.l_orderkey
                       AND b.l_suppkey != a.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM ls c
                         WHERE c.l_orderkey = a.l_orderkey
                           AND c.l_suppkey != a.l_suppkey
                           AND c.is_late = 1)
       GROUP BY 1, 2""",
)
def q21_sole_late_supplier(spark, sf_dir):
    """TPC-H q21 shape: EXISTS + NOT EXISTS over the same derived table,
    decorrelated into one per-order aggregate -- a supplier waits alone
    when the order has >= 2 suppliers and exactly one late one (itself).
    One extra tiny shuffle replaces two correlated re-scans of the
    fact."""
    view = _view(spark, sf_dir)
    t = view.tables
    ls = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = ls.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        ls.filter(F.col("is_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
