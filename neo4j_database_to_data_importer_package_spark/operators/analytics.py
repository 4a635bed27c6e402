"""Relational analytics over the graph view (engine generalization).

The reference's only aggregations are distinct/count/uniqueness
(SURVEY.md §2.4); a usable engine needs the full groupBy/join/window
analytics surface. These are the headline bench queries: TPC-H-shaped
plans chosen to exercise partial aggregation, broadcast vs shuffle join
selection, and multi-join reordering — all left to Catalyst/AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, round_half_up

from ..sources.star_schema import GraphView


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: full-scan aggregate with computed expressions.

    One wide scan → map-side partial agg on a tiny key space → 4-row
    result; the canonical 'is codegen working' benchmark.

    Money sums go through ``dsum`` (exact decimal accumulation) so the
    cent-rounded outputs are independent of partition/accumulation
    order — same value on any cluster size and in the DuckDB oracle.
    Averages divide the exact decimal sum by the exact count for the
    same reason. l_quantity is integer-valued, so its double sum is
    already exact.
    """
    n = F.count(F.lit(1))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_half_up(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_half_up(dsum("l_extendedprice"), 2).alias("sum_base_price"),
            round_half_up(dsum(disc_price), 2).alias("sum_disc_price"),
            round_half_up(dsum(charge, 6), 2).alias("sum_charge"),
            round_half_up(F.avg("l_quantity"), 6).alias("avg_qty"),
            round_half_up(dsum("l_extendedprice") / n, 6).alias("avg_price"),
            round_half_up(dsum("l_discount") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def revenue_by_segment_nation(view: GraphView) -> DataFrame:
    """TPC-H Q5 shape: fact ⋈ 4 dims; dims broadcast, one shuffle agg.

    lineitem ⋈ orders shuffles on orderkey; customer/nation/region are
    broadcast (AQE) — the 100 TB plan is the same shape with bucketed
    lineitem/orders making even that shuffle optional.
    """
    li, orders = view.tables["lineitem"], view.tables["orders"]
    cust, nation, region = view.tables["customer"], view.tables["nation"], view.tables["region"]
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("c_mktsegment", "n_name", "r_name")
        .agg(
            round_half_up(dsum(revenue), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def top_orders_by_revenue(view: GraphView, limit: int = 20) -> DataFrame:
    """TPC-H Q3 shape: selective join + agg + top-k (TakeOrderedAndProject)."""
    li, orders = view.tables["lineitem"], view.tables["orders"]
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(round_half_up(dsum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(limit)
    )


def supplier_part_volume(view: GraphView) -> DataFrame:
    """Double-fact-join shape: lineitem ⋈ part ⋈ supplier with two
    different keys — exercises join reordering + two shuffles."""
    li, part, supp = view.tables["lineitem"], view.tables["part"], view.tables["supplier"]
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("p_brand", "s_name")
        .agg(
            round_half_up(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def part_copurchase_topk(
    view: GraphView, k: int = 5, min_orders: int = 2
) -> DataFrame:
    """Market-basket co-occurrence: for every part, the ``k`` parts most
    often bought in the same order (ties broken on the partner key) —
    the item-item collaborative-filtering primer.

    Scale shape: per-order pair generation is a self-join of the
    DISTINCT (order, part) table on the order key with p1 < p2 — output
    bounded by Σ basket², not |lineitem|² (baskets are small and the
    distinct collapses duplicate lines first). Pair counts partial-
    aggregate before the one shuffle on (p1, p2); the per-part rank
    window partitions by the part — per-group sorts, never global.
    """
    items = (
        view.tables["lineitem"].select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1")
    )
    b = items.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(b, "o")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co_orders"))
        .filter(F.col("n_co_orders") >= min_orders)
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("p2").alias("p1"), F.col("p1").alias("p2"), "n_co_orders"
        )
    )
    w = Window.partitionBy("p1").orderBy(
        F.col("n_co_orders").desc(), F.col("p2")
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("p1").alias("part"),
            F.col("p2").alias("co_part"),
            "n_co_orders",
            "rnk",
        )
    )


def exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float], n_partitions: int = 64
) -> list[tuple[float, float]]:
    """Distributed EXACT linear-interpolated quantiles (quantile_cont
    semantics, rank r = 1 + (n-1)·q).

    Spark's built-in ``percentile()`` buffers every value in one final
    aggregation buffer — exact but single-node. This is the scale path:
    range-repartition on the value (one shuffle), sort within partitions,
    derive each row's GLOBAL rank as (cumulative partition offset +
    within-partition row_number), and fetch only the O(|qs|) rows whose
    ranks bracket the targets. No task ever holds more than its
    partition; works at any row count.

    Returns [(q, value)] on the driver (quantiles are a scalar result).
    """
    import math

    from pyspark.sql import Window

    data = (
        df.select(F.col(value_col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .repartitionByRange(n_partitions, F.col("v"))
        .sortWithinPartitions("v")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = dict(
            (r["pid"], r["cnt"])
            for r in data.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        )
        n = sum(counts.values())
        if n == 0:
            return [(q, float("nan")) for q in qs]
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        ranks = {q: 1 + (n - 1) * q for q in qs}
        needed = sorted(
            {int(math.floor(r)) for r in ranks.values()}
            | {int(math.ceil(r)) for r in ranks.values()}
        )
        off_expr = F.lit(0)
        for pid, off in offsets.items():
            off_expr = F.when(F.col("pid") == pid, F.lit(off)).otherwise(off_expr)
        w = Window.partitionBy("pid").orderBy("v")
        picked = {
            r["rank"]: r["v"]
            for r in data.withColumn("rank", off_expr + F.row_number().over(w))
            .filter(F.col("rank").isin(needed))
            .collect()
        }
    finally:
        data.unpersist()
    out = []
    for q in qs:
        r = ranks[q]
        lo, hi = picked[int(math.floor(r))], picked[int(math.ceil(r))]
        frac = r - math.floor(r)
        out.append((q, lo + (hi - lo) * frac))
    return out


def deterministic_group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 50,
) -> DataFrame:
    """Fixed-size per-group sample, reproducible across runs, engines,
    and partitionings: rank rows within each group by the md5 of their
    id (a uniform, data-independent order) and keep the first k. The
    window is partitioned by the group column — no global sort — and
    the md5 order means the sample is unbiased w.r.t. any natural
    ordering of the data.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.select(F.col(group_col), F.col(id_col))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(group_col, id_col)
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    n_bins: int = 1000,
) -> DataFrame:
    """Approximate quantiles from a fixed-grid histogram — the mergeable
    bounded-state sketch pattern: per-partition bin counts (map-side
    partial aggregation, state = n_bins longs regardless of data volume)
    merge associatively; the quantile read-off walks the n_bins-row
    cumulative histogram. Error is bounded by one bin width of the value
    range. Deterministic (same grid everywhere), unlike sampling
    sketches, so the same query in any engine returns the same estimate.

    Returns (quantile, estimate) with estimate = the upper edge of the
    bin where the cumulative count crosses q * total.
    """
    from pyspark.sql import Window

    lohi = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    w = (hi - lo) / n_bins or 1.0
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)).cast("int"),
    )
    hist = df.select(bin_col.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).crossJoin(F.broadcast(hist.agg(F.sum("c").alias("total"))))
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "quantile double"
    )
    crossed = cum.join(
        F.broadcast(qdf), F.col("cum") >= F.col("quantile") * F.col("total")
    )
    return (
        crossed.groupBy("quantile")
        .agg(F.min("bin").alias("qbin"))
        .select(
            "quantile",
            round_half_up(F.lit(lo) + (F.col("qbin") + 1) * F.lit(w), 6).alias(
                "estimate"
            ),
        )
    )


def customer_rfm_segments(view: GraphView) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (decimal-exact lifetime total), each scored 1-5 against exact
    quintile thresholds.

    Scale shape: the thresholds are FIVE numbers — computed once
    (percentile over the per-customer aggregate; swap in
    ``exact_quantiles`` or approx_percentile beyond validation scale)
    and broadcast, so the scoring pass is map-side. No global ntile
    window over the customer table (the round-3 lesson: rank windows
    don't scale; threshold broadcasts do).
    """
    from ..functions.numeric import dsum, round_half_up

    o = view.tables["orders"]
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("__maxd"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            round_half_up(dsum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.datediff("__maxd", "last_order").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    thresholds = per_cust.agg(
        F.expr(f"percentile(recency_days, array({','.join(map(str, qs))}))").alias("rq"),
        F.expr(f"percentile(frequency, array({','.join(map(str, qs))}))").alias("fq"),
        F.expr(f"percentile(monetary, array({','.join(map(str, qs))}))").alias("mq"),
    )

    def score(col, q_col, invert=False):
        # 1 + number of thresholds strictly exceeded; recency inverts
        # (lower = better)
        s = F.lit(1)
        for i in range(4):
            s = s + (F.col(col) > F.element_at(F.col(q_col), i + 1)).cast("int")
        return (F.lit(6) - s if invert else s).alias(f"{col}_score")

    return (
        per_cust.crossJoin(F.broadcast(thresholds))
        .select(
            "c_custkey",
            "recency_days",
            "frequency",
            "monetary",
            score("recency_days", "rq", invert=True),
            score("frequency", "fq"),
            score("monetary", "mq"),
        )
        .withColumnRenamed("recency_days_score", "r_score")
        .withColumnRenamed("frequency_score", "f_score")
        .withColumnRenamed("monetary_score", "m_score")
    )


def basket_association_rules(
    view: GraphView, min_co_orders: int = 3
) -> DataFrame:
    """Association rules over order baskets: for every directed part
    pair seen in >= ``min_co_orders`` common orders, support,
    confidence and lift — the classical market-basket read-out on top
    of the co-purchase counts.

    All three metrics are ratios of exact integer counts (single IEEE
    divisions — deterministic in any engine). Same scale shape as
    ``part_copurchase_topk``: Σ basket² pair generation, then
    dimension-sized joins of the per-part order counts.
    """
    from ..functions.numeric import round_half_up

    items = view.tables["lineitem"].select("l_orderkey", "l_partkey").distinct()
    # 1-row broadcast, not a driver .count(): keeps the whole rule table
    # one lazy plan
    n_orders = items.select(
        F.count_distinct("l_orderkey").alias("__n_orders")
    )
    per_part = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_orders_part")
    )
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "o")
        .where(F.col("p1") != F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co_orders"))
        .filter(F.col("n_co_orders") >= min_co_orders)
    )
    na = per_part.select(F.col("l_partkey").alias("p1"), F.col("n_orders_part").alias("n_a"))
    nb = per_part.select(F.col("l_partkey").alias("p2"), F.col("n_orders_part").alias("n_b"))
    return (
        pairs.join(na, "p1")
        .join(nb, "p2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("p1").alias("antecedent"),
            F.col("p2").alias("consequent"),
            "n_co_orders",
            round_half_up(F.col("n_co_orders") / F.col("__n_orders"), 6).alias(
                "support"
            ),
            round_half_up(F.col("n_co_orders") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            round_half_up(
                (F.col("n_co_orders") / F.col("n_a"))
                / (F.col("n_b") / F.col("__n_orders")),
                6,
            ).alias("lift"),
        )
    )


def copurchase_recommendations(
    view: GraphView, k: int = 3, min_co_orders: int = 2
) -> DataFrame:
    """Item-based collaborative filtering, end to end: recommend to each
    customer the ``k`` parts they have NOT bought whose co-purchase
    affinity with their history is strongest — score(c, q) = the number
    of c's purchased parts that co-occur (≥ ``min_co_orders`` shared
    orders) with q, ties to the smaller part key. The candidate-
    generation stage of every production recommender, expressed as
    joins over ``part_copurchase_topk``'s bounded pair table.

    Scale shape: purchases are the DISTINCT (customer, part) projection;
    the item-item table is bounded by Σ basket² and pre-filtered by
    ``min_co_orders`` before the expansion join, so the candidate fan-out
    is |purchases| × (capped item degree) — the standard blocked
    candidate generation (a production system would also cap the item
    neighbor list at top-N affinity, which ``part_copurchase_topk``
    already demonstrates). Existing purchases leave via a left-anti
    join; the final cut is a per-customer rank window (per-group sorts,
    never global).
    """
    li = view.tables["lineitem"].select("l_orderkey", "l_partkey")
    orders = view.tables["orders"].select("o_orderkey", "o_custkey")
    # (r14 ablation: persisting this projection measured 1.22× SLOWER
    # isolated — the two consumers' identical subtrees already dedup via
    # exchange reuse, and the cache write + scans cost more than they
    # save. Left exactly as-is.)
    purchases = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    items = li.distinct()
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "o")
        .where(F.col("p1") != F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_co_orders)
    )
    cand = (
        purchases.join(pairs, purchases["p"] == pairs["p1"])
        .groupBy(F.col("c"), F.col("p2").alias("rec_part"))
        .agg(F.count(F.lit(1)).alias("common_items"))
    )
    fresh = cand.join(
        purchases.select("c", F.col("p").alias("rec_part")),
        ["c", "rec_part"],
        "left_anti",
    )
    w = Window.partitionBy("c").orderBy(
        F.col("common_items").desc(), F.col("rec_part")
    )
    return (
        fresh.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("c").alias("custkey"), "rec_part", "common_items", "rnk")
    )


def grouped_linear_regression(
    df: DataFrame,
    group_col: str,
    x_col,
    y_col,
    min_points: int = 3,
    digits: int = 6,
) -> DataFrame:
    """Per-group closed-form least squares: slope, intercept, and
    Pearson r of ``y_col`` on ``x_col`` within every group — the
    grouped trend-fit behind per-segment elasticity, per-source drift
    slopes, and per-key calibration lines. ``x_col``/``y_col`` accept
    Column expressions, so callers fit on transforms (ln-ln for
    elasticities) without materializing them.

    One aggregation pass: slope = cov_pop(x,y)/var_pop(x) per group,
    map-side combined; groups with fewer than ``min_points`` rows or a
    degenerate x (var 0) emit NULL fits rather than dividing by zero
    (ANSI-safe). Output is group-dimension-sized.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    base = df.select(F.col(group_col), x.alias("__x"), y.alias("__y"))
    vx = F.var_pop("__x")
    vy = F.var_pop("__y")
    cxy = F.covar_pop("__x", "__y")
    n = F.count(F.lit(1))
    ok = (n >= min_points) & (vx > 0)
    slope = F.when(ok, cxy / vx)
    return base.groupBy(group_col).agg(
        n.alias("n_points"),
        round_half_up(slope, digits).alias("slope"),
        round_half_up(
            F.when(ok, F.avg("__y") - cxy / vx * F.avg("__x")), digits
        ).alias("intercept"),
        round_half_up(
            F.when(ok & (vy > 0), cxy / F.sqrt(vx * vy)), digits
        ).alias("pearson_r"),
    )


def pareto_skyline_2d(
    df: DataFrame,
    x_col,
    y_col,
    n_buckets: int = 64,
) -> DataFrame:
    """2-D Pareto skyline (both objectives MINIMIZED): rows not
    dominated by any other row — a dominates b iff a.x ≤ b.x and
    a.y ≤ b.y with at least one strict — the classic "cheapest AND
    earliest" frontier query relational engines lack as a primitive.

    Scale shape (the reason this isn't a naive O(n²) NOT EXISTS):
    1. bucket x into ``n_buckets`` equal-width cells (min/max from one
       scan), compute per-bucket min(y) — a bounded aggregate;
    2. prefix-min over the bucket table (a window over ≤n_buckets
       rows) gives, for every bucket, the best y seen in any STRICTLY
       EARLIER bucket — any row with y > that bound is dominated by
       the earlier bucket's witness and is pruned in one broadcast
       screen (survivors hug the frontier, so the screened set is
       tiny);
    3. exact dominance check among the survivors only (the O(k²)
       self-join runs on frontier-sized k, not n).
    Output: the skyline rows (x, y), deduplicated.
    """
    from ..functions.numeric import round_half_up  # noqa: F401 (parity import)

    pts = df.select(
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).distinct()
    rng = pts.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax")
    )
    bucketed = pts.crossJoin(F.broadcast(rng)).select(
        "x",
        "y",
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("x") - F.col("xmin"))
                / ((F.col("xmax") - F.col("xmin")) / n_buckets + 1e-12)
            ).cast("int"),
        ).alias("b"),
    )
    per_b = bucketed.groupBy("b").agg(F.min("y").alias("min_y"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    screen = per_b.select(
        "b", F.min("min_y").over(wb).alias("prev_best_y")
    )
    cand = (
        bucketed.join(F.broadcast(screen), "b")
        .filter(
            F.col("prev_best_y").isNull()
            | (F.col("y") <= F.col("prev_best_y"))
        )
        .select("x", "y")
    )
    a = cand.select(F.col("x").alias("ax"), F.col("y").alias("ay"))
    dominated = (
        cand.join(
            a,
            (F.col("ax") <= F.col("x"))
            & (F.col("ay") <= F.col("y"))
            & ((F.col("ax") < F.col("x")) | (F.col("ay") < F.col("y"))),
            "left_semi",
        )
    )
    return cand.exceptAll(dominated).select("x", "y")


def order_total_reconciliation(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Cross-table reconciliation audit: recompute each order's total
    from its lineitems (Σ extendedprice·(1−discount)·(1+tax), exact
    decimal) and histogram the recomputed/o_totalprice ratio in 0.1
    buckets — the referential-consistency check a pipeline runs after
    ingesting two "should agree" feeds (here they DON'T: the synthetic
    generator's totals are independent of the lineitems, and this
    query is what catches that class of upstream bug).

    One per-order decimal aggregate (map-side combined), one keyed
    equi-join to orders, one bounded histogram aggregate (ratio range
    / 0.1 buckets). Ratios are 6-dp rounded before bucketing/min/max,
    so every emitted number is partition- and engine-independent.
    """
    rec = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        dsum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            6,
        ).alias("recomputed")
    )
    ratio = round_half_up(F.col("recomputed") / F.col("o_totalprice"), 6)
    joined = orders.select("o_orderkey", "o_totalprice").join(
        rec, "o_orderkey"
    ).select(ratio.alias("ratio"))
    bucket = F.floor(F.col("ratio") * 10.0 + 0.5) / 10.0
    return (
        joined.groupBy(bucket.alias("ratio_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("ratio").alias("min_ratio"),
            F.max("ratio").alias("max_ratio"),
        )
    )


def changepoint_day(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
) -> DataFrame:
    """Single-changepoint locator for a daily value series (binary
    segmentation, one split): the day boundary that maximizes the
    between-segment sum-of-squares reduction n_l·n_r/N·(μ_l−μ_r)² —
    the batch companion to the streaming CUSUM monitor (CUSUM says
    "drifting now", this pinpoints WHERE the level shifted in the
    history).

    Per-day decimal aggregates first (the only pass over raw rows),
    then cumulative sums over the bounded distinct-day table and a
    TakeOrdered argmax — the same bounded-window discipline as
    ``ks_drift``. All candidate statistics derive from exact decimal
    day sums, and the argmax orders by the 6-dp-rounded statistic with
    a day tiebreak, so the chosen split is engine-stable.
    """
    days = orders.groupBy(
        F.date_format(F.col(date_col), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(27,4)")).alias("s"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = days.select(
        "day",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
    )
    totals = days.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("s").alias("st")
    )
    # decimal sums stay exact through the cumulative window (a double
    # cumsum would depend on the engine's window-summation tree); cast
    # to double only at the division
    cand = cum.crossJoin(F.broadcast(totals)).where(
        (F.col("cn") > 0) & (F.col("nn") - F.col("cn") > 0)
    )
    ml = F.col("cs").cast("double") / F.col("cn")
    mr = (F.col("st") - F.col("cs")).cast("double") / (F.col("nn") - F.col("cn"))
    delta = (
        (ml - mr) * (ml - mr)
        * F.col("cn") * (F.col("nn") - F.col("cn")) / F.col("nn")
    )
    scored = cand.select(
        F.col("day").alias("split_day"),
        F.col("cn").cast("long").alias("n_before"),
        (F.col("nn") - F.col("cn")).cast("long").alias("n_after"),
        round_half_up(ml, 2).alias("mean_before"),
        round_half_up(mr, 2).alias("mean_after"),
        round_half_up(delta, 6).alias("delta_stat"),
    )
    return scored.orderBy(F.desc("delta_stat"), F.asc("split_day")).limit(1)


def daily_order_backlog(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Daily order backlog: cumulative orders opened minus cumulative
    orders fully shipped (an order closes when its LAST lineitem
    ships) — the operational work-in-progress series that neither
    feed shows alone, and a second cross-feed alignment check next to
    ``order_total_reconciliation`` (that one audits money, this one
    audits lifecycle).

    One per-order max-shipdate aggregate, two per-day counts, a full
    outer day-join, then integer cumulative sums over the bounded
    distinct-day table (the ``ks_drift`` bounded-window discipline).
    Everything is exact integers — engine-identical by construction.
    """
    opened = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_opened"))
    closed = (
        lineitem.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("close_ts"))
        .groupBy(F.date_format("close_ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_closed"))
    )
    days = opened.join(closed, "day", "full_outer").select(
        "day",
        F.coalesce("n_opened", F.lit(0)).alias("n_opened"),
        F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return days.select(
        "day",
        F.col("n_opened").cast("long").alias("n_opened"),
        F.col("n_closed").cast("long").alias("n_closed"),
        (F.sum("n_opened").over(w) - F.sum("n_closed").over(w))
        .cast("long")
        .alias("backlog"),
    )


def supplier_delay_trend(
    orders: DataFrame,
    lineitem: DataFrame,
    top_k: int = 5,
) -> DataFrame:
    """Per-supplier delivery-delay TREND: OLS slope of (ship − order)
    days against order date, surfacing the ``top_k`` suppliers whose
    lead times are WORSENING fastest — the procurement early-warning
    that a level metric (mean delay) hides until it is already bad.

    One keyed join, then a single sums-only aggregate per supplier:
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) over exact integer sums. The
    x axis is recentered to days-since-1995 so every sum stays far
    from long overflow even at 10⁹ rows per supplier; single-day
    suppliers (zero x-variance) are excluded before the ANSI-safe
    division. TakeOrderedAndProject for the top-k.
    """
    j = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("y"),
    )
    agg = j.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    )
    scored = agg.where(den > 0).select(
        "l_suppkey",
        F.col("n").cast("long").alias("n_lineitems"),
        round_half_up(F.col("sy") / F.col("n"), 2).alias("mean_delay_days"),
        round_half_up(slope * 365.0, 6).alias("delay_trend_days_per_year"),
    )
    return scored.orderBy(
        F.desc("delay_trend_days_per_year"), F.asc("l_suppkey")
    ).limit(top_k)


def brand_return_wilson(
    lineitem: DataFrame,
    part: DataFrame,
    z: float = 1.96,
) -> DataFrame:
    """Return-rate ranking per part brand with the Wilson score lower
    bound — the small-sample-honest way to rank rates (a brand with
    2/2 returns must NOT outrank one with 90/1000; the raw rate says
    it does, the Wilson bound says otherwise). The go-to pattern for
    any "worst offenders by rate" leaderboard.

    One keyed join to the part dim (AQE will broadcast it), one
    counts-only aggregate per brand, then pure arithmetic — the
    Wilson expression is written with identical structure in the
    oracle so the doubles agree bit-for-bit before rounding.
    """
    j = lineitem.select(
        "l_partkey", (F.col("l_returnflag") == "R").cast("long").alias("r")
    ).join(
        part.select("p_partkey", "p_brand"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    agg = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("n_returns"),
    )
    p = F.col("n_returns") / F.col("n")
    n = F.col("n")
    z2 = F.lit(z * z)
    lb = (
        p
        + z2 / (2 * n)
        - F.lit(z)
        * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    ) / (1 + z2 / n)
    return agg.select(
        "p_brand",
        "n",
        "n_returns",
        round_half_up(p, 6).alias("return_rate"),
        round_half_up(lb, 6).alias("wilson_lower_bound"),
    )


def cohort_ltv_curve(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    max_age_months: int = 12,
    digits: int = 2,
) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by FIRST-order
    month, then cumulative revenue per cohort member at each month of
    age — the money-grain companion to the retention-cohort triangle
    (retention says who came back; this says what coming back was
    worth), and the curve whose flattening point sets the payback
    window every acquisition budget is judged against.

    One min-aggregate for cohort assignment (month index = y·12+m,
    integer), one keyed join back, one (cohort, age) decimal revenue
    aggregate, and a cumulative window over the BOUNDED (cohort ×
    age ≤ max_age) grid. LTV divides by the fixed cohort size (the
    denominator every later age reuses — not survivors).
    """
    from pyspark.sql import Window
    from ..functions.numeric import dsum, round_half_up

    mon = F.year(ts_col) * 12 + F.month(ts_col)
    first = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.min(mon).alias("cohort_m")
    )
    sizes = first.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    aged = (
        orders.select(
            F.col(cust_col).alias("cust"),
            mon.alias("m"),
            F.col(value_col).alias("v"),
        )
        .join(first, "cust")
        .select(
            "cohort_m",
            (F.col("m") - F.col("cohort_m")).alias("age_months"),
            "v",
        )
        .where(F.col("age_months") <= max_age_months)
    )
    cell = aged.groupBy("cohort_m", "age_months").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum("v", 4).alias("revenue"),
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cell.join(sizes, "cohort_m")
        .select(
            F.col("cohort_m").cast("long").alias("cohort_month"),
            F.col("age_months").cast("long").alias("age_months"),
            "n_orders",
            "cohort_size",
            round_half_up(F.col("revenue"), digits).alias("revenue"),
            round_half_up(
                F.sum(
                    F.col("revenue").cast("decimal(27,4)")
                ).over(w).cast("double")
                / F.col("cohort_size"),
                digits,
            ).alias("cum_ltv_per_customer"),
        )
    )


def value_tier_migration(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    year_a: int = 1995,
    year_b: int = 1996,
    digits: int = 6,
) -> DataFrame:
    """Customer value-tier migration matrix between two periods: each
    customer's revenue quartile (within-period thresholds) in year A
    vs year B, with '(absent)' for customers active in only one —
    the segment-migration table behind every churn/upsell review
    ("are my top-quartile customers staying top-quartile?").

    Per-period per-customer decimal totals (one keyed aggregate
    each), quartile THRESHOLDS as three scalar percentiles
    (broadcast — never a global rank window over customers), tiers
    by comparison, and a full-outer join on customer for the
    bounded 5×5 matrix.
    """
    from ..functions.numeric import dsum, round_half_up

    def tiers(year: int, label: str) -> DataFrame:
        per_cust = (
            orders.where(F.year(ts_col) == year)
            .groupBy(F.col(cust_col).alias("cust"))
            .agg(dsum(value_col, 4).alias("v"))
        )
        q = per_cust.agg(
            F.expr("percentile(v, 0.25)").alias("q1"),
            F.expr("percentile(v, 0.50)").alias("q2"),
            F.expr("percentile(v, 0.75)").alias("q3"),
        )
        tier = (
            F.when(F.col("v") <= F.col("q1"), "T1_low")
            .when(F.col("v") <= F.col("q2"), "T2")
            .when(F.col("v") <= F.col("q3"), "T3")
            .otherwise("T4_top")
        )
        return per_cust.crossJoin(F.broadcast(q)).select(
            "cust", tier.alias(label)
        )
    a = tiers(year_a, "tier_from")
    b = tiers(year_b, "tier_to")
    j = a.join(b, "cust", "full_outer").select(
        F.coalesce("tier_from", F.lit("(absent)")).alias("tier_from"),
        F.coalesce("tier_to", F.lit("(absent)")).alias("tier_to"),
    )
    cell = j.groupBy("tier_from", "tier_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    tot = cell.agg(F.sum("n_customers").alias("__t"))
    return cell.crossJoin(F.broadcast(tot)).select(
        "tier_from",
        "tier_to",
        "n_customers",
        round_half_up(F.col("n_customers") / F.col("__t"), digits).alias(
            "share"
        ),
    )


def revenue_abc_classes(
    lineitem: DataFrame,
    key_col: str = "l_partkey",
    digits: int = 6,
) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue,
    class A = the head covering 80% of cumulative revenue, B = the
    next 15%, C = the tail 5% — the classic stock-policy split,
    reported as class-level counts and revenue shares.

    Per-key exact decimal revenue (one keyed shuffle), then the
    ranking/cumulative window runs over the PER-PART aggregate —
    dimension-sized like customer_balance_deciles (allow-listed with
    the same caveat), never over raw lineitem rows. Deterministic
    (revenue desc, key) ordering; output is the bounded 3-row class
    rollup.
    """
    from pyspark.sql import Window
    from ..functions.numeric import dsum, round_half_up

    rev = lineitem.groupBy(F.col(key_col).alias("key")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "rev"
        )
    )
    tot = rev.agg(
        F.sum(F.col("rev").cast("decimal(27,4)")).cast("double").alias("__t")
    )
    w = Window.orderBy(F.col("rev").desc(), "key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.crossJoin(F.broadcast(tot)).select(
        "key",
        "rev",
        (
            F.sum(F.col("rev").cast("decimal(27,4)")).over(w).cast("double")
            / F.col("__t")
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    out = ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("rev").cast("decimal(27,4)"))
        .cast("double")
        .alias("__r"),
    )
    t2 = out.agg(F.sum("__r").alias("__tt"))
    return out.crossJoin(F.broadcast(t2)).select(
        "abc_class",
        "n_keys",
        round_half_up(F.col("__r"), 2).alias("revenue"),
        round_half_up(F.col("__r") / F.col("__tt"), digits).alias(
            "revenue_share"
        ),
    )


def quarterly_yoy_growth(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    digits: int = 6,
) -> DataFrame:
    """Year-over-year revenue growth per nation and quarter — the BI
    staple that deseasonalizes by construction (Q3-vs-Q3 needs no
    seasonal model): revenue per (nation, year, quarter) plus the
    growth rate against the SAME quarter one year earlier, computed
    by a keyed self-join on the bounded quarterly aggregate (no
    windows at all — the prior-year cell is an equi-join key).

    Two dim joins (AQE broadcasts nation/customer-slim), one decimal
    aggregate, one self-join over ~nations·years·4 rows.
    """
    from ..functions.numeric import dsum, round_half_up

    j = (
        orders.select(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qt"),
            "o_totalprice",
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            nation.select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    cell = j.groupBy("n_name", "yr", "qt").agg(
        dsum("o_totalprice", 4).alias("revenue")
    )
    prev = cell.select(
        "n_name",
        (F.col("yr") + 1).alias("yr"),
        "qt",
        F.col("revenue").alias("prev_revenue"),
    )
    return (
        cell.join(prev, ["n_name", "yr", "qt"], "left")
        .select(
            F.col("n_name").alias("nation"),
            F.col("yr").cast("long").alias("year"),
            F.col("qt").cast("long").alias("quarter"),
            round_half_up(F.col("revenue"), 2).alias("revenue"),
            round_half_up(
                F.col("revenue") / F.col("prev_revenue") - 1.0, digits
            ).alias("yoy_growth"),
        )
    )


def reorder_interval_profile(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    digits: int = 2,
) -> DataFrame:
    """Purchase-cadence profile: the distribution of days between a
    customer's consecutive orders, as a log2-bucketed histogram plus
    exact overall median/mean — the replenishment-cycle read-out that
    sets reorder-reminder timing and flags subscription-like behavior
    (a spike at a fixed bucket).

    One lag window per customer (the standard per-key sequence
    sort), one bounded histogram rollup; the median comes from a
    cumulative walk over the bounded day-gap domain — never a global
    sort of raw intervals.
    """
    from pyspark.sql import Window
    from ..functions.numeric import round_half_up

    w = Window.partitionBy(cust_col).orderBy(F.col(ts_col))
    gaps = orders.select(
        F.datediff(F.col(ts_col), F.lag(ts_col).over(w)).alias("gap_d")
    ).where(F.col("gap_d").isNotNull())
    by_gap = gaps.groupBy("gap_d").agg(F.count(F.lit(1)).alias("c"))
    tot = by_gap.agg(
        F.sum("c").cast("long").alias("n_intervals"),
        F.sum(F.col("c") * F.col("gap_d")).cast("long").alias("sum_d"),
    )
    wc = (
        Window.orderBy("gap_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = by_gap.select(
        "gap_d", "c", F.sum("c").over(wc).alias("cum")
    ).crossJoin(F.broadcast(tot))
    r1 = F.floor((F.col("n_intervals") + 1) / 2)
    r2 = F.floor((F.col("n_intervals") + 2) / 2)
    med = cum.where(
        (F.col("cum") - F.col("c") < r1) & (r1 <= F.col("cum"))
    ).select(F.col("gap_d").alias("m1")).crossJoin(
        cum.where(
            (F.col("cum") - F.col("c") < r2) & (r2 <= F.col("cum"))
        ).select(F.col("gap_d").alias("m2"))
    ).select(((F.col("m1") + F.col("m2")) / 2.0).alias("median_gap_d"))
    hist = by_gap.groupBy(
        F.floor(F.log2(F.col("gap_d") + 1)).cast("long").alias(
            "log2_gap_bucket"
        )
    ).agg(F.sum("c").cast("long").alias("n_intervals_bucket"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(med))
        .select(
            "log2_gap_bucket",
            "n_intervals_bucket",
            F.col("n_intervals"),
            round_half_up(
                F.col("sum_d").cast("double") / F.col("n_intervals"),
                digits,
            ).alias("mean_gap_d"),
            round_half_up(F.col("median_gap_d"), 1).alias("median_gap_d"),
        )
    )


def share_shift_leaderboard(
    lineitem: DataFrame,
    key_col: str = "l_suppkey",
    ts_col: str = "l_shipdate",
    year_a: int = 1995,
    year_b: int = 1996,
    top_k: int = 20,
    digits: int = 6,
) -> DataFrame:
    """Market-share movers: each supplier's share of total revenue in
    year A vs year B and the top-k by absolute share change — the
    "who is winning/losing ground" leaderboard, share-based so it is
    immune to overall market growth.

    Two per-period keyed decimal aggregates + 1-row totals; shares
    are 9-dp rounded BEFORE the delta so ordering is
    engine-deterministic; top-k via TakeOrdered on
    (|delta| desc, key) — no windows.
    """
    from ..functions.numeric import dsum, round_half_up

    def shares(year: int, share_name: str) -> DataFrame:
        rev = (
            lineitem.where(F.year(ts_col) == year)
            .groupBy(F.col(key_col).alias("key"))
            .agg(
                dsum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).alias("rev")
            )
        )
        tot = rev.agg(
            F.sum(F.col("rev").cast("decimal(27,4)"))
            .cast("double")
            .alias("__t")
        )
        return rev.crossJoin(F.broadcast(tot)).select(
            "key",
            round_half_up(F.col("rev") / F.col("__t"), 9).alias(share_name),
        )
    a = shares(year_a, "share_a")
    b = shares(year_b, "share_b")
    j = a.join(b, "key", "full_outer").select(
        "key",
        F.coalesce("share_a", F.lit(0.0)).alias("share_a"),
        F.coalesce("share_b", F.lit(0.0)).alias("share_b"),
    )
    delta = F.col("share_b") - F.col("share_a")
    return (
        j.select(
            F.col("key").cast("long").alias(key_col),
            round_half_up(F.col("share_a"), digits).alias("share_a"),
            round_half_up(F.col("share_b"), digits).alias("share_b"),
            round_half_up(delta, digits).alias("share_delta"),
            F.abs(delta).alias("__ad"),
        )
        .orderBy(F.col("__ad").desc(), key_col)
        .limit(top_k)
        .drop("__ad")
    )


def cumulative_distinct_customers(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    cust_col: str = "o_custkey",
) -> DataFrame:
    """Monthly active / new / cumulative-distinct customer curve — the
    growth-accounting view every warehouse wants and the classic
    example of a metric that is WRONG to compute naively at scale: a
    ``count(distinct)`` over an ever-growing unbounded window re-scans
    all history per month.

    Scale-correct decomposition instead: "cumulative distinct as of
    month m" ≡ "customers whose FIRST order is ≤ m", so one
    per-customer min-date aggregate (customer-keyed shuffle, exact)
    turns the running distinct into a running SUM of first-order
    counts. The only window runs over the aggregated MONTH domain —
    bounded (#months rows, single partition of a ~100-row frame), the
    same bounded-domain exemption as ``orders_daily_backlog``.

    Output: month ('yyyy-MM' string — engine-portable rendering, the
    module's timestamp convention), n_active (distinct customers that
    month), n_new (customers whose first order is that month),
    cum_customers (running distinct).
    """
    month = F.date_format(F.col(date_col), "yyyy-MM")
    active = (
        orders.select(month.alias("month"), F.col(cust_col).alias("c"))
        .groupBy("month")
        .agg(F.count_distinct(F.col("c")).alias("n_active"))
    )
    new = (
        orders.groupBy(F.col(cust_col).alias("c"))
        .agg(F.min(month).alias("month"))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new, "month", "left")
        .select(
            "month",
            "n_active",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_customers", F.sum("n_new").over(w))
    )


def recs_coverage_diversity(
    view: GraphView, k: int = 5, min_orders: int = 2, digits: int = 6
) -> DataFrame:
    """Recommender-quality audit of the item-item co-purchase lists
    (``part_copurchase_topk``): catalog coverage (what share of the
    catalog is ever recommended — low coverage means the recommender
    only resurfaces bestsellers) and mean intra-list brand diversity
    (distinct brands / list length per list — redundancy of each
    slate), plus list-length accounting. The offline eval every recsys
    team runs before an online test.

    Determinism: coverage and lengths are integer-count ratios; each
    list's diversity ratio is rounded to 9 dp then decimal-summed
    before the mean (the standing contract).

    Scale shape: everything downstream of the recs table is either a
    part-keyed aggregate (lists) or a distinct count; the part-dim
    join is an equi-join AQE will broadcast when the dim fits.
    """
    recs = part_copurchase_topk(view, k=k, min_orders=min_orders)
    brands = view.tables["part"].select(
        F.col("p_partkey").alias("co_part"), "p_brand"
    )
    lists = (
        recs.join(brands, "co_part")
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.count_distinct("p_brand").alias("nb"),
        )
    )
    div9 = round_half_up(F.col("nb") / F.col("len"), 9)
    per = lists.agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.sum("len").cast("bigint").alias("__lens"),
        F.sum(div9.cast("decimal(28,9)")).cast("double").alias("__sdiv"),
    )
    cov = recs.agg(F.count_distinct("co_part").alias("__nrec"))
    cat = view.tables["part"].agg(F.count(F.lit(1)).alias("n_catalog"))
    return (
        per.crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_lists",
            "n_catalog",
            F.col("__nrec").alias("n_recommended"),
            round_half_up(F.col("__nrec") / F.col("n_catalog"), digits).alias(
                "coverage"
            ),
            round_half_up(F.col("__lens") / F.col("n_lists"), digits).alias(
                "mean_list_len"
            ),
            round_half_up(F.col("__sdiv") / F.col("n_lists"), digits).alias(
                "mean_brand_diversity"
            ),
        )
    )


def dual_sourcing_overlap(
    view: GraphView, k: int = 20, digits: int = 6
) -> DataFrame:
    """Supplier-pair sourcing overlap: for every supplier pair, how many
    distinct parts BOTH ship (from the lineitem fact) and the Jaccard of
    their part portfolios — the supply-chain "who could replace whom"
    screen, top-``k`` by shared-part count.

    Scale shape: the pair join keys on the PART (bounded by
    suppliers-per-part², the same Σ group² bound as the co-purchase
    join, never |suppliers|²); portfolio sizes come from one
    supplier-keyed aggregate; the read-out is TakeOrderedAndProject.
    Jaccard is an exact integer ratio.
    """
    # r14: persist the distinct (supplier, part) projection — its three
    # consumers (portfolio sizes + both self-join sides) otherwise each
    # re-run the fact-table scan + distinct.
    # Lifecycle (r15, VERDICT r14 #8): bare persist() defaults to
    # MEMORY_AND_DISK (evictions spill, not recompute); cleanup is
    # caller-scoped (clearCache per query) since the result is lazily
    # returned — no in-operator unpersist point exists.
    sp = (
        view.tables["lineitem"]
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    sizes = sp.groupBy("s").agg(F.count(F.lit(1)).alias("n_parts"))
    a = sp.select(F.col("s").alias("s1"), "p")
    b = sp.select(F.col("s").alias("s2"), "p")
    shared = (
        a.join(b, "p")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    top = (
        shared.join(
            sizes.select(F.col("s").alias("s1"), F.col("n_parts").alias("n1")),
            "s1",
        )
        .join(
            sizes.select(F.col("s").alias("s2"), F.col("n_parts").alias("n2")),
            "s2",
        )
        .select(
            "s1",
            "s2",
            "n_shared",
            "n1",
            "n2",
            round_half_up(
                F.col("n_shared")
                / (F.col("n1") + F.col("n2") - F.col("n_shared")),
                digits,
            ).alias("jaccard"),
        )
    )
    return top.orderBy(
        F.desc("n_shared"), F.asc("s1"), F.asc("s2")
    ).limit(k)
