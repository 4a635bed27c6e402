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
from .dedup import _NORM_DUCK, _TOKS_DUCK
from .streaming import _STREAM_SEQ, _replayed_events_stream
from .text import _LANG_LISTS_DUCK

# As-of (point-in-time) join over events — custom operator Spark lacks;
# DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------

@register(
    "asof_latest_high_value",
    f"""WITH marks AS (
          SELECT user_id, ts, floor(max(value) * 10000.0 + 0.5) / 10000.0 AS mark_value
          FROM events WHERE value > 400 GROUP BY 1, 2)
        SELECT e.event_id, e.user_id,
               strftime(e.ts, '{_TS_FMT_DUCK}') AS ts,
               strftime(m.ts, '{_TS_FMT_DUCK}') AS asof_ts,
               m.mark_value AS asof_mark_value
        FROM events e ASOF LEFT JOIN marks m
          ON e.user_id = m.user_id AND e.ts >= m.ts""",
)
def asof_latest_high_value(spark, sf_dir):
    """For every event: the most recent (inclusive) high-value event of
    the same user — single-shuffle union-sort as-of join."""
    from ..functions.numeric import round_half_up
    from ..operators.asof import as_of_join

    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    marks = (
        ev.filter(F.col("value") > 400)
        .groupBy("user_id", "ts")
        .agg(round_half_up(F.max("value"), 4).alias("mark_value"))
    )
    out = as_of_join(
        ev.select("event_id", "user_id", "ts"), marks, on="user_id"
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        F.date_format("asof_ts", _TS_FMT_SPARK).alias("asof_ts"),
        F.col("asof_mark_value"),
    )


# ---------------------------------------------------------------------------
# Selective-scan analytics (TPC-H q6 shape): every predicate must reach
# the parquet reader — the plan-quality test asserts PushedFilters.
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    """SELECT floor(CAST(sum(CAST((l_extendedprice * l_discount) AS DECIMAL(27,4))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS revenue,
              count(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.03 AND 0.07
         AND l_quantity < 24""",
)
def q6_forecast_revenue(spark, sf_dir):
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round_half_up(dsum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Composed corpus-cleaning pipeline: quality gate + language filter +
# exact-dedup survivorship in ONE lazy plan (the realistic LLM-data
# ingest shape — operators compose without materialization barriers).
# ---------------------------------------------------------------------------

@register(
    "corpus_clean_pipeline",
    f"""WITH base AS (
          SELECT doc_id, text, {_TOKS_DUCK} AS t,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars
          FROM documents),
        feat AS (
          SELECT doc_id, n_chars,
                 floor((len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) * 1.0 / len(t)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                 floor((alpha_chars * 1.0 / n_chars) * 1000000.0 + 0.5) / 1000000.0 AS alpha_ratio,
                 (n_chars - (len(t) - 1)) * 1.0 / len(t) AS mean_wlen
          FROM base),
        qual AS (
          SELECT doc_id, n_chars,
                 floor(((CASE WHEN n_chars >= 50 AND n_chars <= 20000 THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN mean_wlen >= 2.0 AND mean_wlen <= 12.0 THEN 0.25 ELSE 0.0 END)
                   + least(stopword_ratio * 2.5, 0.25)
                   + alpha_ratio * 0.25) * 1000000.0 + 0.5) / 1000000.0 AS quality
          FROM feat),
        lscore AS (
          SELECT doc_id,
                 {", ".join(f"len(list_intersect(list_distinct({_TOKS_DUCK}), {lst})) AS score_{lang}" for lang, lst in _LANG_LISTS_DUCK.items())}
          FROM documents),
        lang AS (
          SELECT doc_id,
                 CASE WHEN greatest(score_de, score_en, score_es, score_fr, score_zh) = 0 THEN 'und'
                      WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                      WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                      WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                      WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                      ELSE 'zh' END AS detected_lang
          FROM lscore),
        surv AS (
          SELECT md5({_NORM_DUCK}) AS fp, min(doc_id) AS doc_id, count(*) AS n_dups
          FROM documents GROUP BY 1)
        SELECT q.doc_id, q.n_chars, q.quality, s.n_dups
        FROM qual q
        JOIN lang l ON l.doc_id = q.doc_id
        JOIN surv s ON s.doc_id = q.doc_id
        WHERE q.quality >= 0.5 AND l.detected_lang = 'en'""",
)
def corpus_clean_pipeline(spark, sf_dir):
    """Keep docs that are (a) the canonical survivor of their exact-dup
    group, (b) detected English, (c) quality >= 0.5.

    Single-pass plan: quality, language, and fingerprint are EXPRESSIONS
    fused into one projection over one documents scan (the operator
    functions expose expression-level builders exactly for this);
    survivorship is the only shuffle (fingerprint agg + co-partitioned
    join). The naive operator-join formulation scans documents 4x."""
    from ..functions.text import fingerprint_md5
    from ..operators.text_analysis import language_columns, quality_columns

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        quality_columns("text")["quality"].alias("quality"),
        language_columns("text")["detected_lang"].alias("detected_lang"),
        fingerprint_md5("text").alias("fingerprint"),
    )
    survivors = base.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dups")
    )
    return (
        base.join(survivors, ["fingerprint", "doc_id"])
        .filter((F.col("quality") >= 0.5) & (F.col("detected_lang") == "en"))
        .select("doc_id", "n_chars", "quality", "n_dups")
    )


# ---------------------------------------------------------------------------
# Multi-level aggregation (ROLLUP) and exact quantiles — SQL-surface
# breadth beyond the reference's distinct/count aggregations.
# ---------------------------------------------------------------------------

@register(
    "rollup_revenue_by_flag_status",
    """SELECT l_returnflag, l_linestatus,
              floor(CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(27,4))) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS revenue,
              count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def rollup_revenue_by_flag_status(spark, sf_dir):
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        round_half_up(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "lineitem_price_quantiles",
    """WITH qv AS (
          SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.9, 0.99]) AS v
          FROM lineitem)
        SELECT CAST([0.25, 0.5, 0.9, 0.99][i] AS DOUBLE) AS q,
               floor(v[i] * 10000.0 + 0.5) / 10000.0 AS price_q
        FROM qv, (SELECT unnest(range(1, 5)) AS i) t""",
)
def lineitem_price_quantiles(spark, sf_dir):
    """Exact linear-interpolated quantiles (percentile(), matching
    DuckDB's quantile_cont). The builtin buffers all values in one agg
    buffer — fine at bench SF; the distributed scale path with identical
    results is operators.analytics.exact_quantiles (range partition +
    global-rank lookup, tested equal), or approx_percentile when an
    error bound is acceptable."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"]
    qs = [0.25, 0.5, 0.9, 0.99]
    row = li.agg(
        F.expr(
            f"percentile(l_extendedprice, array({', '.join(map(str, qs))}))"
        ).alias("p")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(q) for q in qs]).alias("q"), F.col("p").alias("price_q")
    )
    return (
        row.select(F.explode(pairs).alias("z"))
        .select(
            F.col("z.q").alias("q"),
            round_half_up(F.col("z.price_q"), 4).alias("price_q"),
        )
    )


# ---------------------------------------------------------------------------
# Anti/semi joins — the idiomatic form of the reference's "filtered rows"
# accounting (SURVEY.md §2.3: exported = all − filtered).
# ---------------------------------------------------------------------------

@register(
    "orders_without_lineitems",
    """SELECT o.o_orderkey, o.o_orderstatus
       FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""",
)
def orders_without_lineitems(spark, sf_dir):
    """Left-anti join: orders with no lineitem rows. At scale the anti
    join broadcasts the distinct key set when small, else shuffles on the
    key like any equi-join — no driver-side set materialization."""
    view = _view(spark, sf_dir)
    o = view.tables["orders"]
    li = view.tables["lineitem"].select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "customers_with_open_orders",
    """SELECT c.c_custkey, c.c_mktsegment
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""",
)
def customers_with_open_orders(spark, sf_dir):
    """Left-semi join with a pushed predicate on the probe side."""
    view = _view(spark, sf_dir)
    c = view.tables["customer"]
    o = view.tables["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Analytic window functions (SURVEY.md §2.5: absent in the reference —
# engine extension): per-user inter-event gaps via lag().
# ---------------------------------------------------------------------------

@register(
    "events_gap_stats",
    """WITH g AS (
         SELECT user_id,
                date_diff('microsecond',
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                          ts) AS gap_us
         FROM events)
       SELECT user_id, count(gap_us) AS n_gaps,
              CAST(min(gap_us) AS BIGINT) AS min_gap_us,
              CAST(max(gap_us) AS BIGINT) AS max_gap_us,
              floor(avg(gap_us) / 10000.0 + 0.5) / 100.0 AS avg_gap_s
       FROM g GROUP BY user_id""",
)
def events_gap_stats(spark, sf_dir):
    """Per-user inter-event gap statistics: lag() over (user, ts) — the
    ranking/analytic window family on event data. One shuffle (partition
    by user), sort within partition, then a partial-aggregated groupBy on
    the same key — no second exchange (same-key clustering is reused)."""
    from pyspark.sql import Window

    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    return (
        ev.select("user_id", gap.alias("gap_us"))
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            round_half_up(F.avg("gap_us") / 1_000_000, 2).alias("avg_gap_s"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding near-dup, LSH-bucketed (scale path next to the exact
# embedding_cosine_pairs): random-hyperplane signatures with
# DETERMINISTIC planes, so the whole approximate pipeline has a SQL twin.
# ---------------------------------------------------------------------------

def _embedding_lsh_oracle() -> str:
    # Mirrors the round-7 scale-safe defaults (VERDICT r06 directive #2):
    # 128 signature bits in 16-bit blocks (8 bands x 65 536 buckets),
    # verified-cosine threshold 0.30, and the max_bucket=8192 occupancy
    # cap (the `kept` CTE — a no-op on the <=2k-row fixtures, mirrored
    # anyway so both engines share the capped semantics).
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(128, 64)
    bit_exprs = ", ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(x) for x in p)
        + "]) >= 0 THEN '1' ELSE '0' END"
        for p in planes
    )
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings),
sig AS (SELECT vec_id, concat({bit_exprs}) AS sig FROM v),
blocks0 AS (
  SELECT vec_id, q, substr(sig, CAST(q * 16 + 1 AS INT), 16) AS block
  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS q) s),
kept AS (
  SELECT q, block FROM blocks0 GROUP BY q, block HAVING count(*) <= 8192),
blocks AS (
  SELECT b.vec_id, b.q, b.block FROM blocks0 b JOIN kept k
    ON b.q = k.q AND b.block = k.block),
cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM blocks a JOIN blocks b
    ON a.q = b.q AND a.block = b.block AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b,
       floor((list_dot_product(x.v, y.v) / (x.norm * y.norm)) * 1000000.0 + 0.5) / 1000000.0 AS cosine
FROM cands c JOIN v x ON x.vec_id = c.id_a JOIN v y ON y.vec_id = c.id_b
WHERE floor((list_dot_product(x.v, y.v) / (x.norm * y.norm)) * 1000000.0 + 0.5) / 1000000.0 >= 0.30
"""


@register("embedding_lsh_pairs", _embedding_lsh_oracle())
def embedding_lsh_pairs(spark, sf_dir):
    from ..operators.similarity import embedding_lsh_pairs as op

    view = _view(spark, sf_dir)
    return op(view.tables["embeddings"])


# ---------------------------------------------------------------------------
# Funnel analysis over events: users who did view -> purchase in order
# (sequence matching via min-timestamp comparison per stage).
# ---------------------------------------------------------------------------

@register(
    "events_funnel_view_purchase",
    f"""WITH s AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
          FROM events GROUP BY user_id)
        SELECT user_id,
               strftime(first_view, '{_TS_FMT_DUCK}') AS first_view,
               strftime(first_purchase, '{_TS_FMT_DUCK}') AS first_purchase,
               (first_purchase > first_view) AS converted
        FROM s WHERE first_view IS NOT NULL""",
)
def events_funnel_view_purchase(spark, sf_dir):
    """Two-stage funnel: for each user with a 'view', did a 'purchase'
    follow it? One groupBy with conditional min aggregates — no self-join
    (the naive events-join-events funnel shuffles the table twice and
    explodes on active users)."""
    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return (
        s.filter(F.col("first_view").isNotNull())
        .select(
            "user_id",
            F.date_format("first_view", _TS_FMT_SPARK).alias("first_view"),
            F.date_format("first_purchase", _TS_FMT_SPARK).alias("first_purchase"),
            (F.col("first_purchase") > F.col("first_view")).alias("converted"),
        )
    )


# ---------------------------------------------------------------------------
# Chain-pattern (mini-Cypher) matching: the graph-query surface a Neo4j
# user expects next to the export — (Customer)-[PLACED]->(Order)-
# [CONTAINS]->(Part), aggregated per customer.
# ---------------------------------------------------------------------------

@register(
    "motif_customer_order_part",
    """SELECT CAST(o.o_custkey AS VARCHAR) AS customer,
              count(*) AS n_paths,
              count(DISTINCT l.l_partkey) AS n_parts
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       GROUP BY o.o_custkey""",
)
def motif_customer_order_part(spark, sf_dir):
    from ..operators.motif import match_chain
    from ..sources.property_graph import edges_from_view

    view = _view(spark, sf_dir)
    paths = match_chain(
        edges_from_view(view), "(Customer)-[PLACED]->(Order)-[CONTAINS]->(Part)"
    )
    return paths.groupBy(F.col("n0").alias("customer")).agg(
        F.count(F.lit(1)).alias("n_paths"),
        F.count_distinct("n2").alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# CUBE (all grouping combinations) and running-total window frames —
# rounding out the multi-level-aggregation / window-frame families.
# ---------------------------------------------------------------------------

@register(
    "cube_orders_by_priority_status",
    """SELECT o_orderpriority, o_orderstatus,
              count(*) AS n,
              floor(CAST(sum(CAST((o_totalprice) AS DECIMAL(27,4))) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS total
       FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
)
def cube_orders_by_priority_status(spark, sf_dir):
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    return view.tables["orders"].cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        round_half_up(dsum("o_totalprice"), 2).alias("total"),
    )


@register(
    "orders_running_total",
    f"""SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '{_TS_FMT_DUCK}') AS o_orderdate,
               floor(CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) * 100.0 + 0.5) / 100.0
               AS running_total
        FROM orders WHERE o_custkey < 100""",
)
def orders_running_total(spark, sf_dir):
    """Cumulative per-customer revenue: an explicit ROWS frame (ordered
    running aggregate). One shuffle on the partition key; the frame scan
    is a per-partition sorted pass."""
    from pyspark.sql import Window

    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    o = view.tables["orders"].filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", _TS_FMT_SPARK).alias("o_orderdate"),
        round_half_up(F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w).cast("double"), 2).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Ranking (ntile deciles), regex extraction over data, and a q17-shape
# decorrelated scalar-subquery aggregate.
# ---------------------------------------------------------------------------

@register(
    "customer_balance_deciles",
    """WITH d AS (
         SELECT c_custkey,
                ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
         FROM customer)
       SELECT decile, count(*) AS n FROM d GROUP BY decile""",
)
def customer_balance_deciles(spark, sf_dir):
    """ntile() global ranking. NOTE the single-partition window: a global
    ORDER BY ntile is inherently one sorted pass — at scale prefer
    approx_percentile bucketing or range-partitioned rank arithmetic
    (operators.analytics.exact_quantiles shows the pattern)."""
    from pyspark.sql import Window

    view = _view(spark, sf_dir)
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        view.tables["customer"]
        .select(F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "part_brand_families",
    """SELECT regexp_extract(p_brand, '#([0-9]+)', 1) AS family,
              count(*) AS n_parts,
              floor(avg(p_retailprice) * 100.0 + 0.5) / 100.0 AS avg_price
       FROM part GROUP BY 1""",
)
def part_brand_families(spark, sf_dir):
    """Regex extraction over data values (the reference only regexes
    catalog text, SURVEY.md §2.8) — stays in codegen."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    return (
        view.tables["part"]
        .groupBy(F.regexp_extract("p_brand", r"#([0-9]+)", 1).alias("family"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            round_half_up(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """SELECT floor(CAST(sum(CAST((l_extendedprice) AS DECIMAL(27,4))) AS DOUBLE) / 7.0 * 100.0 + 0.5) / 100.0 AS avg_yearly
       FROM lineitem l
       JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS lim
             FROM lineitem GROUP BY l_partkey) t
         ON t.l_partkey = l.l_partkey
       WHERE l.l_quantity < t.lim""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H q17 shape: correlated scalar subquery (avg per part),
    decorrelated into a groupBy + join — the per-part aggregate is tiny
    relative to lineitem, so AQE broadcasts it."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"]
    lim = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("lim"))
    return (
        li.join(lim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(round_half_up(dsum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Interval (range) join: purchases within 24h after each signup, per
# user — bucketed equi-join shape, not a per-key cross product.
# ---------------------------------------------------------------------------

@register(
    "signup_purchases_24h",
    """SELECT s.event_id AS signup_id,
              CAST(count(p.event_id) AS BIGINT) AS n_purchases_24h
       FROM events s LEFT JOIN events p
         ON p.user_id = s.user_id AND p.event_type = 'purchase'
        AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
       WHERE s.event_type = 'signup'
       GROUP BY s.event_id""",
)
def signup_purchases_24h(spark, sf_dir):
    from ..operators.asof import interval_join

    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    matched = interval_join(
        signups, purchases, on="user_id", left_ts="ts", right_ts="p_ts",
        lower_s=0, upper_s=86400,
    )
    counts = matched.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_purchases_24h")
    )
    return (
        signups.select(F.col("event_id"))
        .join(counts, "event_id", "left")
        .select(
            F.col("event_id").alias("signup_id"),
            F.coalesce("n_purchases_24h", F.lit(0)).alias("n_purchases_24h"),
        )
    )


# ---------------------------------------------------------------------------
# Continuous-aggregate (hypertable-style) time-hierarchy rollup: daily
# aggregates derived by RE-AGGREGATING the hourly level, never
# rescanning raw events — the materialized-rollup maintenance pattern.
# ---------------------------------------------------------------------------

@register(
    "events_hourly_daily_rollup",
    f"""WITH hourly AS (
          SELECT date_trunc('hour', ts) AS bucket, event_type,
                 count(*) AS n, sum(CAST(value AS DECIMAL(27,4))) AS sv
          FROM events GROUP BY 1, 2),
        daily AS (
          SELECT date_trunc('day', bucket) AS bucket, event_type,
                 CAST(sum(n) AS BIGINT) AS n, sum(sv) AS sv
          FROM hourly GROUP BY 1, 2)
        SELECT 'hour' AS granularity, strftime(bucket, '{_TS_FMT_DUCK}') AS bucket_start,
               event_type, n,
               floor(CAST(sv AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM hourly
        UNION ALL
        SELECT 'day', strftime(bucket, '{_TS_FMT_DUCK}'), event_type, n,
               floor(CAST(sv AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        FROM daily""",
)
def events_hourly_daily_rollup(spark, sf_dir):
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(27,4)")).alias("sv"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    fmt = lambda df, g: df.select(
        F.lit(g).alias("granularity"),
        F.date_format("bucket", _TS_FMT_SPARK).alias("bucket_start"),
        "event_type",
        "n",
        round_half_up(F.col("sv").cast("double"), 4).alias("sum_value"),
    )
    return fmt(hourly, "hour").unionByName(fmt(daily, "day"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic (md5-hashed),
# so the whole estimator has a SQL twin; the mergeable-sketch pattern
# behind approx distinct counting at 100 TB.
# ---------------------------------------------------------------------------

@register(
    "kmv_distinct_users_per_type",
    """WITH h AS (
         SELECT DISTINCT event_type,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS frac
         FROM events),
       ranked AS (
         SELECT event_type, frac,
                row_number() OVER (PARTITION BY event_type ORDER BY frac) AS r
         FROM h),
       kth AS (SELECT event_type, frac AS kth_frac FROM ranked WHERE r = 32),
       exact AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
       SELECT e.event_type,
              CAST(coalesce(CAST(floor(31.0 / k.kth_frac + 0.5) AS BIGINT), e.n_exact) AS BIGINT) AS kmv_estimate,
              e.n_exact
       FROM exact e LEFT JOIN kth k ON k.event_type = e.event_type""",
)
def kmv_distinct_users_per_type(spark, sf_dir):
    """KMV estimator per group as a *mergeable bounded sketch*: hash values
    to (0,1], then two-level aggregation — (1) per (group, input partition)
    keep only the k=32 smallest distinct fracs (``slice(array_sort(
    collect_set))``, built map-side because the partition id is part of the
    group key), (2) merge the ≤k-element partials per group and re-slice.
    No global per-group sort anywhere: the merge state per group is at most
    k × num_partitions doubles. Estimate = (k-1)/kth_min; fewer than k
    distinct values → the sketch holds them all and the count is exact.
    Deterministic md5 hashing makes the estimate reproducible in any
    engine."""
    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    k = 32
    h = ev.select(
        "event_type",
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") / F.lit(4294967296.0)
        ).alias("frac"),
    )
    partials = h.groupBy("event_type", F.spark_partition_id().alias("pid")).agg(
        F.slice(F.array_sort(F.collect_set("frac")), 1, k).alias("mins")
    )
    merged = partials.groupBy("event_type").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))), 1, k
        ).alias("mins")
    )
    kth = merged.select(
        "event_type",
        F.when(F.size("mins") >= k, F.element_at("mins", k)).alias("kth_frac"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(kth, "event_type", "left").select(
        "event_type",
        F.coalesce(
            F.floor(F.lit(float(k - 1)) / F.col("kth_frac") + 0.5).cast("bigint"),
            F.col("n_exact"),
        ).alias("kmv_estimate"),
        "n_exact",
    )


# ---------------------------------------------------------------------------
# Skew stressor: Zipf-ish hot-key join through salted_join
# ---------------------------------------------------------------------------

@register(
    "skewed_join_hot_suppliers",
    f"""SELECT s_nationkey,
              count(*) AS n_items,
              floor(({_dsum('l_extendedprice * (1 - l_discount)')}) * 100.0 + 0.5) / 100.0 AS revenue
       FROM (SELECT CASE WHEN l_orderkey % 10 < 6 THEN 1
                         WHEN l_orderkey % 10 < 8 THEN 2
                         WHEN l_orderkey % 10 = 8 THEN 3
                         ELSE l_suppkey END AS hot_supp,
                    l_extendedprice, l_discount
             FROM lineitem) f
       JOIN supplier ON f.hot_supp = s_suppkey
       GROUP BY s_nationkey""",
)
def skewed_join_hot_suppliers(spark, sf_dir):
    """Skew-resistant join on a Zipf-ish key distribution.

    The fact side remaps lineitem's supplier key so ~60% of all rows hit
    one key, 20% a second, 10% a third, and the remaining 10% keep the
    real (uniform) key — the hot-head/long-tail shape of real event
    streams. The join goes through ``partitioning.salted_join`` (hot keys
    exploded across 8 salted buckets, dim side replicated per salt) with a
    shuffle-hash hint so the skew path is actually exercised rather than
    broadcast away; AQE's runtime skew split stacks on top at scale. The
    reference has no skew handling at all (single client thread,
    ``neo4j_export.py:277-292``)."""
    from ..functions.numeric import round_half_up
    from ..partitioning import salted_join

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].select(
        F.expr(
            "CASE WHEN l_orderkey % 10 < 6 THEN 1 "
            "WHEN l_orderkey % 10 < 8 THEN 2 "
            "WHEN l_orderkey % 10 = 8 THEN 3 "
            "ELSE l_suppkey END"
        ).alias("hot_supp"),
        "l_extendedprice",
        "l_discount",
    )
    supp = (
        view.tables["supplier"]
        .select(F.col("s_suppkey").alias("hot_supp"), "s_nationkey")
        .hint("shuffle_hash")
    )
    joined = salted_join(li, supp, on="hot_supp", salts=8)
    # dsum: ~36k-row hot groups summed in exact decimal — under double
    # accumulation this query was the one strict-canon red in the r04
    # pre-rotation sweep (cent drift on the 1e8-magnitude hot groups).
    from ..functions.numeric import dsum

    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        round_half_up(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join: the streaming twin of signup_purchases_24h
# ---------------------------------------------------------------------------

@register(
    "streaming_signup_purchase_pairs",
    """SELECT s.event_id AS signup_id, p.event_id AS purchase_id
       FROM events s JOIN events p
         ON p.user_id = s.user_id AND p.event_type = 'purchase'
        AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
       WHERE s.event_type = 'signup'""",
)
def streaming_signup_purchase_pairs(spark, sf_dir):
    """Watermarked stream-stream inner join (SURVEY §2.9 beyond-reference):
    signups joined to the purchases that follow within 24h, replayed with
    availableNow over the same events — the batch interval join
    (``signup_purchases_24h``) is the oracle. Output is id pairs only, so
    the comparison is timezone-proof by construction."""
    from ..streaming.events import run_stream_to_memory, streaming_interval_join_pairs

    signups = _replayed_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "signup"
    ).select("event_id", "user_id", "ts")
    purchases = _replayed_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = streaming_interval_join_pairs(
        signups, purchases,
        left_key="user_id", right_key="p_user",
        left_ts="ts", right_ts="p_ts", upper="24 hours",
    ).select(F.col("event_id").alias("signup_id"), "purchase_id")
    _STREAM_SEQ[0] += 1
    return run_stream_to_memory(
        joined, f"q_stream_ssj_{_STREAM_SEQ[0]}", output_mode="append",
        state_partitions=8,
    )


# ---------------------------------------------------------------------------
