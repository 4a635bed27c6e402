"""Query registry: every implemented operator exposed as a (Spark query,
DuckDB oracle SQL) pair for the driver's correctness gate.

Each query callable takes ``(spark, sf_dir)`` and returns a lazy
DataFrame; the oracle is ANSI SQL over the same parquet tables
(pre-registered DuckDB views). Column names are aliased identically on
both sides (the driver sorts columns by name before value-hashing).
Timestamps are rendered ``yyyy-MM-dd HH:mm:ss`` strings on both sides;
float aggregates are rounded — engine-neutral canonical forms.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.numeric import dsum
from .functions.numeric import dsum_sql as _dsum
from .functions.type_inference import infer_type_col
from .operators.identifier import detect_identifiers, uniqueness_profile
from .operators.node_export import export_node_table
from .operators.patterns import discover_patterns_map
from .operators.rel_export import export_relationship_table
from .operators.schema_union import schema_union_map
from .sources.property_graph import nodes_from_view
from .sources.star_schema import TPCH_GRAPH_SPEC, load_graph_view

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Graph views are immutable metadata + lazy scans — cache per (session, dir)
# so repeated queries don't re-read 9 parquet footers each.
_VIEW_CACHE: dict[tuple[int, str], object] = {}


def _view(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    if key not in _VIEW_CACHE:
        _VIEW_CACHE[key] = load_graph_view(spark, sf_dir)
    return _VIEW_CACHE[key]

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _fmt_ts(df: DataFrame, *cols: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.date_format(F.col(c), _TS_FMT_SPARK))
    return out


# ---------------------------------------------------------------------------
# Node export pipelines (C3 = S5→P2→C1→P3→O1)
# ---------------------------------------------------------------------------

@register(
    "node_export_customer",
    """SELECT c_custkey, c_acctbal, c_mktsegment, c_name, c_nationkey
       FROM customer WHERE c_custkey IS NOT NULL""",
)
def node_export_customer(spark, sf_dir):
    view = _view(spark, sf_dir)
    df, _ = export_node_table(
        view.nodes["Customer"], "Customer",
        identifier=view.detected_identifiers()["Customer"],
    )
    return df


@register(
    "node_export_orders",
    f"""SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '{_TS_FMT_DUCK}') AS o_orderdate,
               o_orderpriority, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey IS NOT NULL""",
)
def node_export_orders(spark, sf_dir):
    view = _view(spark, sf_dir)
    df, _ = export_node_table(
        view.nodes["Order"], "Order",
        identifier=view.detected_identifiers()["Order"],
    )
    return _fmt_ts(df, "o_orderdate")


@register(
    "node_export_part",
    """SELECT p_partkey, p_brand, p_name, p_retailprice, p_size, p_type
       FROM part WHERE p_partkey IS NOT NULL""",
)
def node_export_part(spark, sf_dir):
    view = _view(spark, sf_dir)
    df, _ = export_node_table(
        view.nodes["Part"], "Part",
        identifier=view.detected_identifiers()["Part"],
    )
    return df


# ---------------------------------------------------------------------------
# Schema discovery (P2) — distributed map-key union over the canonical graph
# ---------------------------------------------------------------------------

_SCHEMA_ROWS = []
for _label, _cols in [
    ("Region", ["r_name", "r_regionkey"]),
    ("Nation", ["n_name", "n_nationkey", "n_regionkey"]),
    ("Customer", ["c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey"]),
    ("Supplier", ["s_acctbal", "s_name", "s_nationkey", "s_suppkey"]),
    ("Part", ["p_brand", "p_name", "p_partkey", "p_retailprice", "p_size", "p_type"]),
    ("Order", ["o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"]),
]:
    for _c in _cols:
        _SCHEMA_ROWS.append(f"('{_label}', '{_c}')")


@register(
    "schema_union",
    "SELECT * FROM (VALUES " + ", ".join(_SCHEMA_ROWS) + ") AS t(label, property)",
)
def schema_union(spark, sf_dir):
    view = _view(spark, sf_dir)
    return schema_union_map(nodes_from_view(view))


# S1 sampling variant: the oracle replays the same md5-Bernoulli keep-set
# per label table — a (label, property) pair appears iff its label has at
# least one sampled row (the props map always carries every column key).
_SAMPLED_KEYS = [
    ("Region", "region", "r_regionkey"),
    ("Nation", "nation", "n_nationkey"),
    ("Customer", "customer", "c_custkey"),
    ("Supplier", "supplier", "s_suppkey"),
    ("Part", "part", "p_partkey"),
    ("Order", "orders", "o_orderkey"),
]
_SAMPLED_COUNTS = " UNION ALL ".join(
    f"""SELECT '{label}' AS label, count(*) AS n FROM {table}
        WHERE ('0x' || substr(md5('{label}' || '|' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT
              / 4294967296.0 < 0.2"""
    for label, table, key in _SAMPLED_KEYS
)


@register(
    "schema_union_sampled",
    f"""WITH samp AS ({_SAMPLED_COUNTS})
        SELECT t.label, t.property
        FROM (VALUES {", ".join(_SCHEMA_ROWS)}) AS t(label, property)
        JOIN samp ON samp.label = t.label AND samp.n > 0""",
)
def schema_union_sampled(spark, sf_dir):
    from .operators.schema_union import schema_union_map_sampled

    view = _view(spark, sf_dir)
    return schema_union_map_sampled(nodes_from_view(view), sample_rate=0.2)


# ---------------------------------------------------------------------------
# Identifier detection (C1) + uniqueness profile (A2)
# ---------------------------------------------------------------------------

_STRING_COLS = {
    "r_name", "n_name", "c_name", "c_mktsegment", "s_name",
    "p_name", "p_brand", "p_type", "o_orderstatus", "o_orderpriority",
}

_LABEL_TABLES = [
    ("Region", "region", ["r_name", "r_regionkey"]),
    ("Nation", "nation", ["n_name", "n_nationkey", "n_regionkey"]),
    ("Customer", "customer", ["c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey"]),
    ("Supplier", "supplier", ["s_acctbal", "s_name", "s_nationkey", "s_suppkey"]),
    ("Part", "part", ["p_brand", "p_name", "p_partkey", "p_retailprice", "p_size", "p_type"]),
    ("Order", "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"]),
]


def _cascade_oracle_sql() -> str:
    """Data-driven SQL replica of the C1 cascade for the TPC-H labels.

    Tiers 1-3 are vacuous here (no constraints, no id-named columns), so
    the oracle expresses tier 4 (first sorted column whose non-sentinel
    values are all distinct) with tier-5 fallback.
    """
    per_label = []
    for label, table, cols in _LABEL_TABLES:
        unions = []
        for i, c in enumerate(cols):
            expr = (
                f"CASE WHEN {c} IS NULL OR {c} IN ('', 'NULL') THEN NULL ELSE {c} END"
                if c in _STRING_COLS
                else c
            )
            unions.append(
                f"SELECT '{c}' AS property, {i} AS ord, "
                f"count({expr}) > 0 AND count({expr}) = count(DISTINCT {expr}) AS uniq "
                f"FROM {table}"
            )
        u = " UNION ALL ".join(unions)
        per_label.append(
                f"SELECT '{label}' AS label, coalesce("
                f"(SELECT property FROM ({u}) u WHERE uniq ORDER BY ord LIMIT 1), "
                f"'{cols[0]}') AS identifier"
        )
    return " UNION ALL ".join(per_label)


@register("identifier_detection", _cascade_oracle_sql())
def identifier_detection(spark, sf_dir):
    view = _view(spark, sf_dir)
    idents = view.detected_identifiers()
    return spark.createDataFrame(
        sorted(idents.items()), "label string, identifier string"
    )


@register(
    "uniqueness_profile_customer",
    """SELECT 'c_acctbal' AS property, count(c_acctbal) AS cnt, count(DISTINCT c_acctbal) AS cnt_distinct FROM customer
       UNION ALL SELECT 'c_custkey', count(c_custkey), count(DISTINCT c_custkey) FROM customer
       UNION ALL SELECT 'c_mktsegment', count(c_mktsegment), count(DISTINCT c_mktsegment) FROM customer
       UNION ALL SELECT 'c_name', count(c_name), count(DISTINCT c_name) FROM customer
       UNION ALL SELECT 'c_nationkey', count(c_nationkey), count(DISTINCT c_nationkey) FROM customer""",
)
def uniqueness_profile_customer(spark, sf_dir):
    view = _view(spark, sf_dir)
    df = view.nodes["Customer"]
    prof = uniqueness_profile(df, sorted(df.columns), exact=True)
    rows = [(p, int(c), int(d)) for p, (c, d) in sorted(prof.items())]
    return spark.createDataFrame(rows, "property string, cnt long, cnt_distinct long")


# ---------------------------------------------------------------------------
# Pattern discovery (C2/A1) — single-job distinct over canonical edges
# ---------------------------------------------------------------------------

@register(
    "pattern_discovery",
    """SELECT * FROM (VALUES
         ('Customer', 'IN', 'Nation'), ('Customer', 'PLACED', 'Order'),
         ('Nation', 'IN', 'Region'), ('Order', 'CONTAINS', 'Part'),
         ('Order', 'SUPPLIED_BY', 'Supplier'), ('Supplier', 'IN', 'Nation')
       ) AS t(src_label, rel_type, tgt_label)""",
)
def pattern_discovery(spark, sf_dir):
    from .sources.property_graph import edges_from_view

    view = _view(spark, sf_dir)
    return discover_patterns_map(edges_from_view(view))


# ---------------------------------------------------------------------------
# Relationship export (C4 = C2→J1→P4-P6→O2)
# ---------------------------------------------------------------------------

def _rel_export(spark, sf_dir, pattern_key):
    # Edge FKs reference the DECLARED star-schema identifiers (node
    # identity), not the discovered ones — the C1 cascade is the
    # *analysis* operator and is verified separately above.
    view = _view(spark, sf_dir)
    idents = view.declared_identifiers()
    spec = next(e for e in TPCH_GRAPH_SPEC.edges if e.pattern_key == pattern_key)
    return export_relationship_table(view, spec, idents)


@register(
    "rel_export_customer_placed_order",
    f"""SELECT o_custkey AS Customer_c_custkey, o_orderkey AS Order_o_orderkey,
               strftime(o_orderdate, '{_TS_FMT_DUCK}') AS o_orderdate, o_orderstatus
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
          AND o_custkey IN (SELECT c_custkey FROM customer)""",
)
def rel_export_customer_placed_order(spark, sf_dir):
    return _fmt_ts(_rel_export(spark, sf_dir, "Customer_PLACED_Order"), "o_orderdate")


@register(
    "rel_export_order_contains_part",
    """SELECT l_orderkey AS Order_o_orderkey, l_partkey AS Part_p_partkey,
              l_discount, l_extendedprice, l_linenumber, l_quantity, l_tax
       FROM lineitem
       WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
         AND l_orderkey IN (SELECT o_orderkey FROM orders)
         AND l_partkey IN (SELECT p_partkey FROM part)""",
)
def rel_export_order_contains_part(spark, sf_dir):
    return _rel_export(spark, sf_dir, "Order_CONTAINS_Part")


@register(
    "rel_export_order_supplied_by_supplier",
    f"""SELECT l_orderkey AS Order_o_orderkey, l_suppkey AS Supplier_s_suppkey,
               l_quantity, strftime(l_shipdate, '{_TS_FMT_DUCK}') AS l_shipdate
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL
          AND l_orderkey IN (SELECT o_orderkey FROM orders)
          AND l_suppkey IN (SELECT s_suppkey FROM supplier)""",
)
def rel_export_order_supplied_by_supplier(spark, sf_dir):
    return _fmt_ts(_rel_export(spark, sf_dir, "Order_SUPPLIED_BY_Supplier"), "l_shipdate")


@register(
    "rel_export_nation_in_region",
    """SELECT n_nationkey AS Nation_n_nationkey, n_regionkey AS Region_r_regionkey
       FROM nation
       WHERE n_nationkey IS NOT NULL AND n_regionkey IS NOT NULL
         AND n_regionkey IN (SELECT r_regionkey FROM region)""",
)
def rel_export_nation_in_region(spark, sf_dir):
    return _rel_export(spark, sf_dir, "Nation_IN_Region")


# ---------------------------------------------------------------------------
# Type inference (F1) — distributed regex cascade vs the Python-rule oracle
# ---------------------------------------------------------------------------

_TYPE_SAMPLES = [
    ("42", "integer"), ("1_000", "integer"), ("  7 ", "integer"), ("-5", "integer"),
    ("+99", "integer"), ("3.14", "float"), ("nan", "float"), ("inf", "float"),
    ("Infinity", "float"), ("1e5", "float"), ("5.", "float"), (".5", "float"),
    ("1_0.5", "float"), ("True", "boolean"), ("FALSE", "boolean"), ("0x1F", "string"),
    ("hello", "string"), ("", "string"), ("NULL", "string"), ("--3", "string"),
    ("1__0", "string"), ("_1", "string"),
]


@register(
    "type_inference_samples",
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{v}', '{t}')" for v, t in _TYPE_SAMPLES)
    + ") AS t(value, inferred)",
)
def type_inference_samples(spark, sf_dir):
    df = spark.createDataFrame([(v,) for v, _ in _TYPE_SAMPLES], "value string")
    return df.select("value", infer_type_col(F.col("value")).alias("inferred"))


# ---------------------------------------------------------------------------
# Model generation (C5) — the v3.0 importer-model's tableSchemas surface,
# materialized as rows so the driver-side generator earns a driver-gated
# CORRECTNESS row (VERDICT r04 directive #6). The oracle re-derives each
# field's recommendedType/nullable from the SAME parquet fixture: the
# deterministic sample row (min identifier) rendered to VARCHAR, pushed
# through the reference's type-inference grammar (the same regexes the
# engine's JVM twin uses, neo4j_export.py:1221-1244).
# ---------------------------------------------------------------------------

def _model_v3_oracle() -> str:
    from .functions.type_inference import _FLOAT_RE, _INT_RE

    parts = []
    for n in TPCH_GRAPH_SPEC.nodes:
        parts.append(f"""
SELECT '{n.label}.csv' AS table_name, field,
       CASE WHEN val = '' OR val = 'NULL' THEN 'string'
            WHEN regexp_matches(val, '{_INT_RE}') THEN 'integer'
            WHEN regexp_matches(val, '{_FLOAT_RE}') THEN 'float'
            WHEN lower(val) IN ('true', 'false') THEN 'boolean'
            ELSE 'string' END AS recommended_type,
       (val = '' OR val = 'NULL') AS nullable
FROM (
  UNPIVOT (SELECT COALESCE(CAST(COLUMNS(*) AS VARCHAR), 'None') FROM
           (SELECT * FROM {n.table} ORDER BY {n.id_col} LIMIT 1))
  ON COLUMNS(*) INTO NAME field VALUE val
)""")
    return "\nUNION ALL\n".join(parts)


@register("model_v3_table_schemas", _model_v3_oracle())
def model_v3_table_schemas(spark, sf_dir):
    """Flattened v3.0 model: one row per (tableSchema, field) with the
    field's recommendedType and the matching nodeLabel property's
    nullable flag. Runs the REAL driver-side generator
    (``plans.models.generate_model_v3_0``, reference
    neo4j_export.py:460-729) over a manifest whose sample rows are
    deterministic (min-identifier row, exporter ``str()`` rendering), so
    both engines see the same sample. Per-label 1-row collects are
    bounded driver fetches (6 labels), same class as the documented
    manifest scalars."""
    from .operators.node_export import ordered_columns
    from .plans.manifest import ExportManifest, NodeEntry
    from .plans.models import generate_model_v3_0

    view = _view(spark, sf_dir)
    idents = view.declared_identifiers()
    entries: dict[str, object] = {}
    for label in sorted(view.nodes):
        df = view.nodes[label]
        ident = idents[label]
        cols = ordered_columns(df.columns, ident)
        head = df.orderBy(ident).limit(1).select(*cols).collect()
        sample = {c: str(v) for c, v in zip(cols, head[0])} if head else {}
        entries[label] = NodeEntry(label, cols, ident, sample)
    manifest = ExportManifest(nodes=entries, rels={})
    model = generate_model_v3_0(manifest, view.catalog.unique_constraints)
    dm = model["dataModel"]
    nullable_by: dict[tuple[str, str], bool] = {}
    for nl in dm["graphSchemaRepresentation"]["graphSchema"]["nodeLabels"]:
        for p in nl["properties"]:
            nullable_by[(nl["token"], p["token"])] = bool(p["nullable"])
    rows = []
    for ts in dm["graphMappingRepresentation"]["dataSourceSchema"]["tableSchemas"]:
        label = ts["name"][: -len(".csv")]
        for f in ts["fields"]:
            rows.append(
                (
                    ts["name"],
                    f["name"],
                    f["recommendedType"]["type"],
                    nullable_by[(label, f["name"])],
                )
            )
    return spark.createDataFrame(
        rows,
        "table_name string, field string, recommended_type string, nullable boolean",
    )


# ---------------------------------------------------------------------------
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
    from .operators.analytics import pricing_summary

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
    from .operators.analytics import revenue_by_segment_nation

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
    from .operators.analytics import top_orders_by_revenue

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
    from .operators.analytics import supplier_part_volume as op

    return op(_view(spark, sf_dir))


# ---------------------------------------------------------------------------
# Batch window aggregation over events (tumbling / sliding / session)
# ---------------------------------------------------------------------------

@register(
    "window_tumbling_events",
    f"""SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
               strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '{_TS_FMT_DUCK}') AS window_end,
               event_type, count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value,
               floor(({_dsum('value')} / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_value
        FROM events GROUP BY 1, 2, 3""",
)
def window_tumbling_events(spark, sf_dir):
    from .operators.windows import tumbling_window_agg

    view = _view(spark, sf_dir)
    return tumbling_window_agg(view.tables["events"])


@register(
    "window_sliding_events",
    f"""WITH grid AS (
          SELECT *, date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS s1
          FROM events
        ), expanded AS (
          SELECT event_type, value, s1 AS ws FROM grid
          UNION ALL
          SELECT event_type, value, s1 - INTERVAL 30 MINUTE AS ws FROM grid
        )
        SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start,
               strftime(ws + INTERVAL 1 HOUR, '{_TS_FMT_DUCK}') AS window_end,
               event_type, count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM expanded GROUP BY 1, 2, 3""",
)
def window_sliding_events(spark, sf_dir):
    from .operators.windows import sliding_window_agg

    view = _view(spark, sf_dir)
    return sliding_window_agg(view.tables["events"])


@register(
    "window_session_events",
    f"""WITH o AS (
          SELECT user_id, ts, value,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
          FROM events
        ), m AS (
          SELECT *, CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM o
        ), g AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS grp
          FROM m
        )
        SELECT strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start, user_id,
               count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM g GROUP BY user_id, grp""",
)
def window_session_events(spark, sf_dir):
    from .operators.windows import session_window_agg

    view = _view(spark, sf_dir)
    return session_window_agg(view.tables["events"])


# ---------------------------------------------------------------------------
# Deduplication family (exact / n-gram Jaccard / MinHash LSH / SimHash)
# ---------------------------------------------------------------------------

_NORM_DUCK = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_DUCK = "list_filter(string_split(lower(text), ' '), x -> x != '')"
_SHINGLES_DUCK = (
    "CASE WHEN len(t) < 3 THEN [] "
    "ELSE list_transform(range(1, len(t)-1), i -> array_to_string(t[i:i+2], ' ')) END"
)


@register(
    "dedup_exact",
    f"""SELECT md5({_NORM_DUCK}) AS fingerprint, min(doc_id) AS keep_id,
               count(*) AS n_dups
        FROM documents GROUP BY 1""",
)
def dedup_exact(spark, sf_dir):
    from .operators.dedup import exact_dedup

    view = _view(spark, sf_dir)
    return exact_dedup(view.tables["documents"])


@register(
    "dedup_ngram_jaccard",
    f"""WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
        sh0 AS (SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM toks),
        keep AS (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 50),
        sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, floor((i * 1.0 / (sa.n + sb.n - i)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE floor((i * 1.0 / (sa.n + sb.n - i)) * 1000000.0 + 0.5) / 1000000.0 >= 0.5""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    from .operators.dedup import ngram_jaccard_pairs

    view = _view(spark, sf_dir)
    return ngram_jaccard_pairs(view.tables["documents"], n=3, threshold=0.5)


@register(
    "dedup_minhash_signatures",
    f"""WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM toks),
        h AS (
          SELECT doc_id, seed, md5(seed || '|' || shingle) AS h
          FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s),
        mh AS (SELECT doc_id, seed, min(h) AS mh FROM h GROUP BY 1, 2)
        SELECT doc_id, CAST(seed // 4 AS INT) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS signature
        FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)""",
)
def dedup_minhash_signatures(spark, sf_dir):
    from .operators.dedup import minhash_signatures

    view = _view(spark, sf_dir)
    return minhash_signatures(view.tables["documents"])


@register(
    "dedup_minhash_lsh_pairs",
    f"""WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM toks),
        h AS (
          SELECT doc_id, seed, md5(seed || '|' || shingle) AS h
          FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s),
        mh AS (SELECT doc_id, seed, min(h) AS mh FROM h GROUP BY 1, 2),
        sig AS (
          SELECT doc_id, CAST(seed // 4 AS INT) AS band,
                 md5(string_agg(mh, ',' ORDER BY seed)) AS signature
          FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sig a JOIN sig b
            ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT c.id_a, c.id_b, count(*) AS i
          FROM cands c
          JOIN sh a ON a.doc_id = c.id_a
          JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2)
        SELECT id_a, id_b, floor((i * 1.0 / (sa.n + sb.n - i)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE floor((i * 1.0 / (sa.n + sb.n - i)) * 1000000.0 + 0.5) / 1000000.0 >= 0.5""",
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    from .operators.dedup import minhash_lsh_pairs

    view = _view(spark, sf_dir)
    return minhash_lsh_pairs(view.tables["documents"])


@register(
    "dedup_simhash_signatures",
    f"""WITH tok AS (SELECT doc_id, md5(unnest({_TOKS_DUCK})) AS hx FROM documents),
        bits AS (
          SELECT doc_id, b,
                 ((strpos('0123456789abcdef', substr(hx, CAST(b // 4 AS INT) + 1, 1)) - 1)
                  >> CAST(b % 4 AS INT)) & 1 AS bit
          FROM tok CROSS JOIN (SELECT unnest(range(0, 64)) AS b) s),
        sums AS (SELECT doc_id, b, sum(2 * bit - 1) AS s FROM bits GROUP BY 1, 2)
        SELECT doc_id,
               string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
        FROM sums GROUP BY doc_id""",
)
def dedup_simhash_signatures(spark, sf_dir):
    from .operators.dedup import simhash_signatures

    view = _view(spark, sf_dir)
    return simhash_signatures(view.tables["documents"])


def dedup_simhash_pairs(spark, sf_dir):
    from .operators.dedup import simhash_pairs

    view = _view(spark, sf_dir)
    return simhash_pairs(view.tables["documents"], max_hamming=6)


QUERIES["dedup_simhash_pairs"] = dedup_simhash_pairs
# Pigeonhole-blocked Hamming pairs are deterministic → full SQL oracle:
# signatures CTE (same as dedup_simhash_signatures), quarter-blocks
# equi-join, then exact Hamming distance over the 64 bit positions.
ORACLES["dedup_simhash_pairs"] = f"""
WITH tok AS (SELECT doc_id, md5(unnest({_TOKS_DUCK})) AS hx FROM documents),
bits AS (
  SELECT doc_id, b,
         ((strpos('0123456789abcdef', substr(hx, CAST(b // 4 AS INT) + 1, 1)) - 1)
          >> CAST(b % 4 AS INT)) & 1 AS bit
  FROM tok CROSS JOIN (SELECT unnest(range(0, 64)) AS b) s),
sums AS (SELECT doc_id, b, sum(2 * bit - 1) AS s FROM bits GROUP BY 1, 2),
sig AS (
  SELECT doc_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
  FROM sums GROUP BY doc_id),
blocks AS (
  SELECT doc_id, simhash, q, substr(simhash, CAST(q * 16 + 1 AS INT), 16) AS block
  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS q) s),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS sig_a, b.simhash AS sig_b
  FROM blocks a JOIN blocks b
    ON a.q = b.q AND a.block = b.block AND a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM (
  SELECT id_a, id_b,
         CAST(len(list_filter(range(1, 65),
              i -> substr(sig_a, CAST(i AS INT), 1) != substr(sig_b, CAST(i AS INT), 1))) AS INT) AS hamming
  FROM cands) t
WHERE hamming <= 6
"""


# ---------------------------------------------------------------------------
# Text analysis (token stats / quality / language-ID / fingerprints)
# ---------------------------------------------------------------------------

@register(
    "text_token_stats",
    f"""SELECT doc_id,
               CAST(len({_TOKS_DUCK}) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INT) AS n_re_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tok_est,
               CAST(length(text) AS INT) AS n_chars
        FROM documents""",
)
def text_token_stats(spark, sf_dir):
    from .operators.text_analysis import token_stats

    view = _view(spark, sf_dir)
    return token_stats(view.tables["documents"])


@register(
    "text_quality_score",
    f"""WITH base AS (
          SELECT doc_id, text, {_TOKS_DUCK} AS t,
                 length(text) AS n_chars,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars
          FROM documents),
        feat AS (
          SELECT doc_id, len(t) AS n_tokens,
                 floor((len(list_filter(t, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) * 1.0 / len(t)) * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
                 floor((alpha_chars * 1.0 / n_chars) * 1000000.0 + 0.5) / 1000000.0 AS alpha_ratio,
                 n_chars, (n_chars - (len(t) - 1)) * 1.0 / len(t) AS mean_wlen
          FROM base)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, stopword_ratio, alpha_ratio,
               floor(((CASE WHEN n_chars >= 50 AND n_chars <= 20000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN mean_wlen >= 2.0 AND mean_wlen <= 12.0 THEN 0.25 ELSE 0.0 END)
                 + least(stopword_ratio * 2.5, 0.25)
                 + alpha_ratio * 0.25) * 1000000.0 + 0.5) / 1000000.0 AS quality
        FROM feat""",
)
def text_quality_score(spark, sf_dir):
    from .operators.text_analysis import quality_score

    view = _view(spark, sf_dir)
    return quality_score(view.tables["documents"])


_LANG_LISTS_DUCK = {
    "de": "['der','die','das','und','ist','ein','zu','den']",
    "en": "['the','a','of','and','to','in','is','it']",
    "es": "['el','la','de','que','y','en','un','es']",
    "fr": "['le','la','de','et','un','les','des','est']",
    "zh": "['的','了','是','我','不','在','有','他']",
}


@register(
    "text_language_id",
    f"""WITH scored AS (
          SELECT doc_id,
                 {", ".join(f"len(list_intersect(list_distinct({_TOKS_DUCK}), {lst})) AS score_{lang}" for lang, lst in _LANG_LISTS_DUCK.items())}
          FROM documents)
        SELECT doc_id,
               CASE WHEN greatest(score_de, score_en, score_es, score_fr, score_zh) = 0 THEN 'und'
                    WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                    WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                    WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                    WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                    ELSE 'zh' END AS detected_lang,
               CAST(greatest(score_de, score_en, score_es, score_fr, score_zh) AS INT) AS best_score
        FROM scored""",
)
def text_language_id(spark, sf_dir):
    from .operators.text_analysis import language_id

    view = _view(spark, sf_dir)
    return language_id(view.tables["documents"])


@register(
    "text_fingerprints",
    f"SELECT doc_id, md5({_NORM_DUCK}) AS fingerprint FROM documents",
)
def text_fingerprints(spark, sf_dir):
    from .operators.text_analysis import fingerprints

    view = _view(spark, sf_dir)
    return fingerprints(view.tables["documents"])


# ---------------------------------------------------------------------------
# Vector similarity (brute-force cosine pairs / top-k / IVF ANN)
# ---------------------------------------------------------------------------

_COS_DUCK = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


@register(
    "embedding_cosine_pairs",
    f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 >= 0.35""",
)
def embedding_cosine_pairs(spark, sf_dir):
    from .operators.similarity import cosine_pairs

    view = _view(spark, sf_dir)
    return cosine_pairs(view.tables["embeddings"], threshold=0.35)


@register(
    "embedding_topk",
    f"""SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 AS cosine,
               CAST(row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 DESC, b.vec_id) AS INT) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 10
        QUALIFY rank <= 10""",
)
def embedding_topk(spark, sf_dir):
    from .operators.similarity import brute_force_topk

    view = _view(spark, sf_dir)
    return brute_force_topk(view.tables["embeddings"], k=10, n_queries=10)


def embedding_ivf_topk(spark, sf_dir):
    from .operators.similarity import ivf_topk

    view = _view(spark, sf_dir)
    return ivf_topk(view.tables["embeddings"], k=10, n_cells=16, nprobe=4, n_queries=10)


QUERIES["embedding_ivf_topk"] = embedding_ivf_topk
# The IVF path is deterministic end-to-end (centroids = first n_cells
# vectors, every ranking tie-broken), so the WHOLE approximate index is
# SQL-expressible: the oracle mirrors assign → probe → scan stage by
# stage with identical rounding and tie-breaks.
ORACLES["embedding_ivf_topk"] = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
),
cents AS (SELECT vec_id AS cell, v AS cv, norm AS cn FROM v WHERE vec_id < 16),
assigned AS (
  SELECT vec_id, v, norm, cell FROM (
    SELECT a.vec_id, a.v, a.norm, c.cell,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                      c.cell) AS r
    FROM v a CROSS JOIN cents c) t WHERE r = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM assigned WHERE vec_id < 10),
probe AS (
  SELECT query_id, qv, qn, cell FROM (
    SELECT q.query_id, q.qv, q.qn, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY floor((list_dot_product(q.qv, c.cv)/(q.qn*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                      c.cell) AS r
    FROM q CROSS JOIN cents c) t WHERE r <= 4
),
scored AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
         floor((list_dot_product(p.qv, n.v)/(p.qn*n.norm)) * 1000000.0 + 0.5)/1000000.0 AS cosine
  FROM probe p JOIN assigned n ON n.cell = p.cell AND n.vec_id != p.query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
FROM scored QUALIFY rank <= 10
"""


# ---------------------------------------------------------------------------
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
    from .operators.graph_algos import degrees

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
    from .operators.graph_algos import connected_components

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
    from .operators.graph_algos import pagerank

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
# JSON property extraction over events (semi-structured column handling)
# ---------------------------------------------------------------------------

@register(
    "events_json_props",
    """SELECT event_type, CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
              count(*) AS n
       FROM events GROUP BY event_type""",
)
def events_json_props(spark, sf_dir):
    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only: deterministic fake decode, see
# operators/multimodal.py — real codecs are stubbed in this environment)
# ---------------------------------------------------------------------------

def multimodal_features(spark, sf_dir):
    from .operators.multimodal import extract_features, fixture_media_path

    # The media table is a COMMITTED parquet fixture (tools/make_fixtures.py)
    # so the DuckDB oracle computes the same byte statistics over the very
    # same payload blobs. Scalar-only output (gate canon can't sort arrays):
    # the 16-bin histogram becomes columns f0..f15. byte_mean / f* are exact
    # integer divisions — identical doubles on both engines, left unrounded
    # (rounding would CREATE mismatches: the values are multiples of 1/2^k,
    # exact .5 ties at any decimal width, and the engines round ties
    # differently). byte_entropy is an order-dependent float sum — rounded
    # to 4 decimals on both sides.
    feats = extract_features(
        spark.read.parquet(fixture_media_path()), fake=True
    )
    return feats.select(
        "media_id",
        "n_bytes",
        "byte_mean",
        F.round("byte_entropy", 4).alias("byte_entropy"),
        *[F.element_at("features", k + 1).alias(f"f{k}") for k in range(16)],
    )


def multimodal_frame_plan(spark, sf_dir):
    from .operators.multimodal import frame_sample_plan, make_fake_media

    return frame_sample_plan(make_fake_media(spark, n=64), every_ms=500)


QUERIES["multimodal_features"] = multimodal_features
# Byte statistics over the committed payload blobs, decoded from hex in
# pure SQL (blob → hex string → per-byte values via nibble lookup).
_MEDIA_FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "fixtures",
    "fake_media.parquet",
)
ORACLES["multimodal_features"] = f"""
WITH media AS (
  SELECT media_id, octet_length(payload) AS n, lower(hex(payload)) AS h
  FROM read_parquet('{_MEDIA_FIXTURE}')
),
pos AS (
  SELECT media_id, n, h, unnest(range(0, n)) AS i FROM media
),
bytes AS (
  SELECT media_id, n,
         (strpos('0123456789abcdef', substr(h, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(h, 2*i + 2, 1)) - 1) AS b
  FROM pos
),
counts AS (
  SELECT media_id, any_value(n) AS n, b, count(*) AS c
  FROM bytes GROUP BY media_id, b
)
SELECT media_id,
       CAST(any_value(n) AS INTEGER) AS n_bytes,
       sum(b * c) * 1.0 / any_value(n) AS byte_mean,
       round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)), 4) AS byte_entropy,
       {", ".join(f"sum(CASE WHEN b // 16 = {k} THEN c ELSE 0 END) * 1.0 / any_value(n) AS f{k}" for k in range(16))}
FROM counts GROUP BY media_id
"""
QUERIES["multimodal_frame_plan"] = multimodal_frame_plan
# The frame-sampling plan over the deterministic fake media table is pure
# arithmetic (duration_ms = 3000 + 500*(id%5), frames every 500 ms
# inclusive of the endpoint) — regenerate the same table in SQL.
ORACLES["multimodal_frame_plan"] = """
SELECT media_id,
       CAST(unnest(range(0, 3000 + 500 * (media_id % 5) + 1, 500)) AS BIGINT) AS frame_ts_ms
FROM (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS media_id) m
"""


# ---------------------------------------------------------------------------
# Structured Streaming, driven to completion (availableNow) so the batch
# SQL is the oracle: the parquet events are replayed as a file-source
# stream, processed with watermarks / applyInPandasWithState, and the
# final materialized result is returned as a batch DataFrame.
# ---------------------------------------------------------------------------

_STREAM_SEQ = [0]

# The replay directory is immutable once written — materialize it once
# per (session, sf_dir) instead of re-writing the events parquet for
# every streaming query (six gate queries replay the same files).
_STREAM_DIR_CACHE: dict[tuple[int, str], tuple[str, object]] = {}


def _replayed_events_stream(spark, sf_dir, max_files_per_trigger=2):
    import tempfile

    from .streaming.events import read_events_stream

    key = (id(spark), sf_dir)
    if key not in _STREAM_DIR_CACHE:
        view = _view(spark, sf_dir)
        tmp = tempfile.mkdtemp(prefix="ndip_events_stream_")
        view.tables["events"].repartition(4).write.mode("overwrite").parquet(tmp)
        _STREAM_DIR_CACHE[key] = (tmp, spark.read.parquet(tmp).schema)
    tmp, schema = _STREAM_DIR_CACHE[key]
    return read_events_stream(spark, tmp, schema, max_files_per_trigger)


@register(
    "streaming_tumbling_events",
    f"""SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
               event_type, count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM events GROUP BY 1, 2""",
)
def streaming_tumbling_events(spark, sf_dir):
    from .streaming.events import run_stream_to_memory, streaming_tumbling_counts

    stream = _replayed_events_stream(spark, sf_dir)
    _STREAM_SEQ[0] += 1
    return run_stream_to_memory(
        streaming_tumbling_counts(stream),
        f"q_stream_tumbling_{_STREAM_SEQ[0]}",
        output_mode="complete",
        state_partitions=8,
    )


@register(
    "streaming_running_totals",
    """SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n_events,
              floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS sum_value,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
              strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
       FROM events GROUP BY event_type""",
)
def streaming_running_totals(spark, sf_dir):
    """applyInPandasWithState lifetime totals; last emission per key ==
    the batch aggregate (the update is commutative, so arrival order
    cannot change the fixed point)."""
    from pyspark.sql import Window

    from .functions.numeric import round_half_up
    from .streaming.events import run_stream_to_memory
    from .streaming.stateful import streaming_running_totals as op

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream), f"q_stream_running_{_STREAM_SEQ[0]}", output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_events"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "key",
            "n_events",
            round_half_up(F.col("sum_value"), 4).alias("sum_value"),
            F.date_format("min_ts", _TS_FMT_SPARK).alias("min_ts"),
            F.date_format("max_ts", _TS_FMT_SPARK).alias("max_ts"),
        )
    )


# ---------------------------------------------------------------------------
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
    from .functions.numeric import round_half_up
    from .operators.asof import as_of_join

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
    from .functions.numeric import round_half_up

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
    from .functions.text import fingerprint_md5
    from .operators.text_analysis import language_columns, quality_columns

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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

    from .functions.numeric import round_half_up

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
    from .operators.similarity import _hyperplanes

    planes = _hyperplanes(16, 64)
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
blocks AS (
  SELECT vec_id, q, substr(sig, CAST(q * 4 + 1 AS INT), 4) AS block
  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS q) s),
cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM blocks a JOIN blocks b
    ON a.q = b.q AND a.block = b.block AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b,
       floor((list_dot_product(x.v, y.v) / (x.norm * y.norm)) * 1000000.0 + 0.5) / 1000000.0 AS cosine
FROM cands c JOIN v x ON x.vec_id = c.id_a JOIN v y ON y.vec_id = c.id_b
WHERE floor((list_dot_product(x.v, y.v) / (x.norm * y.norm)) * 1000000.0 + 0.5) / 1000000.0 >= 0.35
"""


@register("embedding_lsh_pairs", _embedding_lsh_oracle())
def embedding_lsh_pairs(spark, sf_dir):
    from .operators.similarity import embedding_lsh_pairs as op

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
    from .operators.motif import match_chain
    from .sources.property_graph import edges_from_view

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
    from .functions.numeric import round_half_up

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

    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .operators.asof import interval_join

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up
    from .partitioning import salted_join

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
    from .functions.numeric import dsum

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
    from .streaming.events import run_stream_to_memory, streaming_interval_join_pairs

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

    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
# End-to-end near-dup clustering: LSH candidate pairs -> connected
# components -> one keep-doc per cluster (the training-corpus keep-list)
# ---------------------------------------------------------------------------

ORACLES["dedup_near_dup_clusters"] = f"""
  WITH pairs AS ({ORACLES["dedup_minhash_lsh_pairs"]}),
  und AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b AS a, id_a AS b FROM pairs),
  nodes AS (SELECT DISTINCT a AS node FROM und),
  reach AS (
    WITH RECURSIVE r(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.b, r.comp FROM r JOIN und u ON u.a = r.node)
    SELECT * FROM r),
  comp AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node)
  SELECT cluster_id, count(*) AS n_docs, count(*) - 1 AS n_dropped
  FROM comp GROUP BY cluster_id"""


def dedup_near_dup_clusters(spark, sf_dir):
    """The full near-dup dedup pipeline a training corpus needs: MinHash
    signatures → banded LSH candidates → Jaccard-verified pairs →
    connected components over the pair graph → per-cluster canonical doc
    (min doc_id = cluster_id) with the drop count. Transitive duplicates
    (A~B, B~C but A!~C) land in ONE cluster — pair-level dedup alone
    would keep too many. All stages are the bucketed/bounded ones
    (shuffle-free signatures, banded equi-join, candidate-only
    verification, label-propagation CC) — nothing quadratic in corpus
    size, so the composition survives 100 TB."""
    from .operators.dedup import minhash_lsh_pairs
    from .operators.graph_algos import connected_components

    view = _view(spark, sf_dir)
    pairs = minhash_lsh_pairs(view.tables["documents"]).select("id_a", "id_b")
    # Numeric ids end-to-end: CC's min-label must agree with the oracle's
    # numeric min (string min would order "10" < "9").
    comp = connected_components(pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    return (
        comp.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "cluster_id",
            "n_docs",
            (F.col("n_docs") - F.lit(1)).alias("n_dropped"),
        )
    )


QUERIES["dedup_near_dup_clusters"] = dedup_near_dup_clusters


# ---------------------------------------------------------------------------
# Semantic (embedding-space) near-dup clustering + deterministic sampling
# ---------------------------------------------------------------------------

ORACLES["embedding_near_dup_clusters"] = f"""
  WITH pairs AS ({_embedding_lsh_oracle()}),
  strong AS (SELECT id_a, id_b FROM pairs WHERE cosine >= 0.42),
  und AS (SELECT id_a AS a, id_b AS b FROM strong
          UNION SELECT id_b AS a, id_a AS b FROM strong),
  nodes AS (SELECT DISTINCT a AS node FROM und),
  reach AS (
    WITH RECURSIVE r(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.b, r.comp FROM r JOIN und u ON u.a = r.node)
    SELECT * FROM r),
  comp AS (SELECT node AS vec_id, min(comp) AS cluster_id FROM reach GROUP BY node)
  SELECT cluster_id, count(*) AS n_vecs, count(*) - 1 AS n_dropped
  FROM comp GROUP BY cluster_id"""


def embedding_near_dup_clusters(spark, sf_dir):
    """Semantic dedup: hyperplane-LSH candidate pairs above a cosine
    threshold (0.42 here — the top similarity band of the synthetic
    near-uniform embeddings; a production corpus of real duplicates would
    sit at ~0.9 with identical plumbing) →
    connected components → one keep-vector per cluster. The embedding twin
    of ``dedup_near_dup_clusters`` — near-identical meaning collapses even
    when the text-level shingles differ. The >= comparison is on the
    6-dp-rounded cosine BOTH engines emit, so threshold membership is
    engine-independent."""
    from .operators.graph_algos import connected_components
    from .operators.similarity import embedding_lsh_pairs as op

    view = _view(spark, sf_dir)
    strong = op(view.tables["embeddings"]).filter(F.col("cosine") >= 0.42)
    comp = connected_components(
        strong.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return (
        comp.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .select("cluster_id", "n_vecs", (F.col("n_vecs") - F.lit(1)).alias("n_dropped"))
    )


QUERIES["embedding_near_dup_clusters"] = embedding_near_dup_clusters


@register(
    "corpus_hash_sample",
    """SELECT doc_id, lang,
              floor((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) * 1000000.0 + 0.5) / 1000000.0 AS frac
       FROM documents
       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.2""",
)
def corpus_hash_sample(spark, sf_dir):
    """Deterministic corpus downsampling: hash-based Bernoulli (md5 of the
    stable id → uniform (0,1) fraction, keep < rate). Unlike
    ``df.sample()``, the keep-set is a pure function of the id — stable
    across runs, engines, partitionings, and retries, which is what a
    reproducible training-data pipeline needs. Filter is a scan-level
    predicate: no shuffle at any scale."""
    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(4294967296.0)
    )
    from .functions.numeric import round_half_up

    return (
        docs.select("doc_id", "lang", frac.alias("__frac"))
        .filter(F.col("__frac") < 0.2)
        .select("doc_id", "lang", round_half_up(F.col("__frac"), 6).alias("frac"))
    )


@register(
    "events_stratified_sample",
    """WITH rated AS (
         SELECT event_id, event_type,
                ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS frac,
                CASE event_type WHEN 'view' THEN 0.05
                                WHEN 'purchase' THEN 0.5
                                ELSE 0.2 END AS rate
         FROM events)
       SELECT event_id, event_type,
              floor(frac * 1000000.0 + 0.5) / 1000000.0 AS frac
       FROM rated WHERE frac < rate""",
)
def events_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling: per-stratum keep rates (rare
    strata kept at higher rates) with the same hash-Bernoulli mechanics —
    the class-balancing downsample step of a training pipeline, still a
    pure scan-level predicate."""
    from .functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    frac = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(4294967296.0)
    )
    rate = (
        F.when(F.col("event_type") == "view", 0.05)
        .when(F.col("event_type") == "purchase", 0.5)
        .otherwise(0.2)
    )
    return (
        ev.select("event_id", "event_type", frac.alias("__frac"), rate.alias("__rate"))
        .filter(F.col("__frac") < F.col("__rate"))
        .select(
            "event_id", "event_type", round_half_up(F.col("__frac"), 6).alias("frac")
        )
    )


# ---------------------------------------------------------------------------
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
    from .operators.graph_algos import bfs_distances

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
    from .operators.graph_algos import shortest_paths

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
# Streaming session windows (merging-session state) — batch twin's oracle
# ---------------------------------------------------------------------------

ORACLES["streaming_session_events"] = ORACLES["window_session_events"]


def streaming_session_events(spark, sf_dir):
    """Streaming session windows over the replayed events: the state store
    merges sessions as events arrive within the 30-minute gap, complete
    mode emits the final merged sessions — identical to the batch
    session_window_agg and its lag/sum-over-window SQL oracle."""
    from .streaming.events import run_stream_to_memory, streaming_session_counts

    stream = _replayed_events_stream(spark, sf_dir)
    _STREAM_SEQ[0] += 1
    return run_stream_to_memory(
        streaming_session_counts(stream),
        f"q_stream_session_{_STREAM_SEQ[0]}",
        output_mode="complete",
        state_partitions=8,
    )


QUERIES["streaming_session_events"] = streaming_session_events


# ---------------------------------------------------------------------------
# Multimodal resize planning (aspect-preserving, tensor-snapped dims)
# ---------------------------------------------------------------------------

@register(
    "multimodal_resize_plan",
    """WITH media AS (
         SELECT event_id AS media_id,
                320 + (event_id % 1600) AS width,
                240 + (event_id % 900) AS height
         FROM events WHERE event_id % 7 = 0),
       planned AS (
         SELECT media_id, width, height,
                least(1.0, 512.0 / greatest(width * 1.0, height * 1.0)) AS scale
         FROM media)
       SELECT media_id, width, height,
              floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale,
              greatest(CAST(floor(width * scale / 8) * 8 AS BIGINT), 8) AS out_w,
              greatest(CAST(floor(height * scale / 8) * 8 AS BIGINT), 8) AS out_h
       FROM planned""",
)
def multimodal_resize_plan(spark, sf_dir):
    """Resize planning over a deterministic media-dimension table derived
    from events (the sandbox has no real image dims; the arithmetic is the
    product). Aspect-preserving, longer side <= 512, snapped down to
    multiples of 8, never upscaled — all scan-level JVM expressions; the
    pixel resample is the stubbed decode stage
    (``operators/multimodal.py::decode_stub``)."""
    from .functions.numeric import round_half_up
    from .operators.multimodal import resize_plan

    view = _view(spark, sf_dir)
    media = (
        view.tables["events"]
        .filter(F.col("event_id") % 7 == 0)
        .select(
            F.col("event_id").alias("media_id"),
            (F.lit(320) + F.col("event_id") % 1600).alias("width"),
            (F.lit(240) + F.col("event_id") % 900).alias("height"),
        )
    )
    planned = resize_plan(media, max_side=512, multiple_of=8)
    return planned.select(
        "media_id", "width", "height",
        round_half_up(F.col("scale"), 6).alias("scale"),
        "out_w", "out_h",
    )


# ---------------------------------------------------------------------------
# Corpus retrieval / vocabulary statistics (operators/retrieval.py)
# ---------------------------------------------------------------------------

@register(
    "tfidf_top_terms",
    """WITH tok AS (
         SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (
         SELECT tf.doc_id, tf.term, tf.tf,
                floor(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.doc_freq + 1.0)) + 1.0)
                      * 1000000.0 + 0.5) / 1000000.0 AS tfidf
         FROM tf JOIN dfreq USING (term) CROSS JOIN n)
       SELECT doc_id, term, tf, tfidf,
              CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
       FROM scored QUALIFY rank <= 5""",
)
def tfidf_top_terms(spark, sf_dir):
    from .operators.retrieval import tfidf_top_terms as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"], k=5)


@register(
    "bm25_rank_spark_hash_join",
    """WITH tok AS (
         SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
         FROM documents),
       q AS (SELECT doc_id, term FROM tok WHERE term IN ('spark', 'hash', 'join')),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2),
       dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
       dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       g AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                    (SELECT avg(dl * 1.0) FROM dl) AS avgdl),
       scored AS (
         SELECT tf.doc_id,
                floor(sum(ln(1.0 + (g.n_docs - dfreq.doc_freq + 0.5) / (dfreq.doc_freq + 0.5))
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl)))
                      * 1000000.0 + 0.5) / 1000000.0 AS bm25
         FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN g
         GROUP BY tf.doc_id)
       SELECT doc_id, bm25,
              CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank
       FROM scored QUALIFY rank <= 20""",
)
def bm25_rank_spark_hash_join(spark, sf_dir):
    from .operators.retrieval import bm25_topk

    view = _view(spark, sf_dir)
    return bm25_topk(view.tables["documents"], ["spark", "hash", "join"], k=20)


@register(
    "vocabulary_oov_rate",
    """WITH tok AS (
         SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
         FROM documents),
       vocab AS (
         SELECT term FROM (SELECT term, count(*) AS n FROM tok GROUP BY 1)
         ORDER BY n DESC, term LIMIT 20),
       marked AS (
         SELECT t.doc_id, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
         FROM tok t LEFT JOIN vocab v USING (term))
       SELECT doc_id, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
              floor(sum(oov) * 1.0 / count(*) * 1000000.0 + 0.5) / 1000000.0 AS oov_rate
       FROM marked GROUP BY doc_id""",
)
def vocabulary_oov_rate(spark, sf_dir):
    from .operators.retrieval import vocabulary_oov

    view = _view(spark, sf_dir)
    return vocabulary_oov(view.tables["documents"], vocab_size=20)


# ---------------------------------------------------------------------------
# Streaming dedup (bounded-state dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

@register(
    "streaming_dedup_user_type",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_user_type(spark, sf_dir):
    """Streaming dedup over the replayed events: one surviving row per
    (user_id, event_type). Only the key columns are emitted — which
    physical row survives depends on arrival order, the key set does
    not, so the batch DISTINCT is an exact oracle. The oversized
    watermark keeps every key live for the finite replay; production
    sets the real collision bound and gets state eviction."""
    from .streaming.events import run_stream_to_memory, streaming_dedup

    stream = _replayed_events_stream(spark, sf_dir)
    _STREAM_SEQ[0] += 1
    deduped = streaming_dedup(
        stream, id_cols=("user_id", "event_type"), watermark="3650 days"
    )
    return run_stream_to_memory(
        deduped.select("user_id", "event_type"),
        f"q_stream_dedup_{_STREAM_SEQ[0]}",
        state_partitions=8,
    ).select("user_id", "event_type")


# ---------------------------------------------------------------------------
# Substring-level dedup profile (duplicated n-gram spans)
# ---------------------------------------------------------------------------

@register(
    "dedup_span_stats",
    """WITH tok AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(range(1, len(t) - 8 + 2)) AS i
         FROM tok WHERE len(t) >= 8),
       grams AS (
         SELECT doc_id, md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS gram_h
         FROM pos),
       gd AS (SELECT gram_h, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY 1)
       SELECT g.doc_id, count(*) AS n_spans,
              CAST(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
              floor(sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)
                    * 1000000.0 + 0.5) / 1000000.0 AS dup_ratio
       FROM grams g JOIN gd USING (gram_h) GROUP BY g.doc_id""",
)
def dedup_span_stats(spark, sf_dir):
    from .operators.dedup import duplicate_span_stats

    view = _view(spark, sf_dir)
    return duplicate_span_stats(view.tables["documents"], n=8)


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------

@register(
    "graph_triangle_counts",
    """WITH li AS (SELECT * FROM lineitem WHERE year(l_shipdate) = 1998),
       raw AS (
         SELECT 'O' || l_orderkey AS a, 'P' || l_partkey AS b FROM li
         UNION ALL SELECT 'O' || l_orderkey, 'S' || l_suppkey FROM li
         UNION ALL SELECT 'P' || l_partkey, 'S' || l_suppkey FROM li),
       e0 AS (
         SELECT least(a, b) AS u, greatest(a, b) AS v FROM raw
         WHERE a != b GROUP BY 1, 2),
       tri AS (
         SELECT e1.u AS x, e1.v AS y, e2.v AS z
         FROM e0 e1
         JOIN e0 e2 ON e2.u = e1.v
         JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
       roles AS (
         SELECT x AS node FROM tri
         UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri)
       SELECT node, count(*) AS n_triangles FROM roles GROUP BY node""",
)
def graph_triangle_counts(spark, sf_dir):
    """Triangles in the order/part/supplier co-occurrence graph: the three
    edge kinds come from each lineitem's (orderkey, partkey, suppkey)
    triple, but a triangle needs all three edges regardless of which
    lineitems contributed them — a genuine closed-wedge computation, not
    a row count. One ship-year of edges: the full co-occurrence graph is
    near-bipartite-dense on the tiny supplier side (every part touches
    most of the 100·sf suppliers), which quadratically inflates wedge
    generation without making the operator any more interesting; a
    year's slice keeps realistic sparsity."""
    from .operators.graph_algos import triangle_counts

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].filter(F.year("l_shipdate") == 1998)
    e = (
        li.select(
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
        )
        .unionByName(
            li.select(
                F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
        .unionByName(
            li.select(
                F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
    )
    return triangle_counts(e)


# ---------------------------------------------------------------------------
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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
    from .functions.numeric import round_half_up

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
# Training-data pipeline: chunking, packing, PII scrub, quantization,
# heavy hitters, deterministic sampling
# ---------------------------------------------------------------------------


@register(
    "doc_chunk_plan",
    """WITH tok AS (
         SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       base AS (
         SELECT doc_id, t, len(t) AS n,
                CASE WHEN len(t) <= 128 THEN 1
                     ELSE 1 + (len(t) - 128 + 95) // 96 END AS nc
         FROM tok),
       c AS (SELECT doc_id, t, n, unnest(range(0, nc)) AS chunk_id FROM base)
       SELECT doc_id, chunk_id,
              chunk_id * 96 AS token_start,
              least(chunk_id * 96 + 128, n) AS token_end,
              array_to_string(
                  list_slice(t, chunk_id * 96 + 1, least(chunk_id * 96 + 128, n)),
                  ' ') AS chunk_text
       FROM c""",
)
def doc_chunk_plan(spark, sf_dir):
    from .operators.chunking import chunk_plan

    view = _view(spark, sf_dir)
    return chunk_plan(view.tables["documents"], chunk_size=128, overlap=32)


@register(
    "sequence_pack_stats",
    """WITH tk AS (
         SELECT source, doc_id,
                len(list_filter(string_split(lower(text), ' '), x -> x != '')) AS n_tokens
         FROM documents),
       off AS (
         SELECT source, doc_id, n_tokens,
                coalesce(sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         FROM tk)
       SELECT source, CAST(floor(off / 2048.0) AS BIGINT) AS pack_id,
              count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
              min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM off GROUP BY 1, 2""",
)
def sequence_pack_stats(spark, sf_dir):
    from .operators.chunking import sequence_packs

    view = _view(spark, sf_dir)
    return sequence_packs(view.tables["documents"], budget=2048)


@register(
    "pii_scrub_stats",
    r"""WITH aug AS (
         SELECT doc_id,
                text
                || CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@mail.example.org for data'
                        ELSE '' END
                || CASE WHEN doc_id % 11 = 0
                        THEN ' mirror at https://mirror.example.org/d/'
                             || CAST(doc_id AS VARCHAR)
                        ELSE '' END AS text
         FROM documents),
       cl AS (
         SELECT doc_id, text,
                regexp_replace(
                  regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                    '[EMAIL]', 'g'),
                  'https?://[A-Za-z0-9./_-]+', '[URL]', 'g') AS clean
         FROM aug)
       SELECT doc_id,
              len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
              len(regexp_extract_all(text, 'https?://[A-Za-z0-9./_-]+')) AS n_urls,
              length(clean) AS clean_len,
              md5(clean) AS clean_md5
       FROM cl""",
)
def pii_scrub_stats(spark, sf_dir):
    """PII scrub over a deterministically augmented corpus: every 7th doc
    gets a synthetic email, every 11th a URL (the raw synthetic corpus
    contains none), so the redaction path is actually exercised and the
    md5-of-clean-text column proves byte parity of the replacement."""
    from .operators.text_analysis import pii_scrub

    view = _view(spark, sf_dir)
    d = view.tables["documents"]
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.example.org for data"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" mirror at https://mirror.example.org/d/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    return pii_scrub(aug)


@register(
    "embedding_quantize_stats",
    """WITH e AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       s AS (
         SELECT vec_id, ed,
                list_max(list_transform(ed, x -> abs(x))) / 127.0 AS sc
         FROM e)
       SELECT vec_id,
              floor(sc * 1000000000.0 + 0.5) / 1000000000.0 AS scale,
              len(list_filter(ed, x -> abs(floor(x / sc + 0.5)) > 127)) AS n_clipped,
              floor(list_sum(list_transform(ed,
                        x -> abs(x - greatest(-127.0, least(127.0, floor(x / sc + 0.5))) * sc)))
                    / len(ed) * 1000000000.0 + 0.5) / 1000000000.0 AS mean_abs_err
       FROM s""",
)
def embedding_quantize_stats(spark, sf_dir):
    from .operators.similarity import quantize_stats

    view = _view(spark, sf_dir)
    return quantize_stats(view.tables["embeddings"])


@register(
    "heavy_hitter_terms",
    """WITH t AS (
         SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
         FROM documents),
       c AS (SELECT term, count(*) AS n_occurrences FROM t GROUP BY 1),
       r AS (SELECT term, n_occurrences,
                    row_number() OVER (ORDER BY n_occurrences DESC, term) AS rank
             FROM c)
       SELECT term, n_occurrences, rank FROM r WHERE rank <= 50""",
)
def heavy_hitter_terms(spark, sf_dir):
    from .operators.retrieval import heavy_hitter_terms as hh

    view = _view(spark, sf_dir)
    return hh(view.tables["documents"], k=50)


@register(
    "events_group_sample",
    """SELECT event_type, event_id FROM (
         SELECT event_type, event_id,
                row_number() OVER (
                    PARTITION BY event_type
                    ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
         FROM events) t
       WHERE rn <= 50""",
)
def events_group_sample(spark, sf_dir):
    from .operators.analytics import deterministic_group_sample

    view = _view(spark, sf_dir)
    return deterministic_group_sample(
        view.tables["events"], group_col="event_type", id_col="event_id", k=50
    )


@register(
    "contamination_check",
    """WITH tok AS (
         SELECT doc_id, source,
                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       g AS (
         SELECT doc_id, source,
                array_to_string(list_slice(t, i, i + 4), ' ') AS gram
         FROM (SELECT doc_id, source, t, unnest(range(1, len(t) - 5 + 2)) AS i
               FROM tok WHERE len(t) >= 5) p),
       ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
       tr AS (SELECT doc_id, g.gram, ev.gram AS hit
              FROM g LEFT JOIN ev USING (gram) WHERE source != 'src0')
       SELECT doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_contaminated_grams,
              sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
       FROM tr GROUP BY doc_id""",
)
def contamination_check(spark, sf_dir):
    """Decontamination audit with source 'src0' standing in as the held-
    out benchmark: per training doc, its 5-gram overlap with the eval
    slice."""
    from .operators.dedup import contamination_check as cc

    view = _view(spark, sf_dir)
    d = view.tables["documents"]
    return cc(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        n=5,
    )


@register(
    "unigram_logprob_score",
    """WITH terms AS (
         SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
         FROM documents),
       freq AS (SELECT term, count(*) AS c FROM terms GROUP BY 1),
       tot AS (SELECT sum(c) AS total FROM freq)
       SELECT doc_id, count(*) AS n_tokens,
              floor(avg(ln(c / total)) * 10000.0 + 0.5) / 10000.0 AS mean_logprob
       FROM terms JOIN freq USING (term) CROSS JOIN tot
       GROUP BY doc_id""",
)
def unigram_logprob_score(spark, sf_dir):
    from .operators.text_analysis import unigram_logprob_score as ulps

    view = _view(spark, sf_dir)
    return ulps(view.tables["documents"])


@register(
    "lineitem_price_histogram_quantiles",
    """WITH lh AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
                   FROM lineitem),
       b AS (SELECT least(999, CAST(floor((l_extendedprice - lo)
                                          / ((hi - lo) / 1000.0)) AS INT)) AS bin
             FROM lineitem, lh),
       h AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
       cum AS (SELECT bin, sum(c) OVER (ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                      (SELECT sum(c) FROM h) AS total
               FROM h),
       q AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS quantile)
       SELECT quantile,
              floor((lo + (min(bin) + 1) * ((hi - lo) / 1000.0)) * 1000000.0 + 0.5)
              / 1000000.0 AS estimate
       FROM cum JOIN q ON cum >= quantile * total CROSS JOIN lh
       GROUP BY quantile, lo, hi""",
)
def lineitem_price_histogram_quantiles(spark, sf_dir):
    """Mergeable-sketch twin of the exact distributed quantiles: a
    fixed-grid histogram (bounded state, associative merge) read off at
    five quantiles. Companion to lineitem_price_quantiles the way KMV is
    to count_distinct."""
    from .operators.analytics import histogram_quantiles

    view = _view(spark, sf_dir)
    return histogram_quantiles(
        view.tables["lineitem"], "l_extendedprice", [0.25, 0.5, 0.75, 0.9, 0.99]
    )


def graph_k_core(spark, sf_dir):
    """4-core of the one-ship-year order/part/supplier co-occurrence
    graph (rows-only: iterative peeling has no single-pass SQL twin;
    unit tests cover known graphs)."""
    from .operators.graph_algos import k_core

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].filter(F.year("l_shipdate") == 1998)
    e = (
        li.select(
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
        )
        .unionByName(
            li.select(
                F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
        .unionByName(
            li.select(
                F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
    )
    return k_core(e, k=4)


QUERIES["graph_k_core"] = graph_k_core


def _k_core_oracle_sql(k: int = 4, rounds: int = 12) -> str:
    """Fixed-depth unrolled peeling oracle. The Spark operator peels to
    fixpoint; on this graph the fixpoint lands within 5-7 rounds at
    sf0.001/0.01/0.1 (measured), so a 12-round unroll is a strict
    superset — peeling is monotone and idempotent once converged, extra
    rounds are no-ops."""
    sql = """
WITH li AS (SELECT * FROM lineitem WHERE year(l_shipdate) = 1998),
raw AS (
  SELECT 'O' || l_orderkey AS src, 'P' || l_partkey AS dst FROM li
  UNION ALL SELECT 'O' || l_orderkey, 'S' || l_suppkey FROM li
  UNION ALL SELECT 'P' || l_partkey, 'S' || l_suppkey FROM li
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM raw WHERE src <> dst
)"""
    # AS MATERIALIZED is load-bearing: each round references the previous
    # round's CTE five times — inlined, the scan tree grows 5^rounds.
    for r in range(rounds):
        sql += f""",
d{r} AS MATERIALIZED (
  SELECT node FROM (SELECT u AS node FROM e{r} UNION ALL SELECT v AS node FROM e{r})
  GROUP BY node HAVING count(*) >= {k}
),
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e
  JOIN d{r} ku ON e.u = ku.node
  JOIN d{r} kv ON e.v = kv.node
)"""
    sql += f"""
SELECT node, count(*) AS core_degree
FROM (SELECT u AS node FROM e{rounds} UNION ALL SELECT v AS node FROM e{rounds})
GROUP BY node"""
    return sql


ORACLES["graph_k_core"] = _k_core_oracle_sql()


@register(
    "embedding_kmeans_step",
    """WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       c AS (SELECT vec_id AS cid, ed AS cvec FROM e WHERE vec_id < 8),
       d AS (
         SELECT e.vec_id, c.cid,
                list_sum(list_transform(list_zip(e.ed, c.cvec),
                         p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist2
         FROM e, c),
       a AS (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
             FROM d),
       asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
       n AS (SELECT cid, count(*) AS n_assigned FROM asg GROUP BY 1),
       px AS (
         SELECT asg.cid, t.j AS pos, e.ed[t.j + 1] AS v
         FROM asg JOIN e USING (vec_id)
         CROSS JOIN (SELECT unnest(range(0, 64)) AS j) t)
       SELECT px.cid AS cluster_id, px.pos,
              floor(avg(px.v) * 1000000.0 + 0.5) / 1000000.0 AS centroid_val,
              n.n_assigned
       FROM px JOIN n USING (cid)
       GROUP BY 1, 2, 4""",
)
def embedding_kmeans_step(spark, sf_dir):
    from .operators.similarity import kmeans_step

    view = _view(spark, sf_dir)
    return kmeans_step(view.tables["embeddings"], k=8)


@register(
    "dedup_incremental_batch",
    """WITH norm AS (
         SELECT doc_id, source,
                md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         FROM documents),
       cfp AS (SELECT fp, min(doc_id) AS dup_of
               FROM norm WHERE source != 'src19' GROUP BY fp)
       SELECT n.doc_id, cfp.dup_of IS NOT NULL AS is_dup, cfp.dup_of
       FROM norm n LEFT JOIN cfp USING (fp)
       WHERE n.source = 'src19'""",
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental ingest dedup with source 'src19' as the incoming
    batch and the rest as the standing corpus."""
    from .operators.dedup import incremental_exact_dedup

    view = _view(spark, sf_dir)
    d = view.tables["documents"]
    return incremental_exact_dedup(
        d.filter(F.col("source") != "src19"),
        d.filter(F.col("source") == "src19"),
    )


@register(
    "streaming_kmv_distinct_users",
    """WITH h AS (
         SELECT DISTINCT event_type,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS frac
         FROM events),
       ranked AS (
         SELECT event_type, frac,
                row_number() OVER (PARTITION BY event_type ORDER BY frac) AS r
         FROM h),
       kth AS (SELECT event_type, frac AS kth_frac FROM ranked WHERE r = 32),
       cnt AS (SELECT event_type, count(*) AS n FROM h GROUP BY 1)
       SELECT c.event_type,
              CAST(coalesce(CAST(floor(31.0 / k.kth_frac + 0.5) AS BIGINT), c.n) AS BIGINT)
                AS kmv_estimate
       FROM cnt c LEFT JOIN kth k USING (event_type)""",
)
def streaming_kmv_distinct_users(spark, sf_dir):
    """The KMV sketch maintained as streaming state: k=32 smallest
    distinct hash fractions per event_type merged across micro-batches
    (set-union + k-smallest is commutative/associative, so the fixed
    point is arrival-order independent and the batch KMV SQL is the
    oracle). Hashing runs JVM-side before the state shuffle."""
    from pyspark.sql import Window

    from .streaming.events import run_stream_to_memory
    from .streaming.stateful import streaming_kmv_distinct

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    hashed = stream.select(
        F.col("event_type").cast("string").alias("key"),
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") / F.lit(4294967296.0)
        ).alias("frac"),
    )
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        streaming_kmv_distinct(hashed),
        f"q_stream_kmv_{_STREAM_SEQ[0]}",
        output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_batches"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("key").alias("event_type"), "kmv_estimate")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (beyond-reference text quality).
# ---------------------------------------------------------------------------

_REP_R6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"


@register(
    "text_repetition_stats",
    f"""WITH base AS (
          SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
        g AS (
          SELECT doc_id, t,
                 CASE WHEN len(t) >= 2
                      THEN list_transform(generate_series(1, len(t) - 1),
                                          i -> t[i] || ' ' || t[i + 1])
                      ELSE CAST([] AS VARCHAR[]) END AS g2,
                 CASE WHEN len(t) >= 3
                      THEN list_transform(generate_series(1, len(t) - 2),
                                          i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
                      ELSE CAST([] AS VARCHAR[]) END AS g3
          FROM base),
        c AS (
          SELECT doc_id, len(t) AS nt, len(g2) AS n2, len(g3) AS n3,
                 len(list_distinct(g2)) AS d2, len(list_distinct(g3)) AS d3,
                 CASE WHEN len(g2) > 0
                      THEN list_max(list_transform(list_distinct(g2),
                                    y -> len(list_filter(g2, x -> x = y))))
                      ELSE 0 END AS m2,
                 list_transform(list_distinct(t),
                                y -> len(list_filter(t, x -> x = y))) AS tc
          FROM g),
        r AS (
          SELECT doc_id, CAST(n2 AS INT) AS n_2grams,
                 {_REP_R6.format(x="CASE WHEN n2 > 0 THEN (n2 - d2) * 1.0 / n2 ELSE 0.0 END")} AS dup_2gram_ratio,
                 {_REP_R6.format(x="CASE WHEN n3 > 0 THEN (n3 - d3) * 1.0 / n3 ELSE 0.0 END")} AS dup_3gram_ratio,
                 {_REP_R6.format(x="CASE WHEN n2 > 0 THEN m2 * 1.0 / n2 ELSE 0.0 END")} AS top_2gram_share,
                 {_REP_R6.format(x="CASE WHEN nt > 0 THEN -list_sum(list_transform(tc, c -> (c * 1.0 / nt) * log2(c * 1.0 / nt))) ELSE 0.0 END")} AS token_entropy
          FROM c)
        SELECT doc_id, n_2grams, dup_2gram_ratio, dup_3gram_ratio,
               top_2gram_share, token_entropy,
               (dup_2gram_ratio > 0.2 OR dup_3gram_ratio > 0.18
                OR (n_2grams >= 10 AND top_2gram_share > 0.18)) AS flagged
        FROM r""",
)
def text_repetition_stats(spark, sf_dir):
    """Duplicate-n-gram / top-gram-share / token-entropy quality filters
    (Gopher repetition rules) — shuffle-free array expressions."""
    from .operators.text_analysis import repetition_stats

    view = _view(spark, sf_dir)
    return repetition_stats(view.tables["documents"])


# ---------------------------------------------------------------------------
# Data-mixing operators: deterministic splits, per-domain caps, language
# mixtures (training-corpus assembly at 100 TB — all hash-deterministic,
# so fully oracle-checkable).
# ---------------------------------------------------------------------------

_FRAC_DUCK = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " / 4294967296.0)"
)


@register(
    "corpus_split_stats",
    f"""WITH a AS (
          SELECT CASE WHEN {_FRAC_DUCK} < 0.9 THEN 'train'
                      WHEN {_FRAC_DUCK} < 0.95 THEN 'val'
                      ELSE 'test' END AS split,
                 lang, n_chars
          FROM documents)
        SELECT split, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               floor(avg(n_chars) * 10000.0 + 0.5) / 10000.0 AS avg_chars
        FROM a GROUP BY 1, 2""",
)
def corpus_split_stats(spark, sf_dir):
    """Stable hash-based train/val/test assignment + per (split, lang)
    corpus accounting. Map-side assignment, one tiny-key aggregation."""
    from .operators.mixing import split_stats

    view = _view(spark, sf_dir)
    return split_stats(view.tables["documents"])


@register(
    "domain_cap_sample",
    """WITH h AS (
         SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
         FROM documents),
       r AS (
         SELECT source, doc_id,
                row_number() OVER (PARTITION BY source ORDER BY hx, doc_id) AS rn
         FROM h)
       SELECT source, doc_id FROM r WHERE rn <= 25""",
)
def domain_cap_sample(spark, sf_dir):
    """Per-domain document cap (keep a stable 25-doc md5-ordered sample
    per source) via the two-level bounded-state aggregation — no global
    per-group sort; shuffle payload is (hash, id) pairs only."""
    from .operators.mixing import cap_per_group

    view = _view(spark, sf_dir)
    return cap_per_group(view.tables["documents"], "source", "doc_id", k=25)


@register(
    "lang_mixture_stats",
    f"""WITH a AS (
          SELECT lang, n_chars,
                 {_FRAC_DUCK} < CASE lang
                     WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.5
                     WHEN 'fr' THEN 0.5 WHEN 'es' THEN 0.4
                     WHEN 'zh' THEN 0.3 ELSE 0.0 END AS kept
          FROM documents)
        SELECT lang, count(*) AS n_total,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(sum(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
        FROM a GROUP BY 1""",
)
def lang_mixture_stats(spark, sf_dir):
    """Deterministic weighted language mixture (keep-probability per
    lang, hash-thresholded) with before/after accounting in one scan."""
    from .operators.mixing import mixture_stats

    view = _view(spark, sf_dir)
    return mixture_stats(view.tables["documents"])


# ---------------------------------------------------------------------------
# Time-series features over events: trailing RANGE-frame activity and
# per-group z-score anomaly accounting.
# ---------------------------------------------------------------------------

@register(
    "rolling_user_activity",
    """WITH s AS (
         SELECT user_id, value, epoch_us(ts) AS us FROM events),
       r AS (
         SELECT user_id,
                count(*) OVER w AS n,
                sum(CAST(value AS DECIMAL(27,4))) OVER w AS v
         FROM s
         WINDOW w AS (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW))
       SELECT user_id,
              CAST(max(n) AS BIGINT) AS peak_window_events,
              floor(CAST(max(v) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS peak_window_value
       FROM r GROUP BY 1""",
)
def rolling_user_activity(spark, sf_dir):
    """Per-user peak trailing-3-day activity via an event-time RANGE
    frame on integer microseconds (identical peer semantics in any
    engine); one shuffle on user_id."""
    from .operators.windows import rolling_range_activity

    view = _view(spark, sf_dir)
    return rolling_range_activity(view.tables["events"])


@register(
    "events_zscore_outliers",
    f"""WITH st AS (
         SELECT event_type,
                {_dsum('value')} / count(*) AS m,
                sqrt(greatest({_dsum('value * value', 8)} / count(*)
                              - ({_dsum('value')} / count(*))
                                * ({_dsum('value')} / count(*)), 0.0)) AS sd
         FROM events GROUP BY 1),
       sc AS (
         SELECT e.event_type,
                CASE WHEN sd > 0 THEN abs((value - m) / sd) ELSE 0.0 END AS az
         FROM events e JOIN st USING (event_type))
       SELECT event_type, count(*) AS n_events,
              CAST(sum(CASE WHEN az > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
              floor(max(az) * 10000.0 + 0.5) / 10000.0 AS max_abs_z
       FROM sc GROUP BY 1""",
)
def events_zscore_outliers(spark, sf_dir):
    """Population z-score anomaly counts per event_type: tiny stats agg
    broadcast back over the events scan — no second shuffle."""
    from .operators.windows import zscore_outliers

    view = _view(spark, sf_dir)
    return zscore_outliers(view.tables["events"])


# ---------------------------------------------------------------------------
# Corpus bigram LM read-out (top next-tokens per frequent prefix).
# ---------------------------------------------------------------------------

@register(
    "bigram_next_token_topk",
    f"""WITH tok AS (SELECT {_TOKS_DUCK} AS t FROM documents),
        pairs AS (
          SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> {{'w1': t[i], 'w2': t[i + 1]}}), recursive := true)
          FROM tok),
        pc AS (SELECT w1, w2, count(*) AS pair_count FROM pairs GROUP BY 1, 2),
        pt AS (SELECT w1,
                      row_number() OVER (ORDER BY sum(pair_count) DESC, w1) AS pr
               FROM pc GROUP BY 1),
        ranked AS (
          SELECT c.w1, c.w2, CAST(c.pair_count AS BIGINT) AS pair_count,
                 CAST(row_number() OVER (PARTITION BY c.w1
                      ORDER BY c.pair_count DESC, c.w2) AS INT) AS rnk
          FROM pc c JOIN pt ON pt.w1 = c.w1 AND pt.pr <= 20)
        SELECT w1, w2, pair_count, rnk FROM ranked WHERE rnk <= 3""",
)
def bigram_next_token_topk(spark, sf_dir):
    """Bigram LM over the corpus: top-3 next tokens for the 20 most
    frequent prefixes. Map-side-combined (w1, w2) counts; rankings run
    on vocabulary-sized data with the prefix set broadcast back."""
    from .operators.text_analysis import bigram_next_token_topk as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


# ---------------------------------------------------------------------------
# Round-3 additions: corpus shard planning, quality survival curve,
# per-label embedding stats
# ---------------------------------------------------------------------------

@register(
    "corpus_shard_manifest",
    f"""WITH s AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS INT) AS shard_id,
                 len({_TOKS_DUCK}) AS nt
          FROM documents)
        SELECT shard_id, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM s GROUP BY shard_id""",
)
def corpus_shard_manifest(spark, sf_dir):
    """Shard plan for the corpus-to-token-shards output step: hash-based
    assignment (md5 of the stable id — deterministic across engines and
    retries, no global row_number sort), audited per shard. The writer
    (sinks/shard_sink.py::write_corpus_shards) executes exactly this
    plan; the manifest is the I/O-free gate surface."""
    from .sinks.shard_sink import shard_manifest

    view = _view(spark, sf_dir)
    return shard_manifest(view.tables["documents"], n_shards=16)


ORACLES["quality_survival_curve"] = f"""
WITH q AS ({ORACLES["text_quality_score"]}),
j AS (
  SELECT d.lang, LEAST(CAST(floor(q.quality * 10) AS INT), 9) AS bucket
  FROM q JOIN documents d USING (doc_id)),
a AS (SELECT lang, bucket, count(*) AS n_docs FROM j GROUP BY 1, 2)
SELECT lang, bucket, n_docs,
       CAST(sum(n_docs) OVER (PARTITION BY lang ORDER BY bucket DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_survivors
FROM a
"""


def quality_survival_curve(spark, sf_dir):
    """Threshold-tuning table for the quality filter: per (lang, score
    decile), how many docs sit in the bucket and how many SURVIVE a
    threshold at the bucket's lower edge (cumulative from the top,
    windowed per language — no global window). The question every
    pipeline asks before picking a cutoff: what fraction of each
    language do we lose at quality >= x?"""
    from pyspark.sql import Window

    from .operators.text_analysis import quality_columns

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    q = quality_columns("text")["quality"]
    bucket = F.least(F.floor(q * 10).cast("int"), F.lit(9))
    agg = (
        docs.select(F.col("lang"), bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return agg.withColumn("cum_survivors", F.sum("n_docs").over(w))


QUERIES["quality_survival_curve"] = quality_survival_curve


@register(
    "embedding_label_stats",
    """WITH n AS (
         SELECT label,
                sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings)
       SELECT label, count(*) AS n_vecs,
              floor(avg(nrm) * 1000000.0 + 0.5) / 1000000.0 AS mean_norm,
              floor(min(nrm) * 1000000.0 + 0.5) / 1000000.0 AS min_norm,
              floor(max(nrm) * 1000000.0 + 0.5) / 1000000.0 AS max_norm
       FROM n GROUP BY label""",
)
def embedding_label_stats(spark, sf_dir):
    """Per-class embedding audit (norm distribution by label) — the
    sanity check before any cosine-based dedup/search: unnormalized or
    collapsed classes show up here first. One narrow projection (the
    norm is a per-row array aggregate in codegen) + one small groupBy."""
    from .functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    emb = view.tables["embeddings"]
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    per_vec = emb.select(F.col("label"), norm.alias("nrm"))
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        round_half_up(F.avg("nrm"), 6).alias("mean_norm"),
        round_half_up(F.min("nrm"), 6).alias("min_norm"),
        round_half_up(F.max("nrm"), 6).alias("max_norm"),
    )


@register(
    "doc_novelty_profile",
    """WITH tok AS (
         SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(range(1, len(t) - 8 + 2)) AS i
         FROM tok WHERE len(t) >= 8),
       grams AS (
         SELECT doc_id, md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS gram_h
         FROM pos),
       firsts AS (SELECT gram_h, min(doc_id) AS first_doc FROM grams GROUP BY 1)
       SELECT g.doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_novel,
              floor(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) * 1.0
                    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS novelty
       FROM grams g JOIN firsts f USING (gram_h) GROUP BY g.doc_id""",
)
def doc_novelty_profile(spark, sf_dir):
    """Per-doc first-seen n-gram fraction in ingestion (doc id) order —
    the crawl-value / curriculum signal. See operators/dedup.py
    ::novelty_profile for the plan shape."""
    from .operators.dedup import novelty_profile

    view = _view(spark, sf_dir)
    return novelty_profile(view.tables["documents"], n=8)


@register(
    "lineitem_column_profile",
    """WITH p AS (
         SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
                CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_nulls,
                count(DISTINCT l_orderkey) AS n_distinct,
                CAST(min(l_orderkey) AS VARCHAR) AS min_value,
                CAST(max(l_orderkey) AS VARCHAR) AS max_value
         FROM lineitem
         UNION ALL
         SELECT 'l_shipdate', count(*),
                sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END),
                count(DISTINCT l_shipdate),
                CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR),
                CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR)
         FROM lineitem
         UNION ALL
         SELECT 'l_returnflag', count(*),
                sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END),
                count(DISTINCT l_returnflag),
                min(l_returnflag), max(l_returnflag)
         FROM lineitem
         UNION ALL
         SELECT 'l_linenumber', count(*),
                sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END),
                count(DISTINCT l_linenumber),
                CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
         FROM lineitem)
       SELECT "column", n_rows, CAST(n_nulls AS BIGINT) AS n_nulls,
              n_distinct, min_value, max_value
       FROM p""",
)
def lineitem_column_profile(spark, sf_dir):
    """ANALYZE-style column statistics (exact mode for the oracle; the
    100 TB path flips exact=False for single-pass HLL cardinalities —
    see operators/profiling.py). String-safe columns only in the gate
    projection: float rendering differs across engines."""
    from .operators.profiling import column_profile

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].withColumn("l_shipdate", F.to_date("l_shipdate"))
    return column_profile(
        li,
        ["l_orderkey", "l_shipdate", "l_returnflag", "l_linenumber"],
        exact=True,
    )


@register(
    "corpus_snapshot_diff",
    """WITH old AS (
         SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         FROM documents WHERE doc_id % 11 != 0),
       new AS (
         SELECT doc_id,
                md5(trim(regexp_replace(lower(
                  CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
                ), '\\s+', ' ', 'g'))) AS fp
         FROM documents WHERE doc_id % 13 != 0)
       SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
              CASE WHEN old.fp IS NULL THEN 'added'
                   WHEN new.fp IS NULL THEN 'removed'
                   WHEN old.fp != new.fp THEN 'changed'
                   ELSE 'unchanged' END AS status
       FROM old FULL OUTER JOIN new USING (doc_id)""",
)
def corpus_snapshot_diff(spark, sf_dir):
    """Snapshot-to-snapshot CDC over a deterministic mutation of the
    documents table (drop doc_id%11 from the old crawl, drop %13 from
    the new one, edit the text of %7): per-doc added/removed/changed/
    unchanged via one fingerprint full-outer join. See
    operators/dedup.py::snapshot_diff for the scale shape."""
    from .operators.dedup import snapshot_diff

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    old = docs.filter(F.col("doc_id") % 11 != 0)
    new = docs.filter(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


@register(
    "bpe_merge_candidates",
    """WITH words AS (
         SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
         FROM documents),
       pos AS (
         SELECT w, unnest(range(1, length(w))) AS i
         FROM words WHERE length(w) >= 2),
       pairs AS (SELECT substr(w, i, 2) AS pair FROM pos)
       SELECT pair, count(*) AS cnt FROM pairs
       GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""",
)
def bpe_merge_candidates(spark, sf_dir):
    """Tokenizer induction, step one: the 20 most frequent in-word
    character pairs (what BPE would merge first on this corpus).
    Deterministic tie-break on the pair string."""
    from .operators.text_analysis import bpe_merge_candidates as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


# ---------------------------------------------------------------------------
# Round 4: BPE merge application, Heaps'-law vocab growth, per-domain
# quality calibration, market-basket co-occurrence.
# ---------------------------------------------------------------------------

@register(
    "bpe_apply_merge_stats",
    f"""WITH tok AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
       words AS (
         SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
         FROM documents),
       pos AS (
         SELECT w, unnest(range(1, length(w))) AS i
         FROM words WHERE length(w) >= 2),
       topk AS (
         SELECT substr(w, i, 2) AS pair, count(*) AS cnt FROM pos
         GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20),
       m AS (SELECT list(pair ORDER BY pair) AS merges FROM topk),
       stats AS (
         SELECT doc_id,
                list_sum(list_transform(t, w -> length(w))) AS n_symbols,
                list_sum(list_transform(t, w ->
                  list_reduce(list_prepend(0, range(1, length(w))),
                    (acc, i) -> CASE WHEN acc % 2 = 1 THEN acc - 1
                                     WHEN list_contains(m.merges, substr(w, i, 2))
                                     THEN acc + 3
                                     ELSE acc END) // 2)) AS n_merges
         FROM tok, m)
       SELECT doc_id,
              CAST(n_symbols AS BIGINT) AS n_symbols,
              CAST(n_merges AS BIGINT) AS n_merges,
              CAST(n_symbols - n_merges AS BIGINT) AS n_after,
              CASE WHEN n_symbols > 0
                   THEN floor(n_merges * 1.0 / n_symbols * 1000000.0 + 0.5) / 1000000.0
                   ELSE 0.0 END AS compression
       FROM stats""",
)
def bpe_apply_merge_stats(spark, sf_dir):
    """Tokenizer induction, step two: apply the corpus' top-20 BPE merge
    candidates with the greedy left-to-right rule (a merge consumes both
    characters) and audit the per-doc compression. The greedy scan is an
    integer-encoded fold inside codegen — no explode, no window; the
    oracle reproduces it with DuckDB's list_reduce."""
    from .operators.text_analysis import bpe_apply_merge_stats as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "vocab_growth_curve",
    f"""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
       tok AS (
         SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents),
       firsts AS (SELECT term, min(doc_id) AS first_doc FROM tok GROUP BY term),
       newt AS (
         SELECT LEAST(19, CAST(floor(first_doc * 20.0 / (m + 1)) AS INT)) AS bucket,
                count(*) AS n_new_terms
         FROM firsts, mx GROUP BY 1),
       docs AS (
         SELECT LEAST(19, CAST(floor(doc_id * 20.0 / (m + 1)) AS INT)) AS bucket,
                count(*) AS n_docs
         FROM documents, mx GROUP BY 1),
       j AS (
         SELECT coalesce(d.bucket, n.bucket) AS bucket,
                coalesce(n_docs, 0) AS n_docs,
                coalesce(n_new_terms, 0) AS n_new_terms
         FROM docs d FULL OUTER JOIN newt n ON d.bucket = n.bucket)
       SELECT bucket, n_docs, n_new_terms,
              CAST(sum(n_new_terms) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_vocab
       FROM j""",
)
def vocab_growth_curve(spark, sf_dir):
    """Heaps'-law read-out: cumulative distinct vocabulary per ingestion-
    order slice, computed linearly via first-seen attribution (min doc id
    per term), never an expanding distinct window. Bounded 20-row
    output at any corpus size."""
    from .operators.text_analysis import vocab_growth_curve as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


ORACLES["domain_quality_percentiles"] = f"""
WITH q AS ({ORACLES["text_quality_score"]})
SELECT q.doc_id, d.source, q.quality,
       floor(percent_rank() OVER (PARTITION BY d.source ORDER BY q.quality)
             * 1000000.0 + 0.5) / 1000000.0 AS quality_pct
FROM q JOIN documents d ON q.doc_id = d.doc_id
"""


def domain_quality_percentiles(spark, sf_dir):
    """Per-domain percent_rank of the quality score — cross-domain
    threshold calibration. Window partitions by domain; per-domain
    sorts only."""
    from .operators.text_analysis import domain_quality_percentiles as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


QUERIES["domain_quality_percentiles"] = domain_quality_percentiles


@register(
    "part_copurchase_topk",
    """WITH items AS (
         SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       pairs AS (
         SELECT a.p AS p1, b.p AS p2, count(*) AS n_co_orders
         FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
         GROUP BY 1, 2
         HAVING count(*) >= 2),
       sym AS (
         SELECT p1, p2, n_co_orders FROM pairs
         UNION ALL
         SELECT p2, p1, n_co_orders FROM pairs),
       ranked AS (
         SELECT p1 AS part, p2 AS co_part, n_co_orders,
                CAST(row_number() OVER (PARTITION BY p1
                     ORDER BY n_co_orders DESC, p2) AS INT) AS rnk
         FROM sym)
       SELECT part, co_part, n_co_orders, rnk FROM ranked WHERE rnk <= 5""",
)
def part_copurchase_topk(spark, sf_dir):
    """Market-basket co-occurrence: per part, the 5 parts most often in
    the same order (item-item CF primer). Pair generation bounded by
    basket size squared; rank window partitions by part."""
    from .operators.analytics import part_copurchase_topk as op

    return op(_view(spark, sf_dir))


_LPA_ROUND = """
  SELECT node, label FROM (
    SELECT u.a AS node, l.label, count(*) AS c,
           row_number() OVER (PARTITION BY u.a
                              ORDER BY count(*) DESC, l.label) AS rn
    FROM und u JOIN {prev} l ON u.b = l.node
    GROUP BY u.a, l.label)
  WHERE rn = 1
"""


@register(
    "graph_label_propagation",
    f"""WITH e AS (
         SELECT 'O' || l_orderkey AS a, 'P' || l_partkey AS b
         FROM lineitem WHERE year(l_shipdate) = 1998
         UNION ALL
         SELECT 'O' || l_orderkey, 'S' || l_suppkey
         FROM lineitem WHERE year(l_shipdate) = 1998
         UNION ALL
         SELECT 'P' || l_partkey, 'S' || l_suppkey
         FROM lineitem WHERE year(l_shipdate) = 1998),
       und AS (
         SELECT DISTINCT a, b FROM (
           SELECT a, b FROM e UNION ALL SELECT b, a FROM e)
         WHERE a != b),
       lab0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
       r1 AS ({_LPA_ROUND.format(prev='lab0')}),
       r2 AS ({_LPA_ROUND.format(prev='r1')}),
       r3 AS ({_LPA_ROUND.format(prev='r2')})
       SELECT node, label FROM r3""",
)
def graph_label_propagation(spark, sf_dir):
    """3-round synchronous label propagation over the one-ship-year
    order/part/supplier co-occurrence graph — deterministic communities
    (majority neighbor label, ties to the smallest). Fixed rounds make
    it SQL-replayable; see operators/graph_algos.py::label_propagation
    for the per-superstep shuffle shape."""
    from .operators.graph_algos import label_propagation

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].filter(F.year("l_shipdate") == 1998)
    e = (
        li.select(
            F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
            F.concat(F.lit("P"), F.col("l_partkey")).alias("dst"),
        )
        .unionByName(
            li.select(
                F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
        .unionByName(
            li.select(
                F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
            )
        )
    )
    return label_propagation(e, rounds=3)


@register(
    "streaming_moment_stats",
    """WITH c AS (
         SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
         FROM events)
       SELECT CAST(event_type AS VARCHAR) AS key,
              count(*) AS n_events,
              floor(((CAST(sum(cents) AS BIGINT) / 100.0) / count(*))
                    * 1000000.0 + 0.5) / 1000000.0 AS mean_value,
              floor(sqrt(greatest(
                       (CAST(sum(cents * cents) AS BIGINT) / 10000.0) / count(*)
                       - ((CAST(sum(cents) AS BIGINT) / 100.0) / count(*))
                         * ((CAST(sum(cents) AS BIGINT) / 100.0) / count(*)),
                       0.0)) * 1000000.0 + 0.5) / 1000000.0 AS std_value
       FROM c GROUP BY event_type""",
)
def streaming_moment_stats(spark, sf_dir):
    """Streaming per-key mean/stddev via applyInPandasWithState with
    INTEGER-cent moment state (3 longs per key): integer accumulation is
    exactly commutative, so the last emission per key is bit-identical
    to the batch population formula under any micro-batch schedule —
    which is why a batch SQL oracle exists at all (float state would
    drift with arrival order). The streaming twin of
    ``events_zscore_outliers``' stats pass."""
    from pyspark.sql import Window

    from .streaming.events import run_stream_to_memory
    from .streaming.stateful import streaming_moment_stats as op

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream), f"q_stream_moments_{_STREAM_SEQ[0]}", output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_events"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("key", "n_events", "mean_value", "std_value")
    )


_MH_SIDE = """
  {name}_sh AS (
    SELECT DISTINCT doc_id, unnest({shingles}) AS shingle
    FROM (SELECT doc_id, {toks} AS t FROM documents WHERE {pred})),
  {name}_h AS (
    SELECT doc_id, seed, md5(seed || '|' || shingle) AS h
    FROM {name}_sh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s),
  {name}_mh AS (SELECT doc_id, seed, min(h) AS mh FROM {name}_h GROUP BY 1, 2),
  {name}_sig AS (
    SELECT doc_id, CAST(seed // 4 AS INT) AS band,
           md5(string_agg(mh, ',' ORDER BY seed)) AS signature
    FROM {name}_mh GROUP BY doc_id, CAST(seed // 4 AS INT))
"""


@register(
    "dedup_incremental_near_dup",
    f"""WITH
       {_MH_SIDE.format(name='b', pred='doc_id % 10 = 0', toks=_TOKS_DUCK, shingles=_SHINGLES_DUCK)},
       {_MH_SIDE.format(name='c', pred='doc_id % 10 != 0', toks=_TOKS_DUCK, shingles=_SHINGLES_DUCK)},
       cands AS (
         SELECT DISTINCT b_sig.doc_id AS batch_id, c_sig.doc_id AS corpus_id
         FROM b_sig JOIN c_sig
           ON b_sig.band = c_sig.band AND b_sig.signature = c_sig.signature),
       nb AS (SELECT doc_id, count(*) AS n FROM b_sh GROUP BY 1),
       nc AS (SELECT doc_id, count(*) AS n FROM c_sh GROUP BY 1),
       inter AS (
         SELECT cd.batch_id, cd.corpus_id, count(*) AS i
         FROM cands cd
         JOIN b_sh x ON x.doc_id = cd.batch_id
         JOIN c_sh y ON y.doc_id = cd.corpus_id AND y.shingle = x.shingle
         GROUP BY 1, 2),
       verified AS (
         SELECT batch_id, corpus_id,
                floor((i * 1.0 / (nb.n + nc.n - i)) * 1000000.0 + 0.5)
                  / 1000000.0 AS jaccard
         FROM inter
         JOIN nb ON batch_id = nb.doc_id
         JOIN nc ON corpus_id = nc.doc_id),
       best AS (
         SELECT batch_id, corpus_id, jaccard FROM (
           SELECT *, row_number() OVER (PARTITION BY batch_id
                       ORDER BY jaccard DESC, corpus_id) AS rn
           FROM verified WHERE jaccard >= 0.5)
         WHERE rn = 1)
       SELECT d.doc_id,
              best.corpus_id IS NOT NULL AS has_near_dup,
              best.corpus_id AS best_match,
              best.jaccard AS best_jaccard
       FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
       LEFT JOIN best ON d.doc_id = best.batch_id""",
)
def dedup_incremental_near_dup(spark, sf_dir):
    """Daily-crawl near-dup screen: batch = doc_id % 10 == 0 incoming
    docs, corpus = the rest; banded-MinHash candidate join (small batch
    side against the bucketable corpus signature table) + exact-Jaccard
    verification on candidates only. See
    operators/dedup.py::incremental_near_dup."""
    from .operators.dedup import incremental_near_dup

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_near_dup(corpus, batch)


@register(
    "domain_mixture_weights",
    """WITH a AS (
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY source),
       t AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS tot,
                    CAST(sum(n_docs) AS BIGINT) AS all_docs
             FROM a)
       SELECT source, n_docs, total_chars,
              floor(sqrt(CAST(n_docs AS DOUBLE)) / tot * 1000000.0 + 0.5)
                / 1000000.0 AS weight,
              floor(sqrt(CAST(n_docs AS DOUBLE)) / tot * all_docs / n_docs
                    * 1000000.0 + 0.5) / 1000000.0 AS effective_epochs
       FROM a, t""",
)
def domain_mixture_weights(spark, sf_dir):
    """Temperature (alpha=0.5) sampling weights per source domain with
    implied effective epochs — the corpus-mixing read-out. sqrt (not
    pow) so both engines round identically."""
    from .operators.mixing import domain_mixture_weights as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "embedding_ivf_cell_stats",
    """WITH v AS (
         SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
         FROM embeddings),
       cents AS (SELECT vec_id AS cell, v AS cv, norm AS cn FROM v WHERE vec_id < 16),
       assigned AS (
         SELECT vec_id, v, norm, cell FROM (
           SELECT a.vec_id, a.v, a.norm, c.cell,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn))
                                   * 1000000.0 + 0.5)/1000000.0 DESC,
                             c.cell) AS r
           FROM v a CROSS JOIN cents c) t WHERE r = 1),
       scored AS (
         SELECT a.cell,
                floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn))
                      * 1000000.0 + 0.5)/1000000.0 AS cos
         FROM assigned a JOIN cents c ON a.cell = c.cell)
       SELECT cell, count(*) AS n_vectors,
              floor(CAST(sum(CAST((cos) AS DECIMAL(27,6))) AS DOUBLE) / count(*)
                    * 1000000.0 + 0.5) / 1000000.0 AS mean_cosine
       FROM scored GROUP BY cell""",
)
def embedding_ivf_cell_stats(spark, sf_dir):
    """IVF index balance/coherence audit: per cell, member count and
    decimal-exact mean member-to-centroid cosine. See
    operators/similarity.py::ivf_cell_stats."""
    from .operators.similarity import ivf_cell_stats

    view = _view(spark, sf_dir)
    return ivf_cell_stats(view.tables["embeddings"])


ORACLES["ann_recall_at_k"] = f"""
WITH ivf AS ({ORACLES['embedding_ivf_topk']}),
     brute AS ({ORACLES['embedding_topk']}),
     hits AS (
       SELECT i.query_id, count(*) AS n_overlap
       FROM ivf i JOIN brute b
         ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
       GROUP BY 1),
     qs AS (SELECT DISTINCT query_id FROM ivf)
SELECT qs.query_id,
       CAST(coalesce(hits.n_overlap, 0) AS BIGINT) AS n_overlap,
       floor(coalesce(hits.n_overlap, 0) / 10.0 * 1000000.0 + 0.5)
         / 1000000.0 AS recall_at_k
FROM qs LEFT JOIN hits ON qs.query_id = hits.query_id
"""


def ann_recall_at_k(spark, sf_dir):
    """Recall@10 of the IVF index vs exact brute-force per query — the
    ANN-quality eval; both rankings deterministic, so recall is exact.
    See operators/similarity.py::ann_recall_at_k."""
    from .operators.similarity import ann_recall_at_k as op

    view = _view(spark, sf_dir)
    return op(view.tables["embeddings"])


QUERIES["ann_recall_at_k"] = ann_recall_at_k


@register(
    "cms_term_estimates",
    f"""WITH tok AS (SELECT unnest({_TOKS_DUCK}) AS term FROM documents),
       tr AS (SELECT term, unnest(range(0, 4)) AS i FROM tok),
       cells AS (
         SELECT i,
                CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || term), 1, 8))::BIGINT
                     % 1024 AS INT) AS col
         FROM tr),
       sketch AS (SELECT i, col, count(*) AS c FROM cells GROUP BY 1, 2),
       tc AS (SELECT term, count(*) AS true_count FROM tok GROUP BY 1
              ORDER BY true_count DESC, term LIMIT 20),
       probes AS (
         SELECT term, true_count, i,
                CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || term), 1, 8))::BIGINT
                     % 1024 AS INT) AS col
         FROM (SELECT term, true_count, unnest(range(0, 4)) AS i FROM tc)),
       est AS (
         SELECT term, true_count, min(c) AS cms_estimate
         FROM probes JOIN sketch USING (i, col) GROUP BY 1, 2)
       SELECT term, true_count, cms_estimate,
              cms_estimate - true_count AS overestimate
       FROM est""",
)
def cms_term_estimates(spark, sf_dir):
    """Count-min sketch (4×1024, md5 rows) audited against the exact
    top-20 term counts — the bounded-state counter for vocabularies
    that don't fit, with its overestimate measured in-query. See
    operators/retrieval.py::cms_term_estimates."""
    from .operators.retrieval import cms_term_estimates as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "events_retention_cohorts",
    """WITH s AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS signup_date
         FROM events WHERE event_type = 'signup' GROUP BY user_id),
       a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_date
             FROM events),
       cell AS (
         SELECT a.user_id,
                CAST(floor(datediff('day', DATE '2024-01-01', signup_date)
                           / 7.0) AS INT) AS cohort_week,
                CAST(floor(datediff('day', signup_date, activity_date)
                           / 7.0) AS INT) AS week_offset
         FROM a JOIN s USING (user_id))
       SELECT cohort_week, week_offset,
              count(DISTINCT user_id) AS n_active_users
       FROM cell WHERE week_offset >= 0 AND week_offset < 5
       GROUP BY 1, 2""",
)
def events_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention matrix (first-signup week × weeks-since,
    distinct active users) — product-analytics staple; two shuffles,
    date math on NTZ-derived DATEs (timezone-proof). See
    operators/windows.py::retention_cohorts."""
    from .operators.windows import retention_cohorts

    view = _view(spark, sf_dir)
    return retention_cohorts(view.tables["events"])


@register(
    "customer_rfm_segments",
    f"""WITH pc AS (
         SELECT o_custkey AS c_custkey,
                max(CAST(o_orderdate AS DATE)) AS last_order,
                count(*) AS frequency,
                floor({_dsum('o_totalprice')} * 100.0 + 0.5) / 100.0 AS monetary
         FROM orders GROUP BY 1),
       mx AS (SELECT max(last_order) AS maxd FROM pc),
       r AS (SELECT c_custkey,
                    CAST(datediff('day', last_order, maxd) AS INT) AS recency_days,
                    frequency, monetary
             FROM pc, mx),
       q AS (SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
                    quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fq,
                    quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mq
             FROM r)
       SELECT c_custkey, recency_days, frequency, monetary,
              6 - (1 + CAST(recency_days > rq[1] AS INT)
                     + CAST(recency_days > rq[2] AS INT)
                     + CAST(recency_days > rq[3] AS INT)
                     + CAST(recency_days > rq[4] AS INT)) AS r_score,
              1 + CAST(frequency > fq[1] AS INT) + CAST(frequency > fq[2] AS INT)
                + CAST(frequency > fq[3] AS INT) + CAST(frequency > fq[4] AS INT)
                AS f_score,
              1 + CAST(monetary > mq[1] AS INT) + CAST(monetary > mq[2] AS INT)
                + CAST(monetary > mq[3] AS INT) + CAST(monetary > mq[4] AS INT)
                AS m_score
       FROM r, q""",
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation with broadcast quintile thresholds instead of a
    global ntile window (threshold broadcasts scale; rank windows
    don't). Decimal-exact monetary sums. See
    operators/analytics.py::customer_rfm_segments."""
    from .operators.analytics import customer_rfm_segments as op

    return op(_view(spark, sf_dir))


@register(
    "bigram_perplexity_heldout",
    f"""WITH tokd AS (SELECT doc_id, source, {_TOKS_DUCK} AS t FROM documents),
       tr AS (SELECT doc_id, t FROM tokd WHERE source != 'src0'),
       ho AS (SELECT doc_id, t FROM tokd WHERE source = 'src0'),
       trp AS (SELECT t[i] AS w1, t[i+1] AS w2
               FROM (SELECT t, unnest(range(1, len(t))) AS i FROM tr)),
       c12 AS (SELECT w1, w2, count(*) AS c12 FROM trp GROUP BY 1, 2),
       c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
       vv AS (SELECT count(DISTINCT x) AS v
              FROM (SELECT unnest(t) AS x FROM tr)),
       hop AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM ho)),
       scored AS (
         SELECT hop.doc_id,
                floor(-log2((coalesce(c12.c12, 0) + 1) * 1.0
                            / (coalesce(c1.c1, 0) + vv.v))
                      * 1000000.0 + 0.5) / 1000000.0 AS nll
         FROM hop LEFT JOIN c12 USING (w1, w2)
                  LEFT JOIN c1 USING (w1)
                  CROSS JOIN vv),
       agg AS (
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(CAST(nll AS DECIMAL(27,6))) AS DOUBLE) / count(*) AS a
         FROM scored GROUP BY doc_id)
       SELECT doc_id, n_bigrams,
              floor(a * 1000000.0 + 0.5) / 1000000.0 AS avg_nll,
              floor(pow(2.0, a) * 10000.0 + 0.5) / 10000.0 AS perplexity
       FROM agg""",
)
def bigram_perplexity_heldout(spark, sf_dir):
    """Add-one-smoothed bigram LM fit on source != 'src0', perplexity of
    the held-out src0 docs — the model-based quality filter with a real
    train/heldout split. Per-pair NLL rounded then decimal-summed so
    every stage is engine-portable. See
    operators/text_analysis.py::bigram_perplexity_heldout."""
    from .operators.text_analysis import bigram_perplexity_heldout as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "basket_association_rules",
    """WITH items AS (
         SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
       pp AS (SELECT p, count(*) AS n_orders_part FROM items GROUP BY 1),
       pairs AS (
         SELECT a.p AS p1, b.p AS p2, count(*) AS n_co_orders
         FROM items a JOIN items b ON a.o = b.o AND a.p != b.p
         GROUP BY 1, 2 HAVING count(*) >= 3)
       SELECT p1 AS antecedent, p2 AS consequent, n_co_orders,
              floor(n_co_orders * 1.0 / n.n_orders * 1000000.0 + 0.5)
                / 1000000.0 AS support,
              floor(n_co_orders * 1.0 / na.n_orders_part * 1000000.0 + 0.5)
                / 1000000.0 AS confidence,
              floor((n_co_orders * 1.0 / na.n_orders_part)
                    / (nb.n_orders_part * 1.0 / n.n_orders)
                    * 1000000.0 + 0.5) / 1000000.0 AS lift
       FROM pairs
       JOIN pp na ON pairs.p1 = na.p
       JOIN pp nb ON pairs.p2 = nb.p
       CROSS JOIN n""",
)
def basket_association_rules(spark, sf_dir):
    """Market-basket association rules (support/confidence/lift) for
    directed part pairs with >= 3 common orders — exact integer-ratio
    metrics on top of the co-purchase counts. See
    operators/analytics.py::basket_association_rules."""
    from .operators.analytics import basket_association_rules as op

    return op(_view(spark, sf_dir))


@register(
    "embedding_pq_audit",
    """WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       sub AS (
         SELECT vec_id, m.m, ed[m.m * 16 + 1 : m.m * 16 + 16] AS sv
         FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS m) m),
       codes AS (
         SELECT vec_id AS cid, m, sv AS cv FROM sub WHERE vec_id < 16),
       d AS (
         SELECT s.vec_id, s.m, c.cid,
                list_sum(list_transform(list_zip(s.sv, c.cv),
                         p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
         FROM sub s JOIN codes c ON s.m = c.m),
       a AS (
         SELECT vec_id, m, cid, d2,
                row_number() OVER (PARTITION BY vec_id, m
                                   ORDER BY d2, cid) AS rn
         FROM d)
       SELECT vec_id, CAST(m AS INT) AS subspace, cid AS code,
              floor(d2 * 1000000.0 + 0.5) / 1000000.0 AS sq_err
       FROM a WHERE rn = 1""",
)
def embedding_pq_audit(spark, sf_dir):
    """Product-quantization assignment + reconstruction-error audit
    (4 subspaces x 16 codes over the 64-dim embeddings; codebook = the
    first 16 vectors' sub-vectors, deterministic). The memory side of
    billion-scale ANN. See operators/similarity.py::pq_assign_audit."""
    from .operators.similarity import pq_assign_audit

    view = _view(spark, sf_dir)
    return pq_assign_audit(view.tables["embeddings"])


# ---------------------------------------------------------------------------
# Round-4 second batch: feature-space audits, weighted sampling, batching,
# SCD2 history, robust outliers, record linkage, HITS
# ---------------------------------------------------------------------------


@register(
    "embedding_dim_stats",
    """WITH e AS (
         SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       px AS (
         SELECT i - 1 AS dim, ed[i] AS v
         FROM (SELECT ed, unnest(range(1, len(ed) + 1)) AS i FROM e) t),
       a AS (
         SELECT dim, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2,
                min(v) AS mn, max(v) AS mx
         FROM px GROUP BY 1)
       SELECT CAST(dim AS INT) AS dim, n,
              floor((s1 / n) * 1000000.0 + 0.5) / 1000000.0 AS mean_val,
              floor(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0))
                    * 1000000.0 + 0.5) / 1000000.0 AS std_val,
              floor(mn * 1000000.0 + 0.5) / 1000000.0 AS min_val,
              floor(mx * 1000000.0 + 0.5) / 1000000.0 AS max_val
       FROM a""",
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension mean/std/min/max of the embedding space — the
    pre-normalization feature audit. posexplode keyed on the dimension
    index: state O(dim), corpus-linear. See similarity.py::dim_stats."""
    from .operators.similarity import dim_stats

    view = _view(spark, sf_dir)
    return dim_stats(view.tables["embeddings"])


@register(
    "embedding_norm_outliers",
    """WITH n AS (
         SELECT label,
                sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
       t AS (SELECT quantile_cont(nrm, 0.95) AS thr FROM n)
       SELECT label, count(*) AS n_vecs,
              CAST(sum(CASE WHEN nrm > (SELECT thr FROM t) THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_outliers,
              floor(avg(nrm) * 1000000.0 + 0.5) / 1000000.0 AS mean_norm,
              floor((SELECT thr FROM t) * 1000000.0 + 0.5) / 1000000.0
                AS norm_threshold
       FROM n GROUP BY label""",
)
def embedding_norm_outliers(spark, sf_dir):
    """Norm-outlier reject gate: exact global p95 of L2 norms via the
    distributed range-partitioned quantile (no single-node percentile
    buffer), flag counts per label. See similarity.py::norm_outliers."""
    from .operators.similarity import norm_outliers

    view = _view(spark, sf_dir)
    return norm_outliers(view.tables["embeddings"], pctl=0.95)


@register(
    "weighted_corpus_sample",
    """WITH s AS (
         SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    + 0.5) / 4294967296.0)
                  / CAST(n_chars AS DOUBLE) AS k
         FROM documents)
       SELECT doc_id, weight,
              floor(k * 1000000000.0 + 0.5) / 1000000000.0 AS es_key
       FROM s ORDER BY k DESC, doc_id LIMIT 100""",
)
def weighted_corpus_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted sampling without replacement
    (weight = document length), deterministic via the md5-uniform:
    map-side keys + TakeOrderedAndProject top-k — the length-biased
    corpus subsample, reproducible in any engine.
    See mixing.py::weighted_reservoir_sample."""
    from .operators.mixing import weighted_reservoir_sample

    view = _view(spark, sf_dir)
    return weighted_reservoir_sample(
        view.tables["documents"], weight_col="n_chars", k=100
    )


@register(
    "doc_length_buckets",
    """WITH tok AS (
         SELECT least(len(list_filter(string_split(lower(text), ' '),
                                      x -> x != '')), 2048) AS nt
         FROM documents),
       b AS (
         SELECT nt,
                CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
                     WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128
                     WHEN nt <= 256 THEN 256 WHEN nt <= 512 THEN 512
                     WHEN nt <= 1024 THEN 1024 ELSE 2048 END AS bucket
         FROM tok)
       SELECT bucket, count(*) AS n_docs,
              CAST(sum(nt) AS BIGINT) AS total_tokens,
              CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
              floor((count(*) * bucket - sum(nt))
                    / CAST(count(*) * bucket AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS pad_waste_ratio
       FROM b GROUP BY bucket""",
)
def doc_length_buckets(spark, sf_dir):
    """Power-of-two length-bucket batching audit: per-bucket doc/token
    counts and the padding waste pad-to-bucket batching would cost.
    Integer bucket chain (no cross-engine log2), one scan, <=9 groups.
    See chunking.py::length_bucket_stats."""
    from .operators.chunking import length_bucket_stats

    view = _view(spark, sf_dir)
    return length_bucket_stats(view.tables["documents"])


@register(
    "part_name_linkage",
    """WITH p AS (
         SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk,
                length(p_name) AS ln
         FROM part)
       SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
              a.p_name AS name_a, b.p_name AS name_b,
              levenshtein(a.p_name, b.p_name) AS edit_dist
       FROM p a JOIN p b
         ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        AND abs(a.ln - b.ln) <= 2
       WHERE levenshtein(a.p_name, b.p_name) <= 2
       ORDER BY edit_dist, key_a, key_b LIMIT 200""",
)
def part_name_linkage(spark, sf_dir):
    """Record linkage over the part catalog: first-token blocking +
    length-band prune + Levenshtein <= 2, k closest pairs. The
    dirty-catalog merge step; blocking keeps the candidate set an
    equi-join, never O(n^2). See dedup.py::blocked_name_linkage."""
    from .operators.dedup import blocked_name_linkage

    view = _view(spark, sf_dir)
    return blocked_name_linkage(
        view.tables["part"], name_col="p_name", key_col="p_partkey",
        max_dist=2, k=200,
    )


@register(
    "events_scd2_state",
    f"""WITH o AS (
         SELECT user_id, event_type, ts, event_id,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
         FROM events),
       c AS (SELECT user_id, event_type, ts, event_id FROM o
             WHERE prev IS NULL OR prev != event_type),
       s AS (
         SELECT user_id, event_type AS state, ts,
                lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS version
         FROM c)
       SELECT user_id, state,
              strftime(ts, '{_TS_FMT_DUCK}') AS valid_from,
              strftime(nxt, '{_TS_FMT_DUCK}') AS valid_to,
              CAST(version AS BIGINT) AS version,
              nxt IS NULL AS is_current
       FROM s""",
)
def events_scd2_state(spark, sf_dir):
    """SCD type-2 state history per user from the event stream:
    run-length collapse (lag != current) + valid_from/valid_to
    stitching, one shuffle on the entity key.
    See windows.py::scd2_states."""
    from .operators.windows import scd2_states

    view = _view(spark, sf_dir)
    return scd2_states(view.tables["events"])


@register(
    "events_mad_outliers",
    """WITH s AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
       med AS (SELECT event_type, quantile_cont(v, 0.5) AS md,
                      count(*) AS n_events
               FROM s GROUP BY 1),
       dev AS (SELECT s.event_type, med.n_events, med.md,
                      abs(s.v - med.md) AS ad
               FROM s JOIN med USING (event_type)),
       mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS md2
               FROM dev GROUP BY 1)
       SELECT d.event_type, d.n_events,
              floor(d.md * 1000000.0 + 0.5) / 1000000.0 AS median_val,
              floor(m.md2 * 1000000.0 + 0.5) / 1000000.0 AS mad_val,
              CAST(sum(CASE WHEN d.ad > 3.5 * 1.4826 * m.md2
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM dev d JOIN mad m USING (event_type)
       GROUP BY 1, 2, 3, 4""",
)
def events_mad_outliers(spark, sf_dir):
    """Robust (median/MAD) anomaly screen per event type — the
    heavy-tail-immune counterpart of events_zscore_outliers.
    See windows.py::mad_outliers (incl. the approx_percentile scale
    note)."""
    from .operators.windows import mad_outliers

    view = _view(spark, sf_dir)
    return mad_outliers(view.tables["events"])


@register(
    "graph_hits_scores",
    """WITH e AS (
         SELECT 'C' || c_custkey AS src, 'N' || c_nationkey AS dst FROM customer
         UNION ALL
         SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
       nodes AS (SELECT DISTINCT node FROM
                 (SELECT src AS node FROM e UNION SELECT dst FROM e) u),
       s0 AS (SELECT node, 1.0 AS hub, 1.0 AS auth FROM nodes),
       a1r AS (SELECT e.dst AS node, sum(s.hub) AS x
               FROM e JOIN s0 s ON s.node = e.src GROUP BY 1),
       s1a AS (SELECT n.node, s.hub,
                      coalesce(a.x, 0.0) / (SELECT max(x) FROM a1r) AS auth
               FROM nodes n JOIN s0 s ON s.node = n.node
               LEFT JOIN a1r a ON a.node = n.node),
       h1r AS (SELECT e.src AS node, sum(s.auth) AS x
               FROM e JOIN s1a s ON s.node = e.dst GROUP BY 1),
       s1 AS (SELECT n.node,
                     coalesce(h.x, 0.0) / (SELECT max(x) FROM h1r) AS hub,
                     s.auth
              FROM nodes n JOIN s1a s ON s.node = n.node
              LEFT JOIN h1r h ON h.node = n.node),
       a2r AS (SELECT e.dst AS node, sum(s.hub) AS x
               FROM e JOIN s1 s ON s.node = e.src GROUP BY 1),
       s2a AS (SELECT n.node, s.hub,
                      coalesce(a.x, 0.0) / (SELECT max(x) FROM a2r) AS auth
               FROM nodes n JOIN s1 s ON s.node = n.node
               LEFT JOIN a2r a ON a.node = n.node),
       h2r AS (SELECT e.src AS node, sum(s.auth) AS x
               FROM e JOIN s2a s ON s.node = e.dst GROUP BY 1),
       s2 AS (SELECT n.node,
                     coalesce(h.x, 0.0) / (SELECT max(x) FROM h2r) AS hub,
                     s.auth
              FROM nodes n JOIN s2a s ON s.node = n.node
              LEFT JOIN h2r h ON h.node = n.node)
       SELECT node,
              floor(hub * 100000000.0 + 0.5) / 100000000.0 AS hub_score,
              floor(auth * 100000000.0 + 0.5) / 100000000.0 AS auth_score
       FROM s2""",
)
def graph_hits_scores(spark, sf_dir):
    """HITS hub/authority (2 synchronous iterations, L-inf normalized —
    max is order-independent, so scores are partitioning-invariant) over
    the customer->nation->region FK graph. Same shuffle key every
    half-step. See graph_algos.py::hits."""
    from .operators.graph_algos import hits

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    return hits(cust.unionByName(nat), iterations=2)


@register(
    "pmi_collocations",
    """WITH tok AS (
         SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       uni AS (SELECT unnest(t) AS w FROM tok),
       uc AS (SELECT w, count(*) AS wc FROM uni GROUP BY 1),
       pr AS (SELECT t[i] AS w1, t[i + 1] AS w2
              FROM (SELECT t, unnest(range(1, len(t))) AS i
                    FROM tok WHERE len(t) >= 2) p),
       pc AS (SELECT w1, w2, count(*) AS pair_count FROM pr GROUP BY 1, 2),
       tot AS (SELECT (SELECT sum(pair_count) FROM pc) AS n2,
                      (SELECT sum(wc) FROM uc) AS n1),
       s AS (
         SELECT pc.w1, pc.w2, pc.pair_count,
                ln((pc.pair_count / t.n2)
                   / ((c1.wc / t.n1) * (c2.wc / t.n1))) AS pmi
         FROM pc
         JOIN uc c1 ON c1.w = pc.w1
         JOIN uc c2 ON c2.w = pc.w2, tot t
         WHERE pc.pair_count >= 5)
       SELECT w1, w2, pair_count,
              floor(pmi * 1000000.0 + 0.5) / 1000000.0 AS pmi
       FROM s ORDER BY s.pmi DESC, w1, w2 LIMIT 30""",
)
def pmi_collocations_query(spark, sf_dir):
    """Top-30 adjacent-pair collocations by PMI (min pair count 5) —
    phrase discovery for tokenizer/vocab induction.
    See text_analysis.py::pmi_collocations."""
    from .operators.text_analysis import pmi_collocations

    view = _view(spark, sf_dir)
    return pmi_collocations(view.tables["documents"], min_count=5, k=30)


@register(
    "quality_classifier_score",
    """WITH tok AS (
         SELECT doc_id, text,
                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       f AS (
         SELECT doc_id,
                list_sum(list_transform(t, x -> length(x))) * 1.0 / len(t)
                  AS ml,
                len(list_filter(t, x -> list_contains(
                    ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x)))
                  * 1.0 / len(t) AS sr,
                length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                  / length(text) AS dr,
                len(list_filter(t, x -> length(x) > 7)) * 1.0 / len(t) AS lwr
         FROM tok WHERE len(t) > 0)
       SELECT doc_id,
              floor(ml * 1000000.0 + 0.5) / 1000000.0 AS mean_word_len,
              floor(sr * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
              floor(dr * 1000000.0 + 0.5) / 1000000.0 AS digit_ratio,
              floor(lwr * 1000000.0 + 0.5) / 1000000.0 AS long_word_ratio,
              floor((1.0 / (1.0 + exp(-(-1.0 + 0.3 * ml + 2.0 * sr
                                        - 4.0 * dr - 1.5 * lwr))))
                    * 1000000.0 + 0.5) / 1000000.0 AS quality_prob
       FROM f""",
)
def quality_classifier_score(spark, sf_dir):
    """Logistic quality classifier over lexical features, scored in
    codegen (the fastText-filter shape, deterministic weights).
    See text_analysis.py::quality_classifier_score."""
    from .operators.text_analysis import quality_classifier_score as qcs

    view = _view(spark, sf_dir)
    return qcs(view.tables["documents"])


@register(
    "embedding_centroid_outliers",
    """WITH e AS (
         SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       px AS (SELECT label, i - 1 AS dim, ed[i] AS v
              FROM (SELECT label, ed, unnest(range(1, len(ed) + 1)) AS i
                    FROM e) t),
       cent AS (SELECT label, dim, avg(v) AS c FROM px GROUP BY 1, 2),
       carr AS (SELECT label, list(c ORDER BY dim) AS arr
                FROM cent GROUP BY label),
       d AS (
         SELECT e.vec_id, e.label,
                floor(sqrt(list_sum(list_transform(list_zip(e.ed, c.arr),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))))
                      * 1000000.0 + 0.5) / 1000000.0 AS centroid_dist
         FROM e JOIN carr c USING (label)),
       r AS (SELECT label, vec_id, centroid_dist,
                    row_number() OVER (PARTITION BY label
                                       ORDER BY centroid_dist DESC, vec_id)
                      AS rank
             FROM d)
       SELECT label, vec_id, centroid_dist, CAST(rank AS INT) AS rank
       FROM r WHERE rank <= 3""",
)
def embedding_centroid_outliers(spark, sf_dir):
    """k farthest vectors from their own label centroid — the
    label-noise / contamination review queue. Ranks on the rounded
    distance so cross-engine ulp drift cannot flip a rank.
    See similarity.py::centroid_outliers."""
    from .operators.similarity import centroid_outliers

    view = _view(spark, sf_dir)
    return centroid_outliers(view.tables["embeddings"], k=3)


@register(
    "dedup_prefix_survivorship",
    """WITH tok AS (
         SELECT doc_id, n_chars,
                list_filter(string_split(lower(text), ' '), x -> x != '') AS t
         FROM documents),
       fp AS (SELECT doc_id, n_chars,
                     md5(array_to_string(list_slice(t, 1, 8), ' ')) AS f
              FROM tok),
       r AS (SELECT doc_id, f,
                    row_number() OVER (PARTITION BY f
                                       ORDER BY n_chars DESC, doc_id) AS rn
             FROM fp),
       canon AS (SELECT f, doc_id AS canonical_id FROM r WHERE rn = 1),
       sz AS (SELECT f, count(*) AS group_size FROM fp GROUP BY 1)
       SELECT fp.doc_id, c.canonical_id, sz.group_size,
              fp.doc_id = c.canonical_id AS is_canonical
       FROM fp
       JOIN canon c ON c.f = fp.f
       JOIN sz ON sz.f = fp.f""",
)
def dedup_prefix_survivorship(spark, sf_dir):
    """Truncation-dedup survivorship: same leading 8 tokens => one
    source; keep the longest variant (ties to smallest id) — the
    C4/CCNet keep-longest policy exact-fingerprint dedup cannot see.
    See dedup.py::prefix_survivorship."""
    from .operators.dedup import prefix_survivorship

    view = _view(spark, sf_dir)
    return prefix_survivorship(view.tables["documents"])


_MINHASH_CAND_DUCK = f"""toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM toks),
        h AS (
          SELECT doc_id, seed, md5(seed || '|' || shingle) AS h
          FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s),
        mh AS (SELECT doc_id, seed, min(h) AS mh FROM h GROUP BY 1, 2),
        sig AS (
          SELECT doc_id, CAST(seed // 4 AS INT) AS band,
                 md5(string_agg(mh, ',' ORDER BY seed)) AS signature
          FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sig a JOIN sig b
            ON a.band = b.band AND a.signature = b.signature AND a.doc_id < b.doc_id)"""


@register(
    "dedup_minhash_calibration",
    f"""WITH {_MINHASH_CAND_DUCK},
        agree AS (
          SELECT c.id_a, c.id_b,
                 sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) / 16.0 AS est
          FROM cands c
          JOIN mh a ON a.doc_id = c.id_a
          JOIN mh b ON b.doc_id = c.id_b AND b.seed = a.seed
          GROUP BY 1, 2),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT c.id_a, c.id_b, count(*) AS i
          FROM cands c
          JOIN sh a ON a.doc_id = c.id_a
          JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          GROUP BY 1, 2)
        SELECT g.id_a, g.id_b,
               floor(g.est * 1000000.0 + 0.5) / 1000000.0 AS est_jaccard,
               floor((coalesce(i.i, 0) * 1.0 / (sa.n + sb.n - coalesce(i.i, 0)))
                     * 1000000.0 + 0.5) / 1000000.0 AS exact_jaccard,
               floor(abs(g.est - coalesce(i.i, 0) * 1.0
                                 / (sa.n + sb.n - coalesce(i.i, 0)))
                     * 1000000.0 + 0.5) / 1000000.0 AS abs_err
        FROM agree g
        LEFT JOIN inter i ON i.id_a = g.id_a AND i.id_b = g.id_b
        JOIN sizes sa ON g.id_a = sa.doc_id
        JOIN sizes sb ON g.id_b = sb.doc_id""",
)
def dedup_minhash_calibration(spark, sf_dir):
    """Estimated (signature-agreement) vs exact Jaccard per LSH
    candidate pair — the (num_hashes, band_size) calibration eval, text
    twin of ann_recall_at_k. See dedup.py::minhash_calibration."""
    from .operators.dedup import minhash_calibration

    view = _view(spark, sf_dir)
    return minhash_calibration(view.tables["documents"])


@register(
    "language_confusion_matrix",
    f"""WITH scored AS (
          SELECT lang,
                 {", ".join(f"len(list_intersect(list_distinct({_TOKS_DUCK}), {lst})) AS score_{lang}" for lang, lst in _LANG_LISTS_DUCK.items())}
          FROM documents),
        pred AS (
          SELECT lang,
                 CASE WHEN greatest(score_de, score_en, score_es, score_fr, score_zh) = 0 THEN 'und'
                      WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
                      WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
                      WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
                      WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
                      ELSE 'zh' END AS detected_lang
          FROM scored),
        cell AS (SELECT lang, detected_lang, count(*) AS n_docs
                 FROM pred GROUP BY 1, 2),
        tot AS (SELECT lang, count(*) AS t FROM pred GROUP BY 1)
        SELECT c.lang, c.detected_lang, c.n_docs,
               floor((c.n_docs * 1.0 / t.t) * 1000000.0 + 0.5) / 1000000.0
                 AS share_of_lang
        FROM cell c JOIN tot t ON t.lang = c.lang""",
)
def language_confusion_matrix(spark, sf_dir):
    """Lang-id confusion matrix against the labeled lang column — the
    detector's eval before it routes a corpus mixture.
    See text_analysis.py::language_confusion."""
    from .operators.text_analysis import language_confusion

    view = _view(spark, sf_dir)
    return language_confusion(view.tables["documents"])


@register(
    "split_leakage_check",
    f"""WITH pairs AS ({{MINHASH_PAIRS}}),
        lab AS (
          SELECT CASE WHEN (('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) < 0.9 THEN 'train'
                      WHEN (('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) < 0.95 THEN 'val'
                      ELSE 'test' END AS split_a,
                 CASE WHEN (('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) < 0.9 THEN 'train'
                      WHEN (('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) < 0.95 THEN 'val'
                      ELSE 'test' END AS split_b,
                 jaccard
          FROM pairs)
        SELECT split_a, split_b, count(*) AS n_pairs,
               floor(avg(jaccard) * 1000000.0 + 0.5) / 1000000.0 AS mean_jaccard
        FROM lab GROUP BY 1, 2""",
)
def split_leakage_check(spark, sf_dir):
    """Near-dup pairs straddling the train/val/test hash split — the
    eval-integrity audit (off-diagonal rows = leakage).
    See mixing.py::split_leakage_check."""
    from .operators.mixing import split_leakage_check as slc

    view = _view(spark, sf_dir)
    return slc(view.tables["documents"])


ORACLES["split_leakage_check"] = ORACLES["split_leakage_check"].replace(
    "{MINHASH_PAIRS}", ORACLES["dedup_minhash_lsh_pairs"]
)


@register(
    "streaming_sliding_events",
    f"""WITH grid AS (
          SELECT *, date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS s1
          FROM events
        ), expanded AS (
          SELECT event_type, value, s1 AS ws FROM grid
          UNION ALL
          SELECT event_type, value, s1 - INTERVAL 30 MINUTE AS ws FROM grid
        )
        SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start,
               strftime(ws + INTERVAL 1 HOUR, '{_TS_FMT_DUCK}') AS window_end,
               event_type, count(*) AS n_events,
               floor(({_dsum('value')}) * 10000.0 + 0.5) / 10000.0 AS sum_value
        FROM expanded GROUP BY 1, 2, 3""",
)
def streaming_sliding_events(spark, sf_dir):
    """Watermarked hopping windows over the replayed event stream —
    the streaming twin of window_sliding_events (same oracle). Complete
    mode so the finite replay emits every window exactly once.
    See streaming/events.py::streaming_sliding_counts."""
    from .streaming.events import run_stream_to_memory, streaming_sliding_counts

    stream = _replayed_events_stream(spark, sf_dir)
    _STREAM_SEQ[0] += 1
    return run_stream_to_memory(
        streaming_sliding_counts(stream),
        f"q_stream_sliding_{_STREAM_SEQ[0]}",
        output_mode="complete",
        state_partitions=8,
    )


@register(
    "streaming_topk_users",
    """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key, user_id,
                         count(*) AS cnt
                  FROM events GROUP BY 1, 2),
       t AS (SELECT key, CAST(sum(cnt) AS BIGINT) AS n_total
             FROM c GROUP BY 1),
       r AS (SELECT key, user_id, cnt,
                    row_number() OVER (PARTITION BY key
                                       ORDER BY cnt DESC, user_id) AS rn
             FROM c)
       SELECT r.key, r.user_id, CAST(r.cnt AS BIGINT) AS user_count,
              CAST(r.rn AS BIGINT) AS rank, t.n_total
       FROM r JOIN t USING (key) WHERE rn <= 3""",
)
def streaming_topk_users(spark, sf_dir):
    """Custom stateful top-k (applyInPandasWithState): per event type,
    the running 3 most frequent users; the final emission per key equals
    the batch top-k (commutative update), which is the oracle.
    See streaming/stateful.py::streaming_topk_users."""
    from pyspark.sql import Window

    from .streaming.events import run_stream_to_memory
    from .streaming.stateful import streaming_topk_users as op

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream),
        f"q_stream_topk_{_STREAM_SEQ[0]}",
        output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key")
    return (
        got.withColumn("__m", F.max("n_total").over(w))
        .filter(F.col("n_total") == F.col("__m"))
        .select("key", "user_id", "user_count", "rank", "n_total")
    )


@register(
    "hybrid_rrf_retrieval",
    f"""WITH lex AS (SELECT doc_id, rank FROM ({ORACLES["bm25_rank_spark_hash_join"]})),
        vec AS (
          SELECT b.vec_id AS doc_id,
                 CAST(row_number() OVER (
                   ORDER BY floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                            b.vec_id) AS INT) AS vec_rank
          FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
          WHERE a.vec_id = 0
          QUALIFY vec_rank <= 20),
        f AS (
          SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                 l.rank AS lex_rank, v.vec_rank,
                 coalesce(1.0 / (60 + l.rank), 0.0)
                   + coalesce(1.0 / (60 + v.vec_rank), 0.0) AS s
          FROM lex l FULL OUTER JOIN vec v ON v.doc_id = l.doc_id),
        r AS (SELECT doc_id, lex_rank, vec_rank, s,
                     row_number() OVER (ORDER BY s DESC, doc_id) AS fr
              FROM f)
        SELECT doc_id, lex_rank, vec_rank,
               floor(s * 1000000.0 + 0.5) / 1000000.0 AS rrf_score,
               CAST(fr AS INT) AS fused_rank
        FROM r WHERE fr <= 10""",
)
def hybrid_rrf_retrieval(spark, sf_dir):
    """Reciprocal-rank fusion of BM25 ('spark hash join') and dense
    (query vector 0) top-20 lists — hybrid search's merge step, fused
    over two bounded rank tables. RRF scores are exact rationals, so the
    fused order needs no pre-rank rounding.
    See retrieval.py::hybrid_rrf_topk."""
    from .operators.retrieval import hybrid_rrf_topk

    view = _view(spark, sf_dir)
    return hybrid_rrf_topk(
        view.tables["documents"],
        view.tables["embeddings"],
        ["spark", "hash", "join"],
    )


@register(
    "streaming_funnel_state",
    f"""WITH f AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_views,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_purchases,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
                 max(CASE WHEN event_type = 'purchase' THEN ts END) AS lp
          FROM events WHERE event_type IN ('view', 'purchase')
          GROUP BY 1)
        SELECT user_id, n_views, n_purchases,
               strftime(fv, '{_TS_FMT_DUCK}') AS first_view,
               strftime(lp, '{_TS_FMT_DUCK}') AS last_purchase,
               fv IS NOT NULL AND lp IS NOT NULL AND lp > fv AS converted
        FROM f""",
)
def streaming_funnel_state(spark, sf_dir):
    """Custom stateful funnel (applyInPandasWithState): per-user
    view/purchase counts, first view, last purchase, conversion flag —
    all commutative statistics, so the final emission equals the batch
    aggregate (the oracle) under any micro-batching.
    See streaming/stateful.py::streaming_funnel_state."""
    from pyspark.sql import Window

    from .streaming.events import run_stream_to_memory
    from .streaming.stateful import streaming_funnel_state as op

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream),
        f"q_stream_funnel_{_STREAM_SEQ[0]}",
        output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("user_id")
    total = F.col("n_views") + F.col("n_purchases")
    return (
        got.withColumn("__t", total)
        .withColumn("__m", F.max(total).over(w))
        .filter(F.col("__t") == F.col("__m"))
        .select(
            "user_id",
            "n_views",
            "n_purchases",
            F.date_format("first_view", "yyyy-MM-dd HH:mm:ss").alias(
                "first_view"
            ),
            F.date_format("last_purchase", "yyyy-MM-dd HH:mm:ss").alias(
                "last_purchase"
            ),
            "converted",
        )
    )


@register(
    "epoch_mixture_plan",
    f"""WITH agg AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        tot AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS t,
                       CAST(sum(n_docs) AS BIGINT) AS a
                FROM agg),
        dom AS (SELECT agg.source, agg.n_docs,
                       sqrt(CAST(agg.n_docs AS DOUBLE)) / tot.t * tot.a
                         / agg.n_docs AS e
                FROM agg, tot),
        p AS (
          SELECT d.source, dom.n_docs, d.n_chars,
                 CAST(floor(dom.e) AS BIGINT)
                   + CASE WHEN {_FRAC_DUCK} < dom.e - floor(dom.e)
                          THEN 1 ELSE 0 END AS copies
          FROM documents d JOIN dom ON dom.source = d.source)
        SELECT source, n_docs,
               CAST(sum(copies) AS BIGINT) AS planned_doc_copies,
               CAST(sum(copies * n_chars) AS BIGINT) AS planned_chars,
               floor(sum(copies) * 1.0 / n_docs * 1000000.0 + 0.5) / 1000000.0
                 AS realized_epochs
        FROM p GROUP BY 1, 2""",
)
def epoch_mixture_plan(spark, sf_dir):
    """Temperature weights -> concrete deterministic sampling plan:
    fractional epochs become a stable hash-chosen extra copy per
    document. See mixing.py::epoch_mixture_plan."""
    from .operators.mixing import epoch_mixture_plan as emp

    view = _view(spark, sf_dir)
    return emp(view.tables["documents"])


@register(
    "length_drift_psi",
    """WITH tok AS (
         SELECT source,
                least(len(list_filter(string_split(lower(text), ' '),
                                      x -> x != '')), 2048) AS nt
         FROM documents),
       b AS (
         SELECT source,
                CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
                     WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128
                     WHEN nt <= 256 THEN 256 WHEN nt <= 512 THEN 512
                     WHEN nt <= 1024 THEN 1024 ELSE 2048 END AS bucket
         FROM tok),
       c AS (SELECT source, bucket, count(*) AS n FROM b GROUP BY 1, 2),
       t AS (SELECT source, sum(n) AS tot FROM c GROUP BY 1),
       grid AS (SELECT unnest([16, 32, 64, 128, 256, 512, 1024, 2048]) AS bucket),
       profl AS (
         SELECT t.source, grid.bucket,
                (coalesce(c.n, 0) + 1) / CAST(t.tot + 8 AS DOUBLE) AS p
         FROM t CROSS JOIN grid
         LEFT JOIN c ON c.source = t.source AND c.bucket = grid.bucket),
       ref AS (SELECT bucket, p AS q FROM profl WHERE source = 'src0')
       SELECT f.source,
              floor(sum((f.p - ref.q) * ln(f.p / ref.q)) * 1000000.0 + 0.5)
                / 1000000.0 AS psi
       FROM profl f JOIN ref USING (bucket)
       WHERE f.source != 'src0'
       GROUP BY 1""",
)
def length_drift_psi(spark, sf_dir):
    """Population-stability-index drift of each source's token-length
    profile vs the 'src0' reference (add-one smoothed power-of-two
    buckets). See profiling.py::length_drift_psi."""
    from .operators.profiling import length_drift_psi as psi

    view = _view(spark, sf_dir)
    return psi(view.tables["documents"])


@register(
    "graph_personalized_pagerank",
    """WITH RECURSIVE
edges AS (
  SELECT 'N' || c_nationkey AS src, 'C' || c_custkey AS dst FROM customer
  UNION ALL
  SELECT 'R' || n_regionkey, 'N' || n_nationkey FROM nation),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION SELECT dst FROM edges) u),
seeds AS (SELECT DISTINCT 'R' || r_regionkey AS node FROM region),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
base AS (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL THEN 1.0 / (SELECT n FROM ns)
              ELSE 0.0 END AS v
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
out_deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg
            FROM edges GROUP BY 1),
pr AS (
  SELECT node, v AS rank, 0 AS i FROM base
  UNION ALL
  SELECT b.node,
         CAST((1.0 - 0.85) * b.v
              + 0.85 * ((SELECT coalesce(sum(CASE WHEN od.deg IS NULL
                                              THEN p.rank END), 0.0)
                         FROM pr p LEFT JOIN out_deg od ON od.node = p.node)
                          * b.v
                        + coalesce(c.contrib, 0.0)) AS DOUBLE) AS rank,
         (SELECT min(i) FROM pr) + 1 AS i
  FROM base b
  LEFT JOIN (SELECT e.dst AS node, sum(p.rank / od.deg) AS contrib
             FROM pr p JOIN edges e ON e.src = p.node
             JOIN out_deg od ON od.node = p.node
             GROUP BY e.dst) c ON c.node = b.node
  WHERE (SELECT min(i) FROM pr) < 6
)
SELECT node, floor(rank * 100000000.0 + 0.5) / 100000000.0 AS ppr
FROM pr WHERE i = 6""",
)
def graph_personalized_pagerank(spark, sf_dir):
    """Seed-restarted PageRank over the REVERSED FK graph (regions seed
    the walk; mass flows region -> nation -> customer) — proximity-to-
    seeds ranking, 6 fixed iterations replayed by the recursive-CTE
    oracle. See graph_algos.py::personalized_pagerank."""
    from .operators.graph_algos import personalized_pagerank

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("src"),
        F.concat(F.lit("C"), F.col("c_custkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("src"),
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("dst"),
    )
    seeds = view.tables["region"].select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("node")
    )
    return personalized_pagerank(
        cust.unionByName(nat), seeds, iterations=6
    )


@register(
    "quality_signal_ensemble",
    f"""WITH clf AS (SELECT doc_id, quality_prob
                     FROM ({ORACLES["quality_classifier_score"]})),
        tok AS (
          SELECT doc_id, source, {_TOKS_DUCK} AS t FROM documents),
        uni AS (SELECT doc_id, unnest(t) AS w FROM tok WHERE len(t) > 0),
        counts AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
        tot AS (SELECT sum(c) AS tt FROM counts),
        lp AS (
          SELECT uni.doc_id,
                 floor(avg(ln(counts.c / tot.tt)) * 1000000.0 + 0.5)
                   / 1000000.0 AS mean_logprob
          FROM uni JOIN counts USING (w) CROSS JOIN tot
          GROUP BY 1),
        scored AS (
          SELECT d.doc_id, d.source, clf.quality_prob, lp.mean_logprob
          FROM documents d JOIN clf USING (doc_id) JOIN lp USING (doc_id)),
        ranked AS (
          SELECT doc_id, source,
                 floor(percent_rank() OVER (PARTITION BY source
                       ORDER BY quality_prob, doc_id) * 1000000.0 + 0.5)
                   / 1000000.0 AS clf_rank,
                 floor(percent_rank() OVER (PARTITION BY source
                       ORDER BY mean_logprob, doc_id) * 1000000.0 + 0.5)
                   / 1000000.0 AS lm_rank
          FROM scored)
        SELECT doc_id, source, clf_rank, lm_rank,
               floor((clf_rank + lm_rank) / 2.0 * 1000000.0 + 0.5)
                 / 1000000.0 AS blended_rank
        FROM ranked""",
)
def quality_signal_ensemble(spark, sf_dir):
    """Rank-blend of the logistic quality classifier and the unigram LM
    score, percent-ranked WITHIN each domain (partitioned windows — no
    global sort) — the uncalibrated-signal ensembling step of a
    production quality filter.
    See text_analysis.py::quality_signal_ensemble."""
    from .operators.text_analysis import quality_signal_ensemble as qse

    view = _view(spark, sf_dir)
    return qse(view.tables["documents"])


@register(
    "events_hourly_profile",
    f"""WITH cell AS (
          SELECT event_type, CAST(hour(ts) AS INT) AS hour,
                 count(*) AS n_events,
                 floor(({_dsum('value')}) / count(*) * 1000000.0 + 0.5)
                   / 1000000.0 AS mean_value
          FROM events GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS t
                FROM cell GROUP BY 1)
        SELECT c.event_type, c.hour, c.n_events, c.mean_value,
               floor(c.n_events / CAST(t.t AS DOUBLE) * 24.0 * 1000000.0
                     + 0.5) / 1000000.0 AS load_ratio
        FROM cell c JOIN tot t USING (event_type)""",
)
def events_hourly_profile(spark, sf_dir):
    """Hour-of-day seasonal baseline per event type (share x 24 load
    ratio + exact-decimal mean values) — the time-dimension anomaly
    complement of the z-score/MAD value screens.
    See windows.py::hourly_seasonal_profile."""
    from .operators.windows import hourly_seasonal_profile

    view = _view(spark, sf_dir)
    return hourly_seasonal_profile(view.tables["events"])


# ---------------------------------------------------------------------------
# Round-5 additions: corpus statistics, drift, curriculum, provenance,
# feature-space robustness, sampled centrality. Ledgered in
# __spark_entry__._NEXT_ROTATION for the round-6 gate window.
# ---------------------------------------------------------------------------

@register(
    "term_zipf_fit",
    f"""WITH freq AS (
          SELECT w, count(*) AS c
          FROM (SELECT unnest({_TOKS_DUCK}) AS w FROM documents)
          GROUP BY w),
        top AS (SELECT w, c FROM freq ORDER BY c DESC, w LIMIT 1000),
        r AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS lnr,
                     ln(CAST(c AS DOUBLE)) AS lnf
              FROM top)
        SELECT count(*) AS n_terms,
               floor(regr_slope(lnf, lnr) * 1000000.0 + 0.5) / 1000000.0 AS slope,
               floor((avg(lnf) - regr_slope(lnf, lnr) * avg(lnr)) * 1000000.0 + 0.5)
                 / 1000000.0 AS intercept,
               floor(corr(lnr, lnf) * 1000000.0 + 0.5) / 1000000.0 AS pearson_r
        FROM r""",
)
def term_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency fit over the corpus vocabulary (top-1000 via
    TakeOrderedAndProject, closed-form regression — the natural-language
    sanity probe). See text_analysis.term_zipf_fit."""
    from .operators.text_analysis import term_zipf_fit as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "language_script_stats",
    """WITH d AS (
         SELECT lang, CAST(length(text) AS DOUBLE) AS n,
                CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS l,
                CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS g,
                CAST(length(text) - length(regexp_replace(text, '[ \t\n]', '', 'g')) AS DOUBLE) AS s
         FROM documents WHERE length(text) > 0)
       SELECT lang, count(*) AS n_docs,
              floor(avg(l / n) * 1000000.0 + 0.5) / 1000000.0 AS mean_letter_frac,
              floor(avg(g / n) * 1000000.0 + 0.5) / 1000000.0 AS mean_digit_frac,
              floor(avg(s / n) * 1000000.0 + 0.5) / 1000000.0 AS mean_space_frac,
              floor(avg((n - l - g - s) / n) * 1000000.0 + 0.5) / 1000000.0 AS mean_other_frac
       FROM d GROUP BY lang""",
)
def language_script_stats(spark, sf_dir):
    """Per-language character-class profile (letters/digits/space/other
    fractions) — the cheap mojibake/base64/wrong-bucket screen.
    See text_analysis.script_char_stats."""
    from .operators.text_analysis import script_char_stats

    view = _view(spark, sf_dir)
    return script_char_stats(view.tables["documents"])


@register(
    "domain_term_entropy",
    f"""WITH dt AS (
          SELECT source, w, count(*) AS c
          FROM (SELECT source, unnest({_TOKS_DUCK}) AS w FROM documents)
          GROUP BY source, w),
        corpus AS (SELECT w, sum(c) AS cc FROM dt GROUP BY w),
        dom_tot AS (SELECT source, sum(c) AS dtot FROM dt GROUP BY source),
        corp_tot AS (SELECT sum(cc) AS ctot FROM corpus)
        SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS vocab,
               floor(-sum((c / dtot) * ln(c / dtot)) * 10000.0 + 0.5) / 10000.0 AS entropy,
               floor(sum((c / dtot) * ln((c / dtot) / (cc / ctot))) * 10000.0 + 0.5)
                 / 10000.0 AS kl_vs_corpus
        FROM dt
        JOIN dom_tot USING (source)
        JOIN corpus USING (w)
        CROSS JOIN corp_tot
        GROUP BY source""",
)
def domain_term_entropy(spark, sf_dir):
    """Per-domain unigram entropy + KL vs the corpus distribution — the
    'statistically weird source' screen behind mixture reweighting.
    See text_analysis.domain_term_entropy."""
    from .operators.text_analysis import domain_term_entropy as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "events_cusum_drift",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT event_type, avg(x) AS m, stddev_pop(x) AS sd,
                count(*) AS n_days
         FROM daily GROUP BY 1),
       cum AS (
         SELECT d.event_type, d.day, s.n_days, s.sd,
                sum(d.x - s.m) OVER (PARTITION BY d.event_type ORDER BY d.day) AS cs
         FROM daily d JOIN stats s USING (event_type)),
       peak AS (
         SELECT event_type, day AS peak_day
         FROM cum
         QUALIFY row_number() OVER (
           PARTITION BY event_type ORDER BY abs(cs) DESC, day DESC) = 1)
       SELECT c.event_type, c.n_days,
              floor(max(abs(c.cs)) * 10000.0 + 0.5) / 10000.0 AS max_cusum,
              any_value(p.peak_day) AS peak_day,
              CASE WHEN any_value(c.sd) > 0
                   THEN floor(max(abs(c.cs)) / (any_value(c.sd) * sqrt(c.n_days))
                              * 10000.0 + 0.5) / 10000.0
                   END AS drift_stat
       FROM cum c JOIN peak p USING (event_type)
       GROUP BY c.event_type, c.n_days""",
)
def events_cusum_drift(spark, sf_dir):
    """CUSUM change-point screen over the per-type daily event-count
    series (max |Σ(x−x̄)|, its day, and the scale-free drift statistic).
    The window runs over days-per-type rows, never event rows.
    See windows.cusum_drift."""
    from .operators.windows import cusum_drift

    view = _view(spark, sf_dir)
    return cusum_drift(view.tables["events"])


@register(
    "curriculum_order_plan",
    """WITH ranked AS (
         SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
                row_number() OVER (ORDER BY n_chars, doc_id) AS position,
                count(*) OVER () AS n
         FROM documents)
       SELECT doc_id,
              floor(score * 1000000.0 + 0.5) / 1000000.0 AS score,
              position,
              CAST(1 + floor(4.0 * (position - 1) / n) AS INT) AS phase
       FROM ranked""",
)
def curriculum_order_plan(spark, sf_dir):
    """Curriculum-learning schedule: global training position (total
    order over (length score, doc_id)) + 4 equal difficulty phases,
    computed WITHOUT a global window (range-repartition + partition-
    offset rank arithmetic — exact_quantiles' shape). The oracle's
    global ROW_NUMBER is the semantic spec, not the plan.
    See mixing.curriculum_phases."""
    from .operators.mixing import curriculum_phases

    view = _view(spark, sf_dir)
    return curriculum_phases(view.tables["documents"], score_col="n_chars")


@register(
    "cross_domain_neardup_matrix",
    """WITH pairs AS ({minhash_pairs}),
        doms AS (SELECT doc_id, source FROM documents)
        SELECT least(a.source, b.source) AS domain_a,
               greatest(a.source, b.source) AS domain_b,
               count(*) AS n_pairs,
               floor(avg(jaccard) * 10000.0 + 0.5) / 10000.0 AS mean_jaccard
        FROM pairs
        JOIN doms a ON a.doc_id = pairs.id_a
        JOIN doms b ON b.doc_id = pairs.id_b
        GROUP BY 1, 2""",
)
def cross_domain_neardup_matrix(spark, sf_dir):
    """Domain x domain near-duplication matrix over verified MinHash-LSH
    pairs — the provenance rollup behind 'drop the mirror' mixture
    decisions. See dedup.cross_domain_neardup_matrix."""
    from .operators.dedup import cross_domain_neardup_matrix as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


ORACLES["cross_domain_neardup_matrix"] = ORACLES[
    "cross_domain_neardup_matrix"
].format(minhash_pairs=ORACLES["dedup_minhash_lsh_pairs"])


@register(
    "embedding_dim_quantiles",
    """WITH x AS (
         SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                CAST(unnest(embedding) AS DOUBLE) AS v
         FROM embeddings),
       q AS (
         SELECT dim, count(*) AS n,
                quantile_cont(v, 0.25) AS q25,
                quantile_cont(v, 0.5) AS med,
                quantile_cont(v, 0.75) AS q75
         FROM x GROUP BY dim)
       SELECT dim, n,
              floor(q25 * 1000000.0 + 0.5) / 1000000.0 AS q25,
              floor(med * 1000000.0 + 0.5) / 1000000.0 AS median,
              floor(q75 * 1000000.0 + 0.5) / 1000000.0 AS q75,
              floor((q75 - q25) * 1000000.0 + 0.5) / 1000000.0 AS iqr
       FROM q""",
)
def embedding_dim_quantiles(spark, sf_dir):
    """Per-dimension quartiles/IQR of the embedding space — the robust
    companion to embedding_dim_stats (feeds median/IQR scalers).
    See similarity.dim_quantiles."""
    from .operators.similarity import dim_quantiles

    view = _view(spark, sf_dir)
    return dim_quantiles(view.tables["embeddings"])


@register(
    "dataset_card_stats",
    f"""WITH base AS (
          SELECT source, lang, md5({_NORM_DUCK}) AS fp,
                 len({_TOKS_DUCK}) AS ntok, length(text) AS nchars
          FROM documents),
        vol AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(ntok) AS BIGINT) AS n_tokens,
                 floor(avg(nchars) * 100.0 + 0.5) / 100.0 AS mean_chars
          FROM base GROUP BY 1),
        dups AS (
          SELECT source, CAST(sum(c - 1) AS BIGINT) AS n_dup_docs
          FROM (SELECT source, fp, count(*) AS c FROM base GROUP BY 1, 2)
          GROUP BY 1),
        langs AS (SELECT source, lang, count(*) AS lc FROM base GROUP BY 1, 2),
        nl AS (SELECT source, count(*) AS n_langs FROM langs GROUP BY 1),
        top AS (
          SELECT source, lang AS top_lang, lc
          FROM langs
          QUALIFY row_number() OVER (
            PARTITION BY source ORDER BY lc DESC, lang) = 1)
        SELECT v.source, v.n_docs, v.n_tokens, v.mean_chars, nl.n_langs,
               t.top_lang,
               floor(t.lc / CAST(v.n_docs AS DOUBLE) * 1000000.0 + 0.5)
                 / 1000000.0 AS top_lang_share,
               floor(d.n_dup_docs / CAST(v.n_docs AS DOUBLE) * 1000000.0 + 0.5)
                 / 1000000.0 AS dup_rate
        FROM vol v
        JOIN dups d USING (source)
        JOIN nl USING (source)
        JOIN top t USING (source)""",
)
def dataset_card_stats(spark, sf_dir):
    """Per-source dataset-card row: volume, token count, language spread
    (distinct + dominant), within-source exact-dup rate — the release
    summary assembled from one scan + dimension-sized aggregates.
    See profiling.dataset_card_stats."""
    from .operators.profiling import dataset_card_stats as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "embedding_ivf_pq_topk",
    """WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cv, norm AS cn FROM v WHERE vec_id < 16),
assigned AS (
  SELECT vec_id, v, norm, cell FROM (
    SELECT a.vec_id, a.v, a.norm, c.cell,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                      c.cell) AS r
    FROM v a CROSS JOIN cents c) t WHERE r = 1),
sub AS (
  SELECT vec_id, m.m, v[m.m * 16 + 1 : m.m * 16 + 16] AS sv
  FROM v CROSS JOIN (SELECT unnest(range(0, 4)) AS m) m),
codebook AS (SELECT vec_id AS cid, m, sv AS cv FROM sub WHERE vec_id < 16),
d AS (
  SELECT s.vec_id, s.m, c.cid,
         list_sum(list_transform(list_zip(s.sv, c.cv),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
  FROM sub s JOIN codebook c ON s.m = c.m),
codes AS (
  SELECT vec_id AS neighbor_id, m, cid AS code FROM (
    SELECT vec_id, m, cid,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
    FROM d) t WHERE rn = 1),
lut AS (SELECT vec_id AS query_id, m, cid AS code, d2 AS qd2
        FROM d WHERE vec_id < 10),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM assigned WHERE vec_id < 10),
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY floor((list_dot_product(q.qv, c.cv)/(q.qn*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                      c.cell) AS r
    FROM q CROSS JOIN cents c) t WHERE r <= 4),
cands AS (
  SELECT p.query_id, n.vec_id AS neighbor_id
  FROM probe p JOIN assigned n ON n.cell = p.cell AND n.vec_id != p.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         floor(sum(l.qd2) * 1000000.0 + 0.5) / 1000000.0 AS approx_dist2
  FROM cands c
  JOIN codes k ON k.neighbor_id = c.neighbor_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = k.m AND l.code = k.code
  GROUP BY 1, 2)
SELECT query_id, neighbor_id, approx_dist2,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY approx_dist2, neighbor_id) AS INT) AS rank
FROM scored QUALIFY rank <= 10""",
)
def embedding_ivf_pq_topk(spark, sf_dir):
    """IVF + PQ asymmetric-distance ANN search (the FAISS IVFPQ recipe
    as joins): nprobe cell pruning, candidates scored from subspace
    codes against a broadcast per-query lookup table — never touching
    candidate float vectors. See similarity.ivf_pq_topk."""
    from .operators.similarity import ivf_pq_topk

    view = _view(spark, sf_dir)
    return ivf_pq_topk(view.tables["embeddings"])


def _matryoshka_oracle(prefix_dims=(8, 16, 32), k: int = 10, nq: int = 10) -> str:
    cos = ("floor((list_dot_product(a.{v}, b.{v}) / (a.{n} * b.{n})) "
           "* 1000000.0 + 0.5) / 1000000.0")
    parts = []
    for d in prefix_dims:
        parts.append(f"""
SELECT {d} AS prefix_dim, p.query_id,
       floor(sum(CASE WHEN f.fn IS NOT NULL THEN 1 ELSE 0 END) / {float(k)}
             * 1000000.0 + 0.5) / 1000000.0 AS recall_at_k
FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM p{d} a JOIN p{d} b ON a.vec_id != b.vec_id
  WHERE a.vec_id < {nq}
  QUALIFY row_number() OVER (PARTITION BY a.vec_id
    ORDER BY {cos.format(v='pv', n='pn')} DESC, b.vec_id) <= {k}) p
LEFT JOIN full_topk f ON f.fq = p.query_id AND f.fn = p.neighbor_id
GROUP BY p.query_id""")
    prefix_ctes = ",\n".join(
        f"""p{d} AS (
  SELECT vec_id, v[1:{d}] AS pv,
         sqrt(list_dot_product(v[1:{d}], v[1:{d}])) AS pn
  FROM v WHERE list_dot_product(v[1:{d}], v[1:{d}]) > 0)"""
        for d in prefix_dims
    )
    return f"""WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings),
full_topk AS (
  SELECT a.vec_id AS fq, b.vec_id AS fn
  FROM v a JOIN v b ON a.vec_id != b.vec_id
  WHERE a.vec_id < {nq}
  QUALIFY row_number() OVER (PARTITION BY a.vec_id
    ORDER BY {cos.format(v='v', n='norm')} DESC, b.vec_id) <= {k}),
{prefix_ctes}
SELECT * FROM ({" UNION ALL ".join(parts)})"""


@register(
    "vocab_coverage_curve",
    f"""WITH freq AS (
          SELECT w, count(*) AS c
          FROM (SELECT unnest({_TOKS_DUCK}) AS w FROM documents)
          GROUP BY w),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM freq),
        top AS (
          SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rnk
          FROM freq QUALIFY rnk <= 10000)
        SELECT n.n AS vocab_size,
               CAST(sum(CASE WHEN rnk <= n.n THEN c ELSE 0 END) AS BIGINT)
                 AS covered_tokens,
               floor(sum(CASE WHEN rnk <= n.n THEN c ELSE 0 END)
                     / CAST((SELECT t FROM tot) AS DOUBLE) * 1000000.0 + 0.5)
                 / 1000000.0 AS coverage
        FROM top CROSS JOIN (VALUES (100), (1000), (10000)) n(n)
        GROUP BY n.n""",
)
def vocab_coverage_curve(spark, sf_dir):
    """Top-N vocabulary token-mass coverage at N=100/1000/10000 — the
    vocab-size decision table; bounded TakeOrdered slice + one
    conditional aggregate. See text_analysis.vocab_coverage_curve."""
    from .operators.text_analysis import vocab_coverage_curve as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


@register(
    "dedup_containment_pairs",
    f"""WITH toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM documents),
        sh0 AS (SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS shingle FROM toks),
        keep AS (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 50),
        sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               floor((i * 1.0 / least(sa.n, sb.n)) * 1000000.0 + 0.5)
                 / 1000000.0 AS containment,
               floor((i * 1.0 / (sa.n + sb.n - i)) * 1000000.0 + 0.5)
                 / 1000000.0 AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE floor((i * 1.0 / least(sa.n, sb.n)) * 1000000.0 + 0.5)
                / 1000000.0 >= 0.8""",
)
def dedup_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dups (|A∩B|/min — the excerpt/quote
    detector Jaccard misses), with the Jaccard carried per pair for
    comparison. Runs with the df(shingle) ≤ 50 cap ACTIVE (mirrored in
    the oracle), so the registered query exercises the scale path —
    see dedup.containment_pairs / _df_capped_index."""
    from .operators.dedup import containment_pairs

    view = _view(spark, sf_dir)
    return containment_pairs(view.tables["documents"])


@register(
    "graph_assortativity",
    """WITH e AS (
         SELECT 'C' || c_custkey AS a, 'N' || c_nationkey AS b FROM customer
         UNION ALL
         SELECT 'S' || s_suppkey AS a, 'N' || s_nationkey AS b FROM supplier
         UNION ALL
         SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b FROM nation),
       und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
       deg AS (SELECT a AS node, count(*) AS deg FROM und GROUP BY 1),
       h AS (
         SELECT CAST(da.deg AS DOUBLE) AS da, CAST(db.deg AS DOUBLE) AS db
         FROM und
         JOIN deg da ON da.node = und.a
         JOIN deg db ON db.node = und.b)
       SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
              CASE WHEN var_pop(da) > 0 AND var_pop(db) > 0
                   THEN floor(covar_pop(da, db)
                              / sqrt(var_pop(da) * var_pop(db))
                              * 1000000.0 + 0.5) / 1000000.0 END
                AS assortativity
       FROM h""",
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity of the undirected FK graph — the "do hubs
    attach to hubs" one-number diagnostic (strongly negative for this
    hub-and-spoke schema) and a cheap skew screen.
    See graph_algos.degree_assortativity."""
    from .operators.graph_algos import degree_assortativity

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    supp = view.tables["supplier"].select(
        F.concat(F.lit("S"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    return degree_assortativity(cust.unionByName(supp).unionByName(nat))


_TRI_EDGES_DUCK = """
  SELECT DISTINCT least('P' || l_partkey, 'S' || l_suppkey) AS u,
         greatest('P' || l_partkey, 'S' || l_suppkey) AS v
  FROM lineitem WHERE l_partkey % 50 = 0"""


@register(
    "graph_clustering_coefficients",
    f"""WITH base AS ({{tri_edges}}),
       und AS (SELECT u AS a, v AS b FROM base UNION SELECT v, u FROM base),
       deg AS (SELECT a AS node, count(*) AS degree FROM und GROUP BY 1),
       tri AS (
         SELECT e1.u AS x, e1.v AS y, e2.v AS z
         FROM base e1
         JOIN base e2 ON e2.u = e1.v
         JOIN base e3 ON e3.u = e1.u AND e3.v = e2.v),
       roles AS (
         SELECT x AS node FROM tri
         UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri),
       tcounts AS (SELECT node, count(*) AS n_triangles FROM roles GROUP BY 1)
       SELECT d.node, d.degree,
              CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
              CASE WHEN d.degree >= 2
                   THEN floor(coalesce(t.n_triangles, 0)
                              / (d.degree * (d.degree - 1) / 2.0)
                              * 1000000.0 + 0.5) / 1000000.0
                   ELSE 0.0 END AS clustering_coef
       FROM deg d LEFT JOIN tcounts t USING (node)""".format(
        tri_edges=_TRI_EDGES_DUCK
    ),
)
def graph_clustering_coefficients(spark, sf_dir):
    """Per-node local clustering coefficient over the same part-supplier
    co-occurrence graph the triangle counter uses — community-structure
    probe composing the hub-safe wedge join with the degree table.
    See graph_algos.clustering_coefficients."""
    from .operators.graph_algos import clustering_coefficients

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].filter(F.col("l_partkey") % 50 == 0)
    edges = li.select(
        F.least(
            F.concat(F.lit("P"), F.col("l_partkey")),
            F.concat(F.lit("S"), F.col("l_suppkey")),
        ).alias("src"),
        F.greatest(
            F.concat(F.lit("P"), F.col("l_partkey")),
            F.concat(F.lit("S"), F.col("l_suppkey")),
        ).alias("dst"),
    ).distinct()
    return clustering_coefficients(edges)


@register(
    "events_active_user_curves",
    """WITH d AS (
         SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
       real_days AS (SELECT DISTINCT day FROM d),
       fan AS (
         SELECT d.u, d.day, r.day AS obs_day
         FROM d JOIN real_days r
           ON r.day BETWEEN d.day AND d.day + INTERVAL 27 DAY)
       SELECT obs_day AS day,
              count(DISTINCT CASE WHEN obs_day = day THEN u END) AS dau,
              count(DISTINCT CASE WHEN obs_day < day + INTERVAL 7 DAY THEN u END) AS wau,
              count(DISTINCT u) AS mau
       FROM fan GROUP BY obs_day""",
)
def events_active_user_curves(spark, sf_dir):
    """Exact DAU/WAU/MAU per day via the contribute-forward fan-out (a
    bounded 28x map-side explode + one aggregate per day — no range
    self-join, no window). See windows.active_user_curves."""
    from .operators.windows import active_user_curves

    view = _view(spark, sf_dir)
    return active_user_curves(view.tables["events"])


@register(
    "brand_price_qty_regression",
    """WITH b AS (
         SELECT p_brand,
                ln(l_extendedprice / l_quantity) AS x,
                ln(l_quantity) AS y
         FROM lineitem JOIN part ON l_partkey = p_partkey)
       SELECT p_brand, count(*) AS n_points,
              CASE WHEN count(*) >= 3 AND var_pop(x) > 0
                   THEN floor(covar_pop(x, y) / var_pop(x) * 1000000.0 + 0.5)
                        / 1000000.0 END AS slope,
              CASE WHEN count(*) >= 3 AND var_pop(x) > 0
                   THEN floor((avg(y) - covar_pop(x, y) / var_pop(x) * avg(x))
                              * 1000000.0 + 0.5) / 1000000.0 END AS intercept,
              CASE WHEN count(*) >= 3 AND var_pop(x) > 0 AND var_pop(y) > 0
                   THEN floor(covar_pop(x, y) / sqrt(var_pop(x) * var_pop(y))
                              * 1000000.0 + 0.5) / 1000000.0 END AS pearson_r
       FROM b GROUP BY p_brand""",
)
def brand_price_qty_regression(spark, sf_dir):
    """Per-brand log-log price/quantity least squares (the grouped
    elasticity shape): one map-side-combined aggregation pass, NULL fits
    for degenerate groups instead of ANSI division errors.
    See analytics.grouped_linear_regression."""
    from .operators.analytics import grouped_linear_regression

    view = _view(spark, sf_dir)
    li = view.tables["lineitem"].join(
        view.tables["part"],
        view.tables["lineitem"]["l_partkey"] == view.tables["part"]["p_partkey"],
    )
    return grouped_linear_regression(
        li,
        "p_brand",
        F.log(F.col("l_extendedprice") / F.col("l_quantity")),
        F.log(F.col("l_quantity")),
    )


@register(
    "embedding_cluster_purity",
    """WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cv, norm AS cn FROM v WHERE vec_id < 16),
assigned AS (
  SELECT vec_id, label, cell FROM (
    SELECT a.vec_id, a.label, c.cell,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                      c.cell) AS r
    FROM v a CROSS JOIN cents c) t WHERE r = 1),
cl AS (SELECT cell, label, count(*) AS n FROM assigned GROUP BY 1, 2),
tot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_vecs FROM cl GROUP BY 1),
best AS (
  SELECT cell, label AS dominant_label, n AS n_dominant
  FROM cl QUALIFY row_number() OVER (
    PARTITION BY cell ORDER BY n DESC, label) = 1)
SELECT t.cell, t.n_vecs, b.dominant_label, b.n_dominant,
       floor(b.n_dominant / CAST(t.n_vecs AS DOUBLE) * 1000000.0 + 0.5)
         / 1000000.0 AS purity
FROM tot t JOIN best b USING (cell)""",
)
def embedding_cluster_purity(spark, sf_dir):
    """Cluster-vs-label purity per IVF cell (dominant label + share) —
    does the embedding space separate the classes before training.
    See similarity.cluster_label_purity."""
    from .operators.similarity import cluster_label_purity

    view = _view(spark, sf_dir)
    return cluster_label_purity(view.tables["embeddings"])


def _walk_corpus_oracle(steps: int = 4, n_walks: int = 1) -> str:
    walk_id = (
        "'N' || n_nationkey"
        if n_walks == 1
        else "'N' || n_nationkey || '#' || w"
    )
    ctes = [f"""e AS (
  SELECT 'C' || c_custkey AS a, 'N' || c_nationkey AS b FROM customer
  UNION ALL
  SELECT 'S' || s_suppkey AS a, 'N' || s_nationkey AS b FROM supplier
  UNION ALL
  SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b FROM nation),
und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
ws AS (SELECT unnest(range(0, {n_walks})) AS w),
w0 AS (
  SELECT {walk_id} AS walk_id, w, 'N' || n_nationkey AS cur,
         'N' || n_nationkey AS path, 1 AS n_nodes
  FROM nation CROSS JOIN ws)"""]
    for t in range(1, steps + 1):
        ctes.append(f"""p{t} AS (
  SELECT a, w, arg_min(b, md5(a || '|' || b || '|' || {t} || '|' || w)) AS b
  FROM und CROSS JOIN ws GROUP BY a, w),
w{t} AS (
  SELECT w.walk_id, w.w, coalesce(p.b, w.cur) AS cur,
         CASE WHEN p.b IS NOT NULL THEN w.path || ' ' || p.b
              ELSE w.path END AS path,
         w.n_nodes + CASE WHEN p.b IS NOT NULL THEN 1 ELSE 0 END AS n_nodes
  FROM w{t - 1} w LEFT JOIN p{t} p ON p.a = w.cur AND p.w = w.w)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT walk_id, path, n_nodes FROM w{steps}"
    )


@register("graph_walk_corpus", _walk_corpus_oracle())
def graph_walk_corpus(spark, sf_dir):
    """DeepWalk-style walk-corpus generation over the FK graph with
    md5-derandomized neighbor choices (reproducible across engines /
    partitionings); one frontier join + per-walk min-aggregate per hop,
    walks from every nation node. See graph_algos.walk_corpus."""
    from .operators.graph_algos import walk_corpus

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    supp = view.tables["supplier"].select(
        F.concat(F.lit("S"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    seeds = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("node")
    )
    return walk_corpus(cust.unionByName(supp).unionByName(nat), seeds, steps=4)


@register("graph_walk_corpus_multi", _walk_corpus_oracle(n_walks=3))
def graph_walk_corpus_multi(spark, sf_dir):
    """Multi-walk corpus (VERDICT r05 #3): 3 walks per seed, the md5
    choice keyed by the walk index so repeated samples diverge — the
    actual skip-gram training corpus shape (production uses 10–80
    walks/node; 3 keeps the oracle recurrence tractable). See
    graph_algos.walk_corpus."""
    from .operators.graph_algos import walk_corpus

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    supp = view.tables["supplier"].select(
        F.concat(F.lit("S"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    seeds = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("node")
    )
    return walk_corpus(
        cust.unionByName(supp).unionByName(nat), seeds, steps=4, n_walks=3
    )


def _pca_power_oracle(iterations: int = 3, dim: int = 64) -> str:
    ctes = [f"""e AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
  FROM embeddings),
v0 AS (SELECT list_transform(range(0, {dim}), j -> {1.0 / dim ** 0.5!r}) AS v)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""s{i} AS (
  SELECT ed, list_dot_product(ed, (SELECT v FROM v{i - 1})) AS s FROM e),
m{i} AS (
  SELECT j, sum(x * s) AS m FROM (
    SELECT generate_subscripts(ed, 1) - 1 AS j, unnest(ed) AS x, s FROM s{i})
  GROUP BY j),
n{i} AS (SELECT sqrt(sum(m * m)) AS nn FROM m{i}),
v{i} AS (
  SELECT list(floor(m / (SELECT nn FROM n{i}) * 1000000.0 + 0.5) / 1000000.0
              ORDER BY j) AS v
  FROM m{i})""")
    t = iterations
    return f"""WITH {",".join(ctes)},
fin AS (SELECT ed, list_dot_product(ed, (SELECT v FROM v{t})) AS s FROM e),
sh AS (
  SELECT floor(sum(s * s) / sum(list_dot_product(ed, ed)) * 1000000.0 + 0.5)
           / 1000000.0 AS share
  FROM fin)
SELECT generate_subscripts(v, 1) - 1 AS pos, unnest(v) AS loading,
       (SELECT share FROM sh) AS explained_share
FROM v{t}"""


@register("embedding_pca_power_iteration", _pca_power_oracle())
def embedding_pca_power_iteration(spark, sf_dir):
    """Top principal direction by 3 power iterations (uncentered), the
    per-iteration direction rounded to 6 decimals so both engines
    iterate on identical literals; plus the explained-variance share
    under the final direction. See similarity.pca_power_iteration."""
    from .operators.similarity import pca_power_iteration

    view = _view(spark, sf_dir)
    return pca_power_iteration(view.tables["embeddings"])


@register("embedding_matryoshka_audit", _matryoshka_oracle())
def embedding_matryoshka_audit(spark, sf_dir):
    """Matryoshka/prefix-dimension retrieval audit: recall@10 of search
    over the first 8/16/32 coordinates vs the full-dimension exact
    top-10, per query — the adaptive-dimension retrieval trade table.
    See similarity.matryoshka_prefix_audit."""
    from .operators.similarity import matryoshka_prefix_audit

    view = _view(spark, sf_dir)
    return matryoshka_prefix_audit(view.tables["embeddings"])


@register(
    "user_sequence_anomaly",
    """WITH seq AS (
         SELECT user_id, event_type AS from_type,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         FROM events),
       trans AS (SELECT * FROM seq WHERE to_type IS NOT NULL),
       counts AS (
         SELECT from_type, to_type, count(*) AS n
         FROM trans GROUP BY 1, 2),
       tot AS (SELECT from_type, sum(n) AS t FROM counts GROUP BY 1),
       probs AS (
         SELECT from_type, to_type,
                floor(n / CAST(t AS DOUBLE) * 10000000000.0 + 0.5)
                  / 10000000000.0 AS prob
         FROM counts JOIN tot USING (from_type))
       SELECT user_id, count(*) AS n_transitions,
              floor(avg(ln(prob)) * 10000.0 + 0.5) / 10000.0 AS mean_logprob,
              floor(min(prob) * 1000000.0 + 0.5) / 1000000.0
                AS min_transition_prob
       FROM trans JOIN probs USING (from_type, to_type)
       GROUP BY user_id""",
)
def user_sequence_anomaly(spark, sf_dir):
    """Per-user Markov sequence-likelihood anomaly score: mean
    transition log-likelihood under the corpus' own transition matrix +
    the rarest transition probability — flags unusual behavior ORDER
    even when individual events look normal.
    See windows.sequence_anomaly_scores."""
    from .operators.windows import sequence_anomaly_scores

    view = _view(spark, sf_dir)
    return sequence_anomaly_scores(view.tables["events"])


@register(
    "data_quality_checks",
    """SELECT 'orders' AS table_name, 'o_custkey_in_customer' AS rule,
              count(*) AS n_rows,
              CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violations,
              floor((count(*) - sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END))
                    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
                AS pass_rate
       FROM orders LEFT JOIN customer ON o_custkey = c_custkey
       UNION ALL
       SELECT 'lineitem', 'l_orderkey_in_orders', count(*),
              CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
              floor((count(*) - sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END))
                    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
       UNION ALL
       SELECT 'lineitem', 'l_quantity_in_1_50', count(*),
              CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT),
              floor((count(*) - sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END))
                    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       FROM lineitem
       UNION ALL
       SELECT 'events', 'value_non_negative', count(*),
              CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
              floor((count(*) - sum(CASE WHEN value < 0 THEN 1 ELSE 0 END))
                    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       FROM events
       UNION ALL
       SELECT 'documents', 'text_non_empty', count(*),
              CAST(sum(CASE WHEN coalesce(length(text), 0) = 0 THEN 1 ELSE 0 END) AS BIGINT),
              floor((count(*) - sum(CASE WHEN coalesce(length(text), 0) = 0 THEN 1 ELSE 0 END))
                    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       FROM documents
       UNION ALL
       SELECT 'customer', 'c_custkey_unique', count(*),
              CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
              floor((count(*) - sum(CASE WHEN c > 1 THEN 1 ELSE 0 END))
                    / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       FROM (SELECT c_custkey, count(*) AS c FROM customer GROUP BY 1)""",
)
def data_quality_checks(spark, sf_dir):
    """Expectation-suite audit: referential integrity (FK left-join null
    probes on key-only projections), domain ranges, and key uniqueness —
    one (table, rule, n_rows, n_violations, pass_rate) row per rule.
    See profiling.data_quality_checks."""
    from .operators.profiling import data_quality_checks as op

    return op(_view(spark, sf_dir))


@register(
    "streaming_cusum_drift",
    """WITH daily AS (
         SELECT CAST(event_type AS VARCHAR) AS key, CAST(ts AS DATE) AS day,
                count(*) AS x
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT key, avg(x) AS m, stddev_pop(x) AS sd, count(*) AS n_days,
                CAST(sum(x) AS BIGINT) AS n_events
         FROM daily GROUP BY 1),
       cum AS (
         SELECT d.key, d.day, s.n_days, s.n_events, s.sd,
                sum(d.x - s.m) OVER (PARTITION BY d.key ORDER BY d.day) AS cs
         FROM daily d JOIN stats s USING (key)),
       peak AS (
         SELECT key, day AS peak_day
         FROM cum
         QUALIFY row_number() OVER (
           PARTITION BY key ORDER BY abs(cs) DESC, day DESC) = 1)
       SELECT c.key, c.n_events, c.n_days,
              floor(max(abs(c.cs)) * 10000.0 + 0.5) / 10000.0 AS max_cusum,
              strftime(any_value(p.peak_day), '%Y-%m-%d') AS peak_day,
              CASE WHEN any_value(c.sd) > 0
                   THEN floor(max(abs(c.cs)) / (any_value(c.sd) * sqrt(c.n_days))
                              * 10000.0 + 0.5) / 10000.0
                   END AS drift_stat
       FROM cum c JOIN peak p USING (key)
       GROUP BY c.key, c.n_days, c.n_events""",
)
def streaming_cusum_drift(spark, sf_dir):
    """Streaming CUSUM drift monitor (applyInPandasWithState): per-key
    day→count map state accumulates commutatively, so the final emission
    equals the batch CUSUM under any micro-batch schedule — the
    streaming twin of ``events_cusum_drift``.
    See streaming/stateful.streaming_cusum_monitor."""
    from pyspark.sql import Window

    from .streaming.events import run_stream_to_memory
    from .streaming.stateful import streaming_cusum_monitor as op

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream), f"q_stream_cusum_{_STREAM_SEQ[0]}", output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_events"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("key", "n_events", "n_days", "max_cusum", "peak_day", "drift_stat")
    )


@register(
    "copurchase_recommendations",
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       purch AS (
         SELECT DISTINCT o_custkey AS c, l_partkey AS p
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       pairs AS (
         SELECT a.p AS p1, b.p AS p2, count(*) AS n_co
         FROM li a JOIN li b ON a.o = b.o AND a.p != b.p
         GROUP BY 1, 2 HAVING count(*) >= 2),
       cand AS (
         SELECT pu.c, pr.p2 AS rec_part, count(*) AS common_items
         FROM purch pu JOIN pairs pr ON pu.p = pr.p1
         GROUP BY 1, 2),
       fresh AS (
         SELECT cd.c, cd.rec_part, cd.common_items
         FROM cand cd
         LEFT JOIN purch x ON x.c = cd.c AND x.p = cd.rec_part
         WHERE x.p IS NULL)
       SELECT c AS custkey, rec_part, common_items,
              CAST(row_number() OVER (
                PARTITION BY c ORDER BY common_items DESC, rec_part) AS INT) AS rnk
       FROM fresh QUALIFY rnk <= 3""",
)
def copurchase_recommendations(spark, sf_dir):
    """Item-based collaborative filtering: top-3 not-yet-bought parts
    per customer scored by co-purchase common-neighbor count — the
    candidate-generation stage of a recommender, joins over the bounded
    basket-pair table. See analytics.copurchase_recommendations."""
    from .operators.analytics import copurchase_recommendations as op

    return op(_view(spark, sf_dir))


@register(
    "events_markov_transitions",
    """WITH seq AS (
         SELECT event_type AS from_type,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS to_type
         FROM events),
       counts AS (
         SELECT from_type, to_type, count(*) AS n
         FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       tot AS (SELECT from_type, sum(n) AS t FROM counts GROUP BY 1)
       SELECT from_type, to_type, n,
              floor(n / CAST(t AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS prob
       FROM counts JOIN tot USING (from_type)""",
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams
    (lead window partitioned by user, (ts, event_id) tie-break) — the
    behavioral-sequence baseline. See windows.markov_transitions."""
    from .operators.windows import markov_transitions

    view = _view(spark, sf_dir)
    return markov_transitions(view.tables["events"])


@register(
    "events_first_touch_attribution",
    """WITH a AS (
         SELECT user_id, event_type,
                first_value(CASE WHEN event_type != 'purchase'
                                 THEN event_type END IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft
         FROM events),
       conv AS (
         SELECT coalesce(ft, '(none)') AS channel
         FROM a WHERE event_type = 'purchase'),
       counts AS (SELECT channel, count(*) AS n_conversions FROM conv GROUP BY 1),
       tot AS (SELECT sum(n_conversions) AS t FROM counts)
       SELECT channel, n_conversions,
              floor(n_conversions / CAST(t AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS share
       FROM counts CROSS JOIN tot""",
)
def events_first_touch_attribution(spark, sf_dir):
    """First-touch conversion attribution: each purchase credited to the
    user's earliest prior non-purchase channel via a prefix-frame
    running first — no self-join against the event history.
    See windows.first_touch_attribution."""
    from .operators.windows import first_touch_attribution

    view = _view(spark, sf_dir)
    return first_touch_attribution(view.tables["events"])


def _bpe_train_oracle(rounds: int = 3) -> str:
    def round_cte(r):
        return f"""
l{r} AS (SELECT c, string_split(s, chr(31)) AS l FROM s{r - 1}),
p{r} AS (SELECT lsym, rsym, sum(c) AS cnt FROM (
           SELECT c, l[i] AS lsym, l[i+1] AS rsym
           FROM (SELECT c, l, unnest(range(1, len(l))) AS i FROM l{r} WHERE len(l) >= 2))
         GROUP BY 1, 2),
b{r} AS (SELECT lsym, rsym, cnt FROM p{r} ORDER BY cnt DESC, lsym, rsym LIMIT 1),
s{r} AS (SELECT c, list_reduce(l, (acc, x) -> CASE
            WHEN (acc = b.lsym OR right(acc, length(b.lsym) + 1) = chr(31) || b.lsym)
                 AND x = b.rsym
            THEN acc || x ELSE acc || chr(31) || x END) AS s
         FROM l{r} CROSS JOIN b{r} b)"""

    finals = "\n  UNION ALL ".join(
        f"SELECT {r} AS round, lsym, rsym, lsym || rsym AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return f"""WITH words AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest({_TOKS_DUCK}) AS w FROM documents) GROUP BY w),
s0 AS (SELECT c, array_to_string(
         list_transform(range(1, length(w) + 1), i -> w[i]), chr(31)) AS s
       FROM words),{",".join(round_cte(r) for r in range(1, rounds + 1))}
SELECT * FROM ({finals})"""


@register("bpe_train_merges", _bpe_train_oracle(3))
def bpe_train_merges(spark, sf_dir):
    """TRUE sequential BPE training (3 rounds): each round re-counts
    adjacent symbol pairs AFTER the previous merge applied, so later
    merges can contain earlier merged symbols — the real tokenizer-
    induction recurrence, state = word vocabulary, merge application a
    separator-string fold in codegen. The oracle unrolls the identical
    recurrence with DuckDB list_reduce.
    See text_analysis.bpe_train_merges."""
    from .operators.text_analysis import bpe_train_merges as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"], rounds=3)


@register(
    "graph_closeness_sampled",
    """WITH e AS (
         SELECT 'C' || c_custkey AS a, 'N' || c_nationkey AS b FROM customer
         UNION ALL
         SELECT 'S' || s_suppkey AS a, 'N' || s_nationkey AS b FROM supplier
         UNION ALL
         SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b FROM nation),
       und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
       seeds AS (SELECT DISTINCT 'N' || n_nationkey AS node FROM nation),
       reach AS (
         WITH RECURSIVE r(seed, node, dist) AS (
           SELECT node, node, 0 FROM seeds
           UNION
           SELECT r.seed, u.b, r.dist + 1 FROM r JOIN und u ON u.a = r.node
           WHERE r.dist < 4)
         SELECT seed, node, min(dist) AS dist FROM r GROUP BY 1, 2)
       SELECT seed, count(*) - 1 AS n_reached,
              CAST(sum(dist) AS BIGINT) AS sum_dist,
              floor(CASE WHEN sum(dist) > 0
                         THEN (count(*) - 1) / CAST(sum(dist) AS DOUBLE)
                         ELSE 0.0 END * 1000000.0 + 0.5) / 1000000.0 AS closeness
       FROM reach GROUP BY seed""",
)
def graph_closeness_sampled(spark, sf_dir):
    """Bounded-hop closeness centrality from the nation seed set over
    the undirected customer/supplier/nation/region FK graph — the
    landmark scheme for at-scale centrality (exact all-pairs is O(V·E)).
    Recursive-CTE oracle. See graph_algos.closeness_sampled."""
    from .operators.graph_algos import closeness_sampled

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    supp = view.tables["supplier"].select(
        F.concat(F.lit("S"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    seeds = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("node")
    )
    return closeness_sampled(
        cust.unionByName(supp).unionByName(nat), seeds, max_hops=4
    )
