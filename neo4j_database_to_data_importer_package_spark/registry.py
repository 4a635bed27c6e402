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
    view = load_graph_view(spark, sf_dir)
    df, _ = export_node_table(view.nodes["Customer"], "Customer")
    return df


@register(
    "node_export_orders",
    f"""SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '{_TS_FMT_DUCK}') AS o_orderdate,
               o_orderpriority, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey IS NOT NULL""",
)
def node_export_orders(spark, sf_dir):
    view = load_graph_view(spark, sf_dir)
    df, _ = export_node_table(view.nodes["Order"], "Order")
    return _fmt_ts(df, "o_orderdate")


@register(
    "node_export_part",
    """SELECT p_partkey, p_brand, p_name, p_retailprice, p_size, p_type
       FROM part WHERE p_partkey IS NOT NULL""",
)
def node_export_part(spark, sf_dir):
    view = load_graph_view(spark, sf_dir)
    df, _ = export_node_table(view.nodes["Part"], "Part")
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
    view = load_graph_view(spark, sf_dir)
    return schema_union_map(nodes_from_view(view))


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
    view = load_graph_view(spark, sf_dir)
    idents = detect_identifiers(view.nodes, view.catalog.unique_constraints)
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
    view = load_graph_view(spark, sf_dir)
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

    view = load_graph_view(spark, sf_dir)
    return discover_patterns_map(edges_from_view(view))


# ---------------------------------------------------------------------------
# Relationship export (C4 = C2→J1→P4-P6→O2)
# ---------------------------------------------------------------------------

def _rel_export(spark, sf_dir, pattern_key):
    # Edge FKs reference the DECLARED star-schema identifiers (node
    # identity), not the discovered ones — the C1 cascade is the
    # *analysis* operator and is verified separately above.
    view = load_graph_view(spark, sf_dir)
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
