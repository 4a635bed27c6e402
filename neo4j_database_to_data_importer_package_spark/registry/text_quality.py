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
from .dedup import _TOKS_DUCK

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
    from ..operators.text_analysis import repetition_stats

    view = _view(spark, sf_dir)
    return repetition_stats(view.tables["documents"])


# ---------------------------------------------------------------------------
