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
    from ..operators.mixing import split_stats

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
    from ..operators.mixing import cap_per_group

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
    from ..operators.mixing import mixture_stats

    view = _view(spark, sf_dir)
    return mixture_stats(view.tables["documents"])


# ---------------------------------------------------------------------------
