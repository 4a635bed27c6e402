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
    from ..operators.text_analysis import token_stats

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
    from ..operators.text_analysis import quality_score

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
    from ..operators.text_analysis import language_id

    view = _view(spark, sf_dir)
    return language_id(view.tables["documents"])


@register(
    "text_fingerprints",
    f"SELECT doc_id, md5({_NORM_DUCK}) AS fingerprint FROM documents",
)
def text_fingerprints(spark, sf_dir):
    from ..operators.text_analysis import fingerprints

    view = _view(spark, sf_dir)
    return fingerprints(view.tables["documents"])


# ---------------------------------------------------------------------------
