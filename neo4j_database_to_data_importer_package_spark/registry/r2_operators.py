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
from .streaming import _STREAM_SEQ, _replayed_events_stream

# Streaming session windows (merging-session state) — batch twin's oracle
# ---------------------------------------------------------------------------

ORACLES["streaming_session_events"] = ORACLES["window_session_events"]


def streaming_session_events(spark, sf_dir):
    """Streaming session windows over the replayed events: the state store
    merges sessions as events arrive within the 30-minute gap, complete
    mode emits the final merged sessions — identical to the batch
    session_window_agg and its lag/sum-over-window SQL oracle."""
    from ..streaming.events import run_stream_to_memory, streaming_session_counts

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
    from ..functions.numeric import round_half_up
    from ..operators.multimodal import resize_plan

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
    from ..operators.retrieval import tfidf_top_terms as op

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
    from ..operators.retrieval import bm25_topk

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
    from ..operators.retrieval import vocabulary_oov

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
    from ..streaming.events import run_stream_to_memory, streaming_dedup

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
    from ..operators.dedup import duplicate_span_stats

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
    from ..operators.graph_algos import triangle_counts

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
