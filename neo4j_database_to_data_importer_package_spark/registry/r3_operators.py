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
    from ..sinks.shard_sink import shard_manifest

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

    from ..operators.text_analysis import quality_columns

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
    from ..functions.numeric import round_half_up

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
    from ..operators.dedup import novelty_profile

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
    from ..operators.profiling import column_profile

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
    from ..operators.dedup import snapshot_diff

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
    from ..operators.text_analysis import bpe_merge_candidates as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"])


# ---------------------------------------------------------------------------
