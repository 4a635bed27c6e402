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
    from ..operators.chunking import chunk_plan

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
    from ..operators.chunking import sequence_packs

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
    from ..operators.text_analysis import pii_scrub

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
    from ..operators.similarity import quantize_stats

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
    from ..operators.retrieval import heavy_hitter_terms as hh

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
    from ..operators.analytics import deterministic_group_sample

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
    from ..operators.dedup import contamination_check as cc

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
    from ..operators.text_analysis import unigram_logprob_score as ulps

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
    from ..operators.analytics import histogram_quantiles

    view = _view(spark, sf_dir)
    return histogram_quantiles(
        view.tables["lineitem"], "l_extendedprice", [0.25, 0.5, 0.75, 0.9, 0.99]
    )


def graph_k_core(spark, sf_dir):
    """4-core of the one-ship-year order/part/supplier co-occurrence
    graph (rows-only: iterative peeling has no single-pass SQL twin;
    unit tests cover known graphs)."""
    from ..operators.graph_algos import k_core

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
    from ..operators.similarity import kmeans_step

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
    from ..operators.dedup import incremental_exact_dedup

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

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_kmv_distinct

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
