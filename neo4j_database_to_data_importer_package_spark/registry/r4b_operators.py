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
from .dedup import _SHINGLES_DUCK, _TOKS_DUCK
from .mixing import _FRAC_DUCK
from .similarity import _COS_DUCK
from .streaming import _STREAM_SEQ, _replayed_events_stream
from .text import _LANG_LISTS_DUCK

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
    from ..operators.similarity import dim_stats

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
    from ..operators.similarity import norm_outliers

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
    from ..operators.mixing import weighted_reservoir_sample

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
    from ..operators.chunking import length_bucket_stats

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
    from ..operators.dedup import blocked_name_linkage

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
    from ..operators.windows import scd2_states

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
    from ..operators.windows import mad_outliers

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
    from ..operators.graph_algos import hits

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
    from ..operators.text_analysis import pmi_collocations

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
    from ..operators.text_analysis import quality_classifier_score as qcs

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
    from ..operators.similarity import centroid_outliers

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
    from ..operators.dedup import prefix_survivorship

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
    from ..operators.dedup import minhash_calibration

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
    from ..operators.text_analysis import language_confusion

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
    from ..operators.mixing import split_leakage_check as slc

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
    from ..streaming.events import run_stream_to_memory, streaming_sliding_counts

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

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_topk_users as op

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
    from ..operators.retrieval import hybrid_rrf_topk

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

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_funnel_state as op

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
    from ..operators.mixing import epoch_mixture_plan as emp

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
    from ..operators.profiling import length_drift_psi as psi

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
    from ..operators.graph_algos import personalized_pagerank

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
    from ..operators.text_analysis import quality_signal_ensemble as qse

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
    from ..operators.windows import hourly_seasonal_profile

    view = _view(spark, sf_dir)
    return hourly_seasonal_profile(view.tables["events"])


# ---------------------------------------------------------------------------
