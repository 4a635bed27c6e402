"""Round-6 batch 27: quality-aware dedup representatives, char-n-gram
language-ID confusion, per-funnel-step A/B significance, and the
supplier dual-sourcing overlap — each an oracle-backed registry entry
per the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    ORACLES,
    _view,
    register,
)


@register(
    "dedup_cluster_representatives",
    f"""WITH pairs AS ({ORACLES["dedup_minhash_lsh_pairs"]}),
       und AS (SELECT id_a AS a, id_b AS b FROM pairs
               UNION SELECT id_b AS a, id_a AS b FROM pairs),
       nodes AS (SELECT DISTINCT a AS node FROM und),
       reach AS (
         WITH RECURSIVE r(node, comp) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT u.b, r.comp FROM r JOIN und u ON u.a = r.node)
         SELECT * FROM r),
       comp AS (SELECT node AS doc_id, min(comp) AS cluster_id
                FROM reach GROUP BY node),
       q AS ({ORACLES["text_quality_score"]}),
       members AS (
         SELECT comp.doc_id, comp.cluster_id, d.n_chars, q.quality
         FROM comp JOIN documents d ON comp.doc_id = d.doc_id
                   JOIN q ON q.doc_id = comp.doc_id),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY cluster_id
                     ORDER BY quality DESC, doc_id) AS rn
         FROM members),
       reps AS (SELECT cluster_id, doc_id AS rep_doc,
                       quality AS rep_quality, n_chars AS rc
                FROM ranked WHERE rn = 1),
       sizes AS (SELECT cluster_id, count(*) AS n_docs,
                        CAST(sum(n_chars) AS BIGINT) AS chars_total
                 FROM members GROUP BY 1)
       SELECT r.cluster_id, rep_doc, rep_quality, n_docs, chars_total,
              CAST(chars_total - rc AS BIGINT) AS chars_dropped
       FROM reps r JOIN sizes s ON r.cluster_id = s.cluster_id""",
)
def dedup_cluster_representatives(spark, sf_dir):
    """Quality-aware canonical-doc selection over the MinHash near-dup
    clusters: keep the best member, account the bytes dropped. See
    dedup.cluster_representatives."""
    from ..operators.dedup import cluster_representatives, minhash_lsh_pairs
    from ..operators.graph_algos import connected_components
    from ..operators.text_analysis import quality_score

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    # Checkpointed: CC unions its edge input with itself (see
    # dedup_near_dup_clusters) — run the banded candidate join once.
    pairs = (
        minhash_lsh_pairs(docs)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return cluster_representatives(docs, comp, quality_score(docs))


@register(
    "text_chargram_lang_confusion",
    """WITH base AS (
         SELECT doc_id, lang AS tagged, lower(text) AS t FROM documents),
       dg AS (
         SELECT doc_id, tagged,
                unnest(list_distinct(list_transform(
                  range(1, greatest(length(t) - 2, 1) + 1),
                  i -> substr(t, i, 3)))) AS g
         FROM base),
       dgf AS (SELECT * FROM dg WHERE length(g) = 3),
       pc AS (SELECT tagged, g, count(*) AS c FROM dgf GROUP BY 1, 2),
       prof AS (
         SELECT tagged AS plang, g FROM (
           SELECT tagged, g,
                  row_number() OVER (PARTITION BY tagged
                                     ORDER BY c DESC, g) AS rn
           FROM pc) WHERE rn <= 50),
       hits AS (
         SELECT doc_id, tagged, plang, count(*) AS hits
         FROM dgf JOIN prof USING (g) GROUP BY 1, 2, 3),
       assigned AS (
         SELECT doc_id, tagged, plang AS predicted FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY hits DESC, plang) AS rn
           FROM hits) WHERE rn = 1)
       SELECT tagged, predicted, count(*) AS n_docs
       FROM assigned GROUP BY 1, 2""",
)
def text_chargram_lang_confusion(spark, sf_dir):
    """Cavnar–Trenkle char-3-gram language ID evaluated against the
    corpus language tags (top-50 profiles, integer hit scoring) — the
    method-diversity check against the stopword identifier. See
    text_analysis.chargram_lang_id_confusion."""
    from ..operators.text_analysis import chargram_lang_id_confusion

    view = _view(spark, sf_dir)
    return chargram_lang_id_confusion(view.tables["documents"])


@register(
    "events_funnel_ab_significance",
    """WITH pu AS (
         SELECT user_id AS u,
                max(CASE WHEN event_type = 'view' AND value >= 90.0
                         THEN 1 ELSE 0 END) AS s0,
                max(CASE WHEN event_type = 'click' AND value >= 90.0
                         THEN 1 ELSE 0 END) AS s1,
                max(CASE WHEN event_type = 'signup' AND value >= 90.0
                         THEN 1 ELSE 0 END) AS s2,
                max(CASE WHEN event_type = 'purchase' AND value >= 150.0
                         THEN 1 ELSE 0 END) AS s3,
                CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                           1, 8))::BIGINT % 2 = 0
                     THEN 'A' ELSE 'B' END AS variant
         FROM events GROUP BY user_id),
       arms AS (
         SELECT variant, count(*) AS n_users,
                CAST(sum(s0) AS BIGINT) AS c0, CAST(sum(s1) AS BIGINT) AS c1,
                CAST(sum(s2) AS BIGINT) AS c2, CAST(sum(s3) AS BIGINT) AS c3
         FROM pu GROUP BY 1),
       tall AS (
         SELECT variant, n_users, 'view' AS step, 0 AS step_idx,
                c0 AS n_completed FROM arms
         UNION ALL SELECT variant, n_users, 'click', 1, c1 FROM arms
         UNION ALL SELECT variant, n_users, 'signup', 2, c2 FROM arms
         UNION ALL SELECT variant, n_users, 'purchase', 3, c3 FROM arms),
       a AS (SELECT step, step_idx, n_users AS na, n_completed AS ca
             FROM tall WHERE variant = 'A'),
       b AS (SELECT step AS bstep, n_users AS nb, n_completed AS cb
             FROM tall WHERE variant = 'B'),
       wide AS (SELECT * FROM a JOIN b ON a.step = b.bstep)
       SELECT step, CAST(step_idx AS INT) AS step_idx,
              na AS n_users_a, ca AS n_completed_a,
              nb AS n_users_b, cb AS n_completed_b,
              floor(ca / CAST(na AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS rate_a,
              floor(cb / CAST(nb AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS rate_b,
              CASE WHEN (ca + cb) > 0 AND (ca + cb) < (na + nb) THEN
                floor(((ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))
                       / sqrt(((ca + cb) / CAST(na + nb AS DOUBLE))
                              * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
                              * (1.0 / na + 1.0 / nb)))
                      * 1000000.0 + 0.5) / 1000000.0 END AS z_score
       FROM wide""",
)
def events_funnel_ab_significance(spark, sf_dir):
    """Per-funnel-step A/B completion rates and pooled z — localizes
    which step an experiment moves. See
    statistics.funnel_step_ab_significance."""
    from ..operators.statistics import funnel_step_ab_significance

    view = _view(spark, sf_dir)
    return funnel_step_ab_significance(view.tables["events"])


@register(
    "supplier_dual_sourcing_overlap",
    """WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                   FROM lineitem),
       sizes AS (SELECT s, count(*) AS n_parts FROM sp GROUP BY 1),
       shared AS (
         SELECT a.s AS s1, b.s AS s2, count(*) AS n_shared
         FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
         GROUP BY 1, 2),
       top AS (
         SELECT s1, s2, n_shared, z1.n_parts AS n1, z2.n_parts AS n2,
                floor(n_shared
                      / CAST(z1.n_parts + z2.n_parts - n_shared AS DOUBLE)
                      * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         FROM shared JOIN sizes z1 ON s1 = z1.s JOIN sizes z2 ON s2 = z2.s)
       SELECT * FROM top ORDER BY n_shared DESC, s1, s2 LIMIT 20""",
)
def supplier_dual_sourcing_overlap(spark, sf_dir):
    """Top-20 supplier pairs by shared-part count with portfolio
    Jaccard — the dual-sourcing replaceability screen. See
    analytics.dual_sourcing_overlap."""
    from ..operators.analytics import dual_sourcing_overlap

    return dual_sourcing_overlap(_view(spark, sf_dir))
