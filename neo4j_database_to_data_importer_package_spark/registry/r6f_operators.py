"""Round-6 batch 17: heuristic bot screen, stream-disorder audit,
cohort LTV curves, weighted digraph reciprocity, and banded
perceptual-hash near-dup candidates over the committed media fixture —
each an oracle-backed registry entry per the standing gate discipline
(COVERAGE.md)."""

from __future__ import annotations

import os

from ._core import (  # noqa: F401
    F,
    QUERIES,
    ORACLES,
    _view,
    register,
)

_US = "date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)"
_SECS = "date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)"


@register(
    "events_bot_score_histogram",
    f"""WITH us AS (
         SELECT user_id, event_type, ts, event_id, {_SECS} AS u
         FROM events),
       g AS (
         SELECT user_id,
                u - lag(u) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS gap
         FROM us),
       gm AS (
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                CAST(sum(gap) AS BIGINT) AS g1,
                CAST(sum(gap * gap) AS BIGINT) AS g2
         FROM g WHERE gap IS NOT NULL GROUP BY 1),
       pt AS (SELECT user_id, event_type, count(*) AS c
              FROM events GROUP BY 1, 2),
       tu AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events
              FROM pt GROUP BY 1),
       ent AS (
         SELECT pt.user_id, n_events,
                floor(-(CAST(sum(CAST(floor((c * 1.0 / n_events)
                                            * ln(c * 1.0 / n_events)
                                            * 1000000000000.0 + 0.5)
                                      / 1000000000000.0
                                      AS DECIMAL(27,12))) AS DOUBLE))
                      * 1000000000.0 + 0.5) / 1000000000.0 AS entropy
         FROM pt JOIN tu ON pt.user_id = tu.user_id
         GROUP BY 1, 2),
       night AS (
         SELECT user_id,
                CAST(sum(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_night,
                max(u) - min(u) AS span_s
         FROM us GROUP BY 1),
       j AS (
         SELECT gm.user_id, n_gaps, g1, g2, n_events, entropy, n_night,
                span_s,
                floor(sqrt((CAST(g2 AS DOUBLE)
                            - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE)
                              / CAST(n_gaps AS DOUBLE))
                           / CAST(n_gaps AS DOUBLE))
                      / (CAST(g1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                      * 1000000000.0 + 0.5) / 1000000000.0 AS cv,
                CASE WHEN span_s > 0
                     THEN floor(CAST(n_events AS DOUBLE)
                                / (CAST(span_s AS DOUBLE) / 60.0)
                                * 1000000000.0 + 0.5) / 1000000000.0
                     ELSE 0.0 END AS rate_per_min,
                floor(n_night / (n_events * 1.0) * 1000000000.0 + 0.5)
                  / 1000000000.0 AS night_share
         FROM gm
         JOIN ent ON gm.user_id = ent.user_id
         JOIN night ON gm.user_id = night.user_id
         WHERE n_events >= 10)
       SELECT CAST((CASE WHEN cv < 0.5 THEN 1 ELSE 0 END)
                   + (CASE WHEN rate_per_min > 1.0 THEN 1 ELSE 0 END)
                   + (CASE WHEN entropy < 0.5 THEN 1 ELSE 0 END)
                   + (CASE WHEN night_share > 0.3 THEN 1 ELSE 0 END)
                   AS BIGINT) AS bot_score,
              CAST(count(*) AS BIGINT) AS n_users
       FROM j GROUP BY 1""",
)
def events_bot_score_histogram(spark, sf_dir):
    """Heuristic bot screen (gap regularity, sustained rate, action
    entropy, night share — four flags, score = flags fired) rolled up
    to a score histogram — the traffic-quality gate before
    user-generated text enters a corpus. See
    windows.bot_score_histogram."""
    from ..operators.windows import bot_score_histogram

    view = _view(spark, sf_dir)
    return bot_score_histogram(view.tables["events"])


@register(
    "events_out_of_order",
    f"""WITH us AS (
         SELECT user_id, event_id, {_US} AS u FROM events),
       l AS (
         SELECT greatest(
                  CAST(0 AS BIGINT),
                  CAST(coalesce(
                    max(u) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) - u, 0) AS BIGINT)
                ) AS late_us
         FROM us),
       h AS (
         SELECT CASE WHEN late_us = 0 THEN '0_on_time'
                     WHEN late_us <= 60000000 THEN '1_under_1m'
                     WHEN late_us <= 300000000 THEN '2_under_5m'
                     WHEN late_us <= 3600000000 THEN '3_under_1h'
                     ELSE '4_over_1h' END AS lateness_bucket,
                CAST(count(*) AS BIGINT) AS n_events
         FROM l GROUP BY 1),
       t AS (SELECT sum(n_events) AS tt FROM h)
       SELECT lateness_bucket, n_events,
              floor(n_events / (tt * 1.0) * 1000000.0 + 0.5) / 1000000.0
                AS share
       FROM h, t""",
)
def events_out_of_order(spark, sf_dir):
    """Stream-disorder audit: per-key lateness of each event behind
    the running event-time high-water mark in ARRIVAL (event_id)
    order, bucketed — the measurement that picks a Structured
    Streaming watermark delay. See windows.out_of_order_audit."""
    from ..operators.windows import out_of_order_audit

    view = _view(spark, sf_dir)
    return out_of_order_audit(view.tables["events"])


@register(
    "customer_cohort_ltv",
    """WITH m AS (
         SELECT o_custkey AS cust,
                year(o_orderdate) * 12 + month(o_orderdate) AS mon,
                o_totalprice AS v
         FROM orders),
       first AS (SELECT cust, min(mon) AS cohort_m FROM m GROUP BY 1),
       sizes AS (SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_size
                 FROM first GROUP BY 1),
       aged AS (
         SELECT f.cohort_m, m.mon - f.cohort_m AS age_months, v
         FROM m JOIN first f ON m.cust = f.cust
         WHERE m.mon - f.cohort_m <= 12),
       cell AS (
         SELECT cohort_m, age_months,
                CAST(count(*) AS BIGINT) AS n_orders,
                sum(CAST(v AS DECIMAL(27,4))) AS rev
         FROM aged GROUP BY 1, 2),
       cum AS (
         SELECT cohort_m, age_months, n_orders, rev,
                sum(rev) OVER (PARTITION BY cohort_m ORDER BY age_months
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum_rev
         FROM cell)
       SELECT CAST(cohort_m AS BIGINT) AS cohort_month,
              CAST(age_months AS BIGINT) AS age_months,
              n_orders, cohort_size,
              floor(CAST(rev AS DOUBLE) * 100.0 + 0.5) / 100.0
                AS revenue,
              floor(CAST(cum_rev AS DOUBLE) / cohort_size * 100.0 + 0.5)
                / 100.0 AS cum_ltv_per_customer
       FROM cum JOIN sizes USING (cohort_m)""",
)
def customer_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: cumulative revenue per cohort
    member by month of age since first order — the money companion to
    the retention triangle. See analytics.cohort_ltv_curve."""
    from ..operators.analytics import cohort_ltv_curve

    view = _view(spark, sf_dir)
    return cohort_ltv_curve(view.tables["orders"], max_age_months=12)


@register(
    "events_transition_reciprocity",
    """WITH seq AS (
         SELECT event_type AS f,
                lead(event_type) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id) AS t
         FROM events),
       c AS (
         SELECT f, t, CAST(count(*) AS BIGINT) AS w
         FROM seq WHERE t IS NOT NULL AND f != t GROUP BY 1, 2),
       j AS (
         SELECT a.w, coalesce(b.w, 0) AS wr
         FROM c a LEFT JOIN c b ON a.f = b.t AND a.t = b.f)
       SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
              CAST(sum(w) AS BIGINT) AS total_weight,
              CAST(sum(least(w, wr)) AS BIGINT) AS reciprocated_weight,
              floor(sum(least(w, wr)) / (sum(w) * 1.0)
                    * 1000000.0 + 0.5) / 1000000.0 AS reciprocity
       FROM j""",
)
def events_transition_reciprocity(spark, sf_dir):
    """Weighted reciprocity of the directed event-transition graph
    (self-loops excluded): how much behavioral flow is bidirectional —
    the symmetry audit complementing the SCC decomposition. See
    graph_algos.weighted_reciprocity."""
    from pyspark.sql import Window
    from ..operators.graph_algos import weighted_reciprocity

    view = _view(spark, sf_dir)
    seq = view.tables["events"].select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    )
    counts = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return weighted_reciprocity(counts)


_MEDIA_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "fake_media.parquet",
)

ORACLES["multimodal_ahash_near_dup"] = f"""
WITH media AS (
  SELECT media_id, octet_length(payload) AS n, lower(hex(payload)) AS h
  FROM read_parquet('{_MEDIA_FIXTURE}')
),
pos AS (SELECT media_id, n, h, unnest(range(0, n)) AS i FROM media),
bytes AS (
  SELECT media_id, n,
         (strpos('0123456789abcdef', substr(h, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(h, 2*i + 2, 1)) - 1) AS b
  FROM pos),
bins AS (
  SELECT media_id, any_value(n) AS n, b // 16 AS k, count(*) AS c
  FROM bytes GROUP BY media_id, b // 16),
sig AS (
  SELECT media_id,
         CAST(sum(CASE WHEN 16 * c > n THEN 1 << k ELSE 0 END)
              AS BIGINT) AS h
  FROM bins GROUP BY 1),
bands AS (
  SELECT media_id, h, bb.band,
         CAST(floor(h / power(2, 4 * bb.band)) AS BIGINT) % 16 AS bv
  FROM sig, (SELECT unnest(range(0, 4)) AS band) bb),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         a.h AS hash_a, b.h AS hash_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id)
SELECT id_a, id_b, hash_a, hash_b,
       CAST(bit_count(xor(hash_a, hash_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(hash_a, hash_b)) <= 2
"""


def multimodal_ahash_near_dup(spark, sf_dir):
    """Banded aHash near-duplicate candidates over the committed media
    fixture: byte-histogram signature bits (integer threshold — no
    float shares), nibble-band blocking, exact Hamming verify — the
    image-dedup plumbing with only the codec decode stubbed. See
    multimodal.ahash_near_dup."""
    from ..operators.multimodal import (
        ahash_near_dup,
        extract_features,
        fixture_media_path,
    )

    feats = extract_features(
        spark.read.parquet(fixture_media_path()), fake=True
    )
    return ahash_near_dup(feats)


QUERIES["multimodal_ahash_near_dup"] = multimodal_ahash_near_dup
