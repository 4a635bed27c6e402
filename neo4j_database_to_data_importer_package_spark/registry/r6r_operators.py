"""Round-6 batch 29: streaming histogram-quantile monitor, binary-
quantization retrieval recall, per-year Gini drift, and the
Goh–Barabási gap burstiness coefficient — each an oracle-backed
registry entry per the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    ORACLES,
    QUERIES,
    _dsum,
    _view,
    register,
)


def streaming_value_quantiles(spark, sf_dir):
    """Streaming per-type p50/p90/p99 over a fixed-grid histogram
    sketch (commutative bin-count state) — the always-on percentile
    monitor; final emission equals the batch histogram read-off, so
    the batch SQL oracle is exact. See
    streaming/stateful.streaming_histogram_quantiles."""
    from pyspark.sql import Window

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_histogram_quantiles as op
    from .streaming import _STREAM_SEQ, _replayed_events_stream

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream),
        f"q_stream_histq_{_STREAM_SEQ[0]}",
        output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key", "quantile").orderBy(F.desc("n_events"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("key").alias("event_type"),
            "n_events",
            "quantile",
            "estimate",
        )
    )


QUERIES["streaming_value_quantiles"] = streaming_value_quantiles
ORACLES["streaming_value_quantiles"] = """
WITH m AS (
  SELECT event_type AS key,
         least(CAST(floor(CAST(value AS DOUBLE)) AS BIGINT), 399) AS bin
  FROM events),
h AS (SELECT key, bin, count(*) AS c FROM m GROUP BY 1, 2),
cum AS (
  SELECT key, bin,
         sum(c) OVER (PARTITION BY key ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY key) AS total
  FROM h),
q AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS quantile)
SELECT key AS event_type, CAST(max(total) AS BIGINT) AS n_events,
       quantile, CAST(min(bin) + 1 AS DOUBLE) AS estimate
FROM cum JOIN q ON cum >= quantile * total
GROUP BY key, quantile
"""


@register(
    "embedding_binary_recall",
    """WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       sig AS (
         SELECT vec_id,
                CAST(list_sum(list_transform(range(0, 32),
                  i -> CASE WHEN v[i+1] > 0 THEN 1 << i ELSE 0 END))
                  AS BIGINT) AS w1,
                CAST(list_sum(list_transform(range(32, 64),
                  i -> CASE WHEN v[i+1] > 0 THEN 1 << (i - 32) ELSE 0 END))
                  AS BIGINT) AS w2
         FROM n),
       q AS (SELECT vec_id AS query_id, w1 AS q1, w2 AS q2 FROM sig
             WHERE vec_id < 10),
       ham AS (
         SELECT query_id, s.vec_id AS neighbor_id,
                bit_count(xor(q1, s.w1)) + bit_count(xor(q2, s.w2))
                  AS hamming
         FROM q JOIN sig s ON s.vec_id != q.query_id),
       approx AS (
         SELECT query_id, neighbor_id FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY hamming, neighbor_id) AS rn
           FROM ham) WHERE rn <= 10),
       nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
       qq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM nn
              WHERE vec_id < 10),
       ex AS (
         SELECT query_id, neighbor_id FROM (
           SELECT qq.query_id, nn.vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY qq.query_id
                    ORDER BY floor(list_dot_product(qv, v) / (qn * nrm)
                             * 1000000.0 + 0.5) / 1000000.0 DESC,
                             nn.vec_id) AS rn
           FROM qq JOIN nn ON nn.vec_id != qq.query_id) WHERE rn <= 10),
       ov AS (SELECT a.query_id, count(*) AS n_overlap
              FROM approx a JOIN ex USING (query_id, neighbor_id)
              GROUP BY 1)
       SELECT q.query_id,
              CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
              floor(coalesce(n_overlap, 0) / 10.0 * 1000000.0 + 0.5)
                / 1000000.0 AS recall_at_k
       FROM q LEFT JOIN ov USING (query_id)""",
)
def embedding_binary_recall(spark, sf_dir):
    """Recall@10 of sign-bit (binary-quantized) Hamming retrieval vs
    the exact cosine top-10 — the 32×-memory-cut audit. See
    similarity.binary_quantization_recall."""
    from ..operators.similarity import binary_quantization_recall

    view = _view(spark, sf_dir)
    return binary_quantization_recall(view.tables["embeddings"])


@register(
    "orders_gini_by_year",
    f"""WITH j AS (
         SELECT strftime(o_orderdate, '%Y') AS year, n_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey),
       per AS (SELECT year, n_name, {_dsum("o_totalprice", 4)} AS v
               FROM j GROUP BY 1, 2),
       ranked AS (
         SELECT year, v,
                row_number() OVER (PARTITION BY year
                                   ORDER BY v ASC, n_name) AS i
         FROM per)
       SELECT year, count(*) AS n_groups,
              floor(((2.0 * sum(i * v)) / (count(*) * sum(v))
                     - (count(*) + 1.0) / count(*)) * 1000000.0 + 0.5)
                / 1000000.0 AS gini
       FROM ranked GROUP BY year""",
)
def orders_gini_by_year(spark, sf_dir):
    """Per-year Gini of revenue concentration across nations — the
    inequality-drift trend a single all-time Gini hides. See
    statistics.gini_by_group."""
    from ..operators.statistics import gini_by_group

    view = _view(spark, sf_dir)
    j = (
        view.tables["orders"]
        .join(
            view.tables["customer"],
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            view.tables["nation"],
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.date_format("o_orderdate", "yyyy").alias("year"),
            "n_name",
            "o_totalprice",
        )
    )
    return gini_by_group(j, "year", "n_name", "o_totalprice")


@register(
    "events_gap_burstiness",
    """WITH g AS (
         SELECT event_type AS key,
                date_diff('microsecond',
                          lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id),
                          ts) AS gap_us
         FROM events),
       s AS (SELECT key, gap_us // 1000000 AS gv FROM g
             WHERE gap_us IS NOT NULL),
       m AS (SELECT key, count(*) AS n_gaps,
                    CAST(sum(gv) AS BIGINT) AS s1,
                    CAST(sum(gv * gv) AS BIGINT) AS s2
             FROM s GROUP BY 1)
       SELECT key AS event_type, n_gaps,
              floor(s1 / CAST(n_gaps AS DOUBLE) * 100.0 + 0.5) / 100.0
                AS mean_gap_s,
              floor(((sqrt((s2 - s1 * (s1 / CAST(n_gaps AS DOUBLE)))
                           / (n_gaps - 1))
                      - s1 / CAST(n_gaps AS DOUBLE))
                     / (sqrt((s2 - s1 * (s1 / CAST(n_gaps AS DOUBLE)))
                             / (n_gaps - 1))
                        + s1 / CAST(n_gaps AS DOUBLE)))
                    * 1000000.0 + 0.5) / 1000000.0 AS burstiness
       FROM m""",
)
def events_gap_burstiness(spark, sf_dir):
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of inter-event gaps per
    type (periodic −1, Poisson 0, bursty → 1). See
    statistics.gap_burstiness."""
    from ..operators.statistics import gap_burstiness

    view = _view(spark, sf_dir)
    return gap_burstiness(view.tables["events"])
