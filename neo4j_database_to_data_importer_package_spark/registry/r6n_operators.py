"""Round-6 batch 25: streaming dispersion monitor, sampled effective
diameter, quality margin sampling, and the CUPED variance-reduced
experiment readout — each an oracle-backed registry entry per the
standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    ORACLES,
    QUERIES,
    _view,
    register,
)


def streaming_dispersion_index(spark, sf_dir):
    """Streaming twin of ``events_dispersion_index``: per-type daily
    counts as commutative map state (applyInPandasWithState), VMR
    emitted per micro-batch; the final emission equals the batch
    computation under any replay schedule, so the batch oracle is
    exact. See streaming/stateful.streaming_dispersion_monitor."""
    from pyspark.sql import Window

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_dispersion_monitor as op
    from .streaming import _STREAM_SEQ, _replayed_events_stream

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream),
        f"q_stream_dispersion_{_STREAM_SEQ[0]}",
        output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_obs"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("key").alias("event_type"),
            "n_days",
            "mean_daily",
            "var_daily",
            "vmr",
            "chi2",
        )
    )


QUERIES["streaming_dispersion_index"] = streaming_dispersion_index
ORACLES["streaming_dispersion_index"] = ORACLES["events_dispersion_index"]


@register(
    "graph_effective_diameter",
    """WITH e AS (
         SELECT 'C' || c_custkey AS a, 'N' || c_nationkey AS b FROM customer
         UNION ALL
         SELECT 'S' || s_suppkey AS a, 'N' || s_nationkey AS b FROM supplier
         UNION ALL
         SELECT 'N' || n_nationkey AS a, 'R' || n_regionkey AS b FROM nation),
       und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
       seeds AS (SELECT DISTINCT 'N' || n_nationkey AS node FROM nation),
       reach AS (
         WITH RECURSIVE r(seed, node, dist) AS (
           SELECT node, node, 0 FROM seeds
           UNION
           SELECT r.seed, u.b, r.dist + 1 FROM r JOIN und u ON u.a = r.node
           WHERE r.dist < 4)
         SELECT seed, node, min(dist) AS dist FROM r GROUP BY 1, 2),
       hist AS (SELECT dist, count(*) AS n_pairs FROM reach
                WHERE dist > 0 GROUP BY 1),
       cum AS (SELECT dist, n_pairs,
                      CAST(sum(n_pairs) OVER (ORDER BY dist
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
               FROM hist),
       tot AS (SELECT max(cum) AS total FROM cum),
       eff AS (SELECT min(dist) AS eff_diameter FROM cum, tot
               WHERE cum * 10 >= 9 * total)
       SELECT dist, n_pairs,
              floor(cum / CAST(total AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS cum_share,
              eff_diameter
       FROM cum, tot, eff""",
)
def graph_effective_diameter(spark, sf_dir):
    """90%-effective diameter + hop histogram of the FK graph from the
    nation landmark set (exact integer quantile cut). See
    graph_algos.effective_diameter_sampled."""
    from ..operators.graph_algos import effective_diameter_sampled

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("dst"),
    )
    supp = view.tables["supplier"].select(
        F.concat(F.lit("S"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey")).alias("dst"),
    )
    nat = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("dst"),
    )
    seeds = view.tables["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("node")
    )
    edges = cust.unionByName(supp).unionByName(nat)
    return effective_diameter_sampled(edges, seeds, max_hops=4, q_tenths=9)


@register(
    "quality_margin_sample",
    f"""WITH q AS ({{quality}})
       SELECT doc_id, quality,
              floor(abs(quality - 0.5) * 1000000000.0 + 0.5)
                / 1000000000.0 AS margin
       FROM q
       ORDER BY margin ASC, doc_id ASC LIMIT 50""".format(
        quality=ORACLES["text_quality_score"]
    ),
)
def quality_margin_sample(spark, sf_dir):
    """Uncertainty (margin) sampling for curation: the 50 documents
    closest to the quality-filter threshold 0.5 — the active-learning
    batch selection. See text_analysis.quality_margin_sample."""
    from ..operators.text_analysis import quality_margin_sample as op

    view = _view(spark, sf_dir)
    return op(view.tables["documents"], threshold=0.5, k=50)


@register(
    "events_cuped_lift",
    """WITH pu AS (
         SELECT user_id AS u,
                CAST(sum(CASE WHEN strftime(ts, '%Y-%m-%d') < '2024-01-16'
                     THEN CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5)
                          AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
                CAST(sum(CASE WHEN strftime(ts, '%Y-%m-%d') >= '2024-01-16'
                     THEN CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5)
                          AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
                CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                           1, 8))::BIGINT % 2 = 0
                     THEN 'A' ELSE 'B' END AS variant
         FROM events GROUP BY user_id),
       g AS (
         SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y * y) AS BIGINT) AS syy
         FROM pu),
       arms AS (
         SELECT variant, count(*) AS n_users,
                CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay
         FROM pu GROUP BY 1),
       calc AS (
         SELECT variant, n_users,
                ay / CAST(n_users AS DOUBLE) AS mean_y,
                ax / CAST(n_users AS DOUBLE) AS mean_x,
                sx / CAST(n AS DOUBLE) AS mx,
                (sxy / CAST(n AS DOUBLE)
                 - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                  / (sxx / CAST(n AS DOUBLE)
                     - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
                  AS theta,
                ((sxy / CAST(n AS DOUBLE)
                  - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                 * (sxy / CAST(n AS DOUBLE)
                    - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))))
                  / ((sxx / CAST(n AS DOUBLE)
                      - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
                     * (syy / CAST(n AS DOUBLE)
                        - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))))
                  AS rho2
         FROM arms, g),
       pv AS (
         SELECT variant, n_users,
                floor(mean_y / 1000 * 1000000.0 + 0.5) / 1000000.0
                  AS mean_post,
                floor((mean_y - theta * (mean_x - mx)) / 1000
                      * 1000000.0 + 0.5) / 1000000.0 AS mean_adjusted,
                floor(theta * 1000000.0 + 0.5) / 1000000.0 AS theta,
                floor(rho2 * 1000000.0 + 0.5) / 1000000.0 AS rho2
         FROM calc),
       lifts AS (
         SELECT sum(CASE WHEN variant = 'A' THEN mean_post
                         ELSE -mean_post END) AS lift_raw,
                sum(CASE WHEN variant = 'A' THEN mean_adjusted
                         ELSE -mean_adjusted END) AS lift_cuped
         FROM pv)
       SELECT variant, n_users, mean_post, mean_adjusted, theta, rho2,
              floor(lift_raw * 1000000.0 + 0.5) / 1000000.0 AS lift_raw,
              floor(lift_cuped * 1000000.0 + 0.5) / 1000000.0 AS lift_cuped
       FROM pv, lifts""",
)
def events_cuped_lift(spark, sf_dir):
    """CUPED variance-reduced A/B readout over the events stream
    (pre-period Jan 1–15 as the covariate, md5-parity arms). See
    statistics.cuped_adjusted_lift."""
    from ..operators.statistics import cuped_adjusted_lift

    view = _view(spark, sf_dir)
    return cuped_adjusted_lift(view.tables["events"])
