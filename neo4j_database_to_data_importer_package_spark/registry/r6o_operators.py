"""Round-6 batch 26: Markov stationary distribution, the
incremental-rollup (IVM) consistency audit, the OOD
centroid-distance histogram, and node2vec second-order transition
mass — each an oracle-backed registry entry per the standing gate
discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    _view,
    register,
)


def _pi_round(i: int) -> str:
    prev = f"pi{i - 1}"
    return f"""pi{i} AS (
         SELECT st.s,
                floor(coalesce(sum({prev}.pi * p.prob), 0)
                      * 1000000000.0 + 0.5) / 1000000000.0 AS pi
         FROM states st
         LEFT JOIN p ON p.b = st.s
         LEFT JOIN {prev} ON {prev}.s = p.a
         GROUP BY st.s)"""


@register(
    "events_markov_stationary",
    """WITH seq AS (
         SELECT user_id, event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS to_type
         FROM events),
       c AS (SELECT from_type, to_type, count(*) AS n
             FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
             FROM c GROUP BY 1),
       p AS (SELECT c.from_type AS a, c.to_type AS b,
                    c.n / CAST(t.tot AS DOUBLE) AS prob
             FROM c JOIN t USING (from_type)),
       states AS (SELECT DISTINCT a AS s FROM p
                  UNION SELECT DISTINCT b FROM p),
       ns AS (SELECT count(*) AS k FROM states),
       pi0 AS (SELECT s, floor(1.0 / k * 1000000000.0 + 0.5)
                         / 1000000000.0 AS pi
               FROM states, ns),
       """
    + ",\n       ".join(_pi_round(i) for i in range(1, 9))
    + """
       SELECT st.s AS event_type,
              floor(pi8.pi * 1000000.0 + 0.5) / 1000000.0
                AS stationary_prob,
              CAST(coalesce(t.tot, 0) AS BIGINT) AS n_out
       FROM states st
       JOIN pi8 ON pi8.s = st.s
       LEFT JOIN t ON t.from_type = st.s""",
)
def events_markov_stationary(spark, sf_dir):
    """Long-run state occupancy of the behavioral Markov chain: 8
    power iterations over the bounded |types|² transition matrix,
    replayed exactly by an unrolled SQL recurrence. See
    windows.markov_stationary_distribution."""
    from ..operators.windows import markov_stationary_distribution

    view = _view(spark, sf_dir)
    return markov_stationary_distribution(view.tables["events"], iterations=8)


@register(
    "source_rollup_ivm_check",
    """WITH old AS (
         SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS ch
         FROM documents WHERE doc_id < 250 GROUP BY 1),
       delta AS (
         SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS ch
         FROM documents WHERE doc_id >= 250 GROUP BY 1),
       merged AS (
         SELECT source, CAST(sum(n) AS BIGINT) AS n_docs_ivm,
                CAST(sum(ch) AS BIGINT) AS chars_ivm
         FROM (SELECT * FROM old UNION ALL SELECT * FROM delta)
         GROUP BY 1),
       fullr AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs_full,
                CAST(sum(n_chars) AS BIGINT) AS chars_full
         FROM documents GROUP BY 1)
       SELECT f.source, n_docs_full, n_docs_ivm, chars_full, chars_ivm,
              CAST(CASE WHEN n_docs_full = n_docs_ivm
                         AND chars_full = chars_ivm
                   THEN 1 ELSE 0 END AS INT) AS consistent
       FROM fullr f JOIN merged m ON f.source = m.source""",
)
def source_rollup_ivm_check(spark, sf_dir):
    """Incremental-view-maintenance audit: snapshot rollup + delta
    rollup merged (O(delta) state union) vs a full recompute, exact
    integer equality per source. See profiling.incremental_rollup_check."""
    from ..operators.profiling import incremental_rollup_check

    view = _view(spark, sf_dir)
    return incremental_rollup_check(view.tables["documents"], split_id=250)


@register(
    "embedding_ood_histogram",
    """WITH base AS (
         SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       cents AS (SELECT vec_id AS cell, v AS cv FROM base
                 WHERE vec_id < 16),
       scored AS (
         SELECT b.vec_id,
                min(floor(list_sum(list_transform(
                      list_zip(b.v, c.cv),
                      x -> (x[1] - x[2]) * (x[1] - x[2])))
                    * 1000000000.0 + 0.5) / 1000000000.0) AS min_d2
         FROM base b CROSS JOIN cents c
         GROUP BY b.vec_id),
       binned AS (
         SELECT CAST(least(floor(min_d2 / 0.1), 19) AS INT) AS bin,
                min_d2
         FROM scored)
       SELECT bin, count(*) AS n_vectors,
              floor(CAST(sum(CAST(min_d2 AS DECIMAL(28,9))) AS DOUBLE)
                    / count(*) * 1000000.0 + 0.5) / 1000000.0
                AS mean_min_d2
       FROM binned GROUP BY bin""",
)
def embedding_ood_histogram(spark, sf_dir):
    """Nearest-IVF-centroid squared-distance histogram — the
    out-of-distribution quarantine screen. See
    similarity.ood_centroid_distance_histogram."""
    from ..operators.similarity import ood_centroid_distance_histogram

    view = _view(spark, sf_dir)
    return ood_centroid_distance_histogram(view.tables["embeddings"])


@register(
    "graph_node2vec_weights",
    """WITH e AS (
         SELECT 'O' || l_orderkey AS a, 'P' || l_partkey AS b
         FROM lineitem WHERE year(l_shipdate) = 1998
         UNION ALL
         SELECT 'O' || l_orderkey, 'S' || l_suppkey
         FROM lineitem WHERE year(l_shipdate) = 1998
         UNION ALL
         SELECT 'P' || l_partkey, 'S' || l_suppkey
         FROM lineitem WHERE year(l_shipdate) = 1998),
       und AS (
         SELECT DISTINCT a, b FROM (
           SELECT a, b FROM e UNION ALL SELECT b, a FROM e)
         WHERE a != b),
       pairs AS (
         SELECT a AS prev, b AS cur FROM und
         ORDER BY md5(a || '|' || b) ASC LIMIT 50),
       nbrs AS (
         SELECT p.prev, p.cur, u.b AS w
         FROM pairs p JOIN und u ON u.a = p.cur),
       classed AS (
         SELECT prev, cur, w,
                CASE WHEN w = prev THEN 'return'
                     WHEN EXISTS (SELECT 1 FROM und u2
                                  WHERE u2.a = nbrs.prev AND u2.b = nbrs.w)
                     THEN 'common'
                     ELSE 'far' END AS cls
         FROM nbrs),
       per_class AS (
         SELECT prev, cur, cls, count(*) AS n_nbrs,
                CAST(sum(CASE cls WHEN 'return' THEN 1
                                  WHEN 'common' THEN 2
                                  ELSE 4 END) AS BIGINT) AS num
         FROM classed GROUP BY 1, 2, 3),
       tot AS (SELECT prev, cur, CAST(sum(num) AS BIGINT) AS t
               FROM per_class GROUP BY 1, 2)
       SELECT p.prev, p.cur, p.cls AS nbr_class, p.n_nbrs,
              floor(p.num / CAST(t.t AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS prob_mass
       FROM per_class p JOIN tot t ON p.prev = t.prev AND p.cur = t.cur""",
)
def graph_node2vec_weights(spark, sf_dir):
    """node2vec second-order transition mass (p = 2, q = ½ as exact
    doubled-integer weights 1:2:4) for a constant md5-sampled set of
    directed edges of the one-ship-year graph. See
    graph_algos.node2vec_transition_weights."""
    from ..operators.graph_algos import node2vec_transition_weights
    from .r6_operators import _shipyear_graph

    return node2vec_transition_weights(
        _shipyear_graph(_view(spark, sf_dir)), n_pairs=50
    )
