"""Round-6 additions: graph community quality (modularity, bridge
edges), distribution statistics (Gini, winsorized moments, KS drift,
chi-square, mutual information, deterministic bootstrap), semantic
dedup (SemDeDup pruning, k-NN label agreement, TF-IDF cosine pairs),
and the contribute-forward EWMA trend — each an oracle-backed registry
entry per the standing gate discipline (COVERAGE.md)."""

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
from .r4_operators import _LPA_ROUND


def _shipyear_graph(view):
    """The one-ship-year order/part/supplier co-occurrence graph shared
    with graph_label_propagation."""
    li = view.tables["lineitem"].filter(F.year("l_shipdate") == 1998)
    return (
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


_SHIPYEAR_E_DUCK = """e AS (
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
         WHERE a != b)"""


@register(
    "graph_modularity_lpa",
    f"""WITH {_SHIPYEAR_E_DUCK},
       lab0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
       r1 AS ({_LPA_ROUND.format(prev='lab0')}),
       r2 AS ({_LPA_ROUND.format(prev='r1')}),
       r3 AS ({_LPA_ROUND.format(prev='r2')}),
       hyd AS (
         SELECT la.label AS la, lb.label AS lb
         FROM und u
         JOIN r3 la ON u.a = la.node
         JOIN r3 lb ON u.b = lb.node),
       per_c AS (
         SELECT la AS community, count(*) AS d_c,
                sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS e2_c
         FROM hyd GROUP BY 1),
       agg AS (
         SELECT count(*) AS n_communities,
                CAST(sum(d_c) AS BIGINT) AS rows2,
                CAST(sum(e2_c) AS BIGINT) AS e2,
                CAST(sum(d_c * d_c) AS BIGINT) AS sd2
         FROM per_c)
       SELECT CAST(n_communities AS BIGINT) AS n_communities,
              CAST(rows2 / 2 AS BIGINT) AS n_edges,
              floor((e2 / (2.0 * (rows2 / 2.0))
                     - sd2 / (4.0 * (rows2 / 2.0) * (rows2 / 2.0)))
                    * 1000000.0 + 0.5) / 1000000.0 AS modularity
       FROM agg""",
)
def graph_modularity_lpa(spark, sf_dir):
    """Newman modularity Q of the 3-round LPA communities over the
    one-ship-year co-occurrence graph — turns the community table into
    one comparable score; all aggregates integer-exact so Q is
    bit-deterministic. See graph_algos.modularity."""
    from ..operators.graph_algos import label_propagation, modularity

    e = _shipyear_graph(_view(spark, sf_dir))
    labels = label_propagation(e, rounds=3)
    # r14: LPA's output is eagerly checkpointed, so counting it here is a
    # cheap local scan — the driver-known node count lets modularity
    # broadcast its two node-sized label hydration joins when small.
    return modularity(e, labels, n_state_hint=labels.count())


@register(
    "graph_bridge_edges",
    f"""WITH {_SHIPYEAR_E_DUCK},
       canon AS (SELECT a, b FROM und WHERE a < b),
       deg AS (SELECT a AS c, count(*) AS d FROM und GROUP BY 1),
       keepc AS (SELECT c FROM deg WHERE d <= 200),
       adj AS (
         SELECT und.b AS c, und.a AS n FROM und JOIN keepc ON und.b = keepc.c),
       wedges AS (
         SELECT na.n AS a, nb.n AS b, count(*) AS n_common
         FROM adj na JOIN adj nb ON na.c = nb.c AND na.n < nb.n
         GROUP BY 1, 2)
       SELECT canon.a AS node_a, canon.b AS node_b,
              CAST(coalesce(w.n_common, 0) AS BIGINT) AS n_common,
              coalesce(w.n_common, 0) = 0 AS is_bridge
       FROM canon LEFT JOIN wedges w ON canon.a = w.a AND canon.b = w.b""",
)
def graph_bridge_edges(spark, sf_dir):
    """Local-bridge detection (edge embeddedness up to hubs): edges of
    the one-ship-year graph with their low-degree common-neighbor count
    (0 = bridge); wedge centers above the degree cap are excluded with
    a logged count — Σdeg(center)² has no orientation trick, so the cap
    IS the scale path. See graph_algos.bridge_edges."""
    from ..operators.graph_algos import bridge_edges

    return bridge_edges(_shipyear_graph(_view(spark, sf_dir)))


@register(
    "source_gini_concentration",
    """WITH per_key AS (
         SELECT source,
                CAST(sum(CAST(n_chars AS DECIMAL(27,4))) AS DOUBLE) AS v
         FROM documents GROUP BY 1),
       ranked AS (
         SELECT v, row_number() OVER (ORDER BY v ASC, source) AS i
         FROM per_key)
       SELECT CAST(count(*) AS BIGINT) AS n_groups,
              floor(((2.0 * sum(i * v)) / (count(*) * sum(v))
                     - (count(*) + 1.0) / count(*)) * 1000000.0 + 0.5)
                / 1000000.0 AS gini
       FROM ranked""",
)
def source_gini_concentration(spark, sf_dir):
    """Gini coefficient of character-mass concentration across document
    sources — the one-number "is 90% of the corpus one crawl" audit;
    the ranking window runs over the bounded per-source aggregate. See
    statistics.gini_concentration."""
    from ..operators.statistics import gini_concentration

    view = _view(spark, sf_dir)
    return gini_concentration(view.tables["documents"], "source", "n_chars")


@register(
    "events_winsorized_stats",
    """WITH slim AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
       q AS (
         SELECT event_type,
                quantile_cont(v, 0.05) AS qlo, quantile_cont(v, 0.95) AS qhi
         FROM slim GROUP BY 1),
       clamped AS (
         SELECT s.event_type,
                greatest(least(s.v, q.qhi), q.qlo) AS w
         FROM slim s JOIN q USING (event_type))
       SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              floor(CAST(sum(CAST(w AS DECIMAL(27,4))) AS DOUBLE) / count(*)
                    * 1000000.0 + 0.5) / 1000000.0 AS winsorized_mean,
              floor(min(w) * 1000000.0 + 0.5) / 1000000.0 AS winsorized_min,
              floor(max(w) * 1000000.0 + 0.5) / 1000000.0 AS winsorized_max
       FROM clamped GROUP BY 1""",
)
def events_winsorized_stats(spark, sf_dir):
    """Per-event-type winsorized mean (values clamped to the [5%, 95%]
    quantiles) — the robust location estimate for fat-tailed value
    columns; exact per-group quantiles broadcast back for the clamp
    pass. See statistics.winsorized_stats."""
    from ..operators.statistics import winsorized_stats

    view = _view(spark, sf_dir)
    return winsorized_stats(view.tables["events"], "event_type", "value")


@register(
    "doc_length_ks_drift",
    """WITH sided AS (
         SELECT CAST(n_chars AS DOUBLE) AS v,
                CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ('0','1','2','3','4','5','6','7')
                     THEN 'a' ELSE 'b' END AS side
         FROM documents),
       counts AS (
         SELECT v,
                sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS na,
                sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS nb
         FROM sided GROUP BY 1),
       tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
                      CAST(sum(nb) AS BIGINT) AS n_b FROM counts),
       cum AS (
         SELECT v,
                sum(na) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                sum(nb) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
         FROM counts)
       SELECT t.n_a, t.n_b,
              floor(max(abs(ca * 1.0 / t.n_a - cb * 1.0 / t.n_b))
                    * 1000000.0 + 0.5) / 1000000.0 AS ks_stat
       FROM cum, tot t GROUP BY t.n_a, t.n_b""",
)
def doc_length_ks_drift(spark, sf_dir):
    """Two-sample KS statistic between the doc-length distributions of
    an md5-hash 50/50 split — the non-parametric drift screen next to
    PSI; ECDFs are exact integer-count ratios over the bounded
    distinct-length table. See statistics.ks_drift."""
    from ..operators.statistics import ks_drift

    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    split = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        *"01234567"
    )
    return ks_drift(docs, "n_chars", split)


@register(
    "source_lang_chi2",
    """WITH obs AS (
         SELECT source AS r, lang AS c, count(*) AS o
         FROM documents GROUP BY 1, 2),
       rm AS (SELECT r, sum(o) AS nr FROM obs GROUP BY 1),
       cm AS (SELECT c, sum(o) AS nc FROM obs GROUP BY 1),
       tot AS (SELECT sum(o) AS n FROM obs),
       grid AS (
         SELECT rm.r, cm.c, rm.nr, cm.nc, t.n,
                coalesce(obs.o, 0) AS o,
                rm.nr * cm.nc * 1.0 / t.n AS e
         FROM rm CROSS JOIN cm CROSS JOIN tot t
         LEFT JOIN obs ON obs.r = rm.r AND obs.c = cm.c)
       SELECT r, c, CAST(o AS BIGINT) AS o,
              floor(e * 1000000.0 + 0.5) / 1000000.0 AS expected,
              floor(pow(o - e, 2) / e * 1000000.0 + 0.5) / 1000000.0
                AS chi2_cell
       FROM grid""",
)
def source_lang_chi2(spark, sf_dir):
    """Chi-square contingency audit between source and language: per
    dense-grid cell the observed vs expected count and χ² contribution
    — the "is my mixture confounded" screen. See
    statistics.chi2_association."""
    from ..operators.statistics import chi2_association

    view = _view(spark, sf_dir)
    return chi2_association(view.tables["documents"], "source", "lang")


@register(
    "source_lang_mutual_information",
    """WITH obs AS (
         SELECT source AS r, lang AS c, count(*) AS o
         FROM documents GROUP BY 1, 2),
       rm AS (SELECT r, sum(o) AS nr FROM obs GROUP BY 1),
       cm AS (SELECT c, sum(o) AS nc FROM obs GROUP BY 1),
       tot AS (SELECT sum(o) AS n FROM obs)
       SELECT CAST(count(*) AS BIGINT) AS n_cells,
              floor(sum((o * 1.0 / t.n)
                        * ln(o * 1.0 * t.n / (rm.nr * 1.0 * cm.nc)))
                    * 1000000.0 + 0.5) / 1000000.0 AS mutual_information
       FROM obs JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot t
       GROUP BY ()""",
)
def source_lang_mutual_information(spark, sf_dir):
    """Mutual information (nats) between source and language over the
    bounded contingency grid — does domain predict language in this
    corpus. See statistics.mutual_information."""
    from ..operators.statistics import mutual_information

    view = _view(spark, sf_dir)
    return mutual_information(view.tables["documents"], "source", "lang")


@register(
    "doc_length_bootstrap_ci",
    """WITH fan AS (
         SELECT b.b, CAST(n_chars AS DOUBLE) AS v,
                CAST(n_chars AS VARCHAR) AS k
         FROM documents CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b),
       mults AS (
         SELECT b, v,
                (CASE WHEN substr(md5(b || '|' || k || '|' || 0), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END
               + CASE WHEN substr(md5(b || '|' || k || '|' || 1), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END
               + CASE WHEN substr(md5(b || '|' || k || '|' || 2), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END
               + CASE WHEN substr(md5(b || '|' || k || '|' || 3), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END) AS m
         FROM fan),
       rep AS (
         SELECT b,
                CAST(sum(CAST(v * m AS DECIMAL(27,6))) AS DOUBLE)
                  / sum(m) AS mean_b
         FROM mults GROUP BY 1)
       SELECT CAST(count(*) AS BIGINT) AS n_boot,
              floor(quantile_cont(mean_b, 0.05) * 1000000.0 + 0.5)
                / 1000000.0 AS ci_lo,
              floor(quantile_cont(mean_b, 0.5) * 1000000.0 + 0.5)
                / 1000000.0 AS ci_mid,
              floor(quantile_cont(mean_b, 0.95) * 1000000.0 + 0.5)
                / 1000000.0 AS ci_hi
       FROM rep""",
)
def doc_length_bootstrap_ci(spark, sf_dir):
    """Deterministic (md5-Poisson) bootstrap 90% CI for the corpus mean
    document length — the uncertainty band a dataset card should attach
    to its point estimates; 32 replicates via an exact Binomial(4,1/4)
    multiplicity fan-out. See statistics.bootstrap_mean_ci."""
    from ..operators.statistics import bootstrap_mean_ci

    view = _view(spark, sf_dir)
    return bootstrap_mean_ci(view.tables["documents"], "n_chars")


_COS_R6 = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * "
    "sqrt(list_dot_product({b}, {b})))"
)


@register(
    "embedding_semdedup_prune",
    f"""WITH v AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS norm
         FROM embeddings),
       cents AS (SELECT vec_id AS cell, v AS cv, norm AS cn FROM v WHERE vec_id < 16),
       assigned AS (
         SELECT vec_id, v, norm, cell FROM (
           SELECT a.vec_id, a.v, a.norm, c.cell,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                             c.cell) AS r
           FROM v a CROSS JOIN cents c) t WHERE r = 1),
       pairs AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                floor(list_dot_product(a.v, b.v) / (a.norm * b.norm)
                      * 1000000.0 + 0.5) / 1000000.0 AS cosine
         FROM assigned a JOIN assigned b
           ON a.cell = b.cell AND a.vec_id < b.vec_id),
       hits AS (SELECT * FROM pairs WHERE cosine >= 0.45)
       SELECT id_b AS pruned_id,
              min(id_a) AS kept_id,
              arg_min(cosine, id_a) AS cosine
       FROM hits GROUP BY 1""",
)
def embedding_semdedup_prune(spark, sf_dir):
    """SemDeDup semantic pruning: vectors with a smaller-id near-twin
    (cosine above threshold) in their IVF cell are pruned (survivor =
    min twin) — the embedding-space dedup that catches paraphrases
    shingle methods miss; the quadratic step is within-cell only
    (SemDeDup's own scale contract). The operator default is the
    paper's 0.95; the registered query uses 0.45 because the synthetic
    embeddings are near-orthogonal (max within-cell cosine ≈ 0.49) and
    a 0-row gate query proves nothing. See similarity.semdedup_prune."""
    from ..operators.similarity import semdedup_prune

    view = _view(spark, sf_dir)
    return semdedup_prune(view.tables["embeddings"], threshold=0.45)


@register(
    "embedding_knn_label_agreement",
    """WITH v AS (
         SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS norm
         FROM embeddings),
       q AS (SELECT * FROM v WHERE vec_id < 100),
       scored AS (
         SELECT q.vec_id AS query_id, q.label AS ql,
                c.vec_id AS neighbor_id, c.label AS nl,
                floor(list_dot_product(q.v, c.v) / (q.norm * c.norm)
                      * 1000000.0 + 0.5) / 1000000.0 AS cosine
         FROM q JOIN v c ON q.vec_id != c.vec_id),
       topk AS (
         SELECT query_id, ql, nl FROM (
           SELECT query_id, ql, nl,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rnk
           FROM scored) t WHERE rnk <= 10),
       per_q AS (
         SELECT query_id, ql,
                sum(CASE WHEN ql = nl THEN 1 ELSE 0 END) * 1.0 / count(*) AS agree
         FROM topk GROUP BY 1, 2)
       SELECT ql AS label, CAST(count(*) AS BIGINT) AS n_queries,
              floor(avg(agree) * 1000000.0 + 0.5) / 1000000.0
                AS mean_agreement
       FROM per_q GROUP BY 1""",
)
def embedding_knn_label_agreement(spark, sf_dir):
    """k-NN label agreement per label (k=10, first 100 queries): the
    label-noise / class-separability probe — what fraction of each
    query's exact nearest neighbors share its label. See
    similarity.knn_label_agreement."""
    from ..operators.similarity import knn_label_agreement

    view = _view(spark, sf_dir)
    return knn_label_agreement(view.tables["embeddings"])


@register(
    "dedup_tfidf_cosine_pairs",
    """WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '), x -> x != ''))
                  AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
       nd AS (SELECT count(*) AS n_docs FROM documents),
       w AS (
         SELECT tf.doc_id, tf.term,
                floor(tf.tf * (ln((nd.n_docs + 1.0) / (df.doc_freq + 1.0)) + 1.0)
                      * 1000000000.0 + 0.5) / 1000000000.0 AS w
         FROM tf JOIN df USING (term) CROSS JOIN nd
         WHERE df.doc_freq <= 50),
       norms AS (
         SELECT doc_id,
                sqrt(CAST(sum(CAST(w * w AS DECIMAL(27,18))) AS DOUBLE)) AS nrm
         FROM w GROUP BY 1),
       dots AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(sum(CAST(a.w * b.w AS DECIMAL(27,18))) AS DOUBLE) AS dot
         FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT id_a, id_b,
              floor(dot / (na.nrm * nb.nrm) * 1000000.0 + 0.5) / 1000000.0
                AS tfidf_cosine
       FROM dots
       JOIN norms na ON na.doc_id = id_a
       JOIN norms nb ON nb.doc_id = id_b
       WHERE floor(dot / (na.nrm * nb.nrm) * 1000000.0 + 0.5) / 1000000.0
               >= 0.3""",
)
def dedup_tfidf_cosine_pairs(spark, sf_dir):
    """TF-IDF-weighted cosine near-dup pairs over the term inverted
    index (df ≤ 50 cap active, logged) — the weighted complement to
    shingle Jaccard; decimal-exact dots/norms keep the score
    partition-independent. See retrieval.tfidf_cosine_pairs."""
    from ..operators.retrieval import tfidf_cosine_pairs

    view = _view(spark, sf_dir)
    return tfidf_cosine_pairs(view.tables["documents"])


@register(
    "events_ewma_daily",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(27,6)))
                     AS DOUBLE) / count(*) AS x
         FROM events GROUP BY 1, 2),
       fan AS (
         SELECT d.event_type, d.day, d.x,
                d.day + CAST(o.o AS INTEGER) AS obs_day
         FROM daily d CROSS JOIN (SELECT unnest(range(0, 14)) AS o) o),
       real AS (
         SELECT f.event_type, f.day, f.x, f.obs_day
         FROM fan f JOIN daily r
           ON r.event_type = f.event_type AND r.day = f.obs_day),
       wgt AS (
         SELECT event_type, obs_day,
                floor(pow(0.7, date_diff('day', day, obs_day))
                      * 1000000000.0 + 0.5) / 1000000000.0 AS w,
                x
         FROM real),
       contrib AS (
         SELECT event_type, obs_day, w,
                floor(x * w * 1000000000.0 + 0.5) / 1000000000.0 AS c
         FROM wgt)
       SELECT event_type, obs_day AS day,
              CAST(count(*) AS BIGINT) AS n_days_in_window,
              floor(CAST(sum(CAST(c AS DECIMAL(27,12))) AS DOUBLE)
                    / CAST(sum(CAST(w AS DECIMAL(27,12))) AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS ewma_value
       FROM contrib GROUP BY 1, 2""",
)
def events_ewma_daily(spark, sf_dir):
    """Per-type truncated EWMA (α=0.3, 14-day window) of the daily mean
    value via the contribute-forward fan-out — the smoothed trend line
    with no recursion, no range self-join; weighted sums decimal-exact.
    See windows.ewma_daily."""
    from ..operators.windows import ewma_daily

    view = _view(spark, sf_dir)
    return ewma_daily(view.tables["events"])


@register(
    "orders_pareto_skyline",
    """WITH pts AS (
         SELECT DISTINCT CAST(o_totalprice AS DOUBLE) AS x,
                CAST(date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS DOUBLE) AS y
         FROM orders)
       SELECT x, y FROM pts p
       WHERE NOT EXISTS (
         SELECT 1 FROM pts q
         WHERE q.x <= p.x AND q.y <= p.y AND (q.x < p.x OR q.y < p.y))""",
)
def orders_pareto_skyline(spark, sf_dir):
    """2-D Pareto skyline of orders minimizing (price, order date) —
    the cheapest-and-earliest frontier. The Spark plan is the
    grid-pruned shape (bucket min-y screen, exact check on frontier-
    sized survivors); the oracle is the textbook O(n²) NOT EXISTS. See
    analytics.pareto_skyline_2d."""
    from ..operators.analytics import pareto_skyline_2d

    view = _view(spark, sf_dir)
    o = view.tables["orders"].select(
        F.col("o_totalprice"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")
        ).alias("o_days"),
    )
    return pareto_skyline_2d(o, "o_totalprice", "o_days")


@register(
    "customer_top_percentile_share",
    """WITH per_key AS (
         SELECT o_custkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS v
         FROM orders GROUP BY 1),
       thr AS (SELECT quantile_cont(v, 0.99) AS thr,
                      count(*) AS n_keys FROM per_key)
       SELECT CAST(t.n_keys AS BIGINT) AS n_keys,
              floor(t.thr * 1000000.0 + 0.5) / 1000000.0 AS threshold,
              CAST(sum(CASE WHEN v >= t.thr THEN 1 ELSE 0 END) AS BIGINT)
                AS n_top_keys,
              floor(sum(CASE WHEN v >= t.thr THEN v ELSE 0 END) / sum(v)
                    * 1000000.0 + 0.5) / 1000000.0 AS top_share
       FROM per_key, thr t GROUP BY t.n_keys, t.thr""",
)
def customer_top_percentile_share(spark, sf_dir):
    """Revenue share of the top-1% customers (per-key totals vs the
    0.99 quantile threshold) — the concentration read-off next to the
    Gini, aggregate-only (no ranking window over the unbounded customer
    set). See statistics.top_percentile_contribution."""
    from ..operators.statistics import top_percentile_contribution

    view = _view(spark, sf_dir)
    return top_percentile_contribution(
        view.tables["orders"], "o_custkey", "o_totalprice"
    )


@register(
    "events_seasonal_anomalies",
    """WITH slim AS (
         SELECT event_type,
                (dayofweek(ts) + 1) * 24 + hour(ts) AS how,
                CAST(value AS DOUBLE) AS v
         FROM events),
       prof AS (
         SELECT event_type, how, quantile_cont(v, 0.5) AS season
         FROM slim GROUP BY 1, 2),
       resid AS (
         SELECT s.event_type, s.v - p.season AS r
         FROM slim s JOIN prof p USING (event_type, how)),
       mad AS (
         SELECT event_type, quantile_cont(abs(r), 0.5) AS m,
                count(*) AS n_events
         FROM resid GROUP BY 1)
       SELECT r.event_type, CAST(m.n_events AS BIGINT) AS n_events,
              floor(any_value(m.m) * 1000000.0 + 0.5) / 1000000.0
                AS resid_mad,
              CAST(sum(CASE WHEN abs(r.r) > 3.5 * 1.4826 * m.m
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
              floor(max(abs(r.r)) * 1000000.0 + 0.5) / 1000000.0
                AS max_abs_resid
       FROM resid r JOIN mad m USING (event_type)
       GROUP BY r.event_type, m.n_events""",
)
def events_seasonal_anomalies(spark, sf_dir):
    """Seasonality-aware anomaly counts: residuals vs the per-(type,
    hour-of-week) median profile, flagged at 3.5 modified z-scores of
    the residual MAD — weekly-rhythm-aware outlier screening. See
    windows.seasonal_adjusted_anomalies."""
    from ..operators.windows import seasonal_adjusted_anomalies

    view = _view(spark, sf_dir)
    return seasonal_adjusted_anomalies(view.tables["events"])


@register(
    "events_session_conversion",
    """WITH w AS (
         SELECT user_id, ts, event_type,
                CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_type)
                     > 1800 THEN 1 ELSE 0 END AS brk
         FROM events),
       s AS (
         SELECT user_id, event_type,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_type
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM w),
       per_sess AS (
         SELECT user_id, sid,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS conv,
                count(*) AS n
         FROM s GROUP BY 1, 2)
       SELECT CAST(count(*) AS BIGINT) AS n_sessions,
              CAST(sum(conv) AS BIGINT) AS n_converted,
              floor(sum(conv) * 1.0 / count(*) * 1000000.0 + 0.5)
                / 1000000.0 AS conversion_rate,
              floor(avg(n) * 1000000.0 + 0.5) / 1000000.0
                AS avg_session_events
       FROM per_sess""",
)
def events_session_conversion(spark, sf_dir):
    """Gap-sessionized (30-min silence) conversion rate: share of
    sessions containing a purchase, plus mean session length — the
    canonical per-session funnel denominator; per-user windows only,
    NTZ-safe epoch arithmetic. See windows.session_conversion."""
    from ..operators.windows import session_conversion

    view = _view(spark, sf_dir)
    return session_conversion(view.tables["events"])


@register(
    "dedup_rate_by_source",
    f"""WITH fp AS (
         SELECT source, md5({_NORM_DUCK}) AS fp FROM documents),
       sizes AS (SELECT fp, count(*) AS n FROM fp GROUP BY 1)
       SELECT f.source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN s.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup_docs,
              floor(sum(CASE WHEN s.n > 1 THEN 1 ELSE 0 END) * 1.0
                    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS dup_rate
       FROM fp f JOIN sizes s USING (fp) GROUP BY 1""",
)
def dedup_rate_by_source(spark, sf_dir):
    """Per-source duplication attribution: how many of each source's
    documents share a corpus-wide exact fingerprint with another doc —
    the action-item view of the global dedup number. See
    dedup.dedup_rate_by_key."""
    from ..operators.dedup import dedup_rate_by_key

    view = _view(spark, sf_dir)
    return dedup_rate_by_key(view.tables["documents"])


@register(
    "streaming_ewma_trend",
    """WITH daily AS (
         SELECT CAST(event_type AS VARCHAR) AS key, CAST(ts AS DATE) AS day,
                CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                              AS BIGINT)) AS BIGINT) AS s_micro,
                count(*) AS c
         FROM events GROUP BY 1, 2),
       lastd AS (
         SELECT key, max(day) AS last_day, count(*) AS n_days
         FROM daily GROUP BY 1),
       win AS (
         SELECT d.key, l.last_day, l.n_days,
                date_diff('day', d.day, l.last_day) AS o, d.s_micro, d.c
         FROM daily d JOIN lastd l USING (key)
         WHERE date_diff('day', d.day, l.last_day) BETWEEN 0 AND 13),
       terms AS (
         SELECT key, last_day, n_days,
                CAST(floor(((s_micro / 1000000.0) / c)
                           * (CAST(floor(pow(0.7, o) * 1000000000.0 + 0.5)
                                   AS BIGINT) / 1000000000.0)
                           * 1000000000.0 + 0.5) AS BIGINT) AS num_i,
                CAST(floor(pow(0.7, o) * 1000000000.0 + 0.5) AS BIGINT)
                  AS den_i
         FROM win)
       SELECT key, CAST(n_days AS BIGINT) AS n_days,
              strftime(last_day, '%Y-%m-%d') AS last_day,
              floor(CAST(sum(num_i) AS DOUBLE) / CAST(sum(den_i) AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS ewma_last
       FROM terms GROUP BY key, n_days, last_day""",
)
def streaming_ewma_trend(spark, sf_dir):
    """Streaming EWMA trend monitor (applyInPandasWithState): per-key
    day→(micro-sum, count) state accumulates commutatively (integer
    adds), and the emitted latest-day truncated EWMA is computed in
    integer numerator/denominator units — identical under any
    micro-batch schedule, hence batch-oracle-comparable. The streaming
    twin of ``events_ewma_daily`` read off at its last day. See
    streaming/stateful.streaming_ewma_monitor."""
    from pyspark.sql import Window

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_ewma_monitor as op
    from .streaming import _STREAM_SEQ, _replayed_events_stream

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream), f"q_stream_ewma_{_STREAM_SEQ[0]}", output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_events"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("key", "n_days", "last_day", "ewma_last")
    )


@register(
    "events_linear_attribution",
    """WITH seq AS (
         SELECT user_id, ts, event_id, event_type,
                sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  OVER w AS n0,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  OVER w AS n1,
                sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  OVER w AS n2,
                sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  OVER w AS n3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       conv AS (
         SELECT coalesce(n0, 0) AS n0, coalesce(n1, 0) AS n1,
                coalesce(n2, 0) AS n2, coalesce(n3, 0) AS n3,
                coalesce(n0, 0) + coalesce(n1, 0) + coalesce(n2, 0)
                  + coalesce(n3, 0) AS tot
         FROM seq WHERE event_type = 'purchase'),
       credits AS (
         SELECT 'view' AS channel,
                CAST(sum(CAST(floor(CASE WHEN tot > 0 THEN n0 * 1.0 / tot
                                         ELSE 0 END * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9))) AS DOUBLE)
                  AS credit FROM conv
         UNION ALL
         SELECT 'click',
                CAST(sum(CAST(floor(CASE WHEN tot > 0 THEN n1 * 1.0 / tot
                                         ELSE 0 END * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9))) AS DOUBLE)
           FROM conv
         UNION ALL
         SELECT 'signup',
                CAST(sum(CAST(floor(CASE WHEN tot > 0 THEN n2 * 1.0 / tot
                                         ELSE 0 END * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9))) AS DOUBLE)
           FROM conv
         UNION ALL
         SELECT 'error',
                CAST(sum(CAST(floor(CASE WHEN tot > 0 THEN n3 * 1.0 / tot
                                         ELSE 0 END * 1000000000.0 + 0.5)
                              / 1000000000.0 AS DECIMAL(27,9))) AS DOUBLE)
           FROM conv
         UNION ALL
         SELECT '(none)',
                CAST(sum(CASE WHEN tot = 0 THEN 1 ELSE 0 END) AS DOUBLE)
           FROM conv)
       SELECT channel,
              floor(credit * 1000000.0 + 0.5) / 1000000.0 AS credit
       FROM credits""",
)
def events_linear_attribution(spark, sf_dir):
    """Linear (fractional-credit) attribution: each purchase splits one
    credit across the user's prior touches by per-channel counts —
    bounded-enum prefix-count windows, no touch-pair materialization;
    decimal-exact credit sums. See windows.linear_attribution."""
    from ..operators.windows import linear_attribution

    view = _view(spark, sf_dir)
    return linear_attribution(view.tables["events"])


@register(
    "orders_monthly_seasonality",
    """WITH monthly AS (
         SELECT strftime(o_orderdate, '%Y-%m') AS month,
                count(*) AS n_orders
         FROM orders GROUP BY 1),
       w AS (
         SELECT month, n_orders,
                CAST(count(*) OVER win AS BIGINT) AS n_window,
                avg(n_orders * 1.0) OVER win AS ma
         FROM monthly
         WINDOW win AS (ORDER BY month
                        ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING))
       SELECT month, CAST(n_orders AS BIGINT) AS n_orders, n_window,
              floor(ma * 1000000.0 + 0.5) / 1000000.0 AS trend_ma,
              floor(n_orders / ma * 1000000.0 + 0.5) / 1000000.0
                AS seasonal_index
       FROM w""",
)
def orders_monthly_seasonality(spark, sf_dir):
    """Monthly order volume with a centered 13-month moving-average
    trend and the seasonal index count/trend — classic demand
    decomposition over the bounded month table. See
    windows.monthly_seasonality."""
    from ..operators.windows import monthly_seasonality

    view = _view(spark, sf_dir)
    return monthly_seasonality(view.tables["orders"])


@register(
    "events_burst_days",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       scored AS (
         SELECT event_type, day, n,
                CASE WHEN count(*) OVER w >= 3
                     THEN quantile_cont(n * 1.0, 0.5) OVER w END AS med
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
       SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
              CAST(n AS BIGINT) AS n_events,
              floor(med * 1000000.0 + 0.5) / 1000000.0 AS trailing_median,
              floor(n / med * 1000000.0 + 0.5) / 1000000.0 AS burst_ratio
       FROM scored
       WHERE med IS NOT NULL AND n > 1.15 * med""",
)
def events_burst_days(spark, sf_dir):
    """Burst days: daily counts exceeding the trailing-7-day median per
    type (median base, so spiky history doesn't hide spikes). The
    operator default multiplier is 3.0 (real spike territory); the
    registered query uses 1.15 because the synthetic daily counts are
    near-uniform (max observed ratio 1.41) and a 0-row gate query
    proves nothing. See windows.burst_days."""
    from ..operators.windows import burst_days

    view = _view(spark, sf_dir)
    b = burst_days(view.tables["events"], multiplier=1.15)
    return b.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "trailing_median",
        "burst_ratio",
    )


@register(
    "events_churn_hazard",
    """WITH per_user AS (
         SELECT user_id, min(epoch(ts)) AS f, max(epoch(ts)) AS l
         FROM events GROUP BY 1),
       tenure AS (
         SELECT CAST(floor((l - f) / 604800.0) AS BIGINT) AS tenure_week
         FROM per_user),
       per_week AS (
         SELECT tenure_week, count(*) AS n_churned
         FROM tenure GROUP BY 1),
       at_risk AS (
         SELECT tenure_week, n_churned,
                sum(n_churned) OVER (ORDER BY tenure_week DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS n_at_risk
         FROM per_week)
       SELECT tenure_week, CAST(n_churned AS BIGINT) AS n_churned,
              CAST(n_at_risk AS BIGINT) AS n_at_risk,
              floor(n_churned * 1.0 / n_at_risk * 1000000.0 + 0.5)
                / 1000000.0 AS hazard
       FROM at_risk""",
)
def events_churn_hazard(spark, sf_dir):
    """Discrete weekly churn hazard: users whose last activity fell in
    tenure week w over users surviving to week w — the lifecycle
    loss-point table; bounded week-grain aggregates only. See
    windows.churn_hazard."""
    from ..operators.windows import churn_hazard

    view = _view(spark, sf_dir)
    return churn_hazard(view.tables["events"])


@register(
    "source_length_bootstrap_ci",
    """WITH fan AS (
         SELECT source, b.b, CAST(n_chars AS DOUBLE) AS v,
                CAST(n_chars AS VARCHAR) AS k
         FROM documents CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b),
       mults AS (
         SELECT source, b, v,
                (CASE WHEN substr(md5(b || '|' || k || '|' || 0), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END
               + CASE WHEN substr(md5(b || '|' || k || '|' || 1), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END
               + CASE WHEN substr(md5(b || '|' || k || '|' || 2), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END
               + CASE WHEN substr(md5(b || '|' || k || '|' || 3), 1, 1)
                        IN ('0','1','2','3') THEN 1 ELSE 0 END) AS m
         FROM fan),
       rep AS (
         SELECT source, b,
                CAST(sum(CAST(v * m AS DECIMAL(27,6))) AS DOUBLE)
                  / sum(m) AS mean_b
         FROM mults GROUP BY 1, 2)
       SELECT source, CAST(count(*) AS BIGINT) AS n_boot,
              floor(quantile_cont(mean_b, 0.05) * 1000000.0 + 0.5)
                / 1000000.0 AS ci_lo,
              floor(quantile_cont(mean_b, 0.5) * 1000000.0 + 0.5)
                / 1000000.0 AS ci_mid,
              floor(quantile_cont(mean_b, 0.95) * 1000000.0 + 0.5)
                / 1000000.0 AS ci_hi
       FROM rep GROUP BY 1""",
)
def source_length_bootstrap_ci(spark, sf_dir):
    """Stratified md5-Poisson bootstrap: per-source 90% CI for the mean
    document length — the per-stratum uncertainty band a dataset card
    prints. See statistics.grouped_bootstrap_mean_ci."""
    from ..operators.statistics import grouped_bootstrap_mean_ci

    view = _view(spark, sf_dir)
    return grouped_bootstrap_mean_ci(
        view.tables["documents"], "source", "n_chars"
    )


@register(
    "events_benford_audit",
    """WITH digits AS (
         SELECT substr(regexp_replace(CAST(abs(value) AS VARCHAR),
                                      '[0.]', '', 'g'), 1, 1) AS d
         FROM events),
       keep AS (SELECT d FROM digits WHERE d BETWEEN '1' AND '9'),
       tot AS (SELECT count(*) AS n FROM keep),
       obs AS (SELECT d, count(*) AS n_obs FROM keep GROUP BY 1)
       SELECT d AS leading_digit, CAST(n_obs AS BIGINT) AS n_obs,
              floor(n_obs * 1.0 / t.n * 1000000.0 + 0.5) / 1000000.0
                AS observed_share,
              floor(log10(1.0 + 1.0 / CAST(d AS INTEGER))
                    * 1000000.0 + 0.5) / 1000000.0 AS benford_share,
              floor(pow(n_obs * 1.0 / t.n
                        - log10(1.0 + 1.0 / CAST(d AS INTEGER)), 2)
                    / log10(1.0 + 1.0 / CAST(d AS INTEGER))
                    * 1000000.0 + 0.5) / 1000000.0 AS chi2_term
       FROM obs, tot t""",
)
def events_benford_audit(spark, sf_dir):
    """Benford first-digit audit of the event value column: observed vs
    expected leading-digit shares with per-digit chi-square terms — the
    fabricated-data / unit-mix-up screen. See statistics.benford_audit."""
    from ..operators.statistics import benford_audit

    view = _view(spark, sf_dir)
    return benford_audit(view.tables["events"], "value")


@register(
    "embedding_centroid_split_drift",
    """WITH v AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS norm
         FROM embeddings),
       cents AS (SELECT vec_id AS cell, v AS cv, norm AS cn FROM v WHERE vec_id < 16),
       assigned AS (
         SELECT vec_id, v, cell FROM (
           SELECT a.vec_id, a.v, c.cell,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                             c.cell) AS r
           FROM v a CROSS JOIN cents c) t WHERE r = 1),
       sided AS (
         SELECT cell,
                CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7')
                     THEN 'a' ELSE 'b' END AS side,
                generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x
         FROM assigned),
       means AS (
         SELECT cell, side, dim,
                floor(CAST(sum(CAST(x AS DECIMAL(27,9))) AS DOUBLE) / count(*)
                      * 1000000000.0 + 0.5) / 1000000000.0 AS m
         FROM sided GROUP BY 1, 2, 3),
       pc AS (
         SELECT a.cell,
                CAST(sum(CAST(a.m * b.m AS DECIMAL(27,18))) AS DOUBLE) AS dot,
                CAST(sum(CAST(a.m * a.m AS DECIMAL(27,18))) AS DOUBLE) AS na2,
                CAST(sum(CAST(b.m * b.m AS DECIMAL(27,18))) AS DOUBLE) AS nb2
         FROM means a JOIN means b
           ON a.cell = b.cell AND a.dim = b.dim
          AND a.side = 'a' AND b.side = 'b'
         GROUP BY 1),
       sizes AS (
         SELECT cell,
                sum(CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)
                           IN ('0','1','2','3','4','5','6','7')
                         THEN 1 ELSE 0 END) AS n_a,
                sum(CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)
                           IN ('0','1','2','3','4','5','6','7')
                         THEN 0 ELSE 1 END) AS n_b
         FROM assigned GROUP BY 1)
       SELECT p.cell, CAST(s.n_a AS BIGINT) AS n_a,
              CAST(s.n_b AS BIGINT) AS n_b,
              floor(p.dot / (sqrt(p.na2) * sqrt(p.nb2)) * 1000000.0 + 0.5)
                / 1000000.0 AS centroid_cosine
       FROM pc p JOIN sizes s USING (cell)""",
)
def embedding_centroid_split_drift(spark, sf_dir):
    """Per-IVF-cell centroid drift between an md5 50/50 id split: the
    cosine of the two side-centroids — region-level embedding drift
    detection; all means/dots decimal-exact. See
    similarity.centroid_split_drift."""
    from ..operators.similarity import centroid_split_drift

    view = _view(spark, sf_dir)
    return centroid_split_drift(view.tables["embeddings"])


@register(
    "graph_degree_powerlaw_fit",
    f"""WITH {_SHIPYEAR_E_DUCK},
       deg AS (SELECT a AS node, count(*) AS deg FROM und GROUP BY 1),
       fit AS (SELECT deg FROM deg WHERE deg >= 2),
       terms AS (
         SELECT deg,
                floor(ln(deg / 1.5) * 1000000000.0 + 0.5) / 1000000000.0
                  AS lt
         FROM fit)
       SELECT CAST(count(*) AS BIGINT) AS n_nodes_fit,
              CAST(2 AS BIGINT) AS dmin,
              floor((1.0 + count(*) /
                     CAST(sum(CAST(lt AS DECIMAL(27,9))) AS DOUBLE))
                    * 1000000.0 + 0.5) / 1000000.0 AS alpha,
              CAST(max(deg) AS BIGINT) AS max_degree
       FROM terms""",
)
def graph_degree_powerlaw_fit(spark, sf_dir):
    """Clauset–Shalizi–Newman power-law exponent MLE for the ship-year
    graph's degree distribution (α = 1 + n/Σ ln(d/(dmin−½))) — the
    one-number tail-heaviness gauge that calibrates every hub-skew
    mitigation here; ln terms 9-dp-rounded and summed exactly. See
    graph_algos.degree_powerlaw_fit."""
    from ..operators.graph_algos import degree_powerlaw_fit

    return degree_powerlaw_fit(_shipyear_graph(_view(spark, sf_dir)))


@register(
    "quality_calibration_bins",
    f"""WITH scored AS (
         SELECT lang,
                len(list_intersect(list_distinct({_TOKS_DUCK}),
                    ['the','a','of','and','to','in','is','it'])) * 1.0
                  / greatest(len(list_distinct({_TOKS_DUCK})), 1) AS s
         FROM documents),
       binned AS (
         SELECT least(9, CAST(floor(s * 10) AS INTEGER)) AS bin,
                s, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         FROM scored)
       SELECT bin, CAST(count(*) AS BIGINT) AS n,
              floor(CAST(sum(CAST(s AS DECIMAL(27,9))) AS DOUBLE) / count(*)
                    * 1000000.0 + 0.5) / 1000000.0 AS mean_score,
              floor(sum(y) * 1.0 / count(*) * 1000000.0 + 0.5) / 1000000.0
                AS positive_rate
       FROM binned GROUP BY 1""",
)
def quality_calibration_bins(spark, sf_dir):
    """Reliability diagram of the English-stopword-density score
    against the actual lang='en' label: per score decile the count,
    mean score, and observed positive rate — the calibration readout
    before any score gates a corpus. See
    statistics.score_calibration_bins."""
    from ..functions.text import tokens
    from ..operators.statistics import score_calibration_bins
    from ..operators.text_analysis import LANG_STOPWORDS

    view = _view(spark, sf_dir)
    t = F.array_distinct(tokens("text"))
    en = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    score = F.size(F.array_intersect(t, en)) / F.greatest(
        F.size(t), F.lit(1)
    )
    return score_calibration_bins(
        view.tables["documents"], score, F.col("lang") == "en"
    )


@register(
    "kmv_audience_overlap",
    """WITH h AS (
         SELECT DISTINCT event_type AS key,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                  / 4294967296.0 AS frac
         FROM events),
       merged AS (
         SELECT key, list_sort(list(frac ORDER BY frac))[1:32] AS mins
         FROM h GROUP BY 1),
       pairs AS (
         SELECT a.key AS key_a, b.key AS key_b, a.mins AS ma, b.mins AS mb,
                list_sort(list_distinct(a.mins || b.mins))[1:32] AS um
         FROM merged a JOIN merged b ON a.key < b.key),
       est AS (
         SELECT key_a, key_b,
                CAST(floor(
                  len(list_intersect(list_intersect(um, ma), mb)) * 1.0
                  / len(um)
                  * (CASE WHEN len(um) < 32 THEN len(um) * 1.0
                          ELSE floor(31.0 / um[32] + 0.5) END)
                  + 0.5) AS BIGINT) AS kmv_intersection
         FROM pairs),
       d AS (SELECT DISTINCT event_type AS key, user_id AS id FROM events),
       exact AS (
         SELECT a.key AS key_a, b.key AS key_b,
                count(*) AS exact_intersection
         FROM d a JOIN d b ON a.id = b.id AND a.key < b.key
         GROUP BY 1, 2)
       SELECT e.key_a, e.key_b, e.kmv_intersection,
              CAST(coalesce(x.exact_intersection, 0) AS BIGINT)
                AS exact_intersection
       FROM est e LEFT JOIN exact x USING (key_a, key_b)""",
)
def kmv_audience_overlap(spark, sf_dir):
    """Pairwise audience-overlap estimates between event-type user sets
    from their KMV bottom-32 sketches (union sketch → Jaccard-in-window
    → intersection), with the exact intersections alongside as the
    accuracy audit — mergeable-sketch set algebra. See
    statistics.kmv_set_intersection."""
    from ..operators.statistics import kmv_set_intersection

    view = _view(spark, sf_dir)
    return kmv_set_intersection(view.tables["events"])


@register(
    "tokenizer_fertility_by_lang",
    r"""WITH per_doc AS (
         SELECT lang,
                len(list_filter(string_split(lower(text), ' '), x -> x != ''))
                  AS ws,
                len(regexp_extract_all(text, '\w+|[^\w\s]')) AS re_
         FROM documents)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(ws) AS BIGINT) AS n_ws_tokens,
              CAST(sum(re_) AS BIGINT) AS n_re_tokens,
              floor(sum(re_) * 1.0 / sum(ws) * 1000000.0 + 0.5) / 1000000.0
                AS fertility
       FROM per_doc GROUP BY 1""",
)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility (regex tokens per whitespace word) per
    language — the comparative token-budget metric for multilingual
    mixes; ratio of exact integer sums. See
    text_analysis.tokenizer_fertility."""
    from ..operators.text_analysis import tokenizer_fertility

    view = _view(spark, sf_dir)
    return tokenizer_fertility(view.tables["documents"])


@register(
    "dedup_cluster_size_histogram",
    f"""WITH cl AS (
         SELECT md5({_NORM_DUCK}) AS fp, count(*) AS n_dups
         FROM documents GROUP BY 1),
       banded AS (
         SELECT CASE WHEN n_dups = 1 THEN '1'
                     WHEN n_dups = 2 THEN '2'
                     WHEN n_dups <= 5 THEN '3-5'
                     WHEN n_dups <= 10 THEN '6-10'
                     ELSE '11+' END AS cluster_size_band,
                n_dups
         FROM cl)
       SELECT cluster_size_band, CAST(count(*) AS BIGINT) AS n_clusters,
              CAST(sum(n_dups) AS BIGINT) AS n_docs
       FROM banded GROUP BY 1""",
)
def dedup_cluster_size_histogram(spark, sf_dir):
    """Exact-dup cluster-size bands (1 / 2 / 3-5 / 6-10 / 11+) with
    cluster and document counts — the one-glance shape of the
    duplication problem. See dedup.cluster_size_histogram."""
    from ..operators.dedup import cluster_size_histogram

    view = _view(spark, sf_dir)
    return cluster_size_histogram(view.tables["documents"])


@register(
    "events_transition_entropy",
    """WITH seq AS (
         SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS to_type
         FROM events),
       counts AS (
         SELECT from_type, to_type, count(*) AS n
         FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       totals AS (SELECT from_type, sum(n) AS tot FROM counts GROUP BY 1),
       terms AS (
         SELECT c.from_type, t.tot,
                floor(-(c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)
                      * 1000000000.0 + 0.5) / 1000000000.0 AS term
         FROM counts c JOIN totals t USING (from_type)),
       ent AS (
         SELECT from_type, tot,
                CAST(sum(CAST(term AS DECIMAL(27,9))) AS DOUBLE) AS h
         FROM terms GROUP BY 1, 2)
       SELECT from_type, CAST(tot AS BIGINT) AS n_transitions,
              floor(h * 1000000.0 + 0.5) / 1000000.0 AS entropy_nats,
              floor(exp(h) * 1000000.0 + 0.5) / 1000000.0 AS perplexity
       FROM ent""",
)
def events_transition_entropy(spark, sf_dir):
    """Per-state entropy/perplexity of the behavioral Markov chain's
    next-event distribution — how deterministic behavior is after each
    event type; 9-dp terms summed exactly. See
    windows.transition_entropy."""
    from ..operators.windows import transition_entropy

    view = _view(spark, sf_dir)
    return transition_entropy(view.tables["events"])


@register(
    "doc_length_lang_anova",
    """WITH per_g AS (
         SELECT lang, count(*) AS ni,
                CAST(sum(CAST(CAST(n_chars AS DOUBLE) AS DECIMAL(27,9)))
                     AS DOUBLE) AS si,
                CAST(sum(CAST(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)
                              AS DECIMAL(27,9))) AS DOUBLE) AS qi
         FROM documents GROUP BY 1),
       agg AS (
         SELECT count(*) AS k, CAST(sum(ni) AS BIGINT) AS n,
                sum(si) AS s, sum(qi) AS q,
                sum(si * si / ni) AS sb
         FROM per_g)
       SELECT n, CAST(k AS BIGINT) AS k,
              floor(((sb - s * s / n) / (k - 1))
                    / ((q - sb) / (n - k)) * 1000000.0 + 0.5) / 1000000.0
                AS f_stat,
              floor((sb - s * s / n) / (q - s * s / n) * 1000000.0 + 0.5)
                / 1000000.0 AS eta_squared
       FROM agg""",
)
def doc_length_lang_anova(spark, sf_dir):
    """One-way ANOVA of document length across languages (F statistic +
    η²) — does language structure the length distribution (the check
    before assuming a shared length-filter threshold works for every
    language); sufficient statistics only, decimal-exact. The norm
    variant is deliberately NOT registered: unit-normalized embeddings
    make norm-ANOVA pure catastrophic cancellation (SSB ~1e-9 against
    500-magnitude sums — numerically meaningless in any engine). See
    statistics.oneway_anova."""
    from ..operators.statistics import oneway_anova

    view = _view(spark, sf_dir)
    return oneway_anova(view.tables["documents"], "lang", "n_chars")


@register(
    "doc_char_entropy",
    """WITH chars AS (
         SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch
         FROM documents,
              LATERAL unnest(range(1, greatest(len(text), 1) + 1)) AS t(i)),
       counts AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
       totals AS (SELECT doc_id, sum(c) AS n FROM counts GROUP BY 1),
       terms AS (
         SELECT c.doc_id, t.n,
                floor(-(c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n)
                      * 1000000000.0 + 0.5) / 1000000000.0 AS term
         FROM counts c JOIN totals t USING (doc_id))
       SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
              CAST(count(*) AS BIGINT) AS n_distinct_chars,
              floor(CAST(sum(CAST(term AS DECIMAL(27,9))) AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS char_entropy
       FROM terms GROUP BY doc_id, n""",
)
def doc_char_entropy(spark, sf_dir):
    """Per-document character-unigram entropy — the gibberish /
    encoding-junk detector (base64 scores near-uniform, spam near
    zero); position-enumerated chars, linear row volume. See
    text_analysis.char_entropy."""
    from ..operators.text_analysis import char_entropy

    view = _view(spark, sf_dir)
    return char_entropy(view.tables["documents"])


@register(
    "graph_rich_club",
    f"""WITH {_SHIPYEAR_E_DUCK},
       und2 AS (SELECT a, b FROM und WHERE a != b),
       deg AS (SELECT a AS node, count(*) AS deg FROM und2 GROUP BY 1),
       canon AS (SELECT a, b FROM und2 WHERE a < b),
       ks AS (SELECT unnest([4, 8, 16]) AS k),
       rich AS (
         SELECT k.k, d.node FROM ks k JOIN deg d ON d.deg > k.k),
       nr AS (SELECT k, count(*) AS n_rich FROM rich GROUP BY 1),
       er AS (
         SELECT r1.k, count(*) AS n_edges_rich
         FROM canon c
         JOIN rich r1 ON r1.node = c.a
         JOIN rich r2 ON r2.node = c.b AND r2.k = r1.k
         GROUP BY 1)
       SELECT k.k AS k,
              CAST(coalesce(nr.n_rich, 0) AS BIGINT) AS n_rich,
              CAST(coalesce(er.n_edges_rich, 0) AS BIGINT) AS n_edges_rich,
              CASE WHEN coalesce(nr.n_rich, 0) >= 2
                   THEN floor(2.0 * coalesce(er.n_edges_rich, 0)
                              / (nr.n_rich * (nr.n_rich - 1.0))
                              * 1000000.0 + 0.5) / 1000000.0 END AS phi
       FROM ks k
       LEFT JOIN nr ON nr.k = k.k
       LEFT JOIN er ON er.k = k.k""",
)
def graph_rich_club(spark, sf_dir):
    """Rich-club coefficient φ(k) at k ∈ {4, 8, 16} over the ship-year
    graph — do the hubs form a club; per-k semi-joins against the
    shrinking rich-node set. See graph_algos.rich_club_coefficient."""
    from ..operators.graph_algos import rich_club_coefficient

    return rich_club_coefficient(_shipyear_graph(_view(spark, sf_dir)))


@register(
    "embedding_intrinsic_dimension",
    """WITH v AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS norm
         FROM embeddings),
       q AS (SELECT * FROM v WHERE vec_id < 100),
       scored AS (
         SELECT q.vec_id AS query_id,
                floor(list_dot_product(q.v, c.v) / (q.norm * c.norm)
                      * 1000000.0 + 0.5) / 1000000.0 AS cosine,
                c.vec_id AS neighbor_id
         FROM q JOIN v c ON q.vec_id != c.vec_id),
       topk AS (
         SELECT query_id, cosine, rnk FROM (
           SELECT query_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rnk
           FROM scored) t WHERE rnk <= 2),
       per_q AS (
         SELECT query_id,
                max(CASE WHEN rnk = 1 THEN cosine END) AS c1,
                max(CASE WHEN rnk = 2 THEN cosine END) AS c2
         FROM topk GROUP BY 1),
       valid AS (
         SELECT floor(0.5 * ln((1.0 - c2) / (1.0 - c1))
                      * 1000000000.0 + 0.5) / 1000000000.0 AS lnmu
         FROM per_q WHERE c1 < 1.0 AND c2 IS NOT NULL)
       SELECT CAST(count(*) AS BIGINT) AS n_used,
              floor(count(*) /
                    CAST(sum(CAST(lnmu AS DECIMAL(27,9))) AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS intrinsic_dim
       FROM valid""",
)
def embedding_intrinsic_dimension(spark, sf_dir):
    """TwoNN intrinsic-dimension MLE from each query's two nearest
    neighbors (μ = r2/r1 from rounded cosines on unit vectors) — how
    many dimensions the embedding manifold actually uses. See
    similarity.intrinsic_dimension_twonn."""
    from ..operators.similarity import intrinsic_dimension_twonn

    view = _view(spark, sf_dir)
    return intrinsic_dimension_twonn(view.tables["embeddings"])


@register(
    "events_weekly_autocorrelation",
    """WITH daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1, 2),
       pairs AS (
         SELECT c.event_type, c.n AS x, p.n AS y
         FROM daily c
         JOIN daily p ON p.event_type = c.event_type
                     AND p.day + 7 = c.day)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
              floor((count(*) * CAST(sum(x * y) AS DOUBLE)
                     - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
                    / sqrt((count(*) * CAST(sum(x * x) AS DOUBLE)
                            - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
                         * (count(*) * CAST(sum(y * y) AS DOUBLE)
                            - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
                    * 1000000.0 + 0.5) / 1000000.0 AS lag_autocorr
       FROM pairs GROUP BY 1""",
)
def events_weekly_autocorrelation(spark, sf_dir):
    """Lag-7 Pearson autocorrelation of each type's daily count series
    — the weekly-rhythm test behind the seasonal anomaly profile; all
    moments exact integers, no window. See
    windows.weekly_autocorrelation."""
    from ..operators.windows import weekly_autocorrelation

    view = _view(spark, sf_dir)
    return weekly_autocorrelation(view.tables["events"])


@register(
    "lang_token_budget_plan",
    r"""WITH toks AS (
         SELECT lang, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS t
         FROM documents),
       per_g AS (SELECT lang, sum(t) AS n_tokens FROM toks GROUP BY 1),
       tot AS (SELECT sum(n_tokens) AS total FROM per_g),
       w AS (
         SELECT lang, n_tokens,
                pow(n_tokens * 1.0 / t.total, 0.5) AS wgt
         FROM per_g, tot t),
       ws AS (SELECT sum(wgt) AS s FROM w)
       SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
              floor(wgt / s.s * 1000000.0 + 0.5) / 1000000.0 AS weight,
              CAST(floor(1000000.0 * wgt / s.s + 0.5) AS BIGINT)
                AS alloc_tokens,
              floor(1000000.0 * wgt / s.s / n_tokens * 1000000.0 + 0.5)
                / 1000000.0 AS epochs
       FROM w, ws s""",
)
def lang_token_budget_plan(spark, sf_dir):
    """Temperature-based (τ=0.5) token-budget allocation across
    languages — the XLM-R/mT5 sampling recipe as a plan table: weight,
    allocated tokens of a 1M budget, and epochs (>1 = repetition) per
    language. See mixing.token_budget_plan."""
    from ..operators.mixing import token_budget_plan

    view = _view(spark, sf_dir)
    return token_budget_plan(view.tables["documents"])


@register(
    "events_funnel_steps",
    """WITH r1 AS (
         SELECT user_id, min(ts) AS r FROM events
         WHERE event_type = 'view' GROUP BY 1),
       r2 AS (
         SELECT e.user_id, min(e.ts) AS r
         FROM events e JOIN r1 ON e.user_id = r1.user_id
         WHERE e.event_type = 'click' AND e.ts > r1.r GROUP BY 1),
       r3 AS (
         SELECT e.user_id, min(e.ts) AS r
         FROM events e JOIN r2 ON e.user_id = r2.user_id
         WHERE e.event_type = 'signup' AND e.ts > r2.r GROUP BY 1),
       r4 AS (
         SELECT e.user_id, min(e.ts) AS r
         FROM events e JOIN r3 ON e.user_id = r3.user_id
         WHERE e.event_type = 'purchase' AND e.ts > r3.r GROUP BY 1),
       c AS (
         SELECT (SELECT count(*) FROM r1) AS c1,
                (SELECT count(*) FROM r2) AS c2,
                (SELECT count(*) FROM r3) AS c3,
                (SELECT count(*) FROM r4) AS c4)
       SELECT 1 AS step, 'view' AS step_name, CAST(c1 AS BIGINT) AS n_users,
              floor(c1 * 1.0 / c1 * 1000000.0 + 0.5) / 1000000.0 AS conv_from_prev,
              floor(c1 * 1.0 / c1 * 1000000.0 + 0.5) / 1000000.0 AS conv_from_first
       FROM c
       UNION ALL
       SELECT 2, 'click', CAST(c2 AS BIGINT),
              floor(c2 * 1.0 / c1 * 1000000.0 + 0.5) / 1000000.0,
              floor(c2 * 1.0 / c1 * 1000000.0 + 0.5) / 1000000.0 FROM c
       UNION ALL
       SELECT 3, 'signup', CAST(c3 AS BIGINT),
              floor(c3 * 1.0 / c2 * 1000000.0 + 0.5) / 1000000.0,
              floor(c3 * 1.0 / c1 * 1000000.0 + 0.5) / 1000000.0 FROM c
       UNION ALL
       SELECT 4, 'purchase', CAST(c4 AS BIGINT),
              floor(c4 * 1.0 / c3 * 1000000.0 + 0.5) / 1000000.0,
              floor(c4 * 1.0 / c1 * 1000000.0 + 0.5) / 1000000.0 FROM c""",
)
def events_funnel_steps(spark, sf_dir):
    """4-step ordered funnel (view→click→signup→purchase, each step
    strictly after the previous completion): users reached plus
    conversion from the previous and first steps — a fixed cascade of
    per-user min-after aggregates, exact under out-of-order data. See
    windows.funnel_steps."""
    from ..operators.windows import funnel_steps

    view = _view(spark, sf_dir)
    return funnel_steps(view.tables["events"])


@register(
    "source_js_divergence",
    """WITH tc AS (
         SELECT t.term, source AS g, count(*) AS c
         FROM (
           SELECT source,
                  unnest(list_filter(string_split(lower(text), ' '),
                                     x -> x != '')) AS term
           FROM documents WHERE source IN ('src0', 'src1')) t
         GROUP BY 1, 2),
       piv AS (
         SELECT term,
                sum(CASE WHEN g = 'src0' THEN c ELSE 0 END) AS ca,
                sum(CASE WHEN g = 'src1' THEN c ELSE 0 END) AS cb
         FROM tc GROUP BY 1),
       vocab AS (
         SELECT * FROM piv ORDER BY ca + cb DESC, term ASC LIMIT 500),
       tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM vocab),
       wj AS (
         SELECT ca * 1.0 / t.na AS p, cb * 1.0 / t.nb AS q
         FROM vocab, tot t),
       terms AS (
         SELECT floor(0.5 * (
                  CASE WHEN p > 0
                       THEN p * ln(p / ((p + q) / 2.0)) ELSE 0 END
                + CASE WHEN q > 0
                       THEN q * ln(q / ((p + q) / 2.0)) ELSE 0 END)
                * 1000000000.0 + 0.5) / 1000000000.0 AS term
         FROM wj)
       SELECT 'src0' AS source_a, 'src1' AS source_b,
              CAST(count(*) AS BIGINT) AS n_terms,
              floor(CAST(sum(CAST(term AS DECIMAL(27,9))) AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS js_divergence
       FROM terms""",
)
def source_js_divergence(spark, sf_dir):
    """Jensen–Shannon divergence between two sources' term
    distributions over their combined top-500 vocabulary — the
    symmetric bounded domain-shift number; exact integer probability
    ratios, 9-dp term fold. See text_analysis.js_divergence_sources."""
    from ..operators.text_analysis import js_divergence_sources

    view = _view(spark, sf_dir)
    return js_divergence_sources(view.tables["documents"], "src0", "src1")


def _recall_curve_oracle() -> str:
    # the shared limit token is "rank <= 10" (the nprobe cut is "r <= 4"
    # and must NOT change)
    ivf20 = ORACLES["embedding_ivf_topk"].replace("rank <= 10", "rank <= 20")
    brute20 = ORACLES["embedding_topk"].replace("rank <= 10", "rank <= 20")
    return f"""WITH ivf AS ({ivf20}),
     brute AS ({brute20}),
     matched AS (
       SELECT i.query_id, i.rank AS ri, b.rank AS rb
       FROM ivf i JOIN brute b
         ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id),
     ks AS (SELECT unnest([1, 5, 10, 20]) AS k),
     per_qk AS (
       SELECT ks.k, m.query_id, count(*) AS n_overlap
       FROM matched m JOIN ks ON m.ri <= ks.k AND m.rb <= ks.k
       GROUP BY 1, 2),
     qn AS (SELECT count(DISTINCT query_id) AS qn FROM brute)
   SELECT ks.k, CAST(q.qn AS BIGINT) AS n_queries,
          floor(coalesce(sum(p.n_overlap * 1.0 / ks.k), 0) / q.qn
                * 1000000.0 + 0.5) / 1000000.0 AS mean_recall
   FROM ks CROSS JOIN qn q
   LEFT JOIN per_qk p ON p.k = ks.k
   GROUP BY ks.k, q.qn"""


@register("ann_recall_curve", None)
def ann_recall_curve_q(spark, sf_dir):
    """Recall@k curve (k ∈ 1,5,10,20) of IVF vs brute force from one
    max-k ranking pass per side — the index-tuning chart behind the
    single-point ann_recall_at_k. See similarity.ann_recall_curve."""
    from ..operators.similarity import ann_recall_curve

    view = _view(spark, sf_dir)
    return ann_recall_curve(view.tables["embeddings"])


ORACLES["ann_recall_curve"] = _recall_curve_oracle()


@register(
    "streaming_zscore_extremes",
    """WITH m AS (
         SELECT CAST(event_type AS VARCHAR) AS key,
                CAST(floor(CAST(value AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)
                  AS v
         FROM events),
       agg AS (
         SELECT key, count(*) AS n,
                CAST(sum(v) AS BIGINT) AS s,
                CAST(sum(v * v) AS BIGINT) AS q,
                min(v) AS vmin, max(v) AS vmax
         FROM m GROUP BY 1)
       SELECT key, CAST(n AS BIGINT) AS n_events,
              floor((s * 1.0 / n) / 1000.0 * 1000000.0 + 0.5) / 1000000.0
                AS mean_value,
              floor(sqrt(greatest(q * 1.0 / n
                                  - (s * 1.0 / n) * (s * 1.0 / n), 0.0))
                    / 1000.0 * 1000000.0 + 0.5) / 1000000.0 AS stddev_value,
              CASE WHEN q * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n) > 0
                   THEN floor(greatest(abs(vmax - s * 1.0 / n),
                                       abs(vmin - s * 1.0 / n))
                              / sqrt(q * 1.0 / n
                                     - (s * 1.0 / n) * (s * 1.0 / n))
                              * 1000000.0 + 0.5) / 1000000.0 END AS max_abs_z
       FROM agg""",
)
def streaming_zscore_extremes(spark, sf_dir):
    """Streaming z-score extremes monitor (applyInPandasWithState):
    per-key integer-milli moments + min/max state — all commutative, so
    the emitted mean/stddev/max|z| equal the batch computation under
    any micro-batch schedule. See
    streaming/stateful.streaming_zscore_monitor."""
    from pyspark.sql import Window

    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_zscore_monitor as op
    from .streaming import _STREAM_SEQ, _replayed_events_stream

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream), f"q_stream_zscore_{_STREAM_SEQ[0]}", output_mode="update",
        state_partitions=8,
    )
    w = Window.partitionBy("key").orderBy(F.desc("n_events"))
    return (
        got.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("key", "n_events", "mean_value", "stddev_value", "max_abs_z")
    )


@register(
    "events_fd_violations",
    """WITH pairs AS (
         SELECT user_id AS lhs_value, event_type AS rhs, count(*) AS n
         FROM events GROUP BY 1, 2),
       per_lhs AS (
         SELECT lhs_value, count(*) AS n_distinct_rhs,
                sum(n) AS total, max(n) AS maj
         FROM pairs GROUP BY 1)
       SELECT CAST(lhs_value AS BIGINT) AS lhs_value,
              CAST(n_distinct_rhs AS BIGINT) AS n_distinct_rhs,
              CAST(total AS BIGINT) AS n_rows,
              CAST(total - maj AS BIGINT) AS n_violating_rows
       FROM per_lhs WHERE n_distinct_rhs > 1
       ORDER BY n_violating_rows DESC, lhs_value ASC LIMIT 5""",
)
def events_fd_violations(spark, sf_dir):
    """Functional-dependency profiling user_id → event_type (an FD that
    should NOT hold — the violation table shows multi-type users and
    what enforcing the rule would discard); Metanome-style two-
    aggregate check, top-5 violators. See profiling.fd_violations."""
    from ..operators.profiling import fd_violations

    view = _view(spark, sf_dir)
    return fd_violations(view.tables["events"], "user_id", "event_type")


# ---------------------------------------------------------------------------
# Batch 8: edge truss support, lexical diversity, rank-sum drift,
# path mining, join-key skew profiling
# ---------------------------------------------------------------------------

@register(
    "graph_edge_triangle_support",
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
       sides AS (
         SELECT x AS u, y AS v FROM tri
         UNION ALL SELECT y, z FROM tri
         UNION ALL SELECT x, z FROM tri)
       SELECT u, v, CAST(count(*) AS BIGINT) AS support
       FROM sides GROUP BY 1, 2""",
)
def graph_edge_triangle_support(spark, sf_dir):
    """Per-edge triangle support (the k-truss screen) on the same
    1998-slice order/part/supplier co-occurrence graph as
    graph_triangle_counts — edge-level where that one is node-level.
    See graph_algos.edge_triangle_support for the degree-ordered
    orientation that bounds wedge fan-out under hub skew."""
    from ..operators.graph_algos import edge_triangle_support

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
    return edge_triangle_support(e)


@register(
    "lexical_diversity_by_source",
    """WITH tok AS (
         SELECT source,
                unnest(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) AS term
         FROM documents),
       tc AS (SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2),
       agg AS (
         SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hapax
         FROM tc GROUP BY 1)
       SELECT source, n_tokens, n_types, n_hapax,
              floor(n_types * 1.0 / n_tokens * 1000000.0 + 0.5) / 1000000.0
                AS type_token_ratio,
              floor(n_hapax * 1.0 / n_types * 1000000.0 + 0.5) / 1000000.0
                AS hapax_ratio
       FROM agg""",
)
def lexical_diversity_by_source(spark, sf_dir):
    """Type-token ratio + hapax-legomenon share per source — the
    corpus-richness screen that flags boilerplate-stamped sources.
    See text_analysis.lexical_diversity."""
    from ..operators.text_analysis import lexical_diversity

    view = _view(spark, sf_dir)
    return lexical_diversity(view.tables["documents"], group_col="source")


@register(
    "doc_length_rank_test",
    """WITH sided AS (
         SELECT CAST(n_chars AS BIGINT) AS v, (source = 'src0') AS is_a
         FROM documents WHERE source IN ('src0', 'src1')),
       counts AS (
         SELECT v, sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
                sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS cb
         FROM sided GROUP BY 1),
       cum AS (
         SELECT ca, cb, ca + cb AS t,
                coalesce(sum(ca + cb) OVER (
                  ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS cum_before
         FROM counts),
       agg AS (
         SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                CAST(sum(cb) AS BIGINT) AS n_b,
                CAST(sum(ca * (2 * cum_before + t + 1)) AS BIGINT) AS r2a,
                CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
         FROM cum)
       SELECT n_a, n_b,
              (r2a - n_a * (n_a + 1)) / 2.0 AS u_stat,
              floor(((r2a - n_a * (n_a + 1)) - n_a * n_b)
                    / (2.0 * sqrt(n_a * n_b
                                  * ((n_a + n_b + 1.0)
                                     - tie_term / ((n_a + n_b)
                                                   * (n_a + n_b - 1.0)))
                                  / 12.0))
                    * 1000000.0 + 0.5) / 1000000.0 AS z_score,
              floor((1.0 - (r2a - n_a * (n_a + 1))
                           / CAST(n_a * n_b AS DOUBLE))
                    * 1000000.0 + 0.5) / 1000000.0 AS rank_biserial
       FROM agg""",
)
def doc_length_rank_test(spark, sf_dir):
    """Mann–Whitney U rank-sum test on doc length between src0 and
    src1 (tie-corrected z + rank-biserial effect size) — the
    location-shift companion to doc_length_ks_drift's shape test.
    All rank algebra in integers (2·R_A), cumulative midranks over
    the bounded distinct-length histogram. See
    statistics.mann_whitney_u."""
    from ..operators.statistics import mann_whitney_u

    view = _view(spark, sf_dir)
    return mann_whitney_u(
        view.tables["documents"], "n_chars", "source", "src0", "src1"
    )


@register(
    "events_top_paths",
    """WITH seq AS (
         SELECT event_type AS step1,
                lead(event_type, 1) OVER w AS step2,
                lead(event_type, 2) OVER w AS step3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
       FROM seq WHERE step3 IS NOT NULL
       GROUP BY 1, 2, 3
       ORDER BY n_paths DESC, step1, step2, step3 LIMIT 10""",
)
def events_top_paths(spark, sf_dir):
    """Top-10 three-step event-type journeys (per-user consecutive
    trigrams) — path mining one level deeper than the Markov bigram
    matrix. See windows.top_event_paths."""
    from ..operators.windows import top_event_paths

    view = _view(spark, sf_dir)
    return top_event_paths(view.tables["events"])


@register(
    "join_key_skew_profile",
    """WITH pk AS (
         SELECT l_suppkey AS key, count(*) AS n_rows
         FROM lineitem GROUP BY 1),
       tot AS (
         SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
                CAST(count(*) AS BIGINT) AS n_keys
         FROM pk)
       SELECT key, CAST(n_rows AS BIGINT) AS n_rows, total_rows, n_keys,
              floor(n_rows * 1.0 / total_rows * 1000000.0 + 0.5) / 1000000.0
                AS share,
              floor(n_rows * n_keys * 1.0 / total_rows * 1000000.0 + 0.5)
                / 1000000.0 AS skew_factor
       FROM pk CROSS JOIN tot
       ORDER BY n_rows DESC, key LIMIT 5""",
)
def join_key_skew_profile(spark, sf_dir):
    """Top-5 heaviest lineitem join keys (l_suppkey) with share and
    skew factor — the pre-shuffle skew audit that finds the keys the
    salted-join shape exists for (the testdata plants hot suppliers;
    this is the query that would catch them before
    skewed_join_hot_suppliers pays for them). See
    profiling.join_key_skew_profile."""
    from ..operators.profiling import join_key_skew_profile as op

    view = _view(spark, sf_dir)
    return op(view.tables["lineitem"], "l_suppkey")


# ---------------------------------------------------------------------------
# Batch 9: cluster-quality audits, retrieval eval, cross-table
# reconciliation, revenue concentration
# ---------------------------------------------------------------------------

@register(
    "embedding_silhouette",
    """WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       c AS (SELECT vec_id AS cid, ed AS cvec FROM e WHERE vec_id < 8),
       d AS (
         SELECT e.vec_id, c.cid,
                list_sum(list_transform(list_zip(e.ed, c.cvec),
                         p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist2
         FROM e, c),
       rk AS (
         SELECT vec_id, cid, dist2,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
         FROM d),
       sv AS (
         SELECT o.cid,
                CASE WHEN greatest(sqrt(o.dist2), sqrt(x.dist2)) = 0.0
                     THEN 0.0
                     ELSE floor((sqrt(x.dist2) - sqrt(o.dist2))
                                / greatest(sqrt(o.dist2), sqrt(x.dist2))
                                * 1000000.0 + 0.5) / 1000000.0 END AS s
         FROM (SELECT vec_id, cid, dist2 FROM rk WHERE rn = 1) o
         JOIN (SELECT vec_id, dist2 FROM rk WHERE rn = 2) x USING (vec_id))
       SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
              floor(CAST(sum(CAST(s AS DECIMAL(27,6))) AS DOUBLE) / count(*)
                    * 1000000.0 + 0.5) / 1000000.0 AS mean_silhouette
       FROM sv GROUP BY 1""",
)
def embedding_silhouette(spark, sf_dir):
    """Simplified (centroid-based) silhouette per cluster under the
    deterministic lowest-id k=8 seeding — O(n·k) member-fit audit.
    See similarity.simplified_silhouette."""
    from ..operators.similarity import simplified_silhouette

    view = _view(spark, sf_dir)
    return simplified_silhouette(view.tables["embeddings"], k=8)


@register(
    "embedding_davies_bouldin",
    """WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       c AS (SELECT vec_id AS cid, ed AS cvec FROM e WHERE vec_id < 8),
       d AS (
         SELECT e.vec_id, c.cid,
                list_sum(list_transform(list_zip(e.ed, c.cvec),
                         p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist2
         FROM e, c),
       own AS (
         SELECT vec_id, cid, dist2 FROM (
           SELECT vec_id, cid, dist2,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist2, cid) AS rn
           FROM d) WHERE rn = 1),
       scat AS (
         SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
                floor(CAST(sum(CAST(floor(sqrt(dist2) * 1000000.0 + 0.5)
                                    / 1000000.0 AS DECIMAL(27,6))) AS DOUBLE)
                      / count(*) * 1000000.0 + 0.5) / 1000000.0 AS scatter
         FROM own GROUP BY 1),
       cd AS (
         SELECT ci.cid, cj.cid AS cjd,
                sqrt(list_sum(list_transform(list_zip(ci.cvec, cj.cvec),
                     p -> (p[1] - p[2]) * (p[1] - p[2])))) AS cdist
         FROM c ci, c cj WHERE ci.cid != cj.cid),
       grid AS (
         SELECT cd.cid, cd.cjd, si.n_members, si.scatter,
                floor((si.scatter + sj.scatter) / cd.cdist
                      * 1000000.0 + 0.5) / 1000000.0 AS r
         FROM cd
         JOIN scat si ON si.cid = cd.cid
         JOIN scat sj ON sj.cid = cd.cjd)
       SELECT cid AS cluster_id, n_members, scatter,
              cjd AS worst_other, r AS db_ratio
       FROM (SELECT *, row_number() OVER (PARTITION BY cid
                                          ORDER BY r DESC, cjd) AS rn
             FROM grid)
       WHERE rn = 1""",
)
def embedding_davies_bouldin(spark, sf_dir):
    """Davies–Bouldin separation audit per cluster (worst (s_i+s_j)/d_ij
    neighbor named per cluster) — the centroid-layout complement to
    embedding_silhouette. See similarity.davies_bouldin."""
    from ..operators.similarity import davies_bouldin

    view = _view(spark, sf_dir)
    return davies_bouldin(view.tables["embeddings"], k=8)


@register(
    "retrieval_ndcg_eval",
    """WITH tok AS (
         SELECT doc_id,
                unnest(list_filter(string_split(lower(text), ' '),
                                   x -> x != '')) AS term
         FROM documents),
       tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
              WHERE term IN ('spark', 'hash', 'join') GROUP BY 1, 2),
       dfq AS (SELECT term, count(*) AS n_matched FROM tf GROUP BY 1),
       dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       g AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                    (SELECT avg(dl * 1.0) FROM dl) AS avgdl),
       scored AS (
         SELECT tf.term, tf.doc_id, tf.tf,
                floor(ln(1.0 + (g.n_docs - dfq.n_matched + 0.5)
                               / (dfq.n_matched + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl))
                      * 1000000.0 + 0.5) / 1000000.0 AS score
         FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
       dcg AS (
         SELECT term,
                CAST(sum(CAST(floor(tf / log2(rank + 1.0)
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE) AS dcg
         FROM (SELECT term, tf,
                      row_number() OVER (PARTITION BY term
                                         ORDER BY score DESC, doc_id) AS rank
               FROM scored)
         WHERE rank <= 10 GROUP BY 1),
       idcg AS (
         SELECT term,
                CAST(sum(CAST(floor(tf / log2(rank + 1.0)
                                    * 1000000000.0 + 0.5) / 1000000000.0
                              AS DECIMAL(27,9))) AS DOUBLE) AS idcg
         FROM (SELECT term, tf,
                      row_number() OVER (PARTITION BY term
                                         ORDER BY tf DESC, doc_id) AS rank
               FROM scored)
         WHERE rank <= 10 GROUP BY 1)
       SELECT term, CAST(n_matched AS BIGINT) AS n_matched,
              floor(dcg / idcg * 1000000.0 + 0.5) / 1000000.0 AS ndcg_at_k
       FROM dfq JOIN dcg USING (term) JOIN idcg USING (term)""",
)
def retrieval_ndcg_eval(spark, sf_dir):
    """nDCG@10 of the single-term BM25 ranking vs the tf-ideal ranking
    for the standing probe terms — the label-free retrieval eval.
    See retrieval.ndcg_eval."""
    from ..operators.retrieval import ndcg_eval

    view = _view(spark, sf_dir)
    return ndcg_eval(view.tables["documents"], ["spark", "hash", "join"], k=10)


@register(
    "order_total_reconciliation",
    f"""WITH rec AS (
         SELECT l_orderkey AS o_orderkey,
                {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
                  AS recomputed
         FROM lineitem GROUP BY 1),
       r AS (
         SELECT floor(recomputed / o_totalprice * 1000000.0 + 0.5)
                / 1000000.0 AS ratio
         FROM orders JOIN rec USING (o_orderkey))
       SELECT floor(ratio * 10.0 + 0.5) / 10.0 AS ratio_bucket,
              CAST(count(*) AS BIGINT) AS n_orders,
              min(ratio) AS min_ratio, max(ratio) AS max_ratio
       FROM r GROUP BY 1""",
)
def order_total_reconciliation(spark, sf_dir):
    """Recompute order totals from lineitems (exact decimal) and
    histogram the recomputed/o_totalprice ratio — the cross-feed
    consistency audit (the synthetic totals genuinely disagree; this
    catches it). See analytics.order_total_reconciliation."""
    from ..operators.analytics import order_total_reconciliation as op

    view = _view(spark, sf_dir)
    return op(view.tables["orders"], view.tables["lineitem"])


@register(
    "nation_revenue_hhi",
    f"""WITH pk AS (
         SELECT n_name AS grp, c_custkey AS key,
                {_dsum('l_extendedprice * (1 - l_discount)')} AS rev
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1, 2),
       tot AS (
         SELECT grp, {_dsum('rev')} AS tot,
                CAST(count(*) AS BIGINT) AS n_keys, max(rev) AS max_rev
         FROM pk GROUP BY 1)
       SELECT grp AS n_name, n_keys,
              floor(CAST(sum(CAST(floor((rev / tot) * (rev / tot)
                                        * 1000000000.0 + 0.5) / 1000000000.0
                                  AS DECIMAL(27,9))) AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS hhi,
              floor(max_rev / tot * 1000000.0 + 0.5) / 1000000.0 AS top_share
       FROM pk JOIN tot USING (grp)
       GROUP BY grp, n_keys, tot, max_rev""",
)
def nation_revenue_hhi(spark, sf_dir):
    """Herfindahl revenue-concentration index per nation over its
    customers (share² decimal-summed, top holder share named) — the
    market-concentration companion to source_gini_concentration.
    See statistics.hhi_concentration."""
    from ..operators.statistics import hhi_concentration

    view = _view(spark, sf_dir)
    li = (
        view.tables["lineitem"]
        .join(
            view.tables["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            view.tables["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            view.tables["nation"].select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return hhi_concentration(
        li,
        "n_name",
        "c_custkey",
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
    )


# ---------------------------------------------------------------------------
# Batch 10: silent-key streaming, exponential GoF, JL distortion,
# k-anonymity, neighborhood Jaccard
# ---------------------------------------------------------------------------

@register(
    "streaming_silent_keys",
    """WITH l AS (
         SELECT user_id,
                max(date_diff('microsecond',
                              TIMESTAMP '1970-01-01 00:00:00', ts))
                  AS last_epoch_us
         FROM events GROUP BY 1),
       g AS (SELECT max(last_epoch_us) AS gm FROM l)
       SELECT CAST(user_id AS BIGINT) AS user_id,
              CAST(last_epoch_us AS BIGINT) AS last_epoch_us,
              CAST(gm - last_epoch_us AS BIGINT) AS lag_us
       FROM l, g WHERE gm - last_epoch_us > 86400000000""",
)
def streaming_silent_keys(spark, sf_dir):
    """Silent-key liveness alert from the streaming last-seen tracker
    (one commutative max of wall-clock micros per user): users whose
    last event lags the stream's frontier by > 24 h. The batch oracle
    is exact because the state is a pure max. See
    streaming/stateful.streaming_last_seen."""
    from ..streaming.events import run_stream_to_memory
    from ..streaming.stateful import streaming_last_seen as op
    from .streaming import _STREAM_SEQ, _replayed_events_stream

    stream = _replayed_events_stream(spark, sf_dir, max_files_per_trigger=1)
    _STREAM_SEQ[0] += 1
    got = run_stream_to_memory(
        op(stream), f"q_stream_lastseen_{_STREAM_SEQ[0]}",
        output_mode="update", state_partitions=8,
    )
    final = got.groupBy("key").agg(F.max("last_epoch_us").alias("last_epoch_us"))
    frontier = final.agg(F.max("last_epoch_us").alias("gm"))
    return (
        final.crossJoin(F.broadcast(frontier))
        .where(F.col("gm") - F.col("last_epoch_us") > 86400000000)
        .select(
            F.col("key").cast("long").alias("user_id"),
            "last_epoch_us",
            (F.col("gm") - F.col("last_epoch_us")).alias("lag_us"),
        )
    )


@register(
    "events_gap_exponential_gof",
    """WITH t AS (
         SELECT event_type, user_id, event_id, ts,
                date_diff('microsecond',
                          TIMESTAMP '1970-01-01 00:00:00', ts) AS t_us
         FROM events),
       gp AS (
         SELECT event_type,
                (t_us - lag(t_us) OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id)) // 1000000
                  AS g
         FROM t),
       gaps AS (SELECT event_type, g FROM gp WHERE g IS NOT NULL),
       lam AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
                count(*) * 1.0 / sum(g) AS lam
         FROM gaps GROUP BY 1),
       binned AS (
         SELECT gaps.event_type,
                least(CAST(floor(10 * (1.0 - exp(-lam.lam * gaps.g)))
                           AS INT), 9) AS bin,
                count(*) AS o
         FROM gaps JOIN lam USING (event_type) GROUP BY 1, 2),
       grid AS (
         SELECT lam.event_type, lam.n_gaps, lam.lam, b.bin,
                coalesce(binned.o, 0) AS o
         FROM lam
         CROSS JOIN (SELECT unnest(range(10)) AS bin) b
         LEFT JOIN binned ON binned.event_type = lam.event_type
                         AND binned.bin = b.bin),
       terms AS (
         SELECT event_type, n_gaps, lam,
                floor((o - n_gaps / 10.0) * (o - n_gaps / 10.0)
                      / (n_gaps / 10.0) * 1000000000.0 + 0.5)
                / 1000000000.0 AS term
         FROM grid)
       SELECT event_type, n_gaps,
              floor(lam * 3600.0 * 1000000.0 + 0.5) / 1000000.0
                AS lambda_per_hour,
              floor(CAST(sum(CAST(term AS DECIMAL(27,9))) AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS chi2_gof
       FROM terms GROUP BY event_type, n_gaps, lam""",
)
def events_gap_exponential_gof(spark, sf_dir):
    """Exponential goodness-of-fit for per-type inter-event gaps: MLE
    λ + probability-integral-transform chi-square over the dense
    10-bin CDF grid — quantifies HOW non-Poisson the arrivals are.
    See windows.gap_exponential_gof."""
    from ..operators.windows import gap_exponential_gof

    view = _view(spark, sf_dir)
    return gap_exponential_gof(view.tables["events"])


def _jl_oracle() -> str:
    from ..operators.similarity import jl_sign_matrix

    signs = jl_sign_matrix(64, 16)
    ys = ",\n                ".join(
        "list_sum(list_transform(list_zip(ed, ["
        + ", ".join(str(v) for v in row)
        + "]), p -> p[1] * p[2])) * 0.25"
        for row in signs
    )
    return f"""WITH e AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       p AS (SELECT vec_id, ed, [{ys}] AS y FROM e),
       j AS (
         SELECT a.ed AS ed, b.ed AS ed2, a.y AS y, b.y AS y2
         FROM p a JOIN p b ON b.vec_id = a.vec_id + 1),
       r AS (
         SELECT floor(sqrt(list_sum(list_transform(list_zip(y, y2),
                             q -> (q[1] - q[2]) * (q[1] - q[2]))))
                      / sqrt(list_sum(list_transform(list_zip(ed, ed2),
                             q -> (q[1] - q[2]) * (q[1] - q[2]))))
                      * 1000000.0 + 0.5) / 1000000.0 AS ratio
         FROM j)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              min(ratio) AS min_ratio, max(ratio) AS max_ratio,
              floor(CAST(sum(CAST(ratio AS DECIMAL(27,6))) AS DOUBLE)
                    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS mean_ratio
       FROM r"""


@register("embedding_jl_distortion", None)
def embedding_jl_distortion(spark, sf_dir):
    """Johnson–Lindenstrauss 64→16 projection distortion audit over
    consecutive-id pairs: the md5-derandomized ±1 sign matrix folds
    into the plan as literals; distance ratios should concentrate
    near 1. See similarity.random_projection_distortion."""
    from ..operators.similarity import random_projection_distortion

    view = _view(spark, sf_dir)
    return random_projection_distortion(view.tables["embeddings"], d_out=16)


ORACLES["embedding_jl_distortion"] = _jl_oracle()


@register(
    "customer_k_anonymity",
    """WITH cls AS (
         SELECT c_nationkey, c_mktsegment,
                floor(c_acctbal / 1000.0) AS bal_bucket,
                count(*) AS sz
         FROM customer GROUP BY 1, 2, 3)
       SELECT CAST(sz AS BIGINT) AS class_size,
              CAST(count(*) AS BIGINT) AS n_classes,
              CAST(sum(sz) AS BIGINT) AS n_individuals
       FROM cls GROUP BY 1""",
)
def customer_k_anonymity(spark, sf_dir):
    """k-anonymity equivalence-class-size histogram over the
    (nation, segment, balance-k$-bucket) quasi-identifier — size-1
    classes are re-identifiable customers even with names dropped.
    See profiling.k_anonymity_classes."""
    from ..operators.profiling import k_anonymity_classes

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_bucket"),
    )
    return k_anonymity_classes(
        cust, ["c_nationkey", "c_mktsegment", "bal_bucket"]
    )


@register(
    "graph_neighbor_jaccard",
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
       sides AS (
         SELECT x AS u, y AS v FROM tri
         UNION ALL SELECT y, z FROM tri
         UNION ALL SELECT x, z FROM tri),
       sup AS (SELECT u, v, count(*) AS support FROM sides GROUP BY 1, 2),
       sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       dg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1)
       SELECT s.u, s.v, CAST(s.support AS BIGINT) AS n_common,
              floor(s.support / (du.deg + dv.deg - s.support)
                    * 1000000.0 + 0.5) / 1000000.0 AS jaccard
       FROM sup s
       JOIN dg du ON du.u = s.u
       JOIN dg dv ON dv.u = s.v""",
)
def graph_neighbor_jaccard(spark, sf_dir):
    """Neighborhood Jaccard per existing edge of the 1998 co-occurrence
    graph (common = triangle support, union from degrees — no second
    traversal) — the link-prediction feature layer over the truss
    machinery. See graph_algos.neighbor_jaccard."""
    from ..operators.graph_algos import neighbor_jaccard

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
    return neighbor_jaccard(e)


# ---------------------------------------------------------------------------
# Batch 11: readability, Fisher dims, changepoint, l-diversity, bloom audit
# ---------------------------------------------------------------------------

@register(
    "doc_readability_by_source",
    """WITH per_doc AS (
         SELECT source,
                len(list_filter(string_split(lower(text), ' '),
                                x -> x != '')) AS w,
                greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS snt,
                len(regexp_extract_all(lower(text), '[aeiou]+')) AS syl
         FROM documents),
       scored AS (
         SELECT source,
                floor((206.835 - 1.015 * (w / snt) - 84.6 * (syl / w))
                      * 1000000.0 + 0.5) / 1000000.0 AS score
         FROM per_doc WHERE w > 0)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              floor(CAST(sum(CAST(score AS DECIMAL(27,6))) AS DOUBLE)
                    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS mean_flesch,
              min(score) AS min_flesch, max(score) AS max_flesch
       FROM scored GROUP BY 1""",
)
def doc_readability_by_source(spark, sf_dir):
    """Flesch-reading-ease profile per source with deterministic regex
    proxies (vowel-run syllables, [.!?]+ sentences) — prose vs
    boilerplate screening. See text_analysis.readability_stats."""
    from ..operators.text_analysis import readability_stats

    view = _view(spark, sf_dir)
    return readability_stats(view.tables["documents"], group_col="source")


@register(
    "embedding_fisher_dims",
    """WITH e AS (
         SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       px AS (
         SELECT label, i - 1 AS dim, ed[i] AS v
         FROM (SELECT label, ed, unnest(range(1, len(ed) + 1)) AS i FROM e) t),
       t1 AS (
         SELECT label, dim, count(*) AS n, sum(v) AS s, sum(v * v) AS q
         FROM px GROUP BY 1, 2),
       a AS (
         SELECT dim, sum(n) AS nn, sum(s) AS ss, sum(s * s / n) AS sb,
                sum(q) AS qq, CAST(count(*) AS BIGINT) AS n_labels
         FROM t1 GROUP BY 1)
       SELECT CAST(dim AS INT) AS dim, n_labels,
              floor((sb - ss * ss / nn) / nn * 1000000.0 + 0.5) / 1000000.0
                AS between_var,
              floor((qq - sb) / nn * 1000000.0 + 0.5) / 1000000.0
                AS within_var,
              CASE WHEN (qq - sb) / nn > 0
                   THEN floor(((sb - ss * ss / nn) / nn) / ((qq - sb) / nn)
                              * 1000000.0 + 0.5) / 1000000.0 END AS f_ratio
       FROM a""",
)
def embedding_fisher_dims(spark, sf_dir):
    """Per-dimension Fisher discriminant ratio of the embedding space
    against its labels — names which coordinates carry label signal.
    See similarity.fisher_discriminant_dims."""
    from ..operators.similarity import fisher_discriminant_dims

    view = _view(spark, sf_dir)
    return fisher_discriminant_dims(view.tables["embeddings"])


@register(
    "orders_changepoint_day",
    """WITH d AS (
         SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n,
                sum(CAST(o_totalprice AS DECIMAL(27,4))) AS s
         FROM orders GROUP BY 1),
       c AS (
         SELECT day,
                sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cn,
                sum(s) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cs
         FROM d),
       t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, sum(s) AS st FROM d),
       scored AS (
         SELECT day AS split_day, CAST(cn AS BIGINT) AS n_before,
                CAST(nn - cn AS BIGINT) AS n_after,
                floor(CAST(cs AS DOUBLE) / cn * 100.0 + 0.5) / 100.0
                  AS mean_before,
                floor(CAST(st - cs AS DOUBLE) / (nn - cn) * 100.0 + 0.5)
                  / 100.0 AS mean_after,
                floor((CAST(cs AS DOUBLE) / cn
                       - CAST(st - cs AS DOUBLE) / (nn - cn))
                      * (CAST(cs AS DOUBLE) / cn
                         - CAST(st - cs AS DOUBLE) / (nn - cn))
                      * cn * (nn - cn) / nn * 1000000.0 + 0.5) / 1000000.0
                  AS delta_stat
         FROM c, t WHERE cn > 0 AND nn - cn > 0)
       SELECT * FROM scored
       ORDER BY delta_stat DESC, split_day LIMIT 1""",
)
def orders_changepoint_day(spark, sf_dir):
    """Single-changepoint locator over the daily order-value series
    (binary segmentation): the split day maximizing the between-
    segment SSE reduction, decimal-exact cumulative sums. See
    analytics.changepoint_day."""
    from ..operators.analytics import changepoint_day

    view = _view(spark, sf_dir)
    return changepoint_day(view.tables["orders"])


@register(
    "customer_l_diversity",
    """WITH pairs AS (
         SELECT c_nationkey, floor(c_acctbal / 1000.0) AS bal_bucket,
                c_mktsegment, count(*) AS n
         FROM customer GROUP BY 1, 2, 3),
       cls AS (
         SELECT c_nationkey, bal_bucket,
                CAST(count(*) AS BIGINT) AS l_div,
                CAST(sum(n) AS BIGINT) AS sz
         FROM pairs GROUP BY 1, 2)
       SELECT l_div AS l_diversity, CAST(count(*) AS BIGINT) AS n_classes,
              CAST(sum(sz) AS BIGINT) AS n_individuals
       FROM cls GROUP BY 1""",
)
def customer_l_diversity(spark, sf_dir):
    """l-diversity histogram: distinct sensitive values (mktsegment)
    within each (nation, balance-bucket) quasi-identifier class — the
    k-anonymity companion that catches large-but-uniform classes.
    See profiling.l_diversity_classes."""
    from ..operators.profiling import l_diversity_classes

    view = _view(spark, sf_dir)
    cust = view.tables["customer"].select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).alias("bal_bucket"),
        "c_mktsegment",
    )
    return l_diversity_classes(
        cust, ["c_nationkey", "bal_bucket"], "c_mktsegment"
    )


@register(
    "bloom_filter_fp_audit",
    """WITH kd AS (SELECT DISTINCT c_custkey AS key FROM customer),
       ix AS (SELECT unnest(range(4)) AS i),
       occ AS (
         SELECT DISTINCT
                ('0x' || substr(md5(CAST(key AS VARCHAR) || ':' || i), 1, 8))
                  ::BIGINT % 65536 AS h
         FROM kd CROSS JOIN ix),
       pr AS (SELECT -CAST(i AS BIGINT) AS p
              FROM (SELECT unnest(range(1, 5001)) AS i)),
       ph AS (
         SELECT p,
                ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || i), 1, 8))
                  ::BIGINT % 65536 AS h
         FROM pr CROSS JOIN ix),
       fp AS (
         SELECT CAST(count(*) AS BIGINT) AS n_false_positives
         FROM (SELECT p FROM ph JOIN occ USING (h)
               GROUP BY p HAVING count(*) = 4)),
       nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM occ),
       nk AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM kd),
       np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM pr)
       SELECT n_keys, n_bits_set, n_probes, n_false_positives,
              floor(n_false_positives / (n_probes * 1.0) * 1000000.0 + 0.5)
                / 1000000.0 AS fp_rate,
              floor((n_bits_set / 65536.0) * (n_bits_set / 65536.0)
                    * (n_bits_set / 65536.0) * (n_bits_set / 65536.0)
                    * 1000000.0 + 0.5) / 1000000.0 AS predicted_fp_rate
       FROM nk, nb, np, fp""",
)
def bloom_filter_fp_audit(spark, sf_dir):
    """Measured vs predicted false-positive rate of a 65536-bit 4-hash
    Bloom filter over customer keys, probed with 5000 known
    non-members — the sizing loop for bloom-pruned joins. See
    retrieval.bloom_fp_audit."""
    from ..operators.retrieval import bloom_fp_audit

    view = _view(spark, sf_dir)
    probes = spark.range(1, 5001).select(
        (-F.col("id")).cast("long").alias("probe_id")
    )
    return bloom_fp_audit(
        view.tables["customer"], "c_custkey", probes, "probe_id"
    )


# ---------------------------------------------------------------------------
# Batch 12: anisotropy, backlog, exact group median, delay trend, Wilson
# ---------------------------------------------------------------------------

@register(
    "embedding_pair_cosine_histogram",
    """WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
         FROM embeddings),
       n AS (
         SELECT vec_id, ed,
                sqrt(list_sum(list_transform(ed, x -> x * x))) AS nrm
         FROM e),
       p AS (
         SELECT floor(list_sum(list_transform(list_zip(a.ed, b.ed),
                                q -> q[1] * q[2]))
                      / (a.nrm * b.nrm) * 1000000.0 + 0.5) / 1000000.0 AS c
         FROM n a JOIN n b ON b.vec_id = a.vec_id + 25)
       SELECT floor(c * 10.0 + 0.5) / 10.0 AS cos_bucket,
              CAST(count(*) AS BIGINT) AS n_pairs
       FROM p GROUP BY 1""",
)
def embedding_pair_cosine_histogram(spark, sf_dir):
    """Anisotropy audit: cosine histogram over fixed-offset id pairs —
    collapsed embedding spaces shift the mass toward 1. See
    similarity.pair_cosine_histogram."""
    from ..operators.similarity import pair_cosine_histogram

    view = _view(spark, sf_dir)
    return pair_cosine_histogram(view.tables["embeddings"], offset=25)


@register(
    "orders_daily_backlog",
    """WITH opened AS (
         SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                count(*) AS n_opened
         FROM orders GROUP BY 1),
       closed AS (
         SELECT strftime(mx, '%Y-%m-%d') AS day, count(*) AS n_closed
         FROM (SELECT l_orderkey, max(l_shipdate) AS mx
               FROM lineitem GROUP BY 1)
         GROUP BY 1),
       days AS (
         SELECT coalesce(o.day, c.day) AS day,
                coalesce(o.n_opened, 0) AS n_opened,
                coalesce(c.n_closed, 0) AS n_closed
         FROM opened o FULL OUTER JOIN closed c ON o.day = c.day)
       SELECT day, CAST(n_opened AS BIGINT) AS n_opened,
              CAST(n_closed AS BIGINT) AS n_closed,
              CAST(sum(n_opened) OVER w - sum(n_closed) OVER w AS BIGINT)
                AS backlog
       FROM days
       WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW)""",
)
def orders_daily_backlog(spark, sf_dir):
    """Daily work-in-progress backlog: cumulative opened minus
    cumulative fully-shipped orders — the lifecycle cross-feed audit.
    See analytics.daily_order_backlog."""
    from ..operators.analytics import daily_order_backlog

    view = _view(spark, sf_dir)
    return daily_order_backlog(view.tables["orders"], view.tables["lineitem"])


@register(
    "nation_customer_median_ltv",
    f"""WITH pk AS (
         SELECT n_name AS grp, c_custkey AS key,
                {_dsum('l_extendedprice * (1 - l_discount)')} AS total
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1, 2),
       rk AS (
         SELECT grp, total,
                row_number() OVER (PARTITION BY grp
                                   ORDER BY total, key) AS rn,
                count(*) OVER (PARTITION BY grp) AS cnt
         FROM pk)
       SELECT grp AS n_name, CAST(max(cnt) AS BIGINT) AS n_keys,
              floor(sum(total) / count(*) * 100.0 + 0.5) / 100.0
                AS median_total
       FROM rk
       WHERE rn = floor((cnt + 1) / 2) OR rn = floor((cnt + 2) / 2)
       GROUP BY grp""",
)
def nation_customer_median_ltv(spark, sf_dir):
    """Exact median customer lifetime revenue per nation (true middle
    element over exact decimal totals, not a sketch interpolation).
    See statistics.exact_group_median."""
    from ..operators.statistics import exact_group_median

    view = _view(spark, sf_dir)
    li = (
        view.tables["lineitem"]
        .join(
            view.tables["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            view.tables["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            view.tables["nation"].select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return exact_group_median(
        li,
        "n_name",
        "c_custkey",
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
    )


@register(
    "supplier_delay_trend",
    """WITH j AS (
         SELECT l_suppkey,
                date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                  AS x,
                date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE)) AS y
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       a AS (
         SELECT l_suppkey, count(*) AS n,
                CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
         FROM j GROUP BY 1)
       SELECT l_suppkey, CAST(n AS BIGINT) AS n_lineitems,
              floor(sy * 1.0 / n * 100.0 + 0.5) / 100.0 AS mean_delay_days,
              floor((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * 365.0
                    * 1000000.0 + 0.5) / 1000000.0
                AS delay_trend_days_per_year
       FROM a WHERE n * sxx - sx * sx > 0
       ORDER BY delay_trend_days_per_year DESC, l_suppkey LIMIT 5""",
)
def supplier_delay_trend(spark, sf_dir):
    """Top-5 suppliers with the fastest-WORSENING delivery delay (OLS
    slope over exact integer sums, recentered x to dodge overflow).
    See analytics.supplier_delay_trend."""
    from ..operators.analytics import supplier_delay_trend as op

    view = _view(spark, sf_dir)
    return op(view.tables["orders"], view.tables["lineitem"])


@register(
    "brand_return_wilson",
    """WITH j AS (
         SELECT p_brand,
                CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
         FROM lineitem JOIN part ON l_partkey = p_partkey),
       a AS (
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(r) AS BIGINT) AS n_returns
         FROM j GROUP BY 1)
       SELECT p_brand, n, n_returns,
              floor(n_returns / (n * 1.0) * 1000000.0 + 0.5) / 1000000.0
                AS return_rate,
              floor((n_returns / (n * 1.0) + (1.96 * 1.96) / (2 * n)
                     - 1.96 * sqrt((n_returns / (n * 1.0))
                                   * (1 - n_returns / (n * 1.0)) / n
                                   + (1.96 * 1.96) / (4 * n * n)))
                    / (1 + (1.96 * 1.96) / n) * 1000000.0 + 0.5) / 1000000.0
                AS wilson_lower_bound
       FROM a""",
)
def brand_return_wilson(spark, sf_dir):
    """Return-rate per brand with the Wilson score lower bound — the
    small-sample-honest rate leaderboard. See
    analytics.brand_return_wilson."""
    from ..operators.analytics import brand_return_wilson as op

    view = _view(spark, sf_dir)
    return op(view.tables["lineitem"], view.tables["part"])
