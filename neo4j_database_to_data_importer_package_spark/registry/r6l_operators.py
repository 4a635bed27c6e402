"""Round-6 batch 23: bigram entropy rate, daily-count dispersion
index, spectral-radius power iteration, audio energy windows, and the
recommender coverage/diversity audit — each an oracle-backed registry
entry per the standing gate discipline (COVERAGE.md)."""

from __future__ import annotations

from ._core import (  # noqa: F401
    F,
    ORACLES,
    _view,
    register,
)
from .dedup import _TOKS_DUCK
from .r6f_operators import _MEDIA_FIXTURE


@register(
    "corpus_bigram_entropy_rate",
    f"""WITH tokd AS (SELECT doc_id, lang, {_TOKS_DUCK} AS t FROM documents),
       uni AS (
         SELECT lang, w, count(*) AS c
         FROM (SELECT lang, unnest(t) AS w FROM tokd) GROUP BY 1, 2),
       utot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tu FROM uni GROUP BY 1),
       bi AS (
         SELECT lang, w1, w2, count(*) AS c12
         FROM (SELECT lang, t[i] AS w1, t[i+1] AS w2
               FROM (SELECT lang, t, unnest(range(1, len(t))) AS i FROM tokd))
         GROUP BY 1, 2, 3),
       c1 AS (SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1
              FROM bi GROUP BY 1, 2),
       btot AS (SELECT lang, CAST(sum(c12) AS BIGINT) AS tb FROM bi GROUP BY 1),
       h1 AS (
         SELECT uni.lang, max(tu) AS n_tokens,
                CAST(sum(CAST(floor(
                  -(c / CAST(tu AS DOUBLE)) * log2(c / CAST(tu AS DOUBLE))
                  * 1000000000.0 + 0.5) / 1000000000.0
                AS DECIMAL(28,9))) AS DOUBLE) AS hh1
         FROM uni JOIN utot ON uni.lang = utot.lang GROUP BY 1),
       h2 AS (
         SELECT bi.lang, max(tb) AS n_bigrams,
                CAST(sum(CAST(floor(
                  -(c12 / CAST(tb AS DOUBLE)) * log2(c12 / CAST(c1 AS DOUBLE))
                  * 1000000000.0 + 0.5) / 1000000000.0
                AS DECIMAL(28,9))) AS DOUBLE) AS hh2
         FROM bi JOIN c1 ON bi.lang = c1.lang AND bi.w1 = c1.w1
                 JOIN btot ON bi.lang = btot.lang
         GROUP BY 1)
       SELECT h1.lang, n_tokens, n_bigrams,
              floor(hh1 * 1000000.0 + 0.5) / 1000000.0 AS h_unigram,
              floor(hh2 * 1000000.0 + 0.5) / 1000000.0 AS h_bigram_cond,
              floor((1 - hh2 / hh1) * 1000000.0 + 0.5) / 1000000.0
                AS redundancy
       FROM h1 JOIN h2 ON h1.lang = h2.lang""",
)
def corpus_bigram_entropy_rate(spark, sf_dir):
    """Per-language unigram entropy, conditional bigram entropy rate,
    and redundancy — the Shannon compressibility profile. See
    text_analysis.bigram_entropy_rate."""
    from ..operators.text_analysis import bigram_entropy_rate

    view = _view(spark, sf_dir)
    return bigram_entropy_rate(view.tables["documents"])


@register(
    "events_dispersion_index",
    """WITH daily AS (
         SELECT event_type AS key, strftime(ts, '%Y-%m-%d') AS day,
                count(*) AS c
         FROM events GROUP BY 1, 2),
       m AS (
         SELECT key, count(*) AS n_days,
                CAST(sum(c) AS BIGINT) AS s1,
                CAST(sum(c * c) AS BIGINT) AS s2
         FROM daily GROUP BY 1)
       SELECT key AS event_type, n_days,
              floor((s1 / CAST(n_days AS DOUBLE)) * 1000000.0 + 0.5)
                / 1000000.0 AS mean_daily,
              floor(((s2 - s1 * (s1 / CAST(n_days AS DOUBLE))) / (n_days - 1))
                    * 1000000.0 + 0.5) / 1000000.0 AS var_daily,
              floor((((s2 - s1 * (s1 / CAST(n_days AS DOUBLE)))
                      / (n_days - 1)) / (s1 / CAST(n_days AS DOUBLE)))
                    * 1000000.0 + 0.5) / 1000000.0 AS vmr,
              floor(((n_days - 1) * ((s2 - s1 * (s1 / CAST(n_days AS DOUBLE)))
                      / (n_days - 1)) / (s1 / CAST(n_days AS DOUBLE)))
                    * 1000000.0 + 0.5) / 1000000.0 AS chi2
       FROM m""",
)
def events_dispersion_index(spark, sf_dir):
    """Variance-to-mean ratio of daily event counts per type (Poisson
    overdispersion screen). See statistics.dispersion_index."""
    from ..operators.statistics import dispersion_index

    view = _view(spark, sf_dir)
    return dispersion_index(view.tables["events"])


_POWER_ROUND = """SELECT n.node, CAST(coalesce(s.s, 0) AS BIGINT) AS x
         FROM nodes n LEFT JOIN (
           SELECT und.a AS node, sum({prev}.x) AS s
           FROM und JOIN {prev} ON und.b = {prev}.node
           GROUP BY 1) s ON n.node = s.node"""


@register(
    "graph_spectral_radius",
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
       nodes AS (SELECT DISTINCT a AS node FROM und),
       x0 AS (SELECT node, CAST(1 AS BIGINT) AS x FROM nodes),
       x1 AS (""" + _POWER_ROUND.format(prev="x0") + """),
       x2 AS (""" + _POWER_ROUND.format(prev="x1") + """),
       x3 AS (""" + _POWER_ROUND.format(prev="x2") + """),
       ray AS (
         SELECT count(*) AS n_nodes,
                sum(CAST(a.x AS HUGEINT) * b.x) AS num,
                sum(CAST(b.x AS HUGEINT) * b.x) AS den,
                sum(CAST(a.x AS HUGEINT)) AS tot
         FROM x3 a JOIN x2 b ON a.node = b.node),
       top AS (SELECT node, x FROM x3 ORDER BY x DESC, node LIMIT 10)
       SELECT node,
              floor(CAST(x AS DOUBLE) / CAST(tot AS DOUBLE)
                    * 1000000000.0 + 0.5) / 1000000000.0 AS x_share,
              floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                    * 1000000.0 + 0.5) / 1000000.0 AS lambda_est,
              n_nodes
       FROM top, ray""",
)
def graph_spectral_radius(spark, sf_dir):
    """Spectral radius of the one-ship-year co-occurrence graph by
    3 integer power iterations + a decimal-exact Rayleigh quotient;
    rows = the top-10 eigenvector-centrality nodes. See
    graph_algos.spectral_radius_estimate."""
    from ..operators.graph_algos import spectral_radius_estimate
    from .r6_operators import _shipyear_graph

    return spectral_radius_estimate(
        _shipyear_graph(_view(spark, sf_dir)), rounds=3, top_k=10
    )


ORACLES["multimodal_audio_energy_windows"] = f"""
WITH media AS (
  SELECT media_id, octet_length(payload) AS n, lower(hex(payload)) AS h
  FROM read_parquet('{_MEDIA_FIXTURE}')
),
pos AS (SELECT media_id, n, h, unnest(range(0, n)) AS i FROM media),
bytes AS (
  SELECT media_id, i // 256 AS w,
         (strpos('0123456789abcdef', substr(h, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(h, 2*i + 2, 1)) - 1) AS b
  FROM pos)
SELECT media_id, w, count(*) AS n_samples,
       floor(sqrt(sum((b - 128) * (b - 128)) / CAST(count(*) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS rms
FROM bytes GROUP BY media_id, w
"""


def multimodal_audio_energy_windows(spark, sf_dir):
    """Windowed RMS energy over the committed media fixture's payload
    bytes (8-bit centered PCM reading, 256-byte frames) — the
    voice-activity front-end with only the codec decode stubbed;
    Arrow-batched mapInPandas on the Spark side, hex-nibble byte replay
    in the oracle. See multimodal.audio_energy_windows."""
    from ..operators.multimodal import audio_energy_windows, fixture_media_path

    return audio_energy_windows(spark.read.parquet(fixture_media_path()))


from ._core import QUERIES  # noqa: E402

QUERIES["multimodal_audio_energy_windows"] = multimodal_audio_energy_windows


@register(
    "part_recs_coverage_diversity",
    f"""WITH recs AS ({ORACLES["part_copurchase_topk"]}),
       lists AS (
         SELECT part, count(*) AS len,
                count(DISTINCT p_brand) AS nb
         FROM recs JOIN part ON co_part = p_partkey
         GROUP BY part),
       per AS (
         SELECT count(*) AS n_lists,
                CAST(sum(len) AS BIGINT) AS lens,
                CAST(sum(CAST(floor(nb / CAST(len AS DOUBLE)
                     * 1000000000.0 + 0.5) / 1000000000.0
                   AS DECIMAL(28,9))) AS DOUBLE) AS sdiv
         FROM lists),
       cov AS (SELECT count(DISTINCT co_part) AS nrec FROM recs),
       cat AS (SELECT count(*) AS n_catalog FROM part)
       SELECT n_lists, n_catalog, nrec AS n_recommended,
              floor(nrec / CAST(n_catalog AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS coverage,
              floor(lens / CAST(n_lists AS DOUBLE) * 1000000.0 + 0.5)
                / 1000000.0 AS mean_list_len,
              floor(sdiv / n_lists * 1000000.0 + 0.5) / 1000000.0
                AS mean_brand_diversity
       FROM per, cov, cat""",
)
def part_recs_coverage_diversity(spark, sf_dir):
    """Offline recommender audit of the co-purchase top-5 lists:
    catalog coverage + mean intra-list brand diversity. See
    analytics.recs_coverage_diversity."""
    from ..operators.analytics import recs_coverage_diversity

    return recs_coverage_diversity(_view(spark, sf_dir))
