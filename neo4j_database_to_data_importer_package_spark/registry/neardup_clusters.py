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
from .analytic_shapes import _embedding_lsh_oracle

# End-to-end near-dup clustering: LSH candidate pairs -> connected
# components -> one keep-doc per cluster (the training-corpus keep-list)
# ---------------------------------------------------------------------------

ORACLES["dedup_near_dup_clusters"] = f"""
  WITH pairs AS ({ORACLES["dedup_minhash_lsh_pairs"]}),
  und AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b AS a, id_a AS b FROM pairs),
  nodes AS (SELECT DISTINCT a AS node FROM und),
  reach AS (
    WITH RECURSIVE r(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.b, r.comp FROM r JOIN und u ON u.a = r.node)
    SELECT * FROM r),
  comp AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node)
  SELECT cluster_id, count(*) AS n_docs, count(*) - 1 AS n_dropped
  FROM comp GROUP BY cluster_id"""


def dedup_near_dup_clusters(spark, sf_dir):
    """The full near-dup dedup pipeline a training corpus needs: MinHash
    signatures → banded LSH candidates → Jaccard-verified pairs →
    connected components over the pair graph → per-cluster canonical doc
    (min doc_id = cluster_id) with the drop count. Transitive duplicates
    (A~B, B~C but A!~C) land in ONE cluster — pair-level dedup alone
    would keep too many. All stages are the bucketed/bounded ones
    (shuffle-free signatures, banded equi-join, candidate-only
    verification, label-propagation CC) — nothing quadratic in corpus
    size, so the composition survives 100 TB."""
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.graph_algos import connected_components

    view = _view(spark, sf_dir)
    # Checkpoint the pair list: connected_components unions its edge
    # input with itself, which would otherwise run the banded candidate
    # join twice (same rationale as embedding_near_dup_clusters below).
    pairs = (
        minhash_lsh_pairs(view.tables["documents"])
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    # Numeric ids end-to-end: CC's min-label must agree with the oracle's
    # numeric min (string min would order "10" < "9").
    comp = connected_components(pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    return (
        comp.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "cluster_id",
            "n_docs",
            (F.col("n_docs") - F.lit(1)).alias("n_dropped"),
        )
    )


QUERIES["dedup_near_dup_clusters"] = dedup_near_dup_clusters


# ---------------------------------------------------------------------------
# Semantic (embedding-space) near-dup clustering + deterministic sampling
# ---------------------------------------------------------------------------

ORACLES["embedding_near_dup_clusters"] = f"""
  WITH pairs AS ({_embedding_lsh_oracle()}),
  strong AS (SELECT id_a, id_b FROM pairs WHERE cosine >= 0.42),
  und AS (SELECT id_a AS a, id_b AS b FROM strong
          UNION SELECT id_b AS a, id_a AS b FROM strong),
  nodes AS (SELECT DISTINCT a AS node FROM und),
  reach AS (
    WITH RECURSIVE r(node, comp) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.b, r.comp FROM r JOIN und u ON u.a = r.node)
    SELECT * FROM r),
  comp AS (SELECT node AS vec_id, min(comp) AS cluster_id FROM reach GROUP BY node)
  SELECT cluster_id, count(*) AS n_vecs, count(*) - 1 AS n_dropped
  FROM comp GROUP BY cluster_id"""


def embedding_near_dup_clusters(spark, sf_dir):
    """Semantic dedup: hyperplane-LSH candidate pairs above a cosine
    threshold (0.42 here — the top similarity band of the synthetic
    near-uniform embeddings; a production corpus of real duplicates would
    sit at ~0.9 with identical plumbing) →
    connected components → one keep-vector per cluster. The embedding twin
    of ``dedup_near_dup_clusters`` — near-identical meaning collapses even
    when the text-level shingles differ. The >= comparison is on the
    6-dp-rounded cosine BOTH engines emit, so threshold membership is
    engine-independent."""
    from ..operators.graph_algos import connected_components
    from ..operators.similarity import embedding_lsh_pairs as op

    view = _view(spark, sf_dir)
    # The pair list is tiny (verified near-dups) but its DAG is the whole
    # LSH pipeline, and connected_components unions its edge input with
    # itself — checkpoint the pairs so candidate generation runs once,
    # not twice (0.45s at sf0.1; at corpus scale the second candidate
    # join would dwarf the checkpoint write).
    strong = (
        op(view.tables["embeddings"])
        .filter(F.col("cosine") >= 0.42)
        .localCheckpoint(eager=False)
    )
    comp = connected_components(
        strong.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return (
        comp.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .select("cluster_id", "n_vecs", (F.col("n_vecs") - F.lit(1)).alias("n_dropped"))
    )


QUERIES["embedding_near_dup_clusters"] = embedding_near_dup_clusters


@register(
    "corpus_hash_sample",
    """SELECT doc_id, lang,
              floor((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) * 1000000.0 + 0.5) / 1000000.0 AS frac
       FROM documents
       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < 0.2""",
)
def corpus_hash_sample(spark, sf_dir):
    """Deterministic corpus downsampling: hash-based Bernoulli (md5 of the
    stable id → uniform (0,1) fraction, keep < rate). Unlike
    ``df.sample()``, the keep-set is a pure function of the id — stable
    across runs, engines, partitionings, and retries, which is what a
    reproducible training-data pipeline needs. Filter is a scan-level
    predicate: no shuffle at any scale."""
    view = _view(spark, sf_dir)
    docs = view.tables["documents"]
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(4294967296.0)
    )
    from ..functions.numeric import round_half_up

    return (
        docs.select("doc_id", "lang", frac.alias("__frac"))
        .filter(F.col("__frac") < 0.2)
        .select("doc_id", "lang", round_half_up(F.col("__frac"), 6).alias("frac"))
    )


@register(
    "events_stratified_sample",
    """WITH rated AS (
         SELECT event_id, event_type,
                ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS frac,
                CASE event_type WHEN 'view' THEN 0.05
                                WHEN 'purchase' THEN 0.5
                                ELSE 0.2 END AS rate
         FROM events)
       SELECT event_id, event_type,
              floor(frac * 1000000.0 + 0.5) / 1000000.0 AS frac
       FROM rated WHERE frac < rate""",
)
def events_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling: per-stratum keep rates (rare
    strata kept at higher rates) with the same hash-Bernoulli mechanics —
    the class-balancing downsample step of a training pipeline, still a
    pure scan-level predicate."""
    from ..functions.numeric import round_half_up

    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    frac = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(4294967296.0)
    )
    rate = (
        F.when(F.col("event_type") == "view", 0.05)
        .when(F.col("event_type") == "purchase", 0.5)
        .otherwise(0.2)
    )
    return (
        ev.select("event_id", "event_type", frac.alias("__frac"), rate.alias("__rate"))
        .filter(F.col("__frac") < F.col("__rate"))
        .select(
            "event_id", "event_type", round_half_up(F.col("__frac"), 6).alias("frac")
        )
    )


# ---------------------------------------------------------------------------
