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

# Vector similarity (brute-force cosine pairs / top-k / IVF ANN)
# ---------------------------------------------------------------------------

_COS_DUCK = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


@register(
    "embedding_cosine_pairs",
    f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 >= 0.35""",
)
def embedding_cosine_pairs(spark, sf_dir):
    from ..operators.similarity import cosine_pairs

    view = _view(spark, sf_dir)
    return cosine_pairs(view.tables["embeddings"], threshold=0.35)


@register(
    "embedding_topk",
    f"""SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 AS cosine,
               CAST(row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY floor(({_COS_DUCK}) * 1000000.0 + 0.5) / 1000000.0 DESC, b.vec_id) AS INT) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 10
        QUALIFY rank <= 10""",
)
def embedding_topk(spark, sf_dir):
    from ..operators.similarity import brute_force_topk

    view = _view(spark, sf_dir)
    return brute_force_topk(view.tables["embeddings"], k=10, n_queries=10)


def embedding_ivf_topk(spark, sf_dir):
    from ..operators.similarity import ivf_topk

    view = _view(spark, sf_dir)
    return ivf_topk(view.tables["embeddings"], k=10, n_cells=16, nprobe=4, n_queries=10)


QUERIES["embedding_ivf_topk"] = embedding_ivf_topk
# The IVF path is deterministic end-to-end (centroids = first n_cells
# vectors, every ranking tie-broken), so the WHOLE approximate index is
# SQL-expressible: the oracle mirrors assign → probe → scan stage by
# stage with identical rounding and tie-breaks.
ORACLES["embedding_ivf_topk"] = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings
),
cents AS (SELECT vec_id AS cell, v AS cv, norm AS cn FROM v WHERE vec_id < 16),
assigned AS (
  SELECT vec_id, v, norm, cell FROM (
    SELECT a.vec_id, a.v, a.norm, c.cell,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY floor((list_dot_product(a.v, c.cv)/(a.norm*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                      c.cell) AS r
    FROM v a CROSS JOIN cents c) t WHERE r = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM assigned WHERE vec_id < 10),
probe AS (
  SELECT query_id, qv, qn, cell FROM (
    SELECT q.query_id, q.qv, q.qn, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY floor((list_dot_product(q.qv, c.cv)/(q.qn*c.cn)) * 1000000.0 + 0.5)/1000000.0 DESC,
                      c.cell) AS r
    FROM q CROSS JOIN cents c) t WHERE r <= 4
),
scored AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
         floor((list_dot_product(p.qv, n.v)/(p.qn*n.norm)) * 1000000.0 + 0.5)/1000000.0 AS cosine
  FROM probe p JOIN assigned n ON n.cell = p.cell AND n.vec_id != p.query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
FROM scored QUALIFY rank <= 10
"""


# ---------------------------------------------------------------------------
