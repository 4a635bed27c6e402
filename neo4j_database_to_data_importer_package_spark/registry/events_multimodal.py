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

# JSON property extraction over events (semi-structured column handling)
# ---------------------------------------------------------------------------

@register(
    "events_json_props",
    """SELECT event_type, CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
              count(*) AS n
       FROM events GROUP BY event_type""",
)
def events_json_props(spark, sf_dir):
    view = _view(spark, sf_dir)
    ev = view.tables["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only: deterministic fake decode, see
# operators/multimodal.py — real codecs are stubbed in this environment)
# ---------------------------------------------------------------------------

def multimodal_features(spark, sf_dir):
    from ..operators.multimodal import extract_features, fixture_media_path

    # The media table is a COMMITTED parquet fixture (tools/make_fixtures.py)
    # so the DuckDB oracle computes the same byte statistics over the very
    # same payload blobs. Scalar-only output (gate canon can't sort arrays):
    # the 16-bin histogram becomes columns f0..f15. byte_mean / f* are exact
    # integer divisions — identical doubles on both engines, left unrounded
    # (rounding would CREATE mismatches: the values are multiples of 1/2^k,
    # exact .5 ties at any decimal width, and the engines round ties
    # differently). byte_entropy is an order-dependent float sum — rounded
    # to 4 decimals on both sides.
    feats = extract_features(
        spark.read.parquet(fixture_media_path()), fake=True
    )
    return feats.select(
        "media_id",
        "n_bytes",
        "byte_mean",
        F.round("byte_entropy", 4).alias("byte_entropy"),
        *[F.element_at("features", k + 1).alias(f"f{k}") for k in range(16)],
    )


def multimodal_frame_plan(spark, sf_dir):
    from ..operators.multimodal import frame_sample_plan, make_fake_media

    return frame_sample_plan(make_fake_media(spark, n=64), every_ms=500)


QUERIES["multimodal_features"] = multimodal_features
# Byte statistics over the committed payload blobs, decoded from hex in
# pure SQL (blob → hex string → per-byte values via nibble lookup).
_MEDIA_FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))),
    "fixtures",
    "fake_media.parquet",
)
ORACLES["multimodal_features"] = f"""
WITH media AS (
  SELECT media_id, octet_length(payload) AS n, lower(hex(payload)) AS h
  FROM read_parquet('{_MEDIA_FIXTURE}')
),
pos AS (
  SELECT media_id, n, h, unnest(range(0, n)) AS i FROM media
),
bytes AS (
  SELECT media_id, n,
         (strpos('0123456789abcdef', substr(h, 2*i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(h, 2*i + 2, 1)) - 1) AS b
  FROM pos
),
counts AS (
  SELECT media_id, any_value(n) AS n, b, count(*) AS c
  FROM bytes GROUP BY media_id, b
)
SELECT media_id,
       CAST(any_value(n) AS INTEGER) AS n_bytes,
       sum(b * c) * 1.0 / any_value(n) AS byte_mean,
       round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)), 4) AS byte_entropy,
       {", ".join(f"sum(CASE WHEN b // 16 = {k} THEN c ELSE 0 END) * 1.0 / any_value(n) AS f{k}" for k in range(16))}
FROM counts GROUP BY media_id
"""
QUERIES["multimodal_frame_plan"] = multimodal_frame_plan
# The frame-sampling plan over the deterministic fake media table is pure
# arithmetic (duration_ms = 3000 + 500*(id%5), frames every 500 ms
# inclusive of the endpoint) — regenerate the same table in SQL.
ORACLES["multimodal_frame_plan"] = """
SELECT media_id,
       CAST(unnest(range(0, 3000 + 500 * (media_id % 5) + 1, 500)) AS BIGINT) AS frame_ts_ms
FROM (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS media_id) m
"""


# ---------------------------------------------------------------------------
