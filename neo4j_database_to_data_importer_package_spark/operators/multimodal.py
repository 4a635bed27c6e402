"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media ride as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages so each executor processes whole record batches.
The actual codec calls are STUBBED (image/audio libraries are not in this
container): ``decode_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake "decode" produces
byte-statistics features — making the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) fully real and testable.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of rows
fits executor memory, and select() media columns only in the stages that
need them (column pruning drops the bytes everywhere else).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        # double, not float32: the fake-decode features are exact integer
        # ratios (bin_count / n_bytes) and the oracle comparison relies on
        # both engines producing the identical division result.
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def fixture_media_path() -> str:
    """Committed fake-media parquet (payload blobs are checked in so the
    DuckDB gate oracle reads the very same bytes — see
    tools/make_fixtures.py)."""
    import os

    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures", "fake_media.parquet")


def decode_stub(payload: bytes, meta: dict, fake: bool = False) -> dict:
    """Decode one media payload.

    Real decoding requires codec libraries not present in this
    environment; ``fake=True`` substitutes a deterministic byte-level
    "decode" (histogram statistics) with the same output contract.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries (PIL/librosa/av) not "
            "available in this environment; pass fake=True for the "
            "deterministic stub"
        )
    import math

    data = payload or b""
    n = len(data)
    counts = [0] * 256
    for b in data:
        counts[b] += 1
    mean = sum(i * c for i, c in enumerate(counts)) / n if n else 0.0
    entropy = -sum(
        (c / n) * math.log2(c / n) for c in counts if c
    ) if n else 0.0
    # 16-bin byte histogram as the fake feature vector
    feats = [sum(counts[i * 16 : (i + 1) * 16]) / n if n else 0.0 for i in range(16)]
    return {"n_bytes": n, "byte_mean": mean, "byte_entropy": entropy, "features": feats}


def extract_features(media: DataFrame, fake: bool = True, batch_size_hint: int = 64) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves each partition as record batches; the iterator contract
    keeps peak memory to one batch of payloads per task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_stub(bytes(payload) if payload is not None else b"", {}, fake=fake)
                rows.append(
                    (int(mid), d["n_bytes"], d["byte_mean"], d["byte_entropy"], d["features"])
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "byte_mean", "byte_entropy", "features"]
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (the decode of each frame is the stubbed stage). Pure JVM-side:
    explode over a sequence of timestamps derived from duration."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/demos."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        size = 256 + (i % 7) * 128
        payload = bytes(rng.randrange(256) for _ in range(size))
        rows.append(
            (
                i,
                payload,
                {
                    "media_type": ["image", "audio", "video"][i % 3],
                    "format": ["png", "wav", "mp4"][i % 3],
                    "width": 64,
                    "height": 64,
                    "duration_ms": 3000 + 500 * (i % 5),
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_plan(
    media: DataFrame,
    w_col: str = "width",
    h_col: str = "height",
    max_side: int = 512,
    multiple_of: int = 8,
) -> DataFrame:
    """Image/video resize *plan*: target dimensions for each asset —
    aspect-preserving downscale so the longer side is at most ``max_side``,
    snapped down to a multiple of ``multiple_of`` (the tensor-friendly
    shape most vision models want). Never upscales. Pure JVM expressions;
    the pixel resample itself is the stubbed decode stage, exactly like
    ``extract_features``. Columns: (.., scale, out_w, out_h).
    """
    w = F.col(w_col).cast("double")
    h = F.col(h_col).cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    snap = lambda c: (F.floor(c * scale / multiple_of) * multiple_of).cast("bigint")
    return media.withColumn("scale", scale).withColumn(
        "out_w", F.greatest(snap(w), F.lit(multiple_of))
    ).withColumn("out_h", F.greatest(snap(h), F.lit(multiple_of)))


def ahash_near_dup(
    features: DataFrame,
    id_col: str = "media_id",
    n_bins: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """Perceptual-hash near-duplicate candidates over media byte
    features: an aHash-style signature (bit k = is byte-histogram bin
    k over-represented vs the uniform 1/16 share) with BANDED
    blocking — candidates must agree on at least one of the 4 nibble
    bands (the simhash/LSH shape: equi-joins on (band, value), never
    all-pairs), then the exact Hamming distance filters to
    <= ``max_hamming``. The image-dedup plumbing of a multimodal
    pipeline with the decode step stubbed (see decode_stub): the
    signature math, banding, and verification are the real, tested
    Spark shapes a pHash would drop into.

    Bit thresholds are INTEGER comparisons (n_bins·count > n_bytes —
    no float shares), so signatures are engine-exact. Returns
    (id_a, id_b, hash_a, hash_b, hamming) with id_a < id_b.
    """
    # counts back out of the exact share entries: features[k] are
    # multiples of 1/n_bytes, so round() recovers the integer count
    cnt = lambda k: F.round(  # noqa: E731 — shared per-bin expression
        F.element_at("features", k + 1) * F.col("n_bytes")
    ).cast("long")
    bit = lambda k: (  # noqa: E731
        F.lit(n_bins) * cnt(k) > F.col("n_bytes")
    ).cast("long")
    sig = features.select(
        F.col(id_col).alias("id"),
        sum(
            (bit(k) * F.lit(1 << k) for k in range(n_bins)), F.lit(0)
        ).cast("long").alias("h"),
    )
    bands = sig.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        ((F.col("h") / F.lit(1 << (4 * b))).cast("long")
                         % 16).alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "h", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    a = bands.select(
        F.col("band"), F.col("bv"),
        F.col("id").alias("id_a"), F.col("h").alias("hash_a"),
    )
    b = bands.select(
        F.col("band"), F.col("bv"),
        F.col("id").alias("id_b"), F.col("h").alias("hash_b"),
    )
    cand = (
        a.join(b, ["band", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hash_a", "hash_b")
        .distinct()
    )
    ham = F.bit_count(
        F.col("hash_a").bitwiseXOR(F.col("hash_b"))
    ).cast("long")
    return cand.select(
        "id_a", "id_b", "hash_a", "hash_b", ham.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def audio_energy_windows(
    media: DataFrame,
    window_bytes: int = 256,
    digits: int = 6,
) -> DataFrame:
    """Windowed audio-energy profile over binary payloads: treat each
    payload as 8-bit centered PCM, cut it into ``window_bytes`` frames,
    and emit per-window RMS energy — the silence-detection /
    voice-activity front-end of an audio pipeline, with only the codec
    decode stubbed (the byte-level arithmetic, Arrow batching, window
    bookkeeping, and schema are the real plumbing).

    Runs as ``mapInPandas`` (the module's Arrow-batched contract — one
    batch of payloads in memory per task, column-pruned to id+payload).
    Per-window sums of (b−128)² are exact integers, so
    rms = sqrt(ss/n) is double arithmetic over exact inputs —
    engine-identical, rounded at ``digits``; the DuckDB oracle replays
    the same bytes from the committed fixture via hex-nibble
    extraction.
    """
    import math

    out_schema = (
        "media_id long, w long, n_samples long, rms double"
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                for w in range((len(data) + window_bytes - 1) // window_bytes):
                    chunk = data[w * window_bytes : (w + 1) * window_bytes]
                    ss = 0
                    for b in chunk:
                        d = b - 128
                        ss += d * d
                    n = len(chunk)
                    rms = (
                        math.floor(
                            math.sqrt(ss / n) * 10**digits + 0.5
                        )
                        / 10**digits
                        if n
                        else 0.0
                    )
                    rows.append((int(mid), w, n, rms))
            yield pd.DataFrame(
                rows, columns=["media_id", "w", "n_samples", "rms"]
            )

    return media.select("media_id", "payload").mapInPandas(run, out_schema)
