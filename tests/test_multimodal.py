"""Multimodal plumbing: binary columns + Arrow-batched feature stage."""

from __future__ import annotations

import pytest

from neo4j_database_to_data_importer_package_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    frame_sample_plan,
    make_fake_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media(spark, n=32).cache()


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", {})


def test_extract_features_schema_and_determinism(spark, media):
    feats = extract_features(media, fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    r0 = rows[0]
    assert r0["n_bytes"] == 256
    assert len(r0["features"]) == 16
    assert abs(sum(r0["features"]) - 1.0) < 1e-6  # histogram normalizes
    assert 0.0 <= r0["byte_entropy"] <= 8.0
    # deterministic: second run identical
    again = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert again[0]["byte_mean"] == r0["byte_mean"]


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_ms=1000)
    by_id = {}
    for r in plan.collect():
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    # media 0 has duration 3000 → frames at 0,1000,2000,3000
    assert sorted(by_id[0]) == [0, 1000, 2000, 3000]


def test_payload_pruned_when_not_selected(spark, media):
    # frame planning never touches the payload bytes — column pruning
    # keeps the binary column out of the plan entirely
    df = frame_sample_plan(media)
    assert "payload" not in df.columns


def test_fixture_parquet_matches_generator(spark):
    """The committed fake-media fixture must stay in sync with
    make_fake_media (the gate oracle reads the fixture's bytes; the
    operator tests read the generator's)."""
    from neo4j_database_to_data_importer_package_spark.operators.multimodal import (
        fixture_media_path,
        make_fake_media,
    )

    fixture = {
        r["media_id"]: bytes(r["payload"])
        for r in spark.read.parquet(fixture_media_path()).collect()
    }
    generated = {
        r["media_id"]: bytes(r["payload"]) for r in make_fake_media(spark, n=64).collect()
    }
    assert fixture == generated


def test_extract_features_doubles_are_exact_ratios(spark, media):
    """features are double (not float32) so bin_count/n_bytes divisions
    are engine-exact for the oracle comparison."""
    from neo4j_database_to_data_importer_package_spark.operators.multimodal import (
        extract_features,
    )

    feats = extract_features(media, fake=True)
    assert dict(feats.dtypes)["features"] == "array<double>"
