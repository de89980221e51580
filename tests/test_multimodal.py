"""Multimodal plumbing: metadata struct, mapInPandas feature extraction
with the deterministic fake kernel, and the stub contracts (SURVEY.md
§7.2 step 5 — decoders absent by design in this environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_platform_nyc_taxi_spark.operators.multimodal import (
    _fake_image_features,
    attach_media_meta,
    frame_sample_plan,
    image_features,
)


@pytest.fixture
def blobs(spark):
    rows = [
        (1, bytes([10, 20, 30, 40])),
        (2, b""),
        (3, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_attach_media_meta_struct(blobs):
    out = attach_media_meta(blobs, "payload", media_type="image", fmt="png")
    row = out.filter(F.col("doc_id") == 1).select("payload_meta.*").first()
    assert row["media_type"] == "image"
    assert row["format"] == "png"
    assert row["size_bytes"] == 4
    assert row["width"] is None and row["duration_ms"] is None


def test_image_features_deterministic_kernel(blobs):
    out = {r["doc_id"]: r for r in image_features(blobs, dim=2).collect()}
    # payload [10,20,30,40], dim=2: slot0=(10+30)/4, slot1=(20+40)/4
    assert out[1]["size_bytes"] == 4
    assert out[1]["feat"] == [10.0, 15.0]
    # empty and NULL payloads: zero vector, size 0 — never a crash
    assert out[2]["feat"] == [0.0, 0.0] and out[2]["size_bytes"] == 0
    assert out[3]["feat"] == [0.0, 0.0] and out[3]["size_bytes"] == 0


def test_image_features_schema_and_partition_stability(blobs):
    df = image_features(blobs.repartition(3), dim=4)
    assert [f.name for f in df.schema.fields] == ["doc_id", "size_bytes", "feat"]
    assert df.schema["feat"].dataType.simpleString() == "array<float>"
    # kernel is per-row deterministic: partitioning must not change values
    a = sorted(map(repr, df.collect()))
    b = sorted(map(repr, image_features(blobs.coalesce(1), dim=4).collect()))
    assert a == b


def test_fake_kernel_is_pure():
    p = bytes(range(16))
    assert _fake_image_features(p, 8) == _fake_image_features(p, 8)
    assert _fake_image_features(b"", 3) == [0.0, 0.0, 0.0]


def test_frame_sample_stub_contract(blobs):
    with pytest.raises(NotImplementedError):
        frame_sample_plan(blobs, "payload", every_ms=1000)


def test_resize_images_kernel(blobs):
    from etl_platform_nyc_taxi_spark.operators.multimodal import resize_images

    out = {r["doc_id"]: r for r in resize_images(blobs, target_bytes=2).collect()}
    # stride = 4//2 = 2: bytes [10,20,30,40] -> [10,30]
    assert bytes(out[1]["resized"]) == bytes([10, 30])
    assert out[1]["orig_bytes"] == 4 and out[1]["resized_bytes"] == 2
    assert bytes(out[2]["resized"]) == b"" and out[3]["resized_bytes"] == 0


def test_audio_stub_contract(blobs):
    import pytest as _pytest

    from etl_platform_nyc_taxi_spark.operators.multimodal import audio_features_plan

    with _pytest.raises(NotImplementedError):
        audio_features_plan(blobs, "payload", sample_rate=16000)
