"""Multimodal plumbing: schemas, mapInPandas batch shape, deterministic
fake decode, strict mode errors-as-rows, frame-sampling fan-out."""

from __future__ import annotations

import pytest

from doonop_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_decode,
    sample_frames,
    strict_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-ish-bytes", "image/png", 64, 64, 0),
        (2, "image", b"other-bytes", "image/jpeg", 32, 32, 0),
        (3, "video", b"riff-ish", "video/mp4", 320, 240, 3500),
        (4, "image", None, "image/png", 0, 0, 0),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_fake_decode_deterministic():
    a = fake_decode(b"abc", "image/png")
    b = fake_decode(b"abc", "image/png")
    assert a.shape == (8, 8) and (a == b).all()
    assert not (a == fake_decode(b"abd", "image/png")).all()


def test_strict_decode_raises():
    with pytest.raises(NotImplementedError):
        strict_decode(b"abc", "image/png")


def test_decode_media_plumbing(spark, media):
    out = {r.media_id: r for r in decode_media(media).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].shape == [8, 8] and out[1].error is None
    assert 0.0 <= out[1].mean <= 1.0
    assert out[1].mean != out[2].mean  # payload-dependent
    assert out[4].error is None  # null payload decodes the empty digest


def test_strict_mode_errors_as_rows(spark, media):
    out = decode_media(media, decoder=strict_decode).collect()
    assert all(r.error is not None and r.shape is None for r in out)


def test_extract_features_shape(spark, media):
    out = extract_features(media, dim=16).collect()
    assert all(len(r.features) == 16 for r in out)
    by_id = {r.media_id: r.features for r in out}
    assert by_id[1] != by_id[2]


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    # only the video row fans out: ts 0,1000,2000,3000
    assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000, 3000]
    assert {r.media_id for r in frames} == {3}


def test_sample_frames_zero_duration_yields_nothing(spark):
    """A duration_ms=0 video emits NO frames — matches the driver oracle
    range(0, d, 1000), which is empty for d=0 (the unfiltered sequence
    would emit a phantom t=0 frame)."""
    media = spark.createDataFrame(
        [(9, "video", bytearray(b"x"), "video/mp4", 1, 1, 0)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    assert sample_frames(media, every_ms=1000).count() == 0
