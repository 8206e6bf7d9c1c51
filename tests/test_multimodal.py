"""Multimodal plumbing tests: schemas, Arrow batch shapes, deterministic
fake decode, strict-mode stub seam, frame sampling."""

import numpy as np
import pytest

from frontier_engine.multimodal import (
    FEATURE_DIM,
    block_mean_features,
    decode_image,
    frame_offsets,
    frame_sample,
    image_features,
    probe_meta,
    sniff_kind,
    synth_media_df,
)


def test_sniff_and_decode_pure():
    assert sniff_kind(b"\x89PNG....") == "png"
    assert sniff_kind(b"\xff\xd8\xff..") == "jpeg"
    assert sniff_kind(b"") == "empty"
    img = decode_image(b"abcdef", 8, 6, strict=False)
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8
    # deterministic
    assert (img == decode_image(b"abcdef", 8, 6)).all()
    feats = block_mean_features(img)
    assert feats.shape == (FEATURE_DIM,)
    with pytest.raises(NotImplementedError):
        decode_image(b"abcdef", 8, 6, strict=True)


def test_frame_offsets():
    assert frame_offsets(1024, 256, 2) == [0, 512]
    assert frame_offsets(100, 256, 2) == []


def test_probe_meta_spark(spark):
    df = synth_media_df(spark, 60)
    out = probe_meta(df)
    rows = out.select("media_id", "byte_len", "magic_kind").collect()
    assert len(rows) == 60
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["magic_kind"] == "png"  # i%5==0 rows get a PNG magic
    assert by_id[1]["magic_kind"] == "unknown"
    assert all(r["byte_len"] > 0 for r in rows)


def test_image_features_spark(spark):
    df = synth_media_df(spark, 60).where("kind = 'image'")
    out = image_features(df).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
    # deterministic across recompute
    again = image_features(
        synth_media_df(spark, 60).where("kind = 'image'")
    ).collect()
    a = {r["media_id"]: r["features"] for r in out}
    b = {r["media_id"]: r["features"] for r in again}
    assert a == b


def test_frame_sample_spark(spark):
    df = synth_media_df(spark, 30).where("kind = 'video'")
    out = frame_sample(df, frame_bytes=128, every_k=2).collect()
    assert len(out) > 0
    for r in out:
        assert len(r["frame"]) == 128
