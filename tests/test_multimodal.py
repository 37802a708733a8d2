"""Multimodal binary-column plumbing: decode stub, feature extraction,
frame sampling, resize planning — the Spark-side contracts are real even
though the codecs are stubbed."""

import pytest
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import multimodal as mm


@pytest.fixture()
def media(spark):
    rows = [
        mm.encode_fake_media(1, "image", width=640, height=480, payload=b"px" * 100),
        mm.encode_fake_media(2, "audio", sample_rate=16000, payload=b"\x00" * 64),
        mm.encode_fake_media(3, "video", width=1920, height=1080, n_frames=25, payload=b"f" * 10),
        (4, "image", "jpeg", b"\xff\xd8\xff\xe0 real jpeg", {"width": 0, "height": 0, "sample_rate": 0, "n_frames": 0}),
        (5, "image", "fake", b"GARBAGE", {"width": 0, "height": 0, "sample_rate": 0, "n_frames": 0}),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_DDL)


def test_decode_fake_and_stub_boundary(media):
    out = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert out[1]["dec_width"] == 640 and out[1]["payload_bytes"] == 200
    assert out[2]["dec_sample_rate"] == 16000
    assert out[3]["dec_n_frames"] == 25
    # real format → NotImplementedError captured per-row, not a crash
    assert out[4]["decode_error"].startswith("NotImplementedError")
    assert out[4]["dec_width"] is None
    # malformed synthetic content → row-level error too
    assert out[5]["decode_error"] is not None


def test_feature_extraction_deterministic_shape(media):
    f1 = {r["media_id"]: r["features"] for r in mm.extract_features(media, feat_dim=8).collect()}
    f2 = {r["media_id"]: r["features"] for r in mm.extract_features(media, feat_dim=8).collect()}
    assert f1 == f2  # deterministic
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)
    assert f1[1] != f1[2]  # different content → different vector


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_n=10).collect()
    got = sorted((r["media_id"], r["frame_idx"]) for r in frames)
    # only the video row (n_frames=25) emits frames 0, 10, 20
    assert got == [(3, 0), (3, 10), (3, 20)]


def test_resize_plan_preserves_aspect(media):
    out = {
        r["media_id"]: r["resize"]
        for r in mm.resize_plan(media.filter(F.col("media_id") == 3), 640, 480).collect()
    }
    r = out[3]
    assert (r["out_w"], r["out_h"]) == (640, 360)  # 1920x1080 → fit 640x480
    assert abs(r["scale"] - 1 / 3) < 1e-9
