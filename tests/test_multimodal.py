"""Multimodal binary-column plumbing + real pure-Python image codecs
(PPM/PGM, BMP, PNG). The test-side encoders below implement the
filter-FORWARD direction independently, so the round-trips exercise the
decoder against a second implementation, not against itself."""

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import multimodal as mm


# ---- independent test-side encoders ----


def _gradient(width, height, channels):
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


def _make_ppm(width, height, pixels, magic=b"P6"):
    return magic + b"\n# test comment\n%d %d\n255\n" % (width, height) + pixels


def _make_bmp(width, height, pixel_rows):
    """24-bit bottom-up BI_RGB with row padding."""
    stride = (width * 3 + 3) & ~3
    data = b"".join(row + b"\x00" * (stride - len(row)) for row in pixel_rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) + info + data


def _png_chunk(ctype, data):
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _make_png(width, height, channels, pixels, filters=None):
    """Forward-filtered PNG; by default cycles through all five filter
    types row by row (the decoder must reverse every one to round-trip).
    ``filters``: explicit per-row filter types for the property tests."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride, bpp = width * channels, channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ft = filters[y] if filters is not None else y % 5
        raw.append(ft)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((line[i] - pred) & 0xFF)
        prev = line
    idat = zlib.compress(bytes(raw))
    half = len(idat) // 2  # two IDAT chunks: decoder must concatenate
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat[:half])
        + _png_chunk(b"IDAT", idat[half:])
        + _png_chunk(b"IEND", b"")
    )


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


def test_ppm_pgm_decode():
    px = _gradient(4, 3, 3)
    d = mm._decode_netpbm(_make_ppm(4, 3, px))
    assert (d["width"], d["height"], d["channels"]) == (4, 3, 3)
    assert d["payload"] == px
    gray = _gradient(5, 2, 1)
    d = mm._decode_netpbm(_make_ppm(5, 2, gray, magic=b"P5"))
    assert (d["width"], d["height"], d["channels"]) == (5, 2, 1)
    assert d["payload"] == gray
    with pytest.raises(ValueError):  # truncated pixel plane
        mm._decode_netpbm(_make_ppm(4, 3, px[:-1]))
    with pytest.raises(ValueError):  # 16-bit maxval unsupported
        mm._decode_netpbm(b"P6\n4 3\n65535\n" + px * 2)


def test_bmp_decode():
    rows = [_gradient(5, 1, 3) for _ in range(3)]
    content = _make_bmp(5, 3, rows)
    d = mm._decode_bmp(content)
    assert (d["width"], d["height"], d["channels"]) == (5, 3, 3)
    stride = (5 * 3 + 3) & ~3  # 16: one pad byte per row
    assert len(d["payload"]) == stride * 3
    assert d["payload"][:15] == rows[0]
    with pytest.raises(ValueError):  # RLE compression rejected loudly
        bad = bytearray(content)
        bad[30] = 1
        mm._decode_bmp(bytes(bad))


def test_png_decode_all_filters():
    # height 6 > 5 filter types: every filter (None/Sub/Up/Avg/Paeth)
    # appears at least once, Paeth/Avg see non-zero prev rows
    for channels in (1, 2, 3, 4):
        px = _gradient(4, 6, channels)
        d = mm._decode_png(_make_png(4, 6, channels, px))
        assert (d["width"], d["height"], d["channels"]) == (4, 6, channels), channels
        assert d["payload"] == px, f"channels={channels}"
    with pytest.raises(ValueError):
        mm._decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")


def test_decode_media_real_formats_end_to_end(spark):
    """The Spark path: mixed real formats in one binary column through
    the Arrow mapInPandas codec, plus the still-stubbed jpeg seam."""
    px = _gradient(4, 6, 3)
    rows = [
        (1, "image", "ppm", _make_ppm(4, 3, _gradient(4, 3, 3)), None),
        (2, "image", "png", _make_png(4, 6, 3, px), None),
        (3, "image", "bmp", _make_bmp(5, 3, [_gradient(5, 1, 3)] * 3), None),
        (4, "image", "pgm", _make_ppm(7, 2, _gradient(7, 2, 1), magic=b"P5"), None),
        (5, "image", "jpeg", b"\xff\xd8\xff\xe0 still stubbed", None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_DDL)
    out = {r["media_id"]: r for r in mm.decode_media(df).collect()}
    assert (out[1]["dec_width"], out[1]["dec_height"], out[1]["dec_channels"]) == (4, 3, 3)
    assert out[1]["payload_bytes"] == 4 * 3 * 3
    assert (out[2]["dec_width"], out[2]["dec_height"], out[2]["dec_channels"]) == (4, 6, 3)
    assert out[2]["payload_bytes"] == len(px)
    assert (out[3]["dec_width"], out[3]["dec_channels"]) == (5, 3)
    assert (out[4]["dec_width"], out[4]["dec_channels"]) == (7, 1)
    assert all(out[i]["decode_error"] is None for i in (1, 2, 3, 4))
    # compressed formats without a container codec stay a loud seam
    assert out[5]["decode_error"].startswith("NotImplementedError")


def test_resize_plan_preserves_aspect(media):
    out = {
        r["media_id"]: r["resize"]
        for r in mm.resize_plan(media.filter(F.col("media_id") == 3), 640, 480).collect()
    }
    r = out[3]
    assert (r["out_w"], r["out_h"]) == (640, 360)  # 1920x1080 → fit 640x480
    assert abs(r["scale"] - 1 / 3) < 1e-9
