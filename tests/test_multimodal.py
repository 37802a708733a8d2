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
        (4, "audio", "mp3", b"ID3\x04 compressed bitstream", {"width": 0, "height": 0, "sample_rate": 0, "n_frames": 0}),
        (5, "image", "fake", b"GARBAGE", {"width": 0, "height": 0, "sample_rate": 0, "n_frames": 0}),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_DDL)


def test_decode_fake_and_stub_boundary(media):
    out = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert out[1]["dec_width"] == 640 and out[1]["payload_bytes"] == 200
    assert out[2]["dec_sample_rate"] == 16000
    assert out[3]["dec_n_frames"] == 25
    # mp3 now has a frame-header parser: garbage after an ID3 magic is a
    # row-level ValueError (corrupt stream), still not a crash
    assert out[4]["decode_error"].startswith("ValueError")
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


# ---- WAV / MP4: independent test-side container writers ----


def _make_wav(
    channels, sample_rate, frames, bits=16, audio_format=1,
    extra_chunk=True, data=None,
):
    """Independent RIFF/WAVE writer: fmt + data chunks, optional odd-length
    LIST chunk (exercises even-padding), interleaved zeroed PCM frames
    (or explicit sample ``data`` for the perceptual-stats tests)."""
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    if data is None:
        data = bytes(frames * block_align)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # odd-sized chunk: reader must skip the pad byte
        body += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _box(btype, payload):
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _make_mp4(width=0, height=0, n_frames=0, sample_rate=0, mdat=b""):
    """Independent ISO-BMFF writer: ftyp + moov(mvhd, trak(tkhd, mdia(
    mdhd, hdlr, minf(stbl(stsz))))) + mdat, one video and/or audio trak."""

    def trak(kind, w, h, timescale, samples):
        # tkhd v0: ver/flags, creation, modification, track_ID, reserved,
        # duration, reserved[2], layer/group/volume/reserved, matrix[9],
        # then 16.16 fixed width/height at body offset 76
        tkhd = (
            bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(8)
            + bytes(8) + bytes(8) + bytes(36)
            + struct.pack(">II", w << 16, h << 16)
        )
        mdhd = bytes(4) + bytes(8) + struct.pack(">II", timescale, 0) + bytes(4)
        hdlr = bytes(8) + kind + bytes(12) + b"h\x00"
        stsz = bytes(4) + struct.pack(">II", 0, samples)
        stbl = _box(b"stsz", stsz)
        minf = _box(b"stbl", stbl)
        mdia = _box(b"mdhd", mdhd) + _box(b"hdlr", hdlr) + _box(b"minf", minf)
        return _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))

    mvhd = bytes(4) + bytes(8) + struct.pack(">II", 1000, 60000) + bytes(80)
    traks = b""
    if width:
        traks += trak(b"vide", width, height, 30, n_frames)
    if sample_rate:
        traks += trak(b"soun", 0, 0, sample_rate, 0)
    moov = _box(b"mvhd", mvhd) + traks
    return _box(b"ftyp", b"isom" + bytes(8)) + _box(b"moov", moov) + _box(b"mdat", mdat)


def _make_mjpeg_mp4(frames, width, height, codec=b"jpeg"):
    """ISO-BMFF with a real sample layout: stsd (codec 4CC), per-sample
    stsz, single-chunk stsc, stco holding the true FILE offset of the
    mdat body (built twice: placeholder offset → measure → rebuild)."""
    sizes = [len(f) for f in frames]
    mdat_body = b"".join(frames)

    def build(chunk_off):
        tkhd = (
            bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(8)
            + bytes(8) + bytes(8) + bytes(36)
            + struct.pack(">II", width << 16, height << 16)
        )
        mdhd = bytes(4) + bytes(8) + struct.pack(">II", 30, 0) + bytes(4)
        hdlr = bytes(8) + b"vide" + bytes(12) + b"h\x00"
        stsd = (
            bytes(4) + struct.pack(">I", 1)
            + struct.pack(">I", 8) + codec  # minimal sample entry
        )
        stsz = (
            bytes(4) + struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes)
        )
        stsc = bytes(4) + struct.pack(">I", 1) + struct.pack(
            ">III", 1, len(sizes), 1
        )
        stco = bytes(4) + struct.pack(">I", 1) + struct.pack(">I", chunk_off)
        stbl = (
            _box(b"stsd", stsd) + _box(b"stsz", stsz)
            + _box(b"stsc", stsc) + _box(b"stco", stco)
        )
        minf = _box(b"stbl", stbl)
        mdia = _box(b"mdhd", mdhd) + _box(b"hdlr", hdlr) + _box(b"minf", minf)
        trak = _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))
        mvhd = bytes(4) + bytes(8) + struct.pack(">II", 1000, 60000) + bytes(80)
        moov = _box(b"mvhd", mvhd) + trak
        return _box(b"ftyp", b"isom" + bytes(8)) + _box(b"moov", moov)

    head = build(0)
    head = build(len(head) + 8)  # mdat body starts after its 8-byte header
    return head + _box(b"mdat", mdat_body)


def test_wav_decode():
    d = mm._decode_wav(_make_wav(2, 44100, 100))
    assert (d["channels"], d["sample_rate"], d["n_frames"]) == (2, 44100, 100)
    assert len(d["payload"]) == 100 * 2 * 2
    # IEEE float accepted; mono 8-bit geometry
    d = mm._decode_wav(_make_wav(1, 8000, 5, bits=32, audio_format=3, extra_chunk=False))
    assert (d["channels"], d["n_frames"]) == (1, 5)
    with pytest.raises(ValueError):  # mp3-in-wav = remaining bitstream seam
        mm._decode_wav(_make_wav(1, 8000, 5, audio_format=85))
    with pytest.raises(ValueError):  # truncated data chunk
        mm._decode_wav(_make_wav(2, 44100, 100)[:-10])


def test_mp4_decode():
    payload = b"frame-bytes" * 9
    d = mm._decode_mp4(_make_mp4(width=640, height=360, n_frames=24,
                                 sample_rate=48000, mdat=payload))
    assert (d["width"], d["height"], d["n_frames"]) == (640, 360, 24)
    assert d["sample_rate"] == 48000
    assert d["payload"] == payload
    # audio-only file: geometry absent, rate present
    d = mm._decode_mp4(_make_mp4(sample_rate=16000, mdat=b"aac"))
    assert d["width"] is None and d["sample_rate"] == 16000
    with pytest.raises(ValueError):  # box size past EOF
        mm._decode_mp4(struct.pack(">I", 100) + b"ftypisom")
    with pytest.raises(ValueError):  # no ftyp
        mm._decode_mp4(_box(b"mdat", b"x"))


def test_decode_media_real_formats_end_to_end(spark):
    """The Spark path: mixed real formats in one binary column through
    the Arrow mapInPandas codec, plus the compressed-bitstream seam."""
    px = _gradient(4, 6, 3)
    mdat = b"h264-bitstream" * 3
    rows = [
        (1, "image", "ppm", _make_ppm(4, 3, _gradient(4, 3, 3)), None),
        (2, "image", "png", _make_png(4, 6, 3, px), None),
        (3, "image", "bmp", _make_bmp(5, 3, [_gradient(5, 1, 3)] * 3), None),
        (4, "image", "pgm", _make_ppm(7, 2, _gradient(7, 2, 1), magic=b"P5"), None),
        (5, "audio", "mp3", b"ID3\x04 no container codec", None),
        (6, "audio", "wav", _make_wav(2, 22050, 50), None),
        (7, "video", "mp4", _make_mp4(width=320, height=240, n_frames=12,
                                      sample_rate=44100, mdat=mdat), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_DDL)
    out = {r["media_id"]: r for r in mm.decode_media(df).collect()}
    assert (out[1]["dec_width"], out[1]["dec_height"], out[1]["dec_channels"]) == (4, 3, 3)
    assert out[1]["payload_bytes"] == 4 * 3 * 3
    assert (out[2]["dec_width"], out[2]["dec_height"], out[2]["dec_channels"]) == (4, 6, 3)
    assert out[2]["payload_bytes"] == len(px)
    assert (out[3]["dec_width"], out[3]["dec_channels"]) == (5, 3)
    assert (out[4]["dec_width"], out[4]["dec_channels"]) == (7, 1)
    assert (out[6]["dec_sample_rate"], out[6]["dec_n_frames"]) == (22050, 50)
    assert out[6]["payload_bytes"] == 50 * 2 * 2
    assert (out[7]["dec_width"], out[7]["dec_height"]) == (320, 240)
    assert (out[7]["dec_n_frames"], out[7]["dec_sample_rate"]) == (12, 44100)
    assert out[7]["payload_bytes"] == len(mdat)
    assert all(out[i]["decode_error"] is None for i in (1, 2, 3, 4, 6, 7))
    # a corrupt mp3 stream is a loud row-level error (the header parser
    # walks every frame); formats with NO codec at all stay the
    # NotImplementedError seam (test_decode_media_unknown_format)
    assert out[5]["decode_error"].startswith("ValueError")


# ---- baseline JPEG: independent test-side encoder ----
# Canonical-Huffman construction and the forward DCT are implemented
# here from the T.81 spec, independent of operators/jpeg.py, so the
# round-trips check the decoder against a second implementation.

import numpy as np

# T.81 Annex K.3.3.1 luminance DC table (counts per code length, symbols)
_DC_COUNTS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_SYMS = bytes(range(12))
# Annex K.3.3.2 luminance AC table
_AC_COUNTS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_SYMS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

_ENC_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_ENC_DCT = np.array([
    [(1.0 / np.sqrt(2.0) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16.0) / 2.0
     for x in range(8)]
    for u in range(8)
])  # forward: coeffs = D @ (pix-128) @ D.T


def _enc_codes(counts, syms):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[syms[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def put(self, val, nbits):
        for i in reversed(range(nbits)):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def byte_align(self):
        while self.n:
            self.put(1, 1)


def _enc_category(v):
    return 0 if v == 0 else abs(v).bit_length()


def _enc_block(bw, block, pred, qt, dc_codes, ac_codes):
    coef = _ENC_DCT @ (block.astype(np.float64) - 128.0) @ _ENC_DCT.T
    zz = np.array(
        [int(round(coef.flat[_ENC_ZZ[k]] / qt[k])) for k in range(64)]
    )
    diff = int(zz[0]) - pred
    t = _enc_category(diff)
    bw.put(*dc_codes[t])
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        s = _enc_category(v)
        bw.put(*ac_codes[(run << 4) | s])
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw.put(*ac_codes[0x00])  # EOB
    return int(zz[0])


def _make_jpeg(width, height, pixels, channels=3, y_sampling=(1, 1), restart=0):
    """Independent baseline JFIF encoder: qt=all-ones (near-lossless),
    Annex K luminance Huffman tables for every component, optional 4:2:x
    subsampling on the chroma planes and restart intervals."""
    px = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    px = px.reshape(height, width, channels)
    if channels == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        hv = [y_sampling, (1, 1), (1, 1)]
    else:
        planes, hv = [px[..., 0]], [(1, 1)]
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)

    # subsample chroma by block-averaging, pad planes to MCU multiples
    sub = []
    for plane, (ch, cv) in zip(planes, hv):
        fy, fx = vmax // cv, hmax // ch
        if fy > 1 or fx > 1:
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            plane = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        sub.append(plane)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = []
    for plane, (ch, cv) in zip(sub, hv):
        th, tw = mcuy * cv * 8, mcux * ch * 8
        padded.append(np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), mode="edge"
        ))

    dc_codes = _enc_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _enc_codes(_AC_COUNTS, _AC_SYMS)
    qt = [1] * 64
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_n and mcu_n % restart == 0:
                bw.byte_align()
                bw.buf += bytes([0xFF, 0xD0 + ((mcu_n // restart - 1) % 8)])
                preds = [0] * len(planes)
            for ci, (plane, (ch, cv)) in enumerate(zip(padded, hv)):
                for by in range(cv):
                    for bx in range(ch):
                        y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                        preds[ci] = _enc_block(
                            bw, plane[y0:y0 + 8, x0:x0 + 8],
                            preds[ci], qt, dc_codes, ac_codes,
                        )
            mcu_n += 1
    bw.byte_align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qt))
    sof = struct.pack(">BHHB", 8, height, width, len(planes))
    for i, (ch, cv) in enumerate(hv):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + _AC_COUNTS + _AC_SYMS)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bytes(bw.buf) + b"\xff\xd9"
    return out


def test_jpeg_grayscale_roundtrip():
    from ethereum_analytical_db_spark.operators import jpeg as J

    px = _gradient(16, 8, 1)
    d = J.decode_jpeg(_make_jpeg(16, 8, px, channels=1))
    assert (d["width"], d["height"], d["channels"]) == (16, 8, 1)
    got = np.frombuffer(d["payload"], dtype=np.uint8).astype(int)
    want = np.frombuffer(px, dtype=np.uint8).astype(int)
    # qt=1: only FDCT/IDCT float rounding survives
    assert np.abs(got - want).max() <= 2


def test_jpeg_color_roundtrip_non_multiple_of_8():
    from ethereum_analytical_db_spark.operators import jpeg as J

    px = _gradient(11, 5, 3)  # forces edge-padding + crop on decode
    d = J.decode_jpeg(_make_jpeg(11, 5, px))
    assert (d["width"], d["height"], d["channels"]) == (11, 5, 3)
    got = np.frombuffer(d["payload"], dtype=np.uint8).astype(int)
    want = np.frombuffer(px, dtype=np.uint8).astype(int)
    # RGB→YCbCr→RGB adds colorspace rounding on top of DCT rounding
    assert np.abs(got - want).max() <= 4


def test_jpeg_420_subsampling_flat_color_exact():
    from ethereum_analytical_db_spark.operators import jpeg as J

    w, h = 20, 12  # not an MCU multiple at 4:2:0 (16x16 MCUs)
    px = bytes([90, 160, 40]) * (w * h)
    d = J.decode_jpeg(_make_jpeg(w, h, px, y_sampling=(2, 2)))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    got = np.frombuffer(d["payload"], dtype=np.uint8).reshape(h, w, 3).astype(int)
    want = np.array([90, 160, 40])
    # flat color: subsample-average == nearest-upsample, so exact ±2
    assert np.abs(got - want).max() <= 2


def test_jpeg_restart_markers():
    from ethereum_analytical_db_spark.operators import jpeg as J

    px = _gradient(32, 8, 1)  # 4 MCUs → RST after every 2nd
    d = J.decode_jpeg(_make_jpeg(32, 8, px, channels=1, restart=2))
    got = np.frombuffer(d["payload"], dtype=np.uint8).astype(int)
    want = np.frombuffer(px, dtype=np.uint8).astype(int)
    assert np.abs(got - want).max() <= 2


def test_jpeg_rejects_non_baseline():
    from ethereum_analytical_db_spark.operators import jpeg as J

    good = _make_jpeg(8, 8, _gradient(8, 8, 1), channels=1)
    with pytest.raises(ValueError, match="SOF2"):
        # flip SOF0 marker to SOF2 (progressive)
        J.decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff\xe0 not a jpeg")
    with pytest.raises(ValueError):  # truncated scan
        J.decode_jpeg(good[:-20])


def test_jpeg_through_decode_media(spark):
    """The Spark path: a real JPEG through the Arrow mapInPandas codec."""
    content = _make_jpeg(11, 5, _gradient(11, 5, 3))
    df = spark.createDataFrame(
        [(1, "image", "jpeg", content, None),
         (2, "image", "jpg", content, None)],
        mm.MEDIA_DDL,
    )
    out = {r["media_id"]: r for r in mm.decode_media(df).collect()}
    for i in (1, 2):
        assert (out[i]["dec_width"], out[i]["dec_height"], out[i]["dec_channels"]) == (11, 5, 3)
        assert out[i]["payload_bytes"] == 11 * 5 * 3
        assert out[i]["decode_error"] is None


def test_resize_plan_preserves_aspect(media):
    out = {
        r["media_id"]: r["resize"]
        for r in mm.resize_plan(media.filter(F.col("media_id") == 3), 640, 480).collect()
    }
    r = out[3]
    assert (r["out_w"], r["out_h"]) == (640, 360)  # 1920x1080 → fit 640x480
    assert abs(r["scale"] - 1 / 3) < 1e-9


# ---- IMA ADPCM (WAV format 0x11): hand-computed spec vectors ----


def _make_adpcm_wav(channels, sample_rate, block_align, data):
    fmt = struct.pack("<HHIIHH", 0x11, channels, sample_rate,
                      sample_rate * block_align, block_align, 4)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_ima_adpcm_mono_hand_vector():
    """One mono block, nibbles hand-decoded from the IMA 1992 spec:
    header predictor 100 @ step index 4, body nibbles
    [4, 8, 0, 0, 0, 0, 0, 0] (byte 0x84 then zeros) give exactly
    [100, 112, 111, 112, 113, 114, 115, 116, 116]."""
    block = struct.pack("<hBx", 100, 4) + bytes([0x84, 0, 0, 0])
    d = mm._decode_wav(_make_adpcm_wav(1, 8000, 8, block))
    assert d["channels"] == 1 and d["sample_rate"] == 8000
    assert d["n_frames"] == 9
    got = list(struct.unpack("<9h", d["payload"]))
    assert got == [100, 112, 111, 112, 113, 114, 115, 116, 116]


def test_ima_adpcm_stereo_interleave_and_silence():
    """Stereo block: per-channel 4-byte headers then 4-byte-group
    interleave. All-zero nibbles at step index 0 are perfect silence
    (diff = 7>>3 = 0), so each channel holds its header predictor for
    the whole block — pinning both the channel separation and the
    interleaved output order."""
    block = (
        struct.pack("<hBx", 0, 0) + struct.pack("<hBx", 1000, 0)
        + bytes(8)  # one 4-byte group per channel, all-zero nibbles
    )
    d = mm._decode_wav(_make_adpcm_wav(2, 22050, 16, block))
    assert d["channels"] == 2 and d["n_frames"] == 9
    got = list(struct.unpack("<18h", d["payload"]))
    assert got == [0, 1000] * 9


def test_ima_adpcm_multi_block_and_bad_geometry():
    block = struct.pack("<hBx", -5, 0) + bytes(4)
    two = block * 2
    d = mm._decode_wav(_make_adpcm_wav(1, 8000, 8, two))
    assert d["n_frames"] == 18
    assert list(struct.unpack("<18h", d["payload"])) == [-5] * 18
    # step index out of range fails loudly, not via a table IndexError
    bad = struct.pack("<hBx", 0, 99) + bytes(4)
    with pytest.raises(ValueError, match="step index"):
        mm._decode_wav(_make_adpcm_wav(1, 8000, 8, bad))
    # header bigger than the block fails loudly
    with pytest.raises(ValueError, match="block_align"):
        mm._decode_wav(_make_adpcm_wav(2, 8000, 4, bytes(4)))


def test_ima_adpcm_through_decode_media(spark):
    """The compressed-bitstream path rides the same Spark plumbing as
    every other codec: schema, meta fields, payload all populated."""
    block = struct.pack("<hBx", 100, 4) + bytes([0x84, 0, 0, 0])
    wav = _make_adpcm_wav(1, 8000, 8, block)
    df = spark.createDataFrame(
        [(1, "wav", bytearray(wav))], "media_id long, fmt string, content binary"
    )
    row = mm.decode_media(df).first()
    assert row["decode_error"] is None
    assert row["dec_n_frames"] == 9
    assert row["dec_sample_rate"] == 8000
    assert row["payload_bytes"] == 18  # 9 frames of mono PCM16


# ---- MS-ADPCM (WAV format 2): hand-computed spec vectors ----


def _make_ms_adpcm_wav(channels, sample_rate, block_align, data):
    fmt = struct.pack("<HHIIHH", 2, channels, sample_rate,
                      sample_rate * block_align, block_align, 4)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_ms_adpcm_mono_hand_vector():
    """Predictor 0 (coef 256,0), delta 16, seeds s1=100 s2=50, nibble
    byte 0x10 (high first): n=+1 gives (100*256)>>8 + 16 = 116, then
    n=0 repeats 116. Output order is s2, s1, then nibbles."""
    block = bytes([0]) + struct.pack("<hhh", 16, 100, 50) + bytes([0x10])
    d = mm._decode_wav(_make_ms_adpcm_wav(1, 8000, 8, block))
    assert d["n_frames"] == 4
    assert list(struct.unpack("<4h", d["payload"])) == [50, 100, 116, 116]


def test_ms_adpcm_negative_nibble():
    """0xF is signed -1: from zero seeds it lands at -delta."""
    block = bytes([0]) + struct.pack("<hhh", 16, 0, 0) + bytes([0xF0])
    d = mm._decode_wav(_make_ms_adpcm_wav(1, 8000, 8, block))
    assert list(struct.unpack("<4h", d["payload"])) == [0, 0, -16, -16]


def test_ms_adpcm_stereo_alternates_channels():
    """Stereo nibbles alternate ch0/ch1; header fields group per
    channel (both predictors, both deltas, both s1, both s2)."""
    block = (
        bytes([0, 0])
        + struct.pack("<hh", 16, 16)          # deltas
        + struct.pack("<hh", 100, -100)       # sample1 per channel
        + struct.pack("<hh", 50, -50)         # sample2 per channel
        + bytes([0x10])                       # ch0 n=+1, ch1 n=0
    )
    d = mm._decode_wav(_make_ms_adpcm_wav(2, 44100, 15, block))
    assert d["channels"] == 2 and d["n_frames"] == 3
    got = list(struct.unpack("<6h", d["payload"]))
    assert got == [50, -50, 100, -100, 116, -100]


def test_ms_adpcm_bad_predictor_and_geometry():
    bad = bytes([9]) + struct.pack("<hhh", 16, 0, 0) + bytes([0])
    with pytest.raises(ValueError, match="predictor index"):
        mm._decode_wav(_make_ms_adpcm_wav(1, 8000, 8, bad))
    with pytest.raises(ValueError, match="block_align"):
        mm._decode_wav(_make_ms_adpcm_wav(1, 8000, 7, bytes(7)))


# ---- unpadded trailing blocks: real-world files often leave the last
# block short; both decoders must decode it, not silently drop it ----


def test_ima_adpcm_short_trailing_block_decodes():
    """A header-only trailing fragment contributes its one header frame;
    a header+group fragment decodes the group too (the same bytes as
    the mono hand vector, here as an unpadded last block)."""
    full = struct.pack("<hBx", -5, 0) + bytes(4)          # 8 = block_align
    tail = struct.pack("<hBx", 7, 0)                      # header only
    d = mm._decode_wav(_make_adpcm_wav(1, 8000, 8, full + tail))
    assert d["n_frames"] == 10
    assert list(struct.unpack("<10h", d["payload"])) == [-5] * 9 + [7]
    # whole-file-is-one-short-block: the hand vector under a bigger
    # block_align decodes identically instead of vanishing
    frag = struct.pack("<hBx", 100, 4) + bytes([0x84, 0, 0, 0])
    d = mm._decode_wav(_make_adpcm_wav(1, 8000, 12, frag))
    assert d["n_frames"] == 9
    assert list(struct.unpack("<9h", d["payload"])) == [
        100, 112, 111, 112, 113, 114, 115, 116, 116]


def test_ima_adpcm_sub_header_trailing_fragment_raises():
    full = struct.pack("<hBx", -5, 0) + bytes(4)
    with pytest.raises(ValueError, match="trailing fragment"):
        mm._decode_wav(_make_adpcm_wav(1, 8000, 8, full + b"\x00\x00"))


def test_ms_adpcm_short_trailing_block_decodes():
    frag = bytes([0]) + struct.pack("<hhh", 16, 100, 50) + bytes([0x10])
    d = mm._decode_wav(_make_ms_adpcm_wav(1, 8000, 12, frag))
    assert d["n_frames"] == 4
    assert list(struct.unpack("<4h", d["payload"])) == [50, 100, 116, 116]


def test_ms_adpcm_sub_header_trailing_fragment_raises():
    full = bytes([0]) + struct.pack("<hhh", 16, 0, 0) + bytes([0])
    with pytest.raises(ValueError, match="trailing fragment"):
        mm._decode_wav(_make_ms_adpcm_wav(1, 8000, 8, full + b"\x00\x00\x00"))


# ---- IMA ADPCM round-trip: independent test-side ENCODER ----
#
# The encoder quantizes each residual with the spec's 3-bit successive
# approximation and tracks its own reconstruction with the same update
# rule a decoder applies. That makes "decoder output == encoder's
# reconstruction sequence" an EXACT invariant for arbitrary input — a
# far stronger pin than fixed vectors — while a loose SNR bound checks
# the codec actually follows the signal.

_T_STEPS = mm._IMA_STEPS
_T_ADJ = mm._IMA_INDEX_ADJ


def _ima_encode_mono(samples, block_frames):
    """(blocks_bytes, reconstruction list) for mono input; block_frames =
    frames per block INCLUDING the header frame, must be 1 + multiple
    of 8."""
    assert (block_frames - 1) % 8 == 0
    out = bytearray()
    recon = []
    index = 0
    pos = 0
    while pos < len(samples):
        chunk = samples[pos : pos + block_frames]
        if len(chunk) < block_frames:
            break
        predictor = chunk[0]
        out += struct.pack("<hBx", predictor, index)
        recon.append(predictor)
        nibbles = []
        for s in chunk[1:]:
            step = _T_STEPS[index]
            diff = s - predictor
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            temp, mask = step, 4
            for _ in range(3):
                if diff >= temp:
                    nib |= mask
                    diff -= temp
                temp >>= 1
                mask >>= 1
            predictor, index = mm._ima_expand_nibble(nib, predictor, index)
            recon.append(predictor)
            nibbles.append(nib)
        for i in range(0, len(nibbles), 2):
            out += bytes([nibbles[i] | (nibbles[i + 1] << 4)])
        pos += block_frames
    return bytes(out), recon


def test_ima_adpcm_roundtrip_property():
    import math
    import random

    rnd = random.Random(11)
    for trial in range(10):
        # mixture of sine + noise, the adversarial part is step tracking
        n = 1 + 8 * rnd.randrange(4, 20)
        amp = rnd.choice([300, 5000, 30000])
        freq = rnd.uniform(0.01, 0.3)
        samples = [
            max(-32768, min(32767,
                int(amp * math.sin(freq * i)) + rnd.randrange(-200, 200)))
            for i in range(n)
        ]
        block_frames = n  # single block per trial
        data, recon = _ima_encode_mono(samples, block_frames)
        block_align = 4 + (block_frames - 1) // 2
        d = mm._decode_wav(_make_adpcm_wav(1, 8000, block_align, data))
        got = list(struct.unpack(f"<{d['n_frames']}h", d["payload"]))
        # exact invariant: decoder replays the encoder's reconstruction
        assert got == recon, trial
        # and the reconstruction actually tracks the signal
        err = sum(abs(a - b) for a, b in zip(got, samples)) / len(samples)
        assert err < max(64, amp * 0.25), (trial, err, amp)


# ---- G.711 companding (WAV formats 6 = A-law, 7 = µ-law) ----


def _make_g711_wav(fmt_tag, channels, sample_rate, data):
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, sample_rate,
                      sample_rate * channels, channels, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_ulaw_spec_vectors():
    """ITU G.711 µ-law rails and signs: 0x00 is the -32124 rail, 0x80
    its positive mirror, 0xFF/0x7F the two zero codes, 0x01/0x81 one
    quantization step in from the rails."""
    assert [mm._ULAW_TABLE[c] for c in (0x00, 0x80, 0xFF, 0x7F, 0x01, 0x81)] == [
        -32124, 32124, 0, 0, -31100, 31100]
    d = mm._decode_wav(_make_g711_wav(7, 1, 8000, bytes([0x00, 0xFF, 0x80])))
    assert d["n_frames"] == 3 and d["sample_rate"] == 8000
    assert list(struct.unpack("<3h", d["payload"])) == [-32124, 0, 32124]


def test_alaw_spec_vectors():
    """A-law: even bits inverted, SET sign bit means POSITIVE (opposite
    of µ-law), no zero codes — 0x55/0xD5 are ∓8, 0x2A/0xAA the rails."""
    assert [mm._ALAW_TABLE[c] for c in (0x55, 0xD5, 0x2A, 0xAA)] == [
        -8, 8, -32256, 32256]
    d = mm._decode_wav(_make_g711_wav(6, 2, 16000, bytes([0x55, 0xD5, 0xAA, 0x2A])))
    assert d["channels"] == 2 and d["n_frames"] == 2
    assert list(struct.unpack("<4h", d["payload"])) == [-8, 8, 32256, -32256]


def test_g711_tables_match_reference_codec_all_codes():
    """Every one of the 512 (law, code) pairs against an independent
    reference implementation (CPython's audioop, the Sun g711.c
    lineage) — gated: audioop is deprecated/removed in newer Pythons."""
    audioop = pytest.importorskip("audioop")
    for code in range(256):
        want_u = struct.unpack("<h", audioop.ulaw2lin(bytes([code]), 2))[0]
        want_a = struct.unpack("<h", audioop.alaw2lin(bytes([code]), 2))[0]
        assert mm._ULAW_TABLE[code] == want_u, code
        assert mm._ALAW_TABLE[code] == want_a, code


def test_g711_through_decode_media_and_geometry(spark):
    wav = _make_g711_wav(7, 1, 8000, bytes([0xFF] * 5))
    df = spark.createDataFrame(
        [(1, "wav", bytearray(wav))], "media_id long, fmt string, content binary"
    )
    row = mm.decode_media(df).first()
    assert row["decode_error"] is None
    assert row["dec_n_frames"] == 5 and row["payload_bytes"] == 10
    # stereo data must be a whole number of frames
    with pytest.raises(ValueError, match="whole number"):
        mm._decode_wav(_make_g711_wav(6, 2, 8000, bytes(3)))


# ---- perceptual frame-header metadata (mp3 / ADTS / H.264 SPS) ----
# Independent test-side writers: headers are packed here from the
# published bit layouts (ISO 11172-3 / 14496-3 / 14496-10) with
# hardcoded table values, so the round-trips check the parsers against
# a second implementation — same strategy as the JPEG/ADPCM fixtures.


def test_mp3_header_walk_cbr_with_id3_tags():
    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo: header FF FB 90 00,
    # frame size 144*128000/44100 = 417 bytes; wrapped in ID3v2 (10-byte
    # header + 20-byte body) and ID3v1 ("TAG" + 125 zeros)
    frame = b"\xff\xfb\x90\x00" + bytes(413)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
    id3v1 = b"TAG" + bytes(125)
    d = mm._parse_mp3(id3v2 + frame * 3 + id3v1)
    assert (d["sample_rate"], d["channels"]) == (44100, 2)
    assert d["n_frames"] == 3 * 1152
    assert d["duration_ms"] == round(3 * 1152 * 1000 / 44100)  # 78 ms
    assert d["bitrate_kbps"] == 128
    assert len(d["payload"]) == 3 * 417  # audio region only, tags excluded


def test_mp3_header_walk_vbr_average_and_mpeg2():
    # VBR: one 128 kbps + one 160 kbps MPEG1 L3 frame -> average ~144
    f128 = b"\xff\xfb\x90\x00" + bytes(413)              # 417 bytes
    f160 = b"\xff\xfb\xa0\x00" + bytes(518)              # 144*160000/44100 = 522
    d = mm._parse_mp3(f128 + f160)
    assert d["n_frames"] == 2 * 1152
    assert d["bitrate_kbps"] == round((417 + 522) * 8 * 44100 / (2 * 1152 * 1000))
    # MPEG2 Layer III mono, 64 kbps, 22050 Hz: 576 samples/frame,
    # size 72*64000/22050 = 208
    d2 = mm._parse_mp3(b"\xff\xf3\x80\xc0" + bytes(204))
    assert (d2["sample_rate"], d2["channels"], d2["n_frames"]) == (22050, 1, 576)
    assert d2["duration_ms"] == round(576 * 1000 / 22050)


def test_mp3_header_walk_rejects_corruption():
    frame = b"\xff\xfb\x90\x00" + bytes(413)
    with pytest.raises(ValueError, match="sync"):
        mm._parse_mp3(frame + b"\x12\x34\x56\x78" + bytes(100))
    with pytest.raises(ValueError, match="truncated MP3 frame"):
        mm._parse_mp3(frame[:100])
    with pytest.raises(ValueError, match="bitrate"):
        mm._parse_mp3(b"\xff\xfb\x00\x00" + bytes(413))  # free-format idx 0
    with pytest.raises(ValueError, match="no MP3 frames"):
        mm._parse_mp3(b"")


def test_mp3_in_wav_reports_header_metadata():
    # WAV audio format 0x55 (MPEG L3): container fmt chunk + mp3 frames
    # in data -> real header metadata instead of a rejection
    frame = b"\xff\xfb\x90\x00" + bytes(413)
    wav = _make_wav(2, 44100, 0, audio_format=0x55, extra_chunk=False)
    # splice the mp3 bitstream into the (empty) data chunk
    head, _ = wav.rsplit(b"data", 1)
    body = head[8:] + b"data" + struct.pack("<I", len(frame * 2)) + frame * 2
    d = mm._decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (d["sample_rate"], d["n_frames"]) == (44100, 2 * 1152)
    assert d["bitrate_kbps"] == 128


def _adts_frame(flen: int, blocks: int = 1, sr_idx: int = 3, cfg: int = 2,
                crc: bool = False) -> bytes:
    # ISO 14496-3 ADTS header: sync FFF, MPEG-4, layer 00,
    # protection_absent, profile AAC-LC (01), 13-bit frame length,
    # fullness 0x7FF (VBR), raw-data-blocks-1
    b1 = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
    b2 = (1 << 6) | (sr_idx << 2) | (cfg >> 2)
    b3 = ((cfg & 3) << 6) | ((flen >> 11) & 3)
    b4 = (flen >> 3) & 0xFF
    b5 = ((flen & 7) << 5) | 0x1F
    b6 = 0xFC | (blocks - 1)
    hdr = bytes([0xFF, b1, b2, b3, b4, b5, b6])
    if crc:
        hdr += b"\x00\x00"
    return hdr + bytes(flen - len(hdr))


def test_adts_header_walk():
    d = mm._parse_adts(_adts_frame(100) + _adts_frame(80))
    assert (d["sample_rate"], d["channels"]) == (48000, 2)
    assert d["n_frames"] == 2 * 1024
    assert d["duration_ms"] == round(2048 * 1000 / 48000)  # 43 ms
    assert d["bitrate_kbps"] == round(180 * 8 * 48000 / (2048 * 1000))
    # CRC variant (protection_absent=0, 9-byte header) and multi-block
    d2 = mm._parse_adts(_adts_frame(60, blocks=2, sr_idx=8, cfg=1, crc=True))
    assert (d2["sample_rate"], d2["channels"], d2["n_frames"]) == (16000, 1, 2048)
    with pytest.raises(ValueError, match="sync"):
        mm._parse_adts(b"\x12\x34" + bytes(20))
    with pytest.raises(ValueError, match="frame length"):
        mm._parse_adts(_adts_frame(100)[:50])


class _SpsBitWriter:
    """Independent MSB-first writer with exp-Golomb, for SPS fixtures."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, n, v):
        self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

    def ue(self, v):
        k = v + 1
        self.u(2 * k.bit_length() - 1, k)

    def rbsp(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        bits += [0] * (-len(bits) % 8)
        return bytes(
            sum(b << (7 - i) for i, b in enumerate(bits[p : p + 8]))
            for p in range(0, len(bits), 8)
        )


def _escape_rbsp(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _make_sps_baseline_720p() -> bytes:
    w = _SpsBitWriter()
    w.u(8, 66)   # profile_idc baseline
    w.u(8, 0)    # constraint flags
    w.u(8, 31)   # level_idc
    w.ue(0)      # sps id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(0)      # pic_order_cnt_type
    w.ue(0)      # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)      # max_num_ref_frames
    w.u(1, 0)    # gaps allowed
    w.ue(79)     # pic_width_in_mbs_minus1 -> 1280
    w.ue(44)     # pic_height_in_map_units_minus1 -> 720
    w.u(1, 1)    # frame_mbs_only
    w.u(1, 0)    # direct_8x8
    w.u(1, 0)    # no cropping
    w.u(1, 1)    # vui present
    w.u(1, 0); w.u(1, 0); w.u(1, 0); w.u(1, 0)  # aspect/overscan/signal/chroma
    w.u(1, 1)    # timing info
    w.u(32, 3)   # num_units_in_tick (bytes 00 00 00 03: exercises escaping)
    w.u(32, 150)  # time_scale -> fps = 150 / (2*3) = 25
    w.u(1, 1)    # fixed frame rate
    return b"\x67" + _escape_rbsp(w.rbsp())


def _make_sps_high_1080p() -> bytes:
    w = _SpsBitWriter()
    w.u(8, 100)  # profile_idc high -> chroma branch
    w.u(8, 0)
    w.u(8, 40)
    w.ue(0)      # sps id
    w.ue(1)      # chroma_format_idc 4:2:0
    w.ue(0); w.ue(0)  # bit depths
    w.u(1, 0)    # qpprime
    w.u(1, 0)    # no scaling matrix
    w.ue(0); w.ue(0)  # log2_max_frame_num, poc_type 0
    w.ue(0)      # log2_max_poc
    w.ue(1); w.u(1, 0)
    w.ue(119)    # 120*16 = 1920
    w.ue(67)     # 68*16 = 1088
    w.u(1, 1)    # frame_mbs_only
    w.u(1, 0)    # direct_8x8
    w.u(1, 1)    # cropping
    w.ue(0); w.ue(0); w.ue(0); w.ue(4)  # bottom crop 4 * 2 = 8 -> 1080
    w.u(1, 0)    # no vui
    return b"\x67" + _escape_rbsp(w.rbsp())


def _slice_nal(nal_header: int, first_mb: int) -> bytes:
    w = _SpsBitWriter()
    w.ue(first_mb)
    return bytes([nal_header]) + w.rbsp()


def test_h264_sps_resolution_fps_and_picture_count():
    sc = b"\x00\x00\x00\x01"
    stream = (
        sc + _make_sps_baseline_720p()
        + sc + _slice_nal(0x65, 0)           # IDR, new picture
        + sc + _slice_nal(0x41, 0)           # non-IDR, new picture
        + sc + _slice_nal(0x41, 1)           # same picture, 2nd slice
        + sc + _slice_nal(0x41, 0)           # new picture
    )
    d = mm._parse_h264(stream)
    assert (d["width"], d["height"], d["n_frames"]) == (1280, 720, 3)
    assert d["duration_ms"] == 120  # 3 pictures @ 25 fps
    assert d["bitrate_kbps"] == round(len(stream) * 8 * 25 / (3 * 1000))

    d2 = mm._parse_h264(sc + _make_sps_high_1080p() + sc + _slice_nal(0x65, 0))
    assert (d2["width"], d2["height"], d2["n_frames"]) == (1920, 1080, 1)
    assert "duration_ms" not in d2  # no VUI timing -> no duration claim

    with pytest.raises(ValueError, match="start codes"):
        mm._parse_h264(b"not a bytestream")
    with pytest.raises(ValueError, match="SPS"):
        mm._parse_h264(sc + _slice_nal(0x41, 0))


def test_strip_emulation_prevention():
    assert mm._strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert mm._strip_emulation(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
    # 03 NOT preceded by 00 00, or followed by >3: untouched
    assert mm._strip_emulation(b"\x00\x03\x01") == b"\x00\x03\x01"
    assert mm._strip_emulation(b"\x00\x00\x03\xe8") == b"\x00\x00\x03\xe8"


def test_decode_media_perceptual_headers_end_to_end(spark):
    """fmt mp3/aac/h264 rows through the Arrow mapInPandas path: the new
    dec_duration_ms / dec_bitrate_kbps columns land, formats with no
    codec at all stay the NotImplementedError seam."""
    frame = b"\xff\xfb\x90\x00" + bytes(413)
    sc = b"\x00\x00\x00\x01"
    h264 = sc + _make_sps_baseline_720p() + sc + _slice_nal(0x65, 0)
    rows = [
        (1, "audio", "mp3", frame * 3, None),
        (2, "audio", "aac", _adts_frame(100) + _adts_frame(80), None),
        (3, "video", "h264", h264, None),
        (4, "video", "webm", b"\x1a\x45\xdf\xa3 no codec", None),
    ]
    out = {
        r["media_id"]: r
        for r in mm.decode_media(
            spark.createDataFrame(rows, mm.MEDIA_DDL)
        ).collect()
    }
    assert (out[1]["dec_sample_rate"], out[1]["dec_channels"]) == (44100, 2)
    assert out[1]["dec_duration_ms"] == 78 and out[1]["dec_bitrate_kbps"] == 128
    assert out[1]["payload_bytes"] == 3 * 417
    assert (out[2]["dec_sample_rate"], out[2]["dec_n_frames"]) == (48000, 2048)
    assert out[2]["dec_duration_ms"] == 43
    assert (out[3]["dec_width"], out[3]["dec_height"]) == (1280, 720)
    assert out[3]["dec_n_frames"] == 1 and out[3]["dec_duration_ms"] == 40
    assert out[4]["decode_error"].startswith("NotImplementedError")
    assert all(out[i]["decode_error"] is None for i in (1, 2, 3))


# ------------------------------------------- perceptual sample features


def _ref_ahash(pixels, width, height, channels):
    """Independent aHash reference: plain-loop luma + block means over
    the 8x8 grid, bit k set iff block k's mean >= mean of block means.
    Deliberately a different implementation shape from the operator's
    vectorized one."""
    luma = []
    for y in range(height):
        row = []
        for x in range(width):
            base = (y * width + x) * channels
            if channels >= 3:
                r, g, b = pixels[base], pixels[base + 1], pixels[base + 2]
                row.append((299 * r + 587 * g + 114 * b) // 1000)
            else:
                row.append(pixels[base])
        luma.append(row)
    means = []
    for i in range(8):
        for j in range(8):
            ys = range((i * height) // 8, ((i + 1) * height) // 8)
            xs = range((j * width) // 8, ((j + 1) * width) // 8)
            vals = [luma[y][x] for y in ys for x in xs]
            means.append(sum(vals) / len(vals))
    thresh = sum(means) / 64.0
    v = 0
    for k, m in enumerate(means):
        if m >= thresh:
            v |= 1 << (63 - k)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_ahash_matches_independent_reference():
    w, h = 16, 16
    px = _gradient(w, h, 3)
    d = mm._decode_netpbm(_make_ppm(w, h, px))
    assert mm._ahash64(d, "ppm") == _ref_ahash(px, w, h, 3)
    # grayscale PGM too
    pg = _gradient(w, h, 1)
    d1 = mm._decode_netpbm(_make_ppm(w, h, pg, magic=b"P5"))
    assert mm._ahash64(d1, "pgm") == _ref_ahash(pg, w, h, 1)


def test_ahash_identical_across_ppm_png_bmp():
    """The same image encoded as PPM (RGB top-down), PNG (filtered) and
    BMP (BGR bottom-up, padded rows) must hash identically — the
    orientation/channel-order normalization is the point."""
    w, h = 13, 10  # non-multiple-of-8 and padded BMP stride
    px = _gradient(w, h, 3)
    want = _ref_ahash(px, w, h, 3)
    d_ppm = mm._decode_netpbm(_make_ppm(w, h, px))
    assert mm._ahash64(d_ppm, "ppm") == want
    d_png = mm._decode_png(_make_png(w, h, 3, px))
    assert mm._ahash64(d_png, "png") == want
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up, BGR
        row = bytearray()
        for x in range(w):
            base = (y * w + x) * 3
            row += bytes((px[base + 2], px[base + 1], px[base]))
        rows.append(bytes(row))
    d_bmp = mm._decode_bmp(_make_bmp(w, h, rows))
    assert mm._ahash64(d_bmp, "bmp") == want


def test_ahash_topdown_bmp_not_mirrored():
    """Negative-height BMPs store rows top-down (already raster order):
    the perceptual pass must NOT flip them — r13 review find: the
    unconditional flip mirrored their aHash vs the same image as PNG."""
    w, h = 13, 10
    px = _gradient(w, h, 3)
    want = _ref_ahash(px, w, h, 3)
    rows = []
    for y in range(h):  # TOP-DOWN row order, BGR
        row = bytearray()
        for x in range(w):
            base = (y * w + x) * 3
            row += bytes((px[base + 2], px[base + 1], px[base]))
        rows.append(bytes(row))
    d = mm._decode_bmp(_make_bmp(w, -h, rows))
    assert d["bmp_topdown"] and d["height"] == h
    assert mm._ahash64(d, "bmp") == want


def test_ahash_tiny_image_is_null():
    d = mm._decode_netpbm(_make_ppm(4, 4, _gradient(4, 4, 3)))
    assert mm._ahash64(d, "ppm") is None


def _make_bmp8(width, height, index_rows, palette, n_colors_field=None):
    """8-bit palette BI_RGB, bottom-up; ``palette`` = [(r, g, b), ...];
    ``n_colors_field`` overrides biClrUsed (0 means 'full 256')."""
    stride = (width + 3) & ~3
    data = b"".join(
        bytes(row) + b"\x00" * (stride - width) for row in index_rows
    )
    table = b"".join(bytes((b, g, r, 0)) for (r, g, b) in palette)
    off = 54 + len(table)
    used = len(palette) if n_colors_field is None else n_colors_field
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(data),
        2835, 2835, used, 0,
    )
    return (
        b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + info + table + data
    )


def test_ahash_8bit_palette_bmp_resolves_color_table():
    """r13 advisor: 8-bit BMP pixels are palette INDICES — hashing them
    as luma breaks format invariance for any non-grayscale-identity
    palette. The decoder now carries the color table and the luma pass
    resolves through it: the same image as a palette BMP and as a
    24-bit PPM must hash identically, with a palette deliberately
    ordered so index order anti-correlates with luminance."""
    w, h = 13, 10
    # 16 colors whose luma DESCENDS as the index ascends — raw indices
    # as luma would invert the image
    palette = [(255 - 16 * i, 240 - 15 * i, 200 - 12 * i) for i in range(16)]
    idx = [[(x + y) % 16 for x in range(w)] for y in range(h)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(palette[idx[y][x]])
    want = _ref_ahash(bytes(px), w, h, 3)
    d8 = mm._decode_bmp(
        _make_bmp8(w, h, [idx[y] for y in range(h - 1, -1, -1)], palette)
    )
    assert d8["palette"] is not None
    assert mm._ahash64(d8, "bmp") == want
    # ...and the old behavior (indices as luma) would NOT match
    d_raw = dict(d8)
    d_raw.pop("palette")
    assert mm._ahash64(d_raw, "bmp") != want


def _mjpeg_fixture_frames(w=16, h=16):
    """Three visually distinct baseline JPEGs of the same geometry."""
    g = _gradient(w, h, 3)
    inv = bytes(255 - b for b in g)
    half = bytes(b // 2 for b in g)
    return [_make_jpeg(w, h, px) for px in (g, inv, half)]


def test_mp4_mjpeg_keyframe_hashes(spark):
    """r13 VERDICT task 6: mp4 rows whose video track is MJPEG get a
    sample-level perceptual signal — aHash64 per sampled keyframe
    (first/middle/last), each equal to the hash the SAME frame gets as
    a standalone JPEG row (the cross-modality invariant a curation
    pass relies on). H.264 sample entries stay NULL by design."""
    from ethereum_analytical_db_spark.operators import jpeg as J

    frames = _mjpeg_fixture_frames()
    blob = _make_mjpeg_mp4(frames, 16, 16)
    d = mm._decode_mp4(blob)
    assert d["video_codec"] == "jpeg" and len(d["video_samples"]) == 3
    # the sample ranges point at the REAL frame bytes in the file
    for (off, size), f in zip(d["video_samples"], frames):
        assert blob[off : off + size] == f
    want = [mm._ahash64(J.decode_jpeg(f), "jpeg") for f in frames]
    assert mm._video_keyframe_hashes(d, blob) == want

    rows = [
        (1, "mp4", bytearray(blob)),
        (2, "jpeg", bytearray(frames[0])),
        (3, "mp4", bytearray(_make_mjpeg_mp4(frames, 16, 16, codec=b"avc1"))),
    ]
    df = spark.createDataFrame(rows, "media_id long, fmt string, content binary")
    out = {
        r["media_id"]: r
        for r in mm.decode_media(df, perceptual=True).collect()
    }
    assert out[1]["decode_error"] is None
    assert list(out[1]["video_ahash64"]) == want
    assert out[1]["video_ahash64"][0] == out[2]["ahash64"]  # invariant
    assert out[3]["video_ahash64"] is None  # H.264: the codec seam
    assert out[3]["decode_error"] is None  # container metadata still real


def test_mp4_mjpeg_corrupt_keyframe_skipped():
    """A corrupt frame mid-track skips (the row keeps its other
    keyframes) instead of failing the row — the container metadata
    already validated."""
    frames = _mjpeg_fixture_frames()
    from ethereum_analytical_db_spark.operators import jpeg as J

    want = [mm._ahash64(J.decode_jpeg(f), "jpeg") for f in (frames[0], frames[2])]
    broken = [frames[0], b"\xff\xd8garbage", frames[2]]
    d = mm._decode_mp4(_make_mjpeg_mp4(broken, 16, 16))
    assert mm._video_keyframe_hashes(d, _make_mjpeg_mp4(broken, 16, 16)) == want


def test_mp4_uniform_stsz_bogus_count_does_not_allocate():
    """r14 review find: a corrupt uniform-stsz header claiming 2^31
    samples must not allocate a multi-GB size list — samples cannot
    out-size the file. The count survives as metadata; the sample
    layout is simply unavailable."""
    frames = _mjpeg_fixture_frames()
    blob = bytearray(_make_mjpeg_mp4(frames[:1], 16, 16))
    # locate the stsz box and rewrite it as uniform size=1, count=2^31
    i = blob.find(b"stsz")
    assert i > 0
    blob[i + 4 : i + 16] = (
        bytes(4) + struct.pack(">II", 1, 0x7FFFFFFF)
    )
    d = mm._decode_mp4(bytes(blob))
    assert d["n_frames"] == 0x7FFFFFFF  # metadata kept
    assert "video_samples" not in d  # layout refused, no allocation
    assert mm._video_keyframe_hashes(d, bytes(blob)) is None


def test_expand_sample_layout_multichunk():
    """stsc expansion: two chunks of 2 samples then one chunk of 1,
    sizes consumed in order, offsets pack back-to-back within chunks."""
    stsc = [(1, 2), (3, 1)]
    stco = [100, 200, 300]
    sizes = [10, 11, 12, 13, 14]
    got = mm._expand_sample_layout(stsc, stco, sizes)
    assert got == [(100, 10), (110, 11), (200, 12), (212, 13), (300, 14)]


def test_bmp8_palette_index_out_of_range_rejected():
    w, h = 9, 9
    rows = [[7] * w for _ in range(h)]  # index 7 with only 4 colors
    blob = _make_bmp8(w, h, rows, [(0, 0, 0)] * 4)
    with pytest.raises(ValueError, match="palette index"):
        mm._decode_bmp(blob)
    # biClrUsed == 0 means a full 256-entry table
    blob256 = _make_bmp8(
        w, h, rows, [(i, i, i) for i in range(256)], n_colors_field=0
    )
    d = mm._decode_bmp(blob256)
    assert len(d["palette"]) == 1024


def test_audio_stats_pcm16_reference():
    import math

    samples = [0, 16384, -16384, 32767, -32768, 0, 8192, -8192]
    data = b"".join(struct.pack("<h", s) for s in samples)
    d = mm._decode_wav(_make_wav(1, 8000, len(samples), data=data))
    rms, peak = mm._audio_stats(d)
    norm = [s / 32768.0 for s in samples]
    assert abs(rms - math.sqrt(sum(x * x for x in norm) / len(norm))) < 1e-12
    assert peak == max(abs(x) for x in norm) == 1.0


def test_audio_stats_u8_offset_and_float32():
    import math

    # u8 is offset-binary (128 = silence) on the same [-1, 1) grid as
    # every other depth: scale by 128, not 255 (r13 review find — a
    # full-scale 8-bit clip must peak like its 16-bit encoding)
    data = bytes([128, 255, 0, 128])
    d = mm._decode_wav(_make_wav(1, 8000, 4, bits=8, data=data))
    rms, peak = mm._audio_stats(d)
    norm = [(s - 128) / 128.0 for s in [128, 255, 0, 128]]
    assert abs(rms - math.sqrt(sum(x * x for x in norm) / 4)) < 1e-12
    assert peak == 1.0  # sample 0 is the most-negative code, |.|=1.0

    # IEEE float samples pass through unscaled
    fs = [0.5, -0.25, 0.0, 1.0]
    fdata = b"".join(struct.pack("<f", s) for s in fs)
    d2 = mm._decode_wav(
        _make_wav(1, 8000, 4, bits=32, audio_format=3, data=fdata)
    )
    rms2, peak2 = mm._audio_stats(d2)
    assert abs(rms2 - math.sqrt(sum(x * x for x in fs) / 4)) < 1e-12
    assert peak2 == 1.0


def test_audio_stats_adpcm_expansion():
    """ADPCM-decoded PCM (the i16 expansion) yields bounded, non-null
    stats — the compressed-audio path feeds the same projection."""
    samples = [0, 500, 1000, 1500, 2000, 1500, 1000, 500, 0]
    raw, _recon = _ima_encode_mono(samples, 9)
    d = mm._decode_wav(_make_adpcm_wav(1, 8000, 4 + (9 - 1) // 2, raw))
    rms, peak = mm._audio_stats(d)
    assert rms is not None and 0.0 < rms <= peak <= 1.0


def test_decode_media_perceptual_columns_end_to_end(spark):
    """perceptual=True through the Arrow path: image rows carry ahash64
    (matching the direct computation), PCM rows carry rms/peak,
    metadata-only and failed rows stay NULL, and perceptual=False keeps
    the legacy schema."""
    w, h = 16, 12
    px = _gradient(w, h, 3)
    samples = [0, 1000, -1000, 2000]
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    rows = [
        (1, "image", "ppm", _make_ppm(w, h, px), None),
        (2, "audio", "wav", _make_wav(1, 8000, 4, data=pcm), None),
        (3, "image", "fake", mm.encode_fake_media(3, "image", 8, 8)[3], None),
        (4, "image", "png", b"\x89PNG truncated", None),
        (5, "audio", "mp3", b"\xff\xfb\x90\x00" + bytes(413), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_DDL)
    out = {
        r["media_id"]: r
        for r in mm.decode_media(df, perceptual=True).collect()
    }
    assert out[1]["ahash64"] == _ref_ahash(px, w, h, 3)
    assert out[1]["audio_rms"] is None
    d = mm._decode_wav(_make_wav(1, 8000, 4, data=pcm))
    want_rms, want_peak = mm._audio_stats(d)
    assert out[2]["audio_rms"] == want_rms
    assert out[2]["audio_peak"] == want_peak
    assert out[2]["ahash64"] is None
    assert out[3]["ahash64"] is None  # fake codec: no pixel samples
    assert out[4]["decode_error"] is not None and out[4]["ahash64"] is None
    assert out[5]["audio_rms"] is None  # mp3: header walk, no PCM
    legacy = mm.decode_media(df).columns
    assert "ahash64" not in legacy and "audio_rms" not in legacy


def test_keyframe_decoder_seam_avc1(spark):
    """r14 VERDICT task 4: `keyframe_decoder` plugs a library codec
    into the perceptual pass. A fake decoder wired through an 'avc1'
    track must produce video_ahash64 through the SAME
    grid/threshold/bit-order path as every other modality (hash equals
    _ahash64_luma of the plane the decoder returned); default behavior
    (no decoder) stays NULL for avc1; a decoder returning None skips
    the frame; a raising decoder skips the frame, not the row."""
    import numpy as np

    # three fake "H.264 samples": payload bytes seed a deterministic
    # 16x16 luma plane the way a real decoder would produce pixels
    samples = [b"IDR0" * 8, b"IDR1" * 8, b"IDR2" * 8]
    blob = _make_mjpeg_mp4(samples, 16, 16, codec=b"avc1")

    def fake_decoder(codec_4cc, sample_bytes):
        assert codec_4cc == "avc1"
        seed = sample_bytes[3]
        return np.arange(256, dtype=np.int64).reshape(16, 16) * seed % 251

    want = [
        mm._ahash64_luma(fake_decoder("avc1", s)) for s in samples
    ]
    d = mm._decode_mp4(blob)
    assert d["video_codec"] == "avc1"
    assert mm._video_keyframe_hashes(d, blob, decoder=fake_decoder) == want
    # default path unchanged: avc1 without a decoder stays None
    assert mm._video_keyframe_hashes(d, blob) is None

    df = spark.createDataFrame(
        [(1, "mp4", bytearray(blob))], "media_id long, fmt string, content binary"
    )
    out = mm.decode_media(
        df, perceptual=True, keyframe_decoder=fake_decoder
    ).collect()[0]
    assert out["decode_error"] is None
    assert list(out["video_ahash64"]) == want
    base = mm.decode_media(df, perceptual=True).collect()[0]
    assert base["video_ahash64"] is None

    # decoder returning None / raising: frame skipped, row intact
    def flaky(codec_4cc, sample_bytes):
        if sample_bytes == samples[0]:
            return None
        if sample_bytes == samples[1]:
            raise RuntimeError("codec hiccup")
        return fake_decoder(codec_4cc, sample_bytes)

    assert mm._video_keyframe_hashes(d, blob, decoder=flaky) == [want[2]]
    # MJPEG tracks never consult the hook (the built-in decoder wins)
    jf = _mjpeg_fixture_frames()
    mj = _make_mjpeg_mp4(jf, 16, 16)
    dj = mm._decode_mp4(mj)

    def must_not_be_called(codec_4cc, sample_bytes):
        raise AssertionError("hook consulted for an MJPEG track")

    from ethereum_analytical_db_spark.operators import jpeg as J

    assert mm._video_keyframe_hashes(dj, mj, decoder=must_not_be_called) == [
        mm._ahash64(J.decode_jpeg(f), "jpeg") for f in jf
    ]


def test_truncated_stco_degrades_like_truncated_stsz():
    """r14 advice: a truncated chunk-offset table must degrade the same
    way a truncated stsz does — video_samples unavailable, container
    metadata (width/height/n_frames/codec) kept — instead of failing
    the whole row."""
    frames = _mjpeg_fixture_frames()
    blob = bytearray(_make_mjpeg_mp4(frames, 16, 16))
    # corrupt the stco entry count: claim 1000 entries where 1 exists
    i = blob.find(b"stco")
    assert i > 0
    blob[i + 8 : i + 12] = struct.pack(">I", 1000)
    d = mm._decode_mp4(bytes(blob))
    assert d["width"] == 16 and d["height"] == 16
    assert d["n_frames"] == 3 and d["video_codec"] == "jpeg"
    assert d.get("video_samples") is None  # layout unavailable, row sound
    assert mm._video_keyframe_hashes(d, bytes(blob)) is None
