"""Pure-Python baseline JPEG (JFIF) decoder for the multimodal codec seam.

Closes the last ``NotImplementedError`` behind ``decode_media``
(``operators/multimodal.py``): training corpora are JPEG-heavy, so the
raster seam needed a real JPEG path, not just PPM/PGM/BMP/PNG.

Scope — baseline sequential DCT (SOF0), 8-bit samples, Huffman entropy
coding, grayscale or YCbCr with any h/v subsampling (4:4:4, 4:2:2,
4:2:0, ...), restart markers (DRI/RSTn). Progressive (SOF2),
arithmetic coding, and 12-bit depth raise ``ValueError`` into the
row-level ``decode_error`` column, same as every other malformed input.

Implementation notes:
- Entropy decode is per-bit Python (dict-of-canonical-codes lookup) —
  the correctness baseline at this seam; production swaps in a C-backed
  codec at the same ``_CODECS['jpeg']`` entry and nothing downstream
  changes (same contract as the PNG de-filter, module docstring there).
- Dequant + IDCT + upsample + colorspace run in numpy (already resident
  in the mapInPandas worker), so the per-block math is vectorized even
  in the baseline.

No reference counterpart — the reference engine has no media handling;
this belongs to the LLM-training-data pack (brief: multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np

# natural (row-major) index of the k-th coefficient in zigzag scan order
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: IDCT(B) = A @ B @ A.T
_A = np.array([
    [(1.0 / np.sqrt(2.0) if j == 0 else 1.0)
     * np.cos((2 * i + 1) * j * np.pi / 16.0) / 2.0
     for j in range(8)]
    for i in range(8)
])


def _build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman: (bit-length, code) -> symbol (ITU T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _Restart(Exception):
    """Internal signal: RSTn marker reached in the entropy stream."""


class _Bits:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; raises _Restart at RSTn so the MCU loop can resync."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _byte(self) -> int:
        d, p = self.d, self.p
        if p >= len(d):
            raise ValueError("truncated JPEG scan data")
        b = d[p]
        self.p = p + 1
        if b != 0xFF:
            return b
        if self.p >= len(d):
            raise ValueError("truncated JPEG scan data")
        m = d[self.p]
        self.p += 1
        if m == 0x00:  # stuffed literal 0xFF
            return 0xFF
        if 0xD0 <= m <= 0xD7 or m == 0xD9:
            self.p -= 2  # leave the marker for restart()/caller
            raise _Restart(m)
        raise ValueError(f"unexpected marker 0xff{m:02x} in scan")

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.n < n:
            self.acc = (self.acc << 8) | self._byte()
            self.n += 8
        self.n -= n
        return (self.acc >> self.n) & ((1 << n) - 1)

    def restart(self) -> None:
        """Byte-align past an expected RSTn marker, drop buffered bits."""
        self.acc = 0
        self.n = 0
        d = self.d
        # skip any pad bits already consumed into acc is done; find marker
        if not (self.p + 1 < len(d) and d[self.p] == 0xFF
                and 0xD0 <= d[self.p + 1] <= 0xD7):
            raise ValueError("expected RSTn marker at restart interval")
        self.p += 2

    def huffman(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t raw bits to the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(
    bits: _Bits, dc_tab: dict, ac_tab: dict, qtab: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 block: entropy decode -> dequant -> IDCT -> samples."""
    zz = np.zeros(64, dtype=np.int32)
    t = bits.huffman(dc_tab)
    pred += _extend(bits.bits(t), t)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = bits.huffman(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(bits.bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz * qtab  # DQT/zigzag share the scan order
    pix = _A @ coef.reshape(8, 8) @ _A.T + 128.0
    return np.clip(np.round(pix), 0, 255).astype(np.uint8), pred


def decode_jpeg(content: bytes) -> dict:
    """Decode a baseline JFIF/JPEG byte string.

    Returns ``{"width", "height", "channels", "payload"}`` with payload
    as interleaved 8-bit RGB (3 components) or grayscale (1 component)
    rows — the same contract as the other ``_CODECS`` entries.
    """
    if content[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG magic (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_map: list[tuple[dict, dict, dict]] = []
    while pos + 1 < len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue  # standalone markers
        if marker == 0xD9:  # EOI before SOS: nothing to decode
            raise ValueError("EOI before scan data")
        (seglen,) = struct.unpack(">H", content[pos:pos + 2])
        seg = content[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8
                ).astype(np.float64)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = seg[i + 1:i + 17]
                total = sum(counts)
                tab = _build_huffman(counts, seg[i + 17:i + 17 + total])
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                i += 17 + total
        elif marker == 0xC0:  # SOF0 baseline sequential
            if seg[0] != 8:
                raise ValueError(f"unsupported sample precision {seg[0]}")
            height, width = struct.unpack(">HH", seg[1:5])
            comps = []
            for c in range(seg[5]):
                cid, hv, tq_id = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq_id}
                )
            if len(comps) not in (1, 3):
                raise ValueError(f"unsupported component count {len(comps)}")
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode SOF{marker - 0xC0} (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF0")
            by_id = {c["id"]: c for c in frame["comps"]}
            for c in range(seg[0]):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map.append(
                    (by_id[cs], huff_dc[tables >> 4], huff_ac[tables & 0x0F])
                )
            if len(scan_map) != len(frame["comps"]):
                raise ValueError("non-interleaved scans unsupported")
            break
        # APPn / COM: ignored
    if not scan_map:
        raise ValueError("no SOS scan found")

    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.uint8)
        for c in frame["comps"]
    }
    preds = {c["id"]: 0 for c in frame["comps"]}
    bits = _Bits(content, pos)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bits.restart()
                preds = {cid: 0 for cid in preds}
            for comp, dc_tab, ac_tab in scan_map:
                cid, ch, cv = comp["id"], comp["h"], comp["v"]
                qtab = qt[comp["tq"]]
                plane = planes[cid]
                for by in range(cv):
                    for bx in range(ch):
                        try:
                            block, preds[cid] = _decode_block(
                                bits, dc_tab, ac_tab, qtab, preds[cid]
                            )
                        except _Restart as r:
                            raise ValueError(
                                f"marker 0xff{r.args[0]:02x} inside MCU"
                            ) from None
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = block
            mcu_n += 1

    # upsample subsampled planes (nearest-neighbor) and crop to (h, w)
    full = []
    for c in frame["comps"]:
        p = planes[c["id"]]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w].astype(np.float64))

    if len(full) == 1:
        payload = full[0].astype(np.uint8).tobytes()
        return {"width": w, "height": h, "channels": 1, "payload": payload}

    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "payload": rgb.tobytes()}
