"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media rides as an opaque ``binary`` content column plus a typed metadata
struct; all per-item work (decode, feature extraction, resizing, frame
sampling) runs as Arrow-batched ``mapInPandas`` — binary columns arrive
as zero-copy Arrow buffers, Python touches each batch once, and the
operators are narrow (no shuffle), so they scale linearly with input
splits at 100 TB.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
container; ``decode_media`` therefore ships a clearly-marked stub that
raises ``NotImplementedError`` for real formats, plus a deterministic
synthetic codec (``format='fake'``) that parses this module's own header
layout so the Spark-side plumbing — schema, batch shape, null handling,
metadata propagation — is real and fully tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id long, kind string, fmt string, content binary, "
    "meta struct<width: int, height: int, sample_rate: int, n_frames: int>"
)

_FAKE_MAGIC = b"FAKE"


def encode_fake_media(
    media_id: int, kind: str, width: int = 0, height: int = 0,
    sample_rate: int = 0, n_frames: int = 0, payload: bytes = b"",
) -> tuple:
    """Build one synthetic media row (header + payload). The header is
    the deterministic stand-in for a real container format."""
    header = _FAKE_MAGIC + struct.pack("<iiii", width, height, sample_rate, n_frames)
    return (
        media_id,
        kind,
        "fake",
        header + payload,
        {"width": width, "height": height, "sample_rate": sample_rate, "n_frames": n_frames},
    )


def _decode_fake(content: bytes) -> dict:
    if content[:4] != _FAKE_MAGIC:
        raise ValueError("bad magic")
    w, h, sr, nf = struct.unpack("<iiii", content[4:20])
    return {
        "width": w, "height": h, "sample_rate": sr, "n_frames": nf,
        "payload": content[20:],
    }


def decode_media(df: DataFrame, content_col: str = "content", fmt_col: str = "fmt") -> DataFrame:
    """Decode the container header → verified metadata + payload size.

    STUB BOUNDARY: real formats (jpeg/png/wav/mp4) raise
    NotImplementedError here — wire a real codec in this one function
    and every downstream operator keeps working unchanged.
    """
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = (
        f"{fields}, dec_width int, dec_height int, dec_sample_rate int, "
        "dec_n_frames int, payload_bytes long, decode_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, sr, nf, nb, err = [], [], [], [], [], []
            for fmt, content in zip(pdf[fmt_col], pdf[content_col]):
                try:
                    if fmt != "fake":
                        raise NotImplementedError(
                            f"no codec for format {fmt!r} in this environment"
                        )
                    d = _decode_fake(bytes(content))
                    w.append(d["width"]); h.append(d["height"])
                    sr.append(d["sample_rate"]); nf.append(d["n_frames"])
                    nb.append(len(d["payload"])); err.append(None)
                except Exception as e:  # malformed/unsupported → row-level error
                    w.append(None); h.append(None); sr.append(None); nf.append(None)
                    nb.append(None); err.append(f"{type(e).__name__}: {e}")
            pdf = pdf.copy()
            pdf["dec_width"] = pd.array(w, dtype="Int32")
            pdf["dec_height"] = pd.array(h, dtype="Int32")
            pdf["dec_sample_rate"] = pd.array(sr, dtype="Int32")
            pdf["dec_n_frames"] = pd.array(nf, dtype="Int32")
            pdf["payload_bytes"] = pd.array(nb, dtype="Int64")
            pdf["decode_error"] = err
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    feat_dim: int = 8,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Deterministic content-hash feature vector (array<float>) per item —
    the stand-in for a real encoder model; the batching/shape contract
    (one fixed-dim vector per row, Arrow transfer) is exactly what a
    model-backed UDF uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf[content_col]:
                h = hashlib.md5(bytes(content)).digest()
                # expand deterministically to feat_dim floats in [0, 1)
                vals = []
                seed = h
                while len(vals) < feat_dim:
                    seed = hashlib.md5(seed).digest()
                    vals.extend(
                        int.from_bytes(seed[i : i + 4], "big") / 2**32
                        for i in range(0, 16, 4)
                    )
                feats.append([float(v) for v in vals[:feat_dim]])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(run, schema=f"{id_col} long, features array<float>")


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    n_frames_field: str = "meta.n_frames",
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (0, n, 2n, ...). Pure Column expressions — the actual
    frame *extraction* happens in decode_media's codec; this operator
    decides WHICH frames, which is the shuffle-free part that matters
    for planning."""
    nf = F.col(n_frames_field)
    idxs = F.sequence(F.lit(0), nf - 1, F.lit(every_n))
    return (
        df.filter(nf > 0)
        .select(F.col(id_col), F.explode(idxs).alias("frame_idx"))
    )


def resize_plan(
    df: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Resize metadata plan: computes target dims + scale factors as
    columns (letterbox-preserving aspect). Content transformation is the
    codec stub's job; planning stays JVM-side."""
    w, h = F.col("meta.width").cast("double"), F.col("meta.height").cast("double")
    scale = F.least(F.lit(target_w) / w, F.lit(target_h) / h)
    return df.withColumn(
        "resize",
        F.struct(
            F.lit(target_w).alias("target_w"),
            F.lit(target_h).alias("target_h"),
            scale.alias("scale"),
            F.round(w * scale).cast("int").alias("out_w"),
            F.round(h * scale).cast("int").alias("out_h"),
        ),
    )
