"""Property-based tests (hypothesis) for the invariants a fixed golden
set can't sweep: hex plumbing over arbitrary uint256 values, predicate
builders over arbitrary range lists, PNG de-filtering over random
images/filters, last-write-wins over random replay orders, ANY-join
single-match semantics over duplicate keys, and gap sessionization vs a
pure-Python model. The reference has no property testing at all
(SURVEY §5) — this is part of the 'add what the reference lacks' test
plan. Spark-backed properties keep max_examples small (each example is
a real job); pure-Python ones run wide.
"""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.catalog import final_dedup
from ethereum_analytical_db_spark.functions import ethereum as eth
from ethereum_analytical_db_spark.operators import text as t
from ethereum_analytical_db_spark.operators.joins import any_join
from ethereum_analytical_db_spark.operators.predicates import make_range_filter
from ethereum_analytical_db_spark.operators.multimodal import _decode_png
from ethereum_analytical_db_spark.streaming.stateful import sessionize_batch

from test_multimodal import _make_png

# derandomize: identical example sets every run — a property suite that
# explores fresh examples inside the driver's round gate would turn any
# newly-found edge case into a flaky gate instead of a tracked failure
SPARK_EXAMPLES = settings(max_examples=8, deadline=None, derandomize=True)


# DECIMAL(38,0) holds < 10^38; stay under 2^125 so the decode's decimal
# recombination can't overflow (the try_* NULL behavior at the very top
# of the uint256 range is pinned by the golden-vector tests instead)
@SPARK_EXAMPLES
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**125 - 1),
            st.sampled_from([0, 2, 6, 18]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_uint256_decode_matches_bigint_model(spark, cases):
    """decode('0x' + 64-nibble word) == value / 10^decimals for ANY
    value — the substring offsets, half-split and recombination hold off
    the golden vectors too."""
    # v rides as a string: values above 2^63 don't fit a LongType column
    df = spark.createDataFrame(
        [(f"0x{v:064x}", str(v), int(d)) for v, d in cases],
        "word string, v string, dec int",
    )
    got = df.select(
        "v", "dec", eth.hex_word_to_float("word", "dec").alias("x")
    ).collect()
    for r in got:
        want = int(r["v"]) / 10 ** r["dec"]
        assert r["x"] is not None
        assert abs(r["x"] - want) <= abs(want) * 1e-12, (r["v"], r["dec"])


@SPARK_EXAMPLES
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.integers(-50, 50)),
        ),
        min_size=1,
        max_size=5,
    ),
    st.lists(st.one_of(st.none(), st.integers(-60, 60)), min_size=0, max_size=40),
)
def test_range_filter_matches_python_model(spark, ranges, values):
    """make_range_filter (reference make_range_query) == the obvious
    Python evaluation for every range-list shape, incl. None bounds and
    NULL values."""

    def one(v, lo, hi):
        if lo is None and hi is None:
            return v is not None  # (None, None) → IS NOT NULL
        return (lo is None or v >= lo) and (hi is None or v < hi)

    def model(v):
        return v is not None and any(one(v, lo, hi) for lo, hi in ranges)

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, x int")
    got = {r["i"] for r in df.filter(make_range_filter("x", *ranges)).collect()}
    want = {i for i, v in enumerate(values) if model(v)}
    assert got == want


@settings(max_examples=60, deadline=None, derandomize=True)
@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.sampled_from([1, 2, 3, 4]),
    st.data(),
)
def test_png_defilter_roundtrip_random(width, height, channels, data):
    """Decode inverts the independently-implemented forward filtering
    for ANY image content and ANY per-row filter assignment."""
    n = width * height * channels
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=height, max_size=height)
    )
    d = _decode_png(_make_png(width, height, channels, pixels, filters=filters))
    assert (d["width"], d["height"], d["channels"]) == (width, height, channels)
    assert d["payload"] == pixels


@SPARK_EXAMPLES
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(-5, 5)),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_final_dedup_matches_replay_model(spark, batches):
    """Last-write-wins over ANY batch/replay order == a dict replayed in
    _seq order (ReplacingMergeTree FINAL, SURVEY §1.3)."""
    rows, model = [], {}
    for seq, batch in enumerate(batches):
        for key, val in batch:
            rows.append((str(key), val, seq))
            prev = model.get(str(key))
            # equal _seq: engine tie-breaks by row digest — model only
            # pins the value when the seq strictly advances
            if prev is None or seq > prev[1]:
                model[str(key)] = (val, seq)
    if not rows:
        return
    df = spark.createDataFrame(rows, "id string, value int, _seq long")
    got = {r["id"]: (r["value"], r["_seq"]) for r in final_dedup(df, ["id"]).collect()}
    assert set(got) == set(model)
    for k, (val, seq) in model.items():
        assert got[k][1] == seq, k
        # same-seq duplicates may legitimately pick another value of the
        # same seq; different-seq picks must match the model exactly
        same_seq_vals = {v for kk, v, s in rows if kk == k and s == seq}
        assert got[k][0] in same_seq_vals


@SPARK_EXAMPLES
@given(
    st.lists(st.integers(0, 5), min_size=0, max_size=12),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=20),
)
def test_any_join_single_match_property(spark, left_keys, right_rows):
    """ANY LEFT JOIN: exactly one output row per left row; every matched
    value comes from that key's right rows; unmatched stay NULL."""
    left = spark.createDataFrame(
        [(i, k) for i, k in enumerate(left_keys)], "i long, k int"
    )
    right = spark.createDataFrame(right_rows, "k int, v int")
    out = any_join(left, right, "k", how="left").collect()
    assert len(out) == len(left_keys)
    by_key: dict[int, set] = {}
    for k, v in right_rows:
        by_key.setdefault(k, set()).add(v)
    for r in out:
        if r["k"] in by_key:
            assert r["v"] in by_key[r["k"]]
        else:
            assert r["v"] is None


@SPARK_EXAMPLES
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.lists(st.integers(0, 10_000), min_size=1, max_size=25),
        min_size=1,
        max_size=3,
    )
)
def test_sessionize_batch_matches_python_model(spark, per_key_ts):
    """Gap sessionization == the obvious sort-and-split model for ANY
    event-time multiset (duplicates included), any key mix."""
    gap = 60
    rows = [
        (k, float(ts), i)
        for k, tss in per_key_ts.items()
        for i, ts in enumerate(tss)
    ]
    df = spark.createDataFrame(rows, "user_id string, sec double, event_id long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), F.lit(1.0).alias("value"),
        "event_id",
    )
    out = sessionize_batch(df, gap_seconds=gap, id_col="event_id").collect()
    got = {
        k: sorted(
            (r["session_start"], r["session_end"], r["n_events"])
            for r in out
            if r["user_id"] == k
        )
        for k in per_key_ts
    }
    for k, tss in per_key_ts.items():
        sessions = []
        for ts in sorted(tss):
            if sessions and ts - sessions[-1][1] <= gap:
                prev = sessions[-1]
                sessions[-1] = (prev[0], ts, prev[2] + 1)
            else:
                sessions.append((ts, ts, 1))
        want = sorted(
            (s[0], s[1], s[2]) for s in sessions
        )
        flat = [
            (int(a.timestamp()), int(b.timestamp()), n) for a, b, n in got[k]
        ]
        assert flat == want, k


@settings(max_examples=80, derandomize=True)
@given(st.lists(st.integers(0, 99_999), min_size=1, max_size=10))
def test_phone_pattern_ignores_space_separated_digit_runs(nums):
    """Round-4 advice regression as a property: NO space-separated run
    of plain digit groups is ever redacted as a phone number."""
    s = " ".join(str(n) for n in nums)
    assert re.search(t.PII_PATTERNS["phone"], s) is None


@SPARK_EXAMPLES
@given(
    st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(8)]),
            min_size=0, max_size=20,
        ),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_substring_dedup_matches_python_model(spark, word_lists, k):
    """Keep-first exact-substring dedup equals the pure-Python model on
    ANY corpus — tiny vocab forces heavy window collisions, empty and
    sub-k docs exercise the pass-through path."""
    from ethereum_analytical_db_spark.operators import dedup as dd
    from test_dedup import _py_substring_oracle

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _, exp_clean, exp_removed = _py_substring_oracle(rows, k)
    got = {r["doc_id"]: r for r in dd.exact_substring_dedup(df, k=k).collect()}
    assert len(got) == len(rows)
    for doc_id, _ in rows:
        assert got[doc_id]["text_clean"] == exp_clean[doc_id], (doc_id, k)
        assert got[doc_id]["tokens_removed"] == exp_removed[doc_id], (doc_id, k)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdef"), min_size=5, max_size=10),
            st.integers(min_value=0, max_value=2),  # shard of this doc
        ),
        min_size=4,
        max_size=12,
    )
)
def test_incremental_probe_append_equals_full_recompute(spark, docs):
    """For ANY corpus and ANY 3-way sharding, sequentially probing and
    appending each non-empty shard against the growing band index
    reproduces the one-shot batch recompute exactly: every candidate
    pair surfaces exactly once — in the shard of its LATER doc — with
    the same bands_in_common. The tiny 6-word vocabulary forces heavy
    shingle collisions, so pairs are plentiful."""
    import shutil
    import tempfile

    from ethereum_analytical_db_spark.operators import dedup

    rows = [(i, " ".join(words)) for i, (words, _) in enumerate(docs)]
    shard_of = {i: s for i, (_, s) in enumerate(docs)}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        (r["doc_a"], r["doc_b"]): r["bands_in_common"]
        for r in dedup.minhash_lsh_candidates(df, n=3, num_hashes=8, bands=4).collect()
    }
    base = tempfile.mkdtemp()
    try:
        path = f"{base}/idx"
        found: dict = {}
        seen_shards = []
        for s in (0, 1, 2):
            shard = df.filter(
                F.col("doc_id").isin([i for i, v in shard_of.items() if v == s] or [-1])
            )
            if shard.isEmpty():
                continue
            if not seen_shards:
                dedup.minhash_index_write(shard, path, n=3, num_hashes=8, bands=4)
            else:
                for r in dedup.minhash_probe_candidates(
                    spark, path, shard, n=3, num_hashes=8, bands=4
                ).collect():
                    pair = (r["doc_a"], r["doc_b"])
                    assert pair not in found
                    found[pair] = r["bands_in_common"]
                dedup.minhash_index_append(shard, path, n=3, num_hashes=8, bands=4)
            seen_shards.append(s)
        first = seen_shards[0]
        expected = {
            p: c
            for p, c in want.items()
            if not (shard_of[p[0]] == first and shard_of[p[1]] == first)
        }
        assert found == expected
    finally:
        shutil.rmtree(base, ignore_errors=True)


@SPARK_EXAMPLES
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.floats(min_value=0.0, max_value=3.5, allow_nan=False, width=32),
        min_size=1,
        max_size=3,
    ),
    default_w=st.floats(min_value=0.0, max_value=1.5, allow_nan=False, width=32),
)
def test_mixture_resample_matches_python_model(spark, ids, weights, default_w):
    """mixture_resample vs a pure-Python model: per-row copies equal
    floor(w) + (md5(id||salt) prefix < frac(w) threshold), copy indexes
    are exactly 0..copies-1 — over arbitrary weights (incl. 0 and
    integer-valued floats) and arbitrary strata assignment."""
    import hashlib
    import math

    from ethereum_analytical_db_spark.operators.sampling import (
        _hex4,
        mixture_resample,
    )

    rows = [(i, ["a", "b", "c", "zz"][i % 4]) for i in ids]
    df = spark.createDataFrame(rows, "id long, dom string")
    got = {}
    for r in mixture_resample(df, "dom", weights, "id", default_weight=default_w).collect():
        got.setdefault((r["id"], r["dom"]), []).append(r["copy"])

    def model_copies(i, dom):
        w = weights.get(dom, default_w)
        base = int(math.floor(w))
        frac = w - base
        if frac > 0:
            prefix = hashlib.md5(f"{i}mixture".encode()).hexdigest()[:4]
            base += 1 if prefix < _hex4(frac) else 0
        return base

    want = {
        (i, dom): list(range(model_copies(i, dom)))
        for i, dom in rows
        if model_copies(i, dom) > 0
    }
    assert {k: sorted(v) for k, v in got.items()} == want


@SPARK_EXAMPLES
@given(
    lens=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=12),
    max_tokens=st.integers(min_value=2, max_value=16),
    data=st.data(),
)
def test_chunk_documents_matches_python_model(spark, lens, max_tokens, data):
    """chunk_documents vs a pure-Python window model over arbitrary
    document lengths and (max_tokens, overlap) shapes."""
    from ethereum_analytical_db_spark.operators.packing import chunk_documents

    overlap = data.draw(st.integers(min_value=0, max_value=max_tokens - 1))
    stride = max_tokens - overlap
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(n))) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, max_tokens=max_tokens, overlap=overlap).collect()
    }
    want = {}
    for i, text in rows:
        toks = text.split(" ")
        n = len(toks)
        k_max = (n - overlap - 1) // stride if n > overlap else 0
        for k in range(k_max + 1):
            w = toks[k * stride : k * stride + max_tokens]
            want[(i, k)] = (" ".join(w), len(w))
    assert got == want


# ---- perceptual frame-header parsers (r10): pure-Python, run wide ----

_MP3_V1L3 = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_SR1 = [44100, 48000, 32000]


@settings(max_examples=120, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=14),  # bitrate index
            st.integers(min_value=0, max_value=2),   # sample-rate index
            st.booleans(),                           # padding bit
            st.booleans(),                           # mono
        ),
        min_size=1,
        max_size=12,
    ),
    st.booleans(),  # ID3v2 prefix
    st.booleans(),  # ID3v1 trailer
)
def test_mp3_walk_property(frames, id3v2, id3v1):
    """Any MPEG1-Layer-III frame sequence packed from the published bit
    layout round-trips: per-frame sizes accounted exactly, totals equal
    the independent model. NOTE: all frames share one sample-rate index
    in a real stream; hypothesis varies it per-frame and the parser must
    still walk (it prices duration by the FIRST frame's rate)."""
    from ethereum_analytical_db_spark.operators import multimodal as mm

    sr0 = _MP3_SR1[frames[0][1]]
    blob = b""
    if id3v2:
        blob += b"ID3\x03\x00\x00" + bytes([0, 0, 0, 9]) + bytes(9)
    audio = b""
    sizes = []
    for br_idx, sr_idx, pad, mono in frames:
        br = _MP3_V1L3[br_idx - 1] * 1000
        sr = _MP3_SR1[sr_idx]
        size = 144 * br // sr + (1 if pad else 0)
        b1 = 0b11111011  # MPEG1, Layer III, no CRC
        b2 = (br_idx << 4) | (sr_idx << 2) | ((1 if pad else 0) << 1)
        b3 = 0xC0 if mono else 0x00
        audio += bytes([0xFF, b1, b2, b3]) + bytes(size - 4)
        sizes.append(size)
    blob += audio
    if id3v1:
        blob += b"TAG" + bytes(125)
    d = mm._parse_mp3(blob)
    assert d["sample_rate"] == sr0
    assert d["channels"] == (1 if frames[0][3] else 2)
    assert d["n_frames"] == 1152 * len(frames)
    assert len(d["payload"]) == sum(sizes)
    assert d["duration_ms"] == round(1152 * len(frames) * 1000 / sr0)
    assert d["bitrate_kbps"] == round(
        sum(sizes) * 8 * sr0 / (1152 * len(frames) * 1000)
    )


@settings(max_examples=120, derandomize=True)
@given(
    st.integers(min_value=1, max_value=200),    # pic_width_in_mbs_minus1
    st.integers(min_value=1, max_value=200),    # pic_height_in_map_units_minus1
    st.tuples(*[st.integers(min_value=0, max_value=3)] * 4),  # crops
    st.sampled_from([66, 77, 100, 110]),        # baseline/main/high profiles
    st.booleans(),                              # vui timing present
    st.integers(min_value=1, max_value=60),     # fps numerator
)
def test_h264_sps_property(pw, ph, crops, profile, timing, fps):
    """Arbitrary SPS geometry written with the independent exp-Golomb
    writer (incl. emulation-prevention escaping) parses back to the spec
    crop arithmetic, for both the baseline and the high-profile chroma
    branch, with and without VUI timing."""
    from ethereum_analytical_db_spark.operators import multimodal as mm

    from test_multimodal import _SpsBitWriter, _escape_rbsp

    w = _SpsBitWriter()
    w.u(8, profile)
    w.u(8, 0)
    w.u(8, 40)
    w.ue(0)
    if profile in (100, 110):
        w.ue(1)          # chroma 4:2:0
        w.ue(0); w.ue(0)
        w.u(1, 0)
        w.u(1, 0)
    w.ue(0)              # log2_max_frame_num
    w.ue(0)              # poc type 0
    w.ue(0)              # log2_max_poc
    w.ue(1); w.u(1, 0)
    w.ue(pw); w.ue(ph)
    w.u(1, 1)            # frame_mbs_only
    w.u(1, 0)            # direct_8x8
    any_crop = any(crops)
    w.u(1, 1 if any_crop else 0)
    if any_crop:
        for c in crops:
            w.ue(c)
    w.u(1, 1 if timing else 0)
    if timing:
        w.u(1, 0); w.u(1, 0); w.u(1, 0); w.u(1, 0)
        w.u(1, 1)
        w.u(32, 1); w.u(32, 2 * fps); w.u(1, 1)
    sps = b"\x67" + _escape_rbsp(w.rbsp())
    sc = b"\x00\x00\x00\x01"
    stream = sc + sps + sc + b"\x65\xc0"  # one IDR picture
    d = mm._parse_h264(stream)
    l, r, t_, b = crops if any_crop else (0, 0, 0, 0)
    assert d["width"] == (pw + 1) * 16 - (l + r) * 2
    assert d["height"] == (ph + 1) * 16 - (t_ + b) * 2
    assert d["n_frames"] == 1
    if timing:
        assert d["duration_ms"] == round(1000 / fps)
    else:
        assert "duration_ms" not in d


# ---- r13: driver-local BPE trainer vs the naive full-rescan model ----
# pure-Python on both sides: run wide. The incremental-heap trainer
# (operators/tokenizer.train_bpe_local) must be rank-for-rank identical
# to the quadratic reference for ANY corpus, not just the fixed seeds —
# the whole hybrid design rests on this equivalence.


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=12),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=3),
)
def test_train_bpe_local_matches_naive_model(words, num_merges, min_freq):
    from collections import Counter

    from ethereum_analytical_db_spark.operators.tokenizer import (
        train_bpe_local,
    )
    from test_tokenizer import py_train_bpe

    texts = [" ".join(words)]
    wf = list(Counter(w for w in words).items())
    got = train_bpe_local(wf, num_merges=num_merges, min_freq=min_freq)
    want = py_train_bpe(texts, num_merges=num_merges, min_freq=min_freq)
    assert got == want


# ---- r13: aHash is invariant across pixel containers ----
# the same random image encoded as PPM (RGB top-down), PNG (filtered),
# bottom-up BMP and top-down BMP must produce one hash — the
# orientation/channel-order normalization holds for arbitrary content,
# not just the gradient fixture.


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    st.integers(min_value=8, max_value=20),
    st.integers(min_value=8, max_value=16),
    st.binary(min_size=0, max_size=0),  # placeholder to vary the seed
    st.randoms(use_true_random=False),
)
def test_ahash_container_invariance(width, height, _seed, rnd):
    from ethereum_analytical_db_spark.operators import multimodal as mm
    from test_multimodal import _make_bmp, _make_ppm, _make_png

    px = bytes(rnd.randrange(256) for _ in range(width * height * 3))
    d_ppm = mm._decode_netpbm(_make_ppm(width, height, px))
    want = mm._ahash64(d_ppm, "ppm")
    assert want is not None
    d_png = mm._decode_png(_make_png(width, height, 3, px))
    assert mm._ahash64(d_png, "png") == want
    rows_bu, rows_td = [], []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            base = (y * width + x) * 3
            row += bytes((px[base + 2], px[base + 1], px[base]))
        rows_td.append(bytes(row))
    rows_bu = list(reversed(rows_td))
    assert mm._ahash64(mm._decode_bmp(_make_bmp(width, height, rows_bu)), "bmp") == want
    assert (
        mm._ahash64(mm._decode_bmp(_make_bmp(width, -height, rows_td)), "bmp")
        == want
    )
