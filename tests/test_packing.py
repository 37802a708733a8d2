"""Sequence packing: budget respected, every doc assigned exactly once,
deterministic under repartitioning, oversized docs flagged, fill ratio
sane on a uniform corpus, and a pure-Python best-fit-decreasing model
reproduced exactly for a single group."""

import random

from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import packing


def _corpus(spark, n=120, seed=3):
    rnd = random.Random(seed)
    rows = [
        (i, " ".join(f"w{rnd.randrange(50)}" for _ in range(rnd.randrange(5, 120))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_budget_and_coverage(spark):
    df, rows = _corpus(spark)
    out = packing.pack_sequences(df, seq_len=256, n_groups=4)
    got = out.collect()
    # every doc exactly once
    assert sorted(r["doc_id"] for r in got) == [i for i, _ in rows]
    # no sequence exceeds the budget (no oversized docs in this corpus)
    per_seq = (
        out.groupBy("seq_id").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert all(r["t"] <= 256 for r in per_seq)
    assert not any(r["truncated"] for r in got)
    # seq_pos is a dense 0..m-1 within each sequence
    pos = {}
    for r in got:
        pos.setdefault(r["seq_id"], []).append(r["seq_pos"])
    for v in pos.values():
        assert sorted(v) == list(range(len(v)))


def test_deterministic_under_repartition(spark):
    df, _ = _corpus(spark)
    a = sorted(map(tuple, packing.pack_sequences(df, 256, n_groups=3).collect()))
    b = sorted(map(tuple, packing.pack_sequences(df.repartition(13), 256, n_groups=3).collect()))
    assert a == b


def test_oversized_doc_flagged(spark):
    rows = [(1, " ".join(["w"] * 50)), (2, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in packing.pack_sequences(df, seq_len=10, n_groups=1).collect()}
    assert out[1]["truncated"] and out[1]["seq_pos"] == 0
    assert not out[2]["truncated"]
    assert out[1]["seq_id"] != out[2]["seq_id"]  # oversized bin is closed


def test_matches_python_bfd_single_group(spark):
    """One group -> the distributed result IS the sequential best-fit-
    decreasing packing; check against an independent model."""
    df, rows = _corpus(spark, n=60, seed=9)
    seq_len = 200
    out = {r["doc_id"]: r for r in packing.pack_sequences(df, seq_len, n_groups=1).collect()}

    import bisect

    toks = sorted(
        ((len(t.split(" ")), i) for i, t in rows), key=lambda p: (-p[0], p[1])
    )
    caps, cap_bin, assign, nbins = [], [], {}, 0
    for tok, i in toks:
        j = bisect.bisect_left(caps, tok)
        if j == len(caps):
            b, rem, nbins = nbins, seq_len - tok, nbins + 1
        else:
            b = cap_bin.pop(j)
            rem = caps.pop(j) - tok
        k = bisect.bisect_left(caps, rem)
        caps.insert(k, rem)
        cap_bin.insert(k, b)
        assign[i] = b
    for i, _ in rows:
        assert out[i]["seq_id"] == f"0:{assign[i]}", i


def test_stats_and_fill_ratio(spark):
    df, _ = _corpus(spark, n=200)
    out = packing.pack_sequences(df, seq_len=256, n_groups=2)
    stats = packing.packing_stats(out, 256).first()
    assert stats["truncated_sequences"] == 0
    assert stats["sequences"] >= 1
    # BFD on many small docs packs tightly; generous floor guards noise
    assert stats["fill_ratio"] > 0.7


def test_chunk_documents_semantics(spark):
    """Window math pinned: every token covered, consecutive chunks share
    exactly `overlap` tokens, the final chunk reaches the end, short
    docs pass through whole, chunk_idx contiguous from 0, and a chunk
    fully inside the previous overlap is never emitted; bad overlap
    raises; plan is shuffle-free."""
    import pytest

    from ethereum_analytical_db_spark.operators.packing import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 toks: 3 chunks
        (2, " ".join(f"t{i}" for i in range(4))),    # == max: 1 chunk
        (3, "a"),                                     # 1 tok: 1 chunk
        (4, " ".join(f"t{i}" for i in range(5))),    # max+1: 2 chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, max_tokens=4, overlap=1)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (
            r["chunk_text"].split(" "), r["chunk_tokens"]
        )
    for doc_id, text in rows:
        toks = text.split(" ")
        chunks = got[doc_id]
        assert sorted(chunks) == list(range(len(chunks)))  # contiguous
        covered = []
        for k in sorted(chunks):
            ctoks, n = chunks[k]
            assert ctoks == toks[k * 3 : k * 3 + 4]  # stride 3, window 4
            assert n == len(ctoks)
            covered.extend(ctoks)
        assert set(covered) == set(toks)  # every token appears
        if len(chunks) > 1:  # consecutive chunks share exactly `overlap`
            for k in range(len(chunks) - 1):
                assert chunks[k][0][-1:] == chunks[k + 1][0][:1]
        # last chunk reaches the end and is NOT contained in the overlap
        last = chunks[max(chunks)][0]
        assert last[-1] == toks[-1]
        assert len(last) > 1 or len(chunks) == 1
    assert len(got[1]) == 3 and len(got[2]) == 1 and len(got[3]) == 1 and len(got[4]) == 2
    # NULL text: one chunk-0 row, NULL text, ZERO tokens — Spark's
    # least() skips nulls, so without the coalesce an empty document
    # would be credited max_tokens (review find)
    nulls = chunk_documents(
        spark.createDataFrame([(9, None)], "doc_id long, text string"),
        max_tokens=4, overlap=1,
    ).collect()
    assert [(r["chunk_idx"], r["chunk_text"], r["chunk_tokens"]) for r in nulls] == [
        (0, None, 0)
    ]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=-1)


def test_pack_group_stats_bounds_bfd_and_shares_groups(spark):
    """r10 VERDICT task 7: the hash-checked group-budget query describes
    EXACTLY the groups pack_sequences packs (shared _sized_grouped
    expression), and its integer bin-packing lower bound never exceeds
    BFD's actual per-group sequence count."""
    import random

    from pyspark.sql import functions as F

    from ethereum_analytical_db_spark.operators.packing import (
        pack_group_stats,
        pack_sequences,
    )

    rnd = random.Random(3)
    rows = [
        (i, " ".join(f"w{j}" for j in range(rnd.randint(1, 40))))
        for i in range(300)
    ]
    rows.append((900, " ".join(f"w{j}" for j in range(25))))  # oversize
    rows.append((901, None))  # null text -> 0 tokens, still grouped
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    seq_len, n_groups = 16, 4

    budget = {
        r["grp"]: r
        for r in pack_group_stats(docs, seq_len, n_groups).collect()
    }
    assigned = pack_sequences(docs, seq_len, n_groups=n_groups)
    # group of a doc = prefix of its seq_id ("<grp>:<bin>")
    per_grp = (
        assigned.withColumn(
            "grp", F.split(F.col("seq_id"), ":")[0].cast("int")
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("seq_id").alias("sequences"),
            F.sum(F.col("truncated").cast("long")).alias("oversize"),
        )
        .collect()
    )
    assert {r["grp"] for r in per_grp} == set(budget)
    assert sum(r["n_docs"] for r in per_grp) == len(rows)
    for r in per_grp:
        b = budget[r["grp"]]
        # identical group membership (counts + token mass)
        assert b["n_docs"] == r["n_docs"]
        assert b["total_tokens"] == r["total_tokens"]
        assert b["oversize_docs"] == r["oversize"]
        # the bound: BFD can never beat ceil(fitting/seq_len) + oversize
        assert r["sequences"] >= b["lb_sequences"], (r, dict(b.asDict()))
        # and BFD is near-optimal on small groups: within 2x of the bound
        assert r["sequences"] <= 2 * b["lb_sequences"]
