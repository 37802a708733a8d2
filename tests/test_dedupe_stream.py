"""Streaming exact dedup: duplicates dropped across micro-batches, state
bounded by watermark in the continuous regime, streaming result equals
the batch operator on the same data."""

import datetime as dt

from pyspark.sql import Row

from ethereum_analytical_db_spark.streaming import dedupe_stream as ds
from ethereum_analytical_db_spark.streaming import stream as st

DOC_COLS = "doc_id long, text string, ts timestamp"


def _doc(i: int, text: str, minute: int) -> Row:
    return Row(
        doc_id=i, text=text, ts=dt.datetime(2024, 1, 1, 10, minute, 0)
    )


def _run_stream(spark, src_dir, name: str, **kwargs):
    schema = spark.createDataFrame([], DOC_COLS).schema
    out = ds.dedup_exact_stream(
        st.stream_from_files(spark, str(src_dir), schema), **kwargs
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    st.run_available_now(q)
    return spark.table(name)


def test_stream_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    # batch 1: two distinct docs; batch 2 (separate file): one repeat of
    # doc "aaa" plus one new doc — the repeat must not survive
    spark.createDataFrame(
        [_doc(1, "aaa", 0), _doc(2, "bbb", 1)], DOC_COLS
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [_doc(3, "aaa", 2), _doc(4, "ccc", 3)], DOC_COLS
    ).coalesce(1).write.mode("append").parquet(str(src))

    got = _run_stream(spark, src, "dedup_global")
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["aaa", "bbb", "ccc"]
    # the survivor of "aaa" is its first arrival
    assert got.filter("text = 'aaa'").first()["doc_id"] in (1, 3)


def test_stream_dedup_watermarked(spark, tmp_path):
    src = tmp_path / "docs_wm"
    src.mkdir()
    spark.createDataFrame(
        [_doc(1, "aaa", 0), _doc(2, "aaa", 1), _doc(3, "bbb", 5)], DOC_COLS
    ).coalesce(1).write.mode("append").parquet(str(src))

    got = _run_stream(
        spark, src, "dedup_wm", within_watermark="10 minutes"
    )
    # in-horizon duplicate dropped
    assert sorted(r["text"] for r in got.collect()) == ["aaa", "bbb"]


def test_stream_matches_batch_operator(spark, tmp_path):
    src = tmp_path / "docs_eq"
    src.mkdir()
    rows = [
        _doc(1, "xx", 0),
        _doc(2, "yy", 1),
        _doc(3, "xx", 2),
        _doc(4, "zz", 3),
        _doc(5, "yy", 4),
    ]
    spark.createDataFrame(rows, DOC_COLS).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    streamed = _run_stream(spark, src, "dedup_eq")
    batch = ds.dedup_exact_stream(spark.createDataFrame(rows, DOC_COLS))
    assert sorted(r["text"] for r in streamed.collect()) == sorted(
        r["text"] for r in batch.collect()
    )
