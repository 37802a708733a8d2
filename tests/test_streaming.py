"""Structured Streaming surfaces (SURVEY §2.9 T5/T8 Spark-native):
file-source micro-batches → Warehouse upsert via foreachBatch, per-batch
derived refresh, watermarked windowed aggregation, checkpointed resume."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.catalog import Warehouse
from ethereum_analytical_db_spark.functions import ethereum as eth
from ethereum_analytical_db_spark.plans import derived
from ethereum_analytical_db_spark.streaming import dedupe_stream as dd
from ethereum_analytical_db_spark.streaming import stream as st

EVENT_COLS = (
    "id string, type string, logIndex int, transactionLogIndex int, data string, "
    "transactionIndex int, address string, transactionHash string, blockHash string, "
    "blockNumber int, topics array<string>"
)


def _word(v: int) -> str:
    return format(v, "064x")


def _transfer(i: int, token: str, frm: int, to: int, amount: int) -> Row:
    return Row(
        id=f"0x{i}.0",
        type="mined",
        logIndex=0,
        transactionLogIndex=0,
        data="0x" + _word(amount),
        transactionIndex=0,
        address=token,
        transactionHash=f"0x{i}",
        blockHash="0xb",
        blockNumber=i,
        topics=[eth.TRANSFER_EVENT_TOPIC, "0x" + _word(frm), "0x" + _word(to)],
    )


def test_file_stream_ingest_with_derived_refresh(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create("event")
    wh.create("contract_description")
    wh.write(
        "contract_description",
        spark.createDataFrame([Row(id="0x01", decimals=18)]),
    )

    batch1 = spark.createDataFrame(
        [_transfer(1, "0x01", 0xA, 0xB, 5 * 10**18)], EVENT_COLS
    )
    batch1.write.mode("append").parquet(str(src))

    refreshes = []

    def refresh(w: Warehouse, batch_id: int) -> None:
        tt = derived.token_transactions(
            w.read("event"), w.read("contract_description")
        )
        tt.createOrReplaceTempView("token_transaction")
        refreshes.append(batch_id)

    schema = spark.createDataFrame([], EVENT_COLS).schema
    q = st.ingest_to_warehouse(
        st.stream_from_files(spark, str(src), schema),
        wh,
        "event",
        checkpoint_dir=str(tmp_path / "ckpt"),
        derived_refresh=refresh,
    )
    st.run_available_now(q)

    assert wh.read("event").count() == 1
    assert len(refreshes) >= 1
    tt = spark.table("token_transaction").collect()
    assert len(tt) == 1 and tt[0]["value"] == 5.0

    # second pass: only the NEW file is processed (checkpoint = block_flag
    # analogue); replayed event ids dedup through the warehouse upsert
    batch2 = spark.createDataFrame(
        [
            _transfer(1, "0x01", 0xA, 0xB, 5 * 10**18),  # duplicate id
            _transfer(2, "0x01", 0xB, 0xA, 2 * 10**18),
        ],
        EVENT_COLS,
    )
    batch2.write.mode("append").parquet(str(src))
    q2 = st.ingest_to_warehouse(
        st.stream_from_files(spark, str(src), schema),
        wh,
        "event",
        checkpoint_dir=str(tmp_path / "ckpt"),
        derived_refresh=refresh,
    )
    st.run_available_now(q2)
    assert wh.read("event").count() == 2  # FINAL dedup collapsed the replay
    tt2 = {r["id"]: r["value"] for r in spark.table("token_transaction").collect()}
    assert tt2 == {"0x1.0": 5.0, "0x2.0": 2.0}


def test_stream_dedup_derived_serving_end_to_end(spark, tmp_path):
    """The continuous pipeline, composed (VERDICT r3 item 8): file-source
    streaming ingest → watermarked streaming dedup → per-batch derived
    refresh → serving view read. Content duplicates carry DIFFERENT ids,
    so only the streaming dedup stage (not the warehouse upsert) can
    collapse them."""
    src = tmp_path / "incoming"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create("event")
    wh.create("contract_description")
    wh.write(
        "contract_description",
        spark.createDataFrame([Row(id="0x01", decimals=18)]),
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    cols = EVENT_COLS + ", ts timestamp"

    def with_ts(row: Row, s: int) -> Row:
        return Row(**row.asDict(), ts=t0 + dt.timedelta(seconds=s))

    a = _transfer(1, "0x01", 0xA, 0xB, 5 * 10**18)
    # same payload re-observed under a new event id (a re-org / refetch):
    # identical data+topics, different id — an upsert keeps both
    a_dup = Row(**{**a.asDict(), "id": "0x9.0", "transactionHash": "0x9"})
    b = _transfer(2, "0x01", 0xB, 0xA, 2 * 10**18)
    spark.createDataFrame(
        [with_ts(a, 0), with_ts(a_dup, 30), with_ts(b, 60)], cols
    ).write.mode("append").parquet(str(src))

    refreshes = []

    def refresh(w: Warehouse, batch_id: int) -> None:
        w.write(
            "token_transaction",
            derived.token_transactions(
                w.read("event"), w.read("contract_description")
            ),
        )
        refreshes.append(batch_id)

    schema = spark.createDataFrame([], cols).schema
    stream = st.stream_from_files(spark, str(src), schema)
    deduped = dd.dedup_exact_stream(
        stream, text_col="data", ts_col="ts", within_watermark="10 minutes"
    )
    q = st.ingest_to_warehouse(
        deduped,
        wh,
        "event",  # ts is not an event column; the upsert aligns it away
        checkpoint_dir=str(tmp_path / "ckpt"),
        derived_refresh=refresh,
    )
    st.run_available_now(q)

    # dedup collapsed the duplicated payload to ONE survivor (both
    # arrivals land in the same micro-batch, so which id survives is
    # arbitrary — first-arrival order is only defined across batches)
    ids = {r["id"] for r in wh.read("event").collect()}
    assert len(ids) == 2 and "0x2.0" in ids and ids & {"0x1.0", "0x9.0"}
    assert len(refreshes) >= 1

    # serving read path: the refreshed derived table through SQL views
    wh.register_views("event", "token_transaction")
    served = sorted(
        (r["id"], r["value"])
        for r in spark.sql(
            "SELECT id, value FROM token_transaction"
        ).collect()
    )
    assert [v for _, v in served] in ([2.0, 5.0], [5.0, 2.0])
    assert {i for i, _ in served} == ids


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(ts=t0 + dt.timedelta(seconds=s), user_id=u)
        for s, u in [(5, 1), (10, 2), (65, 1), (70, 1), (200, 3)]
    ]
    spark.createDataFrame(rows, "ts timestamp, user_id long").write.mode(
        "append"
    ).parquet(str(src))

    schema = spark.createDataFrame([], "ts timestamp, user_id long").schema
    stream = st.stream_from_files(spark, str(src), schema)
    counts = st.windowed_counts(stream, ts_col="ts", window="1 minute")

    out_dir = tmp_path / "out"
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    st.run_available_now(q)
    got = {
        r["window_start"].strftime("%H:%M:%S"): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == {"00:00:00": 2, "00:01:00": 2, "00:03:00": 1}


def _data_files(root) -> int:
    import os

    n = 0
    for _d, _s, files in os.walk(str(root)):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_ingest_compact_cadence_bounds_files_and_arms_fast_path(spark, tmp_path):
    """r10 VERDICT task 6: continuous ingest with ``compact_every=N``
    keeps the fact table's file count bounded (no growth with stream
    age) and re-arms the dedup-free FINAL fast path each cycle, so
    reads between a compaction and the next write skip the row_number
    window. Streams 3N batches across two checkpointed passes (the
    ``batch_id % N`` key makes the cadence restart-stable)."""
    N = 2
    src = tmp_path / "incoming"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create("event")
    wh_plain = Warehouse(spark, str(tmp_path / "wh_plain"))
    wh_plain.create("event")

    def _file(i: int):
        # every batch re-writes the SAME two keys -> versions accumulate
        spark.createDataFrame(
            [_transfer(1, "0x01", 0xA, 0xB, i), _transfer(2, "0x01", 0xB, 0xA, i)],
            EVENT_COLS,
        ).coalesce(1).write.mode("append").parquet(str(src))

    schema = spark.createDataFrame([], EVENT_COLS).schema

    def _drain(warehouse, ckpt, compact_every):
        q = st.ingest_to_warehouse(
            st.stream_from_files(
                spark, str(src), schema, max_files_per_trigger=1
            ),
            warehouse,
            "event",
            checkpoint_dir=str(tmp_path / ckpt),
            compact_every=compact_every,
        )
        st.run_available_now(q)

    for i in range(2 * N):  # batches 0..3; cadence fires at 1 and 3
        _file(i)
    _drain(wh, "ckpt", N)
    _drain(wh_plain, "ckpt_plain", None)

    # last batch id (2N-1) hit the cadence -> table fully compacted
    assert wh.is_dedup_free("event")
    plan = (
        wh.read("event", final=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    compacted_files = _data_files(tmp_path / "wh" / "event")
    assert compacted_files < _data_files(tmp_path / "wh_plain" / "event")

    # second pass from the same checkpoint: batches 2N..3N-1 continue the
    # batch_id numbering, so the cadence stays on its restart-stable key
    for i in range(2 * N, 3 * N):
        _file(i)
    _drain(wh, "ckpt", N)
    assert wh.is_dedup_free("event")
    # bounded: stream aged 50% more, file count did not grow
    assert _data_files(tmp_path / "wh" / "event") <= compacted_files

    # value correctness across compactions: latest version wins
    got = {r["id"]: r["data"] for r in wh.read("event", final=True).collect()}
    assert got == {
        "0x1.0": "0x" + _word(3 * N - 1),
        "0x2.0": "0x" + _word(3 * N - 1),
    }


def test_sync_pipeline_compact_cadence(spark, tmp_path):
    """SyncPipeline's pass-cadence twin: every N passes the named fact
    tables are compacted, so FINAL readers between passes hit the
    dedup-free fast path; the next pass's write invalidates it again."""
    from ethereum_analytical_db_spark.streaming import incremental as inc

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create("block_flag")
    n = [0]

    def stage(w):
        n[0] += 1
        w.write(
            "block_flag",
            spark.createDataFrame(
                [Row(id="1", name="traces_extracted", value=n[0])]
            ),
        )

    pipe = inc.SyncPipeline(
        wh, [("flags", stage)], compact_every=2, compact_tables=["block_flag"]
    )
    pipe.run_once()
    assert not wh.is_dedup_free("block_flag")  # pass 1: no compaction yet
    pipe.run_once()
    assert wh.is_dedup_free("block_flag")  # pass 2: compacted
    pipe.run_once()
    assert not wh.is_dedup_free("block_flag")  # pass 3's write invalidates
    pipe.run_once()
    assert wh.is_dedup_free("block_flag")
    assert wh.read("block_flag", final=True).first()["value"] == 4

    import pytest as _pytest

    with _pytest.raises(ValueError, match="compact_tables"):
        inc.SyncPipeline(wh, [], compact_every=2)
    # the mirror misconfiguration: tables without a cadence would
    # silently never compact (r11 advice) — loud instead
    with _pytest.raises(ValueError, match="compact_every"):
        inc.SyncPipeline(wh, [], compact_tables=["block_flag"])
