"""Stateful sessionization via applyInPandasWithState: state carries
across micro-batches; sessions close on gap or processing-time timeout."""

import datetime as dt

from pyspark.sql import Row

from ethereum_analytical_db_spark.streaming import stateful, stream as st

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
DDL = "ts timestamp, user_id long, value double"


def _ev(user, sec, val=1.0):
    return Row(ts=T0 + dt.timedelta(seconds=sec), user_id=user, value=val)


def test_sessionize_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    # file 1: user 1 session A (0s, 60s); user 2 starts (0s)
    spark.createDataFrame([_ev(1, 0), _ev(1, 60), _ev(2, 0)], DDL).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    # file 2: user 1 jumps past the 300s gap → closes session A; user 2
    # continues within the gap (state carried across micro-batches)
    spark.createDataFrame([_ev(1, 1000), _ev(2, 120, 2.5)], DDL).coalesce(
        1
    ).write.mode("append").parquet(str(src))

    schema = spark.createDataFrame([], DDL).schema
    events = st.stream_from_files(spark, str(src), schema, max_files_per_trigger=1)
    sessions = stateful.sessionize(events, gap_seconds=300, timeout_ms=3000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # 3 sessions total: user1 gap-closed (2 events), then both remaining
    # open sessions flushed by the processing-time timeout
    ok = st.poll_until(
        q, lambda: spark.sql("SELECT * FROM sessions").count() >= 3, timeout_s=120
    )
    assert ok, "expected 3 sessions before deadline"
    rows = {
        (r["user_id"], r["n_events"], r["total_value"], r["session_start"].minute)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert rows == {
        (1, 2, 2.0, 0),   # user 1 session A: 0s+60s, gap-closed
        (1, 1, 1.0, 16),  # user 1 session B: 1000s, timeout-flushed
        (2, 2, 3.5, 0),   # user 2: merged across micro-batches
    }


def test_sessionize_batch_hand_vectors(spark):
    rows = [
        _ev(1, 0), _ev(1, 100), _ev(1, 500),      # gaps 100, 400 → split at 400>300
        _ev(2, 0), _ev(2, 1000),                   # two sessions
        _ev(3, 50),                                # singleton
    ]
    df = spark.createDataFrame(rows)
    out = stateful.sessionize_batch(df, gap_seconds=300)
    got = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in out.collect()
    }
    t = lambda sec: T0 + dt.timedelta(seconds=sec)  # noqa: E731
    assert got == {
        (1, t(0), 2),
        (1, t(500), 1),
        (2, t(0), 1),
        (2, t(1000), 1),
        (3, t(50), 1),
    }
