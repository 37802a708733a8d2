"""Golden conformance vectors ported from the reference's pure-function
tests onto the registered relational queries (SURVEY §5 pattern 6)."""

import datetime as dt

from ethereum_analytical_db_spark.plans.registry import all_queries


def test_moving_average_warmup_reference_golden(spark, tmp_path):
    """Reference tests/token_prices_tests.py:39-60 (_set_moving_average,
    window_size=5): closes [2,3,4,5,4,200,5] → the first window_size-1
    positions keep their raw value, then the trailing-5 mean. Replayed
    through the registered W1 query over a one-event-per-day corpus."""
    closes = [2, 3, 4, 5, 4, 200, 5]
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "close", float(c), "{}")
        for i, c in enumerate(closes)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = (
        all_queries()["moving_average_warmup"]
        .build(spark, str(tmp_path))
        .orderBy("day")
        .collect()
    )
    got = [r["moving_average"] for r in out]
    want = [
        2.0,
        3.0,
        4.0,
        5.0,
        (2 + 3 + 4 + 5 + 4) / 5,
        (3 + 4 + 5 + 4 + 200) / 5,
        (4 + 5 + 4 + 200 + 5) / 5,
    ]
    assert got == want
    assert [r["daily"] for r in out] == [float(c) for c in closes]
