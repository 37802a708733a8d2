"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.9 — capability the reference's
batch loop cannot express; prompt north-star: custom stateful operators
for training-data/event pipelines).

Semantics: events grouped by key; a session closes when no event
arrives within ``gap_seconds`` of the previous one (event-time, per
batch arrival order) or when the state times out. Emits one row per
closed session: (user_id, session_start, session_end, n_events,
total_value).

Scale: state is partitioned by the grouping key across executors; each
micro-batch touches only keys present in the batch plus timed-out keys.
State size is O(active keys), bounded by the processing-time timeout.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize(
    events: DataFrame,
    gap_seconds: int = 300,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Group a (streaming) events DataFrame into gap-separated sessions.

    Works on both streaming and batch inputs (batch closes everything at
    the end of the group — useful for tests and backfills).
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield _emit(user, start, last, n, total)
            return

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        closed: list[tuple] = []
        # concatenate BEFORE sorting: a key whose batch exceeds one Arrow
        # record batch arrives as several chunks with no global ts order,
        # and per-chunk sorting would close sessions at phantom gaps and
        # drag `last` backwards across chunk boundaries
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(ts_col)
            for ts, val in zip(batch[ts_col], batch[value_col]):
                t = int(pd.Timestamp(ts).value // 1_000_000)  # epoch ms
                if last is not None and t - last > gap_seconds * 1000:
                    closed.append((start, last, n, total))
                    start, n, total = t, 0, 0.0
                if start is None:
                    start = t
                last = t
                n += 1
                total += float(val) if val == val else 0.0  # NaN-safe

        state.update((start, last, n, total))
        state.setTimeoutDuration(timeout_ms)
        for s in closed:
            yield _emit(user, *s)

    def _emit(user, start, last, n, total) -> pd.DataFrame:
        # tz-AWARE UTC instants: a naive datetime would be re-localized
        # in the Spark session timezone on the Arrow boundary, shifting
        # sessions by the tz offset on any non-UTC deployment and
        # breaking the advertised batch/streaming equivalence
        return pd.DataFrame(
            {
                "user_id": [user],
                "session_start": [
                    dt.datetime.fromtimestamp(start / 1000, tz=dt.timezone.utc)
                ],
                "session_end": [
                    dt.datetime.fromtimestamp(last / 1000, tz=dt.timezone.utc)
                ],
                "n_events": [n],
                "total_value": [total],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 300,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str | None = None,
):
    """Batch form of gap sessionization, window-function shape: a new
    session starts where the gap to the previous event (per key, event
    time) exceeds ``gap_seconds``; session number is the running count
    of session starts. Same semantics as the streaming ``sessionize``
    at batch boundaries, fully SQL-expressible (lag + cumulative sum —
    both absent from the reference, SURVEY §2.5 "no lead/lag").

    Scale: both windows partition by the session key — one shuffle,
    reused by the final aggregation; per-key state is the window frame,
    spill-safe.
    """
    from pyspark.sql import Window, functions as F

    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev.isNull()
        | (F.col(ts_col).cast("long") - prev.cast("long") > F.lit(gap_seconds))
    )
    sess = F.sum(is_new.cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn("__sess", sess)
        .groupBy(F.col(key_col), F.col("__sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(key_col, "session_start", "session_end", "n_events", "total_value")
    )
