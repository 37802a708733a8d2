"""Join helpers.

ClickHouse ``ANY [LEFT|INNER] JOIN`` keeps at most one right-side match
per left row (SURVEY §2.3 preamble). Spark has no direct equivalent, so
``any_join`` dedups the right side on the join keys first. The reference's
"first found" pick is nondeterministic; ours is deterministic (lowest
order_by value, or a stable row digest) — documented deviation, SURVEY
§7.3 risk (b).

Scale notes: the right-side dedup is a shuffle on the join keys — the
same shuffle the join itself needs, so Catalyst/AQE reuses the exchange;
when the deduped right side is small (dims, watermark tables) pass
``broadcast=True`` to skip the left-side shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dedup_right(right: DataFrame, keys: list[str], order_by: list | None) -> DataFrame:
    # Fast path (order_by is None or plain column names): pick the winner
    # with min(struct(order_cols…, remaining_cols…)). Struct min compiles
    # to SortAggregate, but WITH map-side partial combine — the input
    # collapses to one row per key BEFORE the shuffle (the window form
    # shuffles every duplicate row, then sorts). Struct comparison is
    # field-by-field with nulls-first, matching the window's default asc
    # ordering; ties on order_by break deterministically by the remaining
    # columns (the window pick on full-row ties is arbitrary anyway —
    # SURVEY §7.3 risk (b)).
    if order_by is None or all(isinstance(c, str) for c in order_by):
        other = [c for c in right.columns if c not in keys]
        if not other:
            return right.dropDuplicates(keys)
        lead = [c for c in (order_by or []) if c not in keys]
        rest = [c for c in other if c not in lead]
        packed = right.groupBy(*keys).agg(
            F.min(F.struct(*[F.col(c) for c in lead + rest])).alias("__s")
        )
        expanded = packed.select(
            *keys, *[F.col(f"__s.{c}").alias(c) for c in lead + rest]
        )
        return expanded.select(*right.columns)
    # expression orderings (e.g. desc(), casts) keep the window form
    order = [F.col(c).asc() if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def any_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | str,
    how: str = "left",
    order_by: list | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """ClickHouse-style ANY JOIN: at most one right match per left row.

    ``order_by``: columns (or Column expressions) that define which right
    row wins; defaults to a stable digest of the non-key columns.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    deduped = _dedup_right(right, keys, order_by)
    if broadcast:
        deduped = F.broadcast(deduped)
    return left.join(deduped, on=keys, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """`x IN (subquery)` (SURVEY J12)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """`x NOT IN (subquery)` / unprocessed-row discovery (SURVEY J1/J4/J13/P5)."""
    return left.join(right, on=on, how="left_anti")
