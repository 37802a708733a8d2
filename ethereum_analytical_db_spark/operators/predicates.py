"""Predicate builders mirroring reference utils.py (SURVEY §2.2).

These return Column expressions, so Catalyst pushes them into the
Parquet scan (PushedFilters) — the Spark-native version of the
reference's hand-built SQL WHERE strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def make_range_filter(field: str, *ranges: tuple) -> Column:
    """OR-chain of half-open ranges, reproducing reference
    utils.py:32-66 (make_range_query):

    (lo, hi)     → field >= lo AND field < hi
    (lo, None)   → field >= lo
    (None, hi)   → field < hi
    (None, None) → field IS NOT NULL
    """
    col = F.col(field)

    def one(rng: tuple) -> Column:
        lo, hi = rng
        if lo is not None and hi is not None:
            return (col >= F.lit(lo)) & (col < F.lit(hi))
        if lo is not None:
            return col >= F.lit(lo)
        if hi is not None:
            return col < F.lit(hi)
        return col.isNotNull()

    out = one(ranges[0])
    for rng in ranges[1:]:
        out = out | one(rng)
    return out


def in_list(field: str, values: list) -> Column:
    """Contract-whitelist IN filter (reference utils.py:105-107, SURVEY P3)."""
    return F.col(field).isin(values)


def top_level_call(id_field: str = "id") -> Column:
    """`id LIKE '%.0'` — first trace entry of a transaction
    (reference examples/sql_balances/balances.sql:23, SURVEY P7)."""
    return F.col(id_field).endswith(".0")


def valid_operation(error: str = "error", parent_error: str = "parent_error") -> Column:
    """`error IS NULL AND parent_error IS NULL` (SURVEY P8)."""
    return F.col(error).isNull() & F.col(parent_error).isNull()


def topic_equals(topics_field: str, index: int, signature: str) -> Column:
    """1-based array-element predicate `topics[i] = sig` (SURVEY P9).

    Uses 0-based null-safe ``F.get`` rather than ``element_at``: a log
    row with fewer topics yields NULL (predicate false) instead of an
    ANSI out-of-bounds error — one malformed event can't fail a 100-TB
    scan, matching ClickHouse's default-value behavior for topics[N].
    (``element_at(array(<non-foldable>), i)`` inside a Filter also trips
    a Janino codegen fault — "isNull_N is not an rvalue" — that silently
    drops the whole stage to interpreted mode; ``get`` compiles.)"""
    return F.get(F.col(topics_field), index - 1) == F.lit(signature)


def count_distinct_skewproof(df, keys, value_col: str, out_col: str):
    """Exact count(DISTINCT value) per key, skew-proof (SURVEY A4 at
    100 TB scale).

    A direct ``countDistinct`` keeps every distinct value of a hot key
    in one final-aggregation task. This two-phase form first dedups on
    (keys, value) — that shuffle is keyed by the PAIR, so a hot key's
    values spread across the cluster — then counts the survivors per
    key, where partial counting compresses map-side. Same exact result,
    bounded per-task state.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415 (local for Column ns)

    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
