"""Deterministic sampling / dataset-split operators (training-data
pipeline pack — every large-scale corpus pipeline ends with a stable
train/valid/test assignment).

Design: bucket on a salted md5 of the id. md5 is available and
bit-identical in every engine (so the DuckDB oracle reproduces the
assignment exactly), uniform (so fractions hold at scale), and salted
(so re-splitting with a new salt is independent of the old split).
Lexicographic comparison of the lowercase hex prefix equals numeric
comparison — no hex→int parsing, which keeps the expression portable.

Scale: one narrow projection — no shuffle, no state; the split column
can be a parquet partition key for downstream split-local reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 16**4  # 4-hex-char prefix space


def _hex4(fraction: float) -> str:
    """Upper bound (exclusive) of a fraction of the 4-hex-char space."""
    return format(min(int(fraction * _BUCKETS), _BUCKETS - 1), "04x")


def split_column(
    id_col: Column | str,
    fractions: dict[str, float],
    salt: str = "split",
) -> Column:
    """CASE expression assigning each id a split name by salted-md5
    bucket. ``fractions`` values must sum to 1; the last split takes the
    remainder exactly."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 4)
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = prefix < F.lit(_hex4(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])).alias(
        "split"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """df + a deterministic ``split`` column (default 90/5/5)."""
    fractions = fractions or {"train": 0.90, "valid": 0.05, "test": 0.05}
    return df.withColumn("split", split_column(id_col, fractions, salt))
