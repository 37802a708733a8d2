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


def _md5_prefix(col: Column, salt: str) -> Column:
    """The module's one bucketing primitive: 4-hex-char prefix of the
    salted md5. Shared by split_column and stratified_sample so the
    engine-parity contract (lowercase-hex lexicographic compare, see
    module docstring) lives in exactly one place."""
    return F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 4)


def split_column(
    id_col: Column | str,
    fractions: dict[str, float],
    salt: str = "split",
) -> Column:
    """CASE expression assigning each id a split name by salted-md5
    bucket. ``fractions`` values must sum to 1; the last split takes the
    remainder exactly."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = _md5_prefix(col, salt)
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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-balancing
    step (e.g. keep 100% of books, 10% of common-crawl, 1% of logs).

    A row is kept iff its salted-md5 prefix falls under its stratum's
    fraction. Unlike ``df.sampleBy`` (seeded Bernoulli whose outcome
    depends on partition layout and row order), the same inputs select
    the same rows on any cluster — rerunnable, resumable, and exactly
    reproducible by a DuckDB oracle (tests/test_sampling.py).

    Strata absent from ``fractions`` keep ``default_fraction`` of their
    rows (0.0 = drop unknown strata; 1.0 = pass them through).

    Rows with a NULL ``id_col`` are always dropped — a deterministic
    sample needs an identity to hash, and quietly keeping them in some
    branches (the NULL hash compares as NULL → filtered) but not others
    would make the kept fraction discontinuous in the configured rate.

    Scale: one narrow filter — the strata→threshold CASE is a literal
    expression, no shuffle, no collected state. Expected kept fraction
    per stratum is exact to 1/65536 granularity.
    """
    return df.filter(keep_column(strata_col, fractions, id_col, salt, default_fraction))


def keep_column(
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> Column:
    """:func:`stratified_sample`'s per-row keep decision as a boolean
    Column (never NULL; NULL ids are False, see above) — for plans that
    want the flag WITHOUT dropping rows (e.g. `dataset_split`'s `kept`
    column). Exposing the predicate keeps such plans shuffle-free: the
    alternative — filter, then join the survivors back on id — shuffles
    the full table twice for a decision that is a literal CASE (review
    find)."""
    col = F.col(id_col)
    prefix = _md5_prefix(col, salt)

    def keep_of(frac: float) -> Column:
        if frac >= 1.0:
            return F.lit(True)
        if frac <= 0.0:
            return F.lit(False)
        return prefix < F.lit(_hex4(frac))

    keep_expr = _strata_case(strata_col, fractions, keep_of, default_fraction)
    # false AND null = false, so NULL ids come out False, not NULL
    return col.isNotNull() & keep_expr


def _strata_case(
    strata_col: str,
    mapping: dict[str, float],
    value_of,
    default_value: float,
) -> Column:
    """One CASE over the strata dict: ``value_of(mapping[stratum])`` per
    listed stratum, ``value_of(default_value)`` otherwise — the fold
    keep_column and mixture_copies_column share (review find: it was
    hand-rolled in both; a semantics fix must land once, not twice)."""
    expr = None
    for name, v in mapping.items():
        cond = F.col(strata_col) == F.lit(name)
        expr = F.when(cond, value_of(v)) if expr is None else expr.when(cond, value_of(v))
    return expr.otherwise(value_of(default_value)) if expr is not None else value_of(default_value)


def mixture_copies_column(
    strata_col: str,
    weights: dict[str, float],
    id_col: str,
    salt: str = "mixture",
    default_weight: float = 0.0,
) -> Column:
    """Per-row copy count for deterministic mixture resampling: a
    stratum with weight ``w`` replicates each row ``floor(w)`` times
    plus one more iff the salted-md5 prefix falls under ``frac(w)`` —
    the replication generalization of :func:`keep_column` (``w <= 1``
    reduces to Bernoulli keep with probability w). NULL ids get 0
    copies (same deterministic-identity rule as stratified_sample)."""
    import math

    col = F.col(id_col)
    prefix = _md5_prefix(col, salt)

    def _copies(w: float) -> Column:
        if w < 0:
            raise ValueError(f"mixture weight {w} < 0")
        base = int(math.floor(w))
        frac = w - base
        if frac <= 0:
            return F.lit(base)
        return F.lit(base) + F.when(prefix < F.lit(_hex4(frac)), 1).otherwise(0)

    out = _strata_case(strata_col, weights, _copies, default_weight)
    return F.when(col.isNotNull(), out).otherwise(F.lit(0))


def mixture_resample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    id_col: str,
    salt: str = "mixture",
    default_weight: float = 0.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic data-mixture resampling — the domain-weighting step
    of a pretraining pipeline (temperature-style upsampling of scarce
    domains, downsampling of dominant ones, e.g. books 2.5x,
    common-crawl 0.3x). Each row appears ``mixture_copies_column`` times
    with ``copy_col`` = 0..copies-1 so downstream shuffling/packing can
    tell replicas apart.

    Unlike seeded ``sample``/``sampleBy`` replication, the outcome is a
    pure function of (id, salt) — identical on any cluster, any
    partitioning, any engine (exactly reproducible by a DuckDB oracle),
    and re-salting draws an independent mixture.

    Scale: one narrow projection + explode — no shuffle, no state;
    output rows = Σ_s w_s·n_s exactly (to md5 granularity, 1/65536 per
    stratum). Skew note: explode replicates WITHIN the source
    partition, so a wildly-upweighted small stratum concentrated in few
    files can leave fat partitions — follow with the writer's
    range/hash partitioning (or AQE rebalance) when w >> 10, the same
    advice as any generator expression."""
    # withColumn REPLACES an existing column of the same name — silently
    # destroying caller data (review find); refuse the collision instead
    taken = set(df.columns) & {copy_col, "_copies"}
    if taken:
        raise ValueError(
            f"mixture_resample would overwrite input column(s) {sorted(taken)}; "
            "rename them or pass a different copy_col"
        )
    copies = mixture_copies_column(strata_col, weights, id_col, salt, default_weight)
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)))
        .drop("_copies")
    )
