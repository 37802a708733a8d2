"""Driver-facing query registry.

Each QueryDef pairs a Spark DataFrame builder (spark, sf_dir) → DataFrame
with the equivalent ANSI SQL a DuckDB oracle runs on the same parquet
tables. Column names/aliases must match exactly — the driver sorts
columns by name before hashing values.

Determinism rules used throughout (so value-hashes match DuckDB):
- double SUM/AVG go through DECIMAL(38,6) (exact, order-independent),
  cast to DOUBLE only at the end;
- top-k orderings always carry a unique tie-break key;
- timestamps stay timestamps (date_trunc), session TZ is UTC.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    note: str = ""      # SURVEY §2 operator ids exercised
    # one-time per-process fixture build (frozen warehouse / serve
    # index) the query's serve path reads. The bench harness calls it
    # OUTSIDE the timed band so the first sample measures the serve
    # side, not the setup (r12 VERDICT task 2: reorg_canonical's band
    # was absorbing the fork-warehouse build). Queries without a frozen
    # fixture leave it None; correctness harnesses may ignore it (the
    # build is idempotent and lazily triggered by build() regardless).
    prewarm: Callable[[SparkSession, str], object] | None = None


TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# (session app id, absolute parquet path) → constructed DataFrame.
# ``spark.read.parquet`` lists the directory and reads parquet footers
# on the DRIVER every call, and the registry builds each query fresh per
# bench sample — ~40-120 ms of repeated driver work per table reference
# (the r15 `build_regressed` creep was exactly this class of cost).
# DataFrames are immutable plans, so handing the same object back is
# side-effect-free; keying on the application id drops entries when a
# test spins up a fresh session. The driver test data is read-only for
# the life of a process — a caller that rewrites a parquet dir in place
# mid-session should not route it through this registry helper.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    app_id = spark.sparkContext.applicationId
    key = (app_id, os.path.abspath(f"{sf_dir}/{name}.parquet"))
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    # evict entries from other applications: their plans are bound to
    # stopped sessions and would otherwise accumulate for the life of
    # the process across test sessions (r16 advice)
    stale = [k for k in _TABLE_CACHE if k[0] != app_id]
    for k in stale:
        del _TABLE_CACHE[k]
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses to
        # map to its microsecond TimestampType; read nanos as long and
        # convert (truncation matches pandas/duckdb ns→us behavior).
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: (ts / 1000) in double loses ULPs on big
            # nanosecond values and rounds a microsecond off vs DuckDB
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # micros-with-no-timezone parquet arrives as TIMESTAMP_NTZ,
            # which Spark 4 refuses to cast to long (breaking epoch
            # arithmetic downstream); under the UTC session zone the
            # wall-clock values are identical, so normalize to the
            # session-zoned TimestampType every consumer was written for
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _TABLE_CACHE[key] = df
    return df


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, note: str = "", prewarm=None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryDef(
            name=name, build=fn, oracle=oracle, note=note, prewarm=prewarm
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # import registering modules lazily to avoid cycles
    from . import analytics, chainops, compat_queries, derived_queries, ml_queries, pipeline, relational  # noqa: F401

    # Oracle-checked queries first (stable within each tier): the driver's
    # correctness harness records the first 50 registry entries, so the
    # hash-checked queries must all land inside that window. The rows-only
    # approximate operators (xxhash64-based — no portable SQL oracle) sort
    # last; their correctness evidence is the recall suite in tests/, and
    # they still run in bench.py. Guarded by
    # tests/test_entry.py::test_oracle_queries_fit_correctness_window.
    return dict(
        sorted(_REGISTRY.items(), key=lambda kv: kv[1].oracle is None)
    )
