"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship balances pyramid at sf0.001;
``queries()`` exposes every implemented operator from SURVEY §2 (plus the
training-data pipeline pack); ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for each (omitted only for xxhash64-based approximate operators,
which get rows-only checks and are recall-tested in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ethereum_analytical_db_spark.plans.registry import all_queries
from ethereum_analytical_db_spark.session import tune_session

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    qs = all_queries()
    return qs["balances_pyramid"].build(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2."""

    def wrap(qdef):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return qdef.build(spark, sf_dir)

        run.__doc__ = qdef.note
        return run

    return {name: wrap(qdef) for name, qdef in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column aliases)."""
    return {
        name: qdef.oracle
        for name, qdef in all_queries().items()
        if qdef.oracle is not None
    }
