"""Local oracle-parity harness, mimicking the driver's correctness gate:
run each queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet tables, compare row count, schema shape, and values
(column-name-sorted, row-sorted, exact).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
Exit code != 0 on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from ethereum_analytical_db_spark.plans.registry import TABLE_NAMES
from ethereum_analytical_db_spark.session import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # normalize missing markers first: Spark's toPandas yields
            # None, DuckDB's fetchdf yields NaN — both must stringify
            # identically or every nullable non-numeric column "differs"
            df[c] = df[c].where(pd.notna(df[c]), None).astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"row count {len(spark_pd)} vs {len(duck_pd)}")
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        problems.append(
            f"columns {sorted(spark_pd.columns)} vs {sorted(duck_pd.columns)}"
        )
        return problems
    a, b = canon(spark_pd), canon(duck_pd)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
                eq = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
                if not eq.all():
                    idx = int(np.argmin(eq))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} diffs, first at row {idx}: "
                        f"{av[idx]!r} vs {bv[idx]!r} (delta {av[idx]-bv[idx]!r})"
                    )
            else:
                eq = pd.Series(av).astype(str).values == pd.Series(bv).astype(str).values
                if not eq.all():
                    idx = int(np.argmin(eq))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} diffs, first at row {idx}: "
                        f"{av[idx]!r} vs {bv[idx]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(
        app_name="oracle-check",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pd)} rows (no oracle)")
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pd, duck_pd)
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(spark_pd)} rows")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
