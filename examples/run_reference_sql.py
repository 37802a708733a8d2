"""Run reference-shipped ClickHouse SQL verbatim against a warehouse.

The switch path for a reference user: point this at the SQL text you run
today (examples/sql_balances/*.sql, a Grafana panel's query, the gas
notebook's cell) and a warehouse directory — the compat layer translates
the dialect, registers every table under its reference physical name
(eth_block, eth_internal_transaction, …), and executes on Spark. An
``INTO OUTFILE`` clause in the file writes the CSV exactly like
clickhouse-client did.

    python examples/run_reference_sql.py --warehouse /path/wh query.sql
    python examples/run_reference_sql.py --warehouse /path/wh panel.sql \
        --from-ts "2020-01-01 00:00:00" --to-ts "2020-02-01 00:00:00" \
        --interval 3600

Grafana's $timeFilter / $timeSeries / $table / $dateCol macros are
substituted from the --from-ts/--to-ts/--interval flags
(compat.grafana_macros).
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as `python examples/run_reference_sql.py` without an
# installed package: the repo root is one level up from this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("sql_file", help="file containing one ClickHouse-dialect query")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--from-ts", default="1970-01-01 00:00:01")
    p.add_argument("--to-ts", default="2100-01-01 00:00:00")
    p.add_argument("--interval", type=int, default=3600)
    p.add_argument("--show", type=int, default=20, help="rows to print")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from ethereum_analytical_db_spark.catalog import Warehouse
    from ethereum_analytical_db_spark.compat import ClickHouseCompat, grafana_macros
    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(app_name="reference-sql", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    compat = ClickHouseCompat(spark)
    compat.register_warehouse(Warehouse(spark, args.warehouse))
    with open(args.sql_file) as fh:
        text = fh.read()
    df = compat.sql(
        text, macros=grafana_macros(args.from_ts, args.to_ts, args.interval)
    )
    df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
