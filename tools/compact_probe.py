"""Measure what Warehouse.compact() buys a FINAL reader — the empirical
datapoint behind SCALE.md's FINAL-dedup mitigation chain (VERDICT r5
item 5).

The FINAL (last-write-wins) read is the one genuinely expensive default
at 100 TB: every read pays a row_number window over ALL retained
versions. The mitigation is ClickHouse's background merge made explicit:
``Warehouse.compact(table)`` rewrites the table to one row per key, so
the next FINAL read windows over 1/V of the rows (V = versions/key).

Protocol: load the scaled events corpus, upsert it V times into an
``internal_transaction`` warehouse table (V versions per id, bumped
_seq, block-range partitioned like production), then time the same
FINAL aggregate before and after compact(). Timings are median-of-N
end-to-end materializations (count + max so the dedup window can't be
pruned away).

Usage: python tools/compact_probe.py [sf_dir] [versions] [runs]
Defaults: /tmp/sf1 3 5. Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ethereum_analytical_db_spark.catalog import Warehouse
from ethereum_analytical_db_spark.session import get_spark

ROOT = "/tmp/compact_probe_wh"


def _timed_final_read(wh: Warehouse, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df = wh.read("internal_transaction", final=True)
        df.agg(
            F.count("*").alias("n"), F.max("blockNumber").alias("mx")
        ).collect()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    versions = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark(app_name="compact_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)
    wh = Warehouse(spark, ROOT)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # events → internal_transaction shape: string id, a real block-number
    # column so the write exercises the production block-range layout
    facts = ev.select(
        F.col("event_id").cast("string").alias("id"),
        (F.col("event_id") % 1_000_000).alias("blockNumber"),
        F.col("user_id").cast("string").alias("from"),
        F.col("event_type").alias("type"),
        F.col("value").cast("string").alias("value"),
    )
    for _ in range(versions):
        wh.write("internal_transaction", facts, block_partition="blockNumber")

    n_rows = spark.read.parquet(wh._path("internal_transaction")).count()
    before = _timed_final_read(wh, runs)

    t0 = time.perf_counter()
    wh.compact("internal_transaction")
    compact_sec = time.perf_counter() - t0

    n_after = spark.read.parquet(wh._path("internal_transaction")).count()
    after = _timed_final_read(wh, runs)

    print(json.dumps({
        "metric": "final_read_sec",
        "sf_dir": sf_dir,
        "versions": versions,
        "rows_before_compact": n_rows,
        "rows_after_compact": n_after,
        "final_read_before_sec": round(before, 4),
        "final_read_after_sec": round(after, 4),
        "speedup": round(before / after, 2) if after else None,
        "compact_cost_sec": round(compact_sec, 4),
        "runs": runs,
        "stat": "median",
    }))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
