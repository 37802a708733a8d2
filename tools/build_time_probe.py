"""Per-query DRIVER BUILD time: how long `qdef.build(spark, sf_dir)`
takes BEFORE any action runs — pure py4j Column-construction + analysis
cost. bench.py times build+execute together, so a query whose logical
plan is assembled through hundreds of py4j round trips (wide lane
aggregations, long CASE chains) pays that latency in every bench
sample AND in every real interactive use. Found while trimming the md5
SimHash face (r14): 32 Column-API lanes cost ~1.3 s per build; the
same expressions as SQL strings parse JVM-side in ~50 ms.

Usage: python tools/build_time_probe.py [sf_dir] [top_n]
Prints one line per query, slowest build first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ethereum_analytical_db_spark.plans.registry import all_queries
from ethereum_analytical_db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    spark = get_spark(app_name="build_time_probe", cpus=8)
    qs = all_queries()
    out = []
    for name, qdef in qs.items():
        try:
            qdef.build(spark, sf_dir)  # warm (table registration, JIT)
            t0 = time.perf_counter()
            qdef.build(spark, sf_dir)
            out.append((time.perf_counter() - t0, name))
        except Exception as e:  # noqa: BLE001 - report, keep probing
            print(f"ERR   {name}: {type(e).__name__}: {e}", file=sys.stderr)
    out.sort(reverse=True)
    total = sum(t for t, _ in out)
    print(f"total build time across {len(out)} queries: {total:.2f}s")
    for t, name in out[:top_n]:
        print(f"{t:7.3f}s  {name}")


if __name__ == "__main__":
    main()
