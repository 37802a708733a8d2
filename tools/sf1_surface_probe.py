"""sf1 measurement of the two driver-side surfaces (r14 VERDICT task
5): the S2 cursor (`catalog.paginate`, the primitive behind
`Warehouse.iterate`) and the Flask serving layer.

- Cursor: page a 1M-row table through the driver at per=10_000 and
  sample VmRSS as pages stream — the pin is CONSTANT driver residency
  (bounded by max(page, one partition), never the table).
- Serving: build sf1-scale `internal_transaction` / `token_transaction`
  views (1M rows, 50k addresses — synthesized deterministically from
  the sf1 events fixture; the API is schema-shaped, not
  content-shaped), then measure POST /balances/ (3-address filter and
  the full 50k-address universe) and POST /token_balances/<token>
  through Flask's test client — the same request path a real client
  hits minus the TCP hop.

Appends one JSON line per surface to SCALE_NEWOPS_DETAIL.jsonl.
Usage: python tools/sf1_surface_probe.py [sf_dir=/tmp/sf1]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ethereum_analytical_db_spark.catalog import paginate  # noqa: E402
from ethereum_analytical_db_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def vm_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return round(int(ln.split()[1]) / 1024, 1)
    return -1.0


def emit(row: dict) -> None:
    print(json.dumps(row), flush=True)
    with open(os.path.join(HERE, "SCALE_NEWOPS_DETAIL.jsonl"), "a") as f:
        f.write(json.dumps(row, separators=(",", ":")) + "\n")


def cursor_probe(spark, sf_dir: str) -> None:
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = df.count()
    la0 = round(os.getloadavg()[0], 2)
    rss = [vm_rss_mb()]
    t0 = time.time()
    pages = 0
    rows = 0
    for page in paginate(df, per=10_000):
        pages += 1
        rows += len(page)
        if pages % 20 == 0:
            rss.append(vm_rss_mb())
    el = round(time.time() - t0, 3)
    rss.append(vm_rss_mb())
    assert rows == n, (rows, n)
    emit(
        {
            "op": "cursor_paginate",
            "sf_dir": sf_dir,
            "median_sec": el,
            "samples": [el],
            "loadavg_brackets": [[la0, round(os.getloadavg()[0], 2)]],
            "rows": rows,
            "pages": pages,
            "per": 10_000,
            "rows_per_sec": round(rows / el),
            "driver_rss_mb": {
                "start": rss[0],
                "median": statistics.median(rss),
                "max": max(rss),
            },
        }
    )


def serving_probe(spark, sf_dir: str) -> None:
    from ethereum_analytical_db_spark.serving import api

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    addr = lambda c: F.concat(F.lit("0x"), (c % 50_000).cast("string"))  # noqa: E731
    itx = ev.select(
        F.concat(F.lit("0xT"), F.col("event_id").cast("string"), F.lit(".0")).alias("id"),
        (F.col("event_id") / 100).cast("long").alias("blockNumber"),
        addr(F.col("user_id")).alias("from"),
        addr(F.col("user_id") * 7 + 1).alias("to"),
        F.abs(F.col("value")).alias("value"),
        F.lit(21000).cast("long").alias("gasUsed"),
        F.lit(1e-9).alias("gasPrice"),
        F.lit("call").alias("type"),
        F.lit(None).cast("string").alias("rewardType"),
        F.lit(None).cast("string").alias("author"),
        F.when(F.col("event_id") % 97 == 0, "Reverted")
        .otherwise(F.lit(None))
        .alias("error"),
        F.lit(False).alias("parent_error"),
    )
    itx.createOrReplaceTempView("internal_transaction")
    ev.select(
        F.concat(F.lit("0xE"), F.col("event_id").cast("string"), F.lit(".0")).alias("id"),
        F.concat(F.lit("0xtok"), (F.col("event_id") % 100).cast("string")).alias("token"),
        addr(F.col("user_id")).alias("from"),
        addr(F.col("user_id") * 7 + 1).alias("to"),
        F.abs(F.col("value")).alias("value"),
    ).createOrReplaceTempView("token_transaction")

    app = api.create_app(spark)
    client = app.test_client()
    la0 = round(os.getloadavg()[0], 2)

    def timed_post(path: str, payload, k: int) -> tuple[float, int]:
        vals = []
        size = 0
        for _ in range(k):
            t0 = time.time()
            resp = client.post(path, json=payload)
            vals.append(time.time() - t0)
            assert resp.status_code == 200, resp.status_code
            size = len(resp.get_json())
        return round(statistics.median(vals), 3), size

    filt_sec, filt_n = timed_post(
        "/balances/", {"addresses": ["0x17", "0x4242", "0x31337"]}, 5
    )
    tok_sec, tok_n = timed_post("/token_balances/0xtok7", None, 3)
    t0 = time.time()
    resp = client.post("/balances/", json={"addresses": None})
    full_sec = round(time.time() - t0, 3)
    full_n = len(resp.get_json())
    emit(
        {
            "op": "serving_api",
            "sf_dir": sf_dir,
            "median_sec": filt_sec,
            "samples": [filt_sec],
            "loadavg_brackets": [[la0, round(os.getloadavg()[0], 2)]],
            "itx_rows": ev.count(),
            "balances_3addr_sec": filt_sec,
            "balances_3addr_rows": filt_n,
            "token_balances_sec": tok_sec,
            "token_balances_rows": tok_n,
            "balances_full_universe_sec": full_sec,
            "balances_full_universe_rows": full_n,
        }
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="sf1_surface_probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cursor_probe(spark, sf_dir)
    serving_probe(spark, sf_dir)


if __name__ == "__main__":
    main()
