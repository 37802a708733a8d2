"""Per-stage cost breakdown of the clean_corpus chain (r11 VERDICT
task 4): which of the 9 stages drives `clean_corpus_e2e`'s per-decade
growth (1.21x -> 2.28x -> 5.0x) — measured, not argued.

Runs the chain with the registry query's exact parameters in STATS
mode, which materializes each stage from its predecessor's cache —
so `CleanCorpusReport.stage_secs` is an attribution of wall time to
stages (boundary-to-boundary: the LM trainer's eager aggregations land
in the perplexity stage that runs them). The stats-mode TOTAL is higher
than the lazy-mode bench query (each stage is fully counted and cached);
the breakdown is for attribution, the bench records the headline.

Calibration probes bracket the run (bench.py convention) so a loaded
box is visible in the record.

Usage: python tools/corpus_stage_breakdown.py [sf_dir ...]
Defaults: /tmp/sf10 /tmp/sf100. Prints one JSON line per dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def run_one(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ethereum_analytical_db_spark.operators import corpus

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    benchmark = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    t0 = time.perf_counter()
    report = corpus.clean_corpus(
        docs,
        benchmark=benchmark,
        langs=["en", "de", "fr", "es", "zh"],
        max_perplexity=1e9,
        strata_fractions={"en": 1.0, "de": 0.5},
        balance_default_fraction=0.9,
        collect_stats=True,
    )
    total = round(time.perf_counter() - t0, 3)
    out = {
        "sf_dir": sf_dir,
        "rows_in": report.stages[0][1],
        "total_stats_sec": total,
        "stages": [
            {"stage": name, "sec": sec, "rows": rows}
            for (name, sec), (_n, rows) in zip(report.stage_secs, report.stages)
        ],
        "loadavg": round(os.getloadavg()[0], 2),
    }
    report.release()
    return out


def main() -> int:
    dirs = sys.argv[1:] or ["/tmp/sf10", "/tmp/sf100"]
    import bench

    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(
        app_name="corpus_stage_breakdown",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe_start = bench._calibration_probe(spark)
    results = []
    for d in dirs:
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            print(f"# {d}: no documents.parquet, skipped", file=sys.stderr)
            continue
        r = run_one(spark, d)
        results.append(r)
        print(json.dumps(r))
    probe_end = bench._calibration_probe(spark)
    print(
        json.dumps(
            {
                "metric": "corpus_stage_breakdown",
                "factor_start": bench._probe_factor(probe_start),
                "factor_end": bench._probe_factor(probe_end),
                "results": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
