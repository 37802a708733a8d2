"""Interleaved A/B for lm_perplexity_quality (r10 VERDICT task 5).

The r10 driver run moved this query 1.12 -> 1.46 s raw (1.30x, the
round's largest common-query move) and lm code WAS touched that round —
commit aff86dd changed the registry build itself: the r9 form detached
the trained model per build (`train_bigram_lm(...).detach()` — a full
re-train + driver collect every sample), the r10 form keeps the cached
model tables (Spark's cache manager dedupes by canonicalized plan, so
repeat builds reuse them). The judge's hypothesis was "load, not code";
this pins it with the strongest local protocol:

- SAME session, STRICTLY INTERLEAVED samples (A B A B ...), so ambient
  drift prices both variants equally;
- A = the r9-era build (detach per build), B = the current registry
  build; each `.toPandas()`-drained like bench.py;
- median of 5 per variant, calibration probes before/after (bench.py's
  probe, so contamination is visible in the record).

If B (current) <= A (r9) the r10 move was load; a genuine code
regression would show B persistently above A here.

Usage: python tools/lm_ab.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ROUNDS = 5


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench

    from ethereum_analytical_db_spark.operators.lm import (
        score_perplexity_bigram,
        train_bigram_lm,
    )
    from ethereum_analytical_db_spark.plans.pipeline import docs_table
    from ethereum_analytical_db_spark.plans.registry import all_queries
    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(
        app_name="lm_ab",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def build_r9():
        # verbatim r9 form (pre-aff86dd): detach per build — re-train +
        # driver-local collect every sample, zero cache reuse
        docs = docs_table(spark, sf_dir).select("doc_id", "text")
        lm = train_bigram_lm(docs, vocab_size=5000, bigram_size=20000).detach()
        return (
            score_perplexity_bigram(docs, lm, exact_decimal_sum=True)
            .select("doc_id", "n_tokens", "avg_neg_logp")
            .orderBy("doc_id")
        )

    current = all_queries()["lm_perplexity_quality"]

    def build_r10():
        return current.build(spark, sf_dir)

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn().toPandas()
        return time.perf_counter() - t0

    # warm both paths (JIT, python workers, parquet footer cache)
    timed(build_r9)
    timed(build_r10)
    bench._calibration_probe(spark)
    probe_start = bench._calibration_probe(spark)
    a_times, b_times = [], []
    for _ in range(ROUNDS):
        a_times.append(round(timed(build_r9), 4))
        b_times.append(round(timed(build_r10), 4))
    probe_end = bench._calibration_probe(spark)
    med_a = statistics.median(a_times)
    med_b = statistics.median(b_times)
    out = {
        "metric": "lm_perplexity_ab",
        "sf_dir": sf_dir,
        "r9_detach_per_build": {"samples": a_times, "median": round(med_a, 4)},
        "r10_cached_model": {"samples": b_times, "median": round(med_b, 4)},
        "ratio_r10_over_r9": round(med_b / med_a, 3),
        "factor_start": bench._probe_factor(probe_start),
        "factor_end": bench._probe_factor(probe_end),
        "loadavg": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
