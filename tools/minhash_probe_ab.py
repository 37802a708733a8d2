"""Same-box, same-session A/B: incremental dedup probe vs full recompute.

Measures, at a given sf dir, the per-shard cost of `minhash_dedup_probe`
(new shard probes the frozen corpus band index; index build time paid
once, reported separately) against `minhash_lsh_candidates` (the batch
form: every doc re-hashed every run). Interleaved samples, median of N,
loadavg recorded — the round-8 measurement discipline.

Usage: python tools/minhash_probe_ab.py /tmp/sf1 [n_samples]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ethereum_analytical_db_spark.plans import pipeline as pl
from ethereum_analytical_db_spark.plans.registry import all_queries
from ethereum_analytical_db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="minhash_probe_ab", cpus=cpus)
    qs = all_queries()

    t0 = time.time()
    pl._minhash_frozen_index(spark, sf_dir)  # build once, outside timing
    build_sec = time.time() - t0

    def run(name: str) -> float:
        t = time.time()
        qs[name].build(spark, sf_dir).toPandas()
        return time.time() - t

    # JIT/IO warm-up, one each, untimed
    run("minhash_dedup_probe")
    run("minhash_lsh_candidates")

    probe, full = [], []
    for _ in range(n):
        probe.append(run("minhash_dedup_probe"))
        full.append(run("minhash_lsh_candidates"))
    out = {
        "sf_dir": sf_dir,
        "n_samples": n,
        "index_build_sec": round(build_sec, 3),
        "probe_median_sec": round(statistics.median(probe), 3),
        "full_median_sec": round(statistics.median(full), 3),
        "probe_samples": [round(x, 3) for x in probe],
        "full_samples": [round(x, 3) for x in full],
        "speedup": round(statistics.median(full) / statistics.median(probe), 2),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
