"""Same-box, same-session A/B: SimHash incremental probe vs full recompute.

The SimHash twin of tools/minhash_probe_ab.py: at a given sf dir,
measures `simhash_probe_candidates` (10% shard against the frozen chunk
index of the other 90%; index build paid once, reported separately)
against `simhash_near_duplicates` over the whole table. Interleaved
samples, median of N, loadavg recorded.

Usage: python tools/simhash_probe_ab.py /tmp/sf1 [n_samples]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import dedup
from ethereum_analytical_db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="simhash_probe_ab", cpus=cpus)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    shard = docs.filter(F.col("doc_id") % 10 == 0)
    path = os.path.join(tempfile.mkdtemp(), "simhash_index")

    t0 = time.time()
    dedup.simhash_index_write(corpus, path, blocks=4)  # once, outside timing
    build_sec = time.time() - t0

    def run_probe() -> float:
        t = time.time()
        dedup.simhash_probe_candidates(
            spark, path, shard, max_hamming=3, blocks=4
        ).toPandas()
        return time.time() - t

    def run_full() -> float:
        t = time.time()
        dedup.simhash_near_duplicates(docs, max_hamming=3, blocks=4).toPandas()
        return time.time() - t

    run_probe(); run_full()  # JIT/IO warm-up, untimed
    probe, full = [], []
    for _ in range(n):
        probe.append(run_probe())
        full.append(run_full())
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_samples": n,
        "index_build_sec": round(build_sec, 3),
        "probe_median_sec": round(statistics.median(probe), 3),
        "full_median_sec": round(statistics.median(full), 3),
        "probe_samples": [round(x, 3) for x in probe],
        "full_samples": [round(x, 3) for x in full],
        "speedup": round(statistics.median(full) / statistics.median(probe), 2),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
