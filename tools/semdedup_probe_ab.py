"""Same-box, same-session A/B: incremental SemDeDup probe vs one-shot
recompute — the serve-path story for semantic dedup at scale.

Measures, at a given sf dir:
- one-shot ``semantic_dedup`` over the corpus (k sized N/2000, the
  paper discipline) — what a naive daily rerun would pay;
- ``semdedup_index_write`` once (build cost, reported separately);
- ``semdedup_probe`` of a small new batch (default 1% of the corpus,
  ids offset to be new) against the frozen index — what the serve path
  pays per increment.

Interleaved samples, median of N, loadavg bracketed per sample — the
round-8 measurement discipline.

Usage: python tools/semdedup_probe_ab.py /tmp/sf10 [n_samples] [batch_frac]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import semdedup
from ethereum_analytical_db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="semdedup_probe_ab", cpus=cpus)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    k = max(8, n_vec // 2000)

    # deterministic 1% batch with ids offset past the corpus (the
    # append contract wants new ids); vectors reused — fine for timing,
    # and realistic (new data resembles old)
    batch = (
        emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(int(1 / frac))) == 0)
        .select(
            (F.col("vec_id") + F.lit(10 * n_vec)).alias("vec_id"), "embedding"
        )
        .localCheckpoint()
    )
    n_batch = batch.count()

    idx = f"/tmp/semdedup_ab_idx_{os.getpid()}"
    t0 = time.time()
    centroids = semdedup.semdedup_index_write(
        emb, idx, threshold=0.97, n_centroids=k, iterations=2
    )
    build_sec = time.time() - t0

    def probe() -> float:
        t = time.time()
        semdedup.semdedup_probe(batch, idx, centroids).count()
        return time.time() - t

    def full() -> float:
        t = time.time()
        semdedup.semantic_dedup(
            emb, threshold=0.97, n_centroids=k, iterations=2
        ).count()
        return time.time() - t

    probe()  # warm-up, untimed
    p, f, loads = [], [], []
    for _ in range(n):
        l0 = os.getloadavg()[0]
        p.append(probe())
        f.append(full())
        loads.append((l0, os.getloadavg()[0]))
    out = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "n_batch": n_batch,
        "n_centroids": k,
        "index_build_sec": round(build_sec, 3),
        "probe_median_sec": round(statistics.median(p), 3),
        "full_median_sec": round(statistics.median(f), 3),
        "probe_samples": [round(x, 3) for x in p],
        "full_samples": [round(x, 3) for x in f],
        "speedup": round(statistics.median(f) / statistics.median(p), 2),
        "loadavg_brackets": [[round(a, 2), round(b, 2)] for a, b in loads],
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
