"""Same-box, same-session A/Bs for the r10 exact-dedup serve path.

Two measurements, the round-8 discipline (interleaved samples, median
of N, loadavg recorded):

A. probe vs full recompute — per-shard cost of `exact_probe_duplicates`
   (shard digests broadcast to the frozen index scan) against the batch
   form (`exact_duplicates` over corpus ∪ shard: every doc re-digested
   and shuffled every run). Index build time is paid once and reported
   separately. 90/10 corpus/shard split, same as the registry query.

B. fragmentation: what `compact_index` / the streaming `compact_every`
   cadence buys a probe — the same index materialized as ONE build vs
   K appends (K micro-batches' worth of small files), probe timed
   against both, then the fragmented one compacted and timed again.

Usage: python tools/exact_probe_ab.py /tmp/sf1 [n_samples] [k_appends]
Prints one JSON line; paste numbers into SCALE.md.
"""

from __future__ import annotations

import glob
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


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exact_probe_ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    shard = docs.filter(F.col("doc_id") % 10 == 0)
    out: dict = {"sf_dir": sf_dir, "n_samples": n, "k_appends": k}

    with tempfile.TemporaryDirectory(prefix="exact_ab_") as tmp:
        # --- A: probe vs recompute ---
        idx = os.path.join(tmp, "one_shot")
        out["index_build_sec"] = round(_t(lambda: dedup.exact_index_write(corpus, idx)), 3)

        def probe():
            dedup.exact_probe_duplicates(spark, idx, shard).count()

        def recompute():
            # the batch form a user without the index runs: digest and
            # shuffle EVERYTHING, then keep groups the shard touches
            pairs = dedup.exact_within_pairs(docs)
            sh = shard.select(F.col("doc_id").alias("doc_b"))
            pairs.join(sh, "doc_b", "left_semi").count()

        probe(), recompute()  # warm both plans
        ps, rs = [], []
        for _ in range(n):  # interleaved: same box drift hits both
            ps.append(_t(probe))
            rs.append(_t(recompute))
        out["probe_sec"] = round(statistics.median(ps), 3)
        out["recompute_sec"] = round(statistics.median(rs), 3)
        out["speedup_x"] = round(out["recompute_sec"] / out["probe_sec"], 2)

        # --- B: fragmentation / compaction ---
        frag = os.path.join(tmp, "fragmented")
        first = corpus.filter(F.col("doc_id") % k == 0)
        dedup.exact_index_write(first, frag)
        for i in range(1, k):
            dedup.exact_index_append(
                corpus.filter(F.col("doc_id") % k == i), frag
            )
        out["files_fragmented"] = len(glob.glob(f"{frag}/pfx=*/*.parquet"))

        def probe_frag():
            dedup.exact_probe_duplicates(spark, frag, shard).count()

        probe_frag()
        fs = [_t(probe_frag) for _ in range(n)]
        out["probe_fragmented_sec"] = round(statistics.median(fs), 3)
        out["compact_sec"] = round(
            _t(lambda: dedup.compact_index(spark, frag, ["pfx"])), 3
        )
        out["files_compacted"] = len(glob.glob(f"{frag}/pfx=*/*.parquet"))
        probe_frag()
        cs = [_t(probe_frag) for _ in range(n)]
        out["probe_compacted_sec"] = round(statistics.median(cs), 3)
        out["fragmentation_penalty_x"] = round(
            out["probe_fragmented_sec"] / out["probe_compacted_sec"], 2
        )
    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
