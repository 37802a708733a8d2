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

C. (``--cold``, r10 VERDICT task 3) the same probe-vs-recompute A/B
   with the page cache EVICTED before every timed sample
   (``sync; echo 3 > /proc/sys/vm/drop_caches`` — root-only; the tool
   degrades with a clear error otherwise). This is the measurement the
   warm A/B cannot make: the probe's value proposition is reading
   ~32 B/doc of digest index instead of ~KB/doc of corpus text, and a
   page-cached corpus hides exactly that difference (SCALE.md r10
   caveat: warm probe ≈ warm recompute at sf1/sf10). Cold mode also
   materializes corpus and shard into SEPARATE parquet files first —
   sharing one file would make the probe's shard scan drag the corpus
   text through the cache anyway — and reports on-disk bytes for the
   index vs the corpus text, the ratio the cold medians should track.
   Only measurement A runs in cold mode. Nothing else may run on the
   box during a cold A/B: eviction is machine-wide.

Usage: python tools/exact_probe_ab.py /tmp/sf1 [n_samples] [k_appends] [--cold]
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


def _evict_page_cache() -> None:
    """sync + drop_caches(3): every timed read after this hits storage.
    Clean-cache-only eviction — reversible, no data risk — but it IS
    machine-wide, so cold runs must own the box."""
    os.sync()
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3\n")


def _du_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _assert_evictable(path: str) -> None:
    """Refuse cold measurements on tmpfs/ramfs: drop_caches cannot evict
    pages backing a RAM filesystem, so every 'cold' sample would be
    silently warm and the recorded numbers a lie (review find)."""
    best_fstype, best_len = None, -1
    with open("/proc/mounts") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            mnt, fstype = parts[1], parts[2]
            if path.startswith(mnt.rstrip("/") + "/") or path == mnt:
                if len(mnt) > best_len:
                    best_fstype, best_len = fstype, len(mnt)
    if best_fstype in ("tmpfs", "ramfs"):
        raise SystemExit(
            f"--cold: {path} is on {best_fstype} — page-cache eviction "
            "cannot make RAM-backed files cold; point the corpus (and "
            "this tool's scratch space) at a disk-backed filesystem"
        )


def run_cold(spark, sf_dir: str, n: int) -> dict:
    """Measurement C: cold-cache probe vs recompute (module docstring)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    out: dict = {"sf_dir": sf_dir, "n_samples": n, "mode": "cold"}
    # scratch lives NEXT TO the corpus (same filesystem), and both must
    # be evictable — a tmpfs default TMPDIR would make every sample warm
    scratch_parent = os.path.dirname(os.path.abspath(sf_dir))
    _assert_evictable(os.path.abspath(sf_dir))
    _assert_evictable(scratch_parent)
    with tempfile.TemporaryDirectory(
        prefix="exact_ab_cold_", dir=scratch_parent
    ) as tmp:
        corpus_path = os.path.join(tmp, "corpus")
        shard_path = os.path.join(tmp, "shard")
        docs.filter(F.col("doc_id") % 10 != 0).write.parquet(corpus_path)
        docs.filter(F.col("doc_id") % 10 == 0).write.parquet(shard_path)
        corpus = spark.read.parquet(corpus_path)
        shard = spark.read.parquet(shard_path)
        idx = os.path.join(tmp, "index")
        dedup.exact_index_write(corpus, idx)
        out["corpus_bytes"] = _du_bytes(corpus_path)
        out["index_bytes"] = _du_bytes(idx)
        out["shard_bytes"] = _du_bytes(shard_path)
        out["bytes_ratio_corpus_over_index"] = round(
            out["corpus_bytes"] / out["index_bytes"], 2
        )

        def probe():
            # reads: shard text + the 32 B/doc digest index
            dedup.exact_probe_duplicates(spark, idx, shard).count()

        def recompute():
            # reads: corpus text + shard text (the full re-digest path)
            pairs = dedup.exact_within_pairs(corpus.unionByName(shard))
            sh = shard.select(F.col("doc_id").alias("doc_b"))
            pairs.join(sh, "doc_b", "left_semi").count()

        probe(), recompute()  # warm the PLANS and JIT (not the cache)
        ps, rs = [], []
        for _ in range(n):  # interleaved; cache evicted before each sample
            _evict_page_cache()
            ps.append(round(_t(probe), 3))
            _evict_page_cache()
            rs.append(round(_t(recompute), 3))
        out["probe_cold_samples"] = ps
        out["recompute_cold_samples"] = rs
        out["probe_cold_sec"] = round(statistics.median(ps), 3)
        out["recompute_cold_sec"] = round(statistics.median(rs), 3)
        out["speedup_cold_x"] = round(
            out["recompute_cold_sec"] / out["probe_cold_sec"], 2
        )
    out["loadavg"] = round(os.getloadavg()[0], 2)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--cold"]
    cold = "--cold" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/tmp/sf1"
    n = int(args[1]) if len(args) > 1 else 5
    k = int(args[2]) if len(args) > 2 else 60
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="exact_probe_ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if cold:
        if not os.access("/proc/sys/vm/drop_caches", os.W_OK):
            raise SystemExit(
                "--cold needs write access to /proc/sys/vm/drop_caches "
                "(root); run the warm A/B instead"
            )
        print(json.dumps(run_cold(spark, sf_dir, n)))
        return

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
