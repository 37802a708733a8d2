"""Scaling probe for the r12 operators: distributed BPE training /
encoding (operators/tokenizer.py) and SemDeDup semantic dedup
(operators/semdedup.py).

What the decades should show, by design:
- ``train_bpe``: ONE corpus-sized shuffle (word_frequencies), then a
  vocabulary-sized loop. The scaled corpora suffix every word per
  replica, so the vocabulary ALSO grows ~linearly (31 -> 310 -> 3.1k ->
  31k words) — the honest case, not a fixed-vocab freebie.
- ``bpe_train_1k`` (r13): 1,000 merges in mode='auto' (driver-local
  loop), reporting the SPARK JOB COUNT alongside wall time — the round
  -count axis the r12 VERDICT flagged: jobs must stay O(1) (the
  reduction aggregate + collect) regardless of merge count, where the
  old per-round loop would have scheduled ~2,000 jobs.
- ``encode_bpe``: embarrassingly parallel Arrow batches with per-batch
  word memoization — expect ~linear in corpus bytes.
- ``semantic_dedup``: k-means assignment is linear; the prune is
  Σ nᵢ² bounded by n_centroids ∝ N / target_cluster_size (the probe
  sizes k that way, like the paper) — expect ~linear at fixed target
  cluster size.

Usage: python tools/newops_scale_probe.py SF_DIR [n_samples]
       [--ops op1,op2]
Emits one JSON line per operator; median of n_samples after one
untimed warm-up, loadavg bracketed per sample.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ethereum_analytical_db_spark.operators import semdedup, tokenizer
from ethereum_analytical_db_spark.session import get_spark


def timed(fn, n: int):
    fn()  # warm-up, untimed
    samples, loads = [], []
    for _ in range(n):
        l0 = os.getloadavg()[0]
        t = time.time()
        fn()
        samples.append(time.time() - t)
        loads.append((l0, os.getloadavg()[0]))
    return samples, loads


def emit(name: str, sf_dir: str, samples, loads, extra=None):
    row = {
        "op": name,
        "sf_dir": sf_dir,
        "median_sec": round(statistics.median(samples), 3),
        "samples": [round(x, 3) for x in samples],
        "loadavg_brackets": [[round(a, 2), round(b, 2)] for a, b in loads],
    }
    if extra:
        row.update(extra)
    print(json.dumps(row, separators=(",", ":")))


KNOWN_OPS = {
    "bpe_train_10",
    "bpe_train_1k",
    "bpe_train_distributed",
    "bpe_train_distributed_relaxed",
    "bpe_encode",
    "semantic_dedup",
    "semantic_decontam",
}


def main() -> None:
    # argparse, not hand-rolled prefix stripping: the old parser
    # silently ran EVERYTHING on `--ops bpe_encode` (space form left
    # ops=None and ate the op name as a positional) and silently ran
    # NOTHING on `--ops=` (the empty set) — r13 advisor find
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("n", nargs="?", type=int, default=3)
    ap.add_argument(
        "--ops",
        default=None,
        help="comma-separated subset of: " + ", ".join(sorted(KNOWN_OPS)),
    )
    parsed = ap.parse_args()
    sf_dir, n = parsed.sf_dir, parsed.n
    ops = None
    if parsed.ops is not None:
        ops = {o for o in parsed.ops.split(",") if o}
        if not ops:
            ap.error("--ops given but names no operators")
        unknown = ops - KNOWN_OPS
        if unknown:
            ap.error(
                f"unknown op(s) {sorted(unknown)}; known: {sorted(KNOWN_OPS)}"
            )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="newops_scale_probe", cpus=cpus)

    def want(op: str) -> bool:
        return ops is None or op in ops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    vocab = None
    if want("bpe_train_10") or want("bpe_train_1k"):
        # only the bpe rows report it — a corpus-sized shuffle the
        # semantic_dedup-only invocation must not pay (review find)
        vocab = tokenizer.word_frequencies(docs).count()

    # --- BPE train (10 merges, the registry shape)
    if want("bpe_train_10"):
        samples, loads = timed(
            lambda: tokenizer.train_bpe(docs, num_merges=10), n
        )
        emit(
            "bpe_train_10", sf_dir, samples, loads,
            {"n_docs": n_docs, "vocab": vocab},
        )

    # --- BPE train, 1,000 merges on the driver-local path (min_freq=1
    # so the merge sequence runs deep on the small-SF vocabulary); the
    # job-group count pins rounds << merges
    if want("bpe_train_1k"):
        last: dict = {}

        def train_1k():
            sc = spark.sparkContext
            sc.setJobGroup("bpe1k", "bpe_train_1k probe")
            try:
                last["m"] = tokenizer.train_bpe(
                    docs, num_merges=1000, min_freq=1
                )
                return last["m"]
            finally:
                sc.setJobGroup(None, None)

        samples, loads = timed(train_1k, n)  # warm-up + n timed runs
        spark_jobs = len(
            spark.sparkContext.statusTracker().getJobIdsForGroup("bpe1k")
        )
        emit(
            "bpe_train_1k",
            sf_dir,
            samples,
            loads,
            {
                "n_docs": n_docs,
                "vocab": vocab,
                "merges_learned": len(last["m"]),
                "runs": n + 1,
                "spark_jobs_all_runs": spark_jobs,
            },
        )

    # --- BPE train on the DISTRIBUTED fallback path with merge
    # batching (r13 VERDICT task 3): Spark rounds must come in well
    # under the merge count — the honest bound is ~2-4x (exact greedy
    # order makes merge chains serial; see SCALE.md), vs exactly
    # num_merges rounds for the r12 per-merge loop
    for op, exact in [
        ("bpe_train_distributed", True),
        ("bpe_train_distributed_relaxed", False),
    ]:
        if not want(op):
            continue
        last: dict = {}

        def train_dist(exact=exact, last=last):
            st: dict = {}
            last["m"] = tokenizer.train_bpe(
                docs, num_merges=1000, min_freq=1,
                mode="distributed", exact_order=exact, stats=st,
            )
            last["stats"] = st

        samples, loads = timed(train_dist, n)
        emit(
            op,
            sf_dir,
            samples,
            loads,
            {
                "n_docs": n_docs,
                "merges_learned": len(last["m"]),
                "spark_rounds": last["stats"]["rounds"],
            },
        )

    # --- BPE encode with the learned table (count action: full decode,
    # nothing collected)
    if want("bpe_encode"):
        merges = tokenizer.train_bpe(docs, num_merges=10)
        samples, loads = timed(
            lambda: tokenizer.encode_bpe(docs, merges).count(), n
        )
        emit("bpe_encode", sf_dir, samples, loads, {"n_docs": n_docs})

    # --- SemDeDup, k sized to ~2000-vector clusters (paper discipline)
    if want("semantic_dedup"):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_vec = emb.count()
        k = max(8, n_vec // 2000)
        samples, loads = timed(
            lambda: semdedup.semantic_dedup(
                emb, threshold=0.97, n_centroids=k, iterations=2
            ).count(),
            n,
        )
        emit(
            "semantic_dedup",
            sf_dir,
            samples,
            loads,
            {"n_vectors": n_vec, "n_centroids": k},
        )

    # --- semantic decontamination (r15): broadcast-matrix BLAS gemm,
    # one mapInPandas pass, no shuffle — expect linear in corpus size
    # at a fixed benchmark (vec_id % 97 slice ≈ real eval-set scale)
    if want("semantic_decontam"):
        from pyspark.sql import functions as F

        from ethereum_analytical_db_spark.operators import decontam

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        bench = emb.filter(F.col("vec_id") % 97 == 0)
        train = emb.filter(F.col("vec_id") % 97 != 0)
        n_vec, n_bench = train.count(), bench.count()
        samples, loads = timed(
            lambda: decontam.benchmark_embedding_similarity(
                train, bench
            ).count(),
            n,
        )
        emit(
            "semantic_decontam",
            sf_dir,
            samples,
            loads,
            {"n_vectors": n_vec, "n_benchmark": n_bench},
        )


if __name__ == "__main__":
    main()
