"""Delta-vs-recount A/B for the distributed BPE loop's pair statistics
(r14 VERDICT task 2, r15 finding): at the sf10/sf100 probe corpora the
vocabulary is TINY (31k words), every per-round recount is sub-floor,
and delta maintenance only adds stages — measured 2.1-2.5x SLOWER
(SCALE_NEWOPS_DETAIL). But the distributed fallback only runs in
production when the vocabulary EXCEEDS driver_max_cells (>= 20M cells);
this probe builds a corpus actually in that regime (N distinct words,
~9 chars each) and measures both maintenance modes at a relaxed-mode
merge budget, giving the crossover the `pair_maintenance="auto"`
default is sized from.

Usage: python tools/bpe_pair_maintenance_ab.py [n_words] [merges]
Appends one JSON line per mode to SCALE_NEWOPS_DETAIL.jsonl (op
`bpe_pair_maintenance_ab`) and prints them.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ethereum_analytical_db_spark.operators import tokenizer  # noqa: E402
from ethereum_analytical_db_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_docs(spark, n_words: int):
    """N DISTINCT ~9-char words (base-26 of a mixed id — distinctness by
    construction), packed 100 per document. Vocabulary cells ≈ 9·N, so
    n_words=3M sits at ~27M cells — above the 20M driver_max_cells
    default, i.e. genuinely inside the distributed fallback's regime."""
    word = F.concat(
        *[
            F.chr(
                F.lit(97)
                + (
                    F.conv(
                        F.substring(F.md5(F.col("id").cast("string")), k + 1, 4),
                        16,
                        10,
                    ).cast("long")
                    % 26
                )
            )
            for k in range(6)
        ],
        # distinctness tail: id in base-26, 3 chars is enough headroom
        F.chr(F.lit(97) + (F.col("id") / 676).cast("long") % 26),
        F.chr(F.lit(97) + (F.col("id") / 26).cast("long") % 26),
        F.chr(F.lit(97) + F.col("id") % 26),
    )
    return (
        spark.range(n_words)
        .select((F.col("id") / 100).cast("long").alias("doc_id"), word.alias("w"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    merges = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bpe_pair_maintenance_ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_docs(spark, n_words)
    docs.write.mode("overwrite").parquet("/tmp/bpe_ab_docs.parquet")
    docs = spark.read.parquet("/tmp/bpe_ab_docs.parquet")
    out_path = os.path.join(HERE, "SCALE_NEWOPS_DETAIL.jsonl")
    for mode in ("recount", "delta"):
        # cooldown: the first leg drives loadavg to ~19; starting the
        # second leg hot would confound the comparison
        t_wait = time.time()
        while os.getloadavg()[0] > 4 and time.time() - t_wait < 600:
            time.sleep(10)
        stats: dict = {}
        la0 = round(os.getloadavg()[0], 2)
        t0 = time.time()
        got = tokenizer.train_bpe(
            docs,
            num_merges=merges,
            min_freq=1,
            mode="distributed",
            exact_order=False,
            pair_maintenance=mode,
            stats=stats,
        )
        el = round(time.time() - t0, 3)
        row = {
            "op": "bpe_pair_maintenance_ab",
            "sf_dir": f"synthetic:{n_words}w",
            "median_sec": el,
            "samples": [el],
            "loadavg_brackets": [[la0, round(os.getloadavg()[0], 2)]],
            "n_words": n_words,
            "vocab_cells": 9 * n_words,
            "merges_learned": len(got),
            "spark_rounds": stats["rounds"],
            "pair_maintenance": mode,
            "sec_per_round": round(el / max(stats["rounds"], 1), 3),
        }
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row, separators=(",", ":")) + "\n")


if __name__ == "__main__":
    main()
