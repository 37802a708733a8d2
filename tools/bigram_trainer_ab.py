"""Bigram-trainer shape A/B (r17): the sf1 scale_ab run showed the r16
one-pass trainer costs ~3x the executor CPU of the r15 two-pass form
(377 s vs 129 s at /tmp/sf1) despite one fewer corpus scan — the struct
HOF that re-emits every token as a (NULL, word) row is interpreted,
per-element work on EVERY word, which at scale dwarfs the saved scan.
This tool isolates the TRAINER (no scorer) across three variants and
reports wall + per-round executor time from the UI REST API:

- ``A_onepass``   the r16 one-pass form, reconstructed verbatim here
                  (one explode of unigram structs + pair structs, one
                  groupBy) — train_bigram_lm WAS this when the decisive
                  run was taken; r17 reverted it, so the tool keeps the
                  shape re-runnable
- ``B_twopass``   r15 shape: plain explode for unigram counts + the
                  sequence/element_at pair stream
- ``C_twopass_zip`` two-pass with the pair stream built by
                  zip_with(slice, slice) (dsir's bigram idiom — no
                  sequence allocation, no element_at lookups). This is
                  the form train_bigram_lm ships since the r17 revert.

Model identity across variants is VERIFIED here (unigram + bigram
tables collected and compared) before timing.

Usage: python tools/bigram_trainer_ab.py <sf_dir> [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402


def _jobs_executor_ms(sc) -> float:
    base = sc.uiWebUrl
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete",
            timeout=10,
        )
    )
    return sum(s.get("executorRunTime", 0) for s in stages)


def trainer_variants(docs):
    from ethereum_analytical_db_spark.operators.lm import (
        BigramLM,
        _fit_unigram_from_counts,
        train_unigram_lm,
    )
    from ethereum_analytical_db_spark.operators.text import words

    V, B, K, LAM = 5000, 20000, 0.5, 0.7

    def finish(uni, bi_counts, unpersist):
        top_bi = bi_counts.orderBy(
            F.desc("c"), F.asc("prev"), F.asc("word")
        ).limit(B)
        hist_totals = bi_counts.groupBy("prev").agg(F.sum("c").alias("h"))
        v = uni.vocab_size
        table = (
            hist_totals.join(F.broadcast(top_bi), "prev")
            .select(
                "prev",
                "word",
                (
                    (F.col("c") + F.lit(K))
                    / (F.col("h") + F.lit(K) * (v + 1))
                ).alias("p_bi"),
            )
            .cache()
        )
        table.count()
        unpersist.unpersist()
        return BigramLM(unigram=uni, table=table, lam=LAM)

    def onepass():
        # the r16 one-pass form, verbatim (train_bigram_lm pre-revert)
        ws = docs.select(words(F.col("text")).alias("ws"))
        empty = F.array().cast("array<struct<prev:string,word:string>>")
        both = (
            ws.select(
                F.explode(
                    F.concat(
                        F.filter(
                            F.transform(
                                "ws",
                                lambda w: F.struct(
                                    F.lit(None).cast("string").alias("prev"),
                                    w.alias("word"),
                                ),
                            ),
                            lambda s: s["word"] != "",
                        ),
                        F.when(
                            F.size("ws") >= 2,
                            F.filter(
                                F.transform(
                                    F.sequence(F.lit(0), F.size("ws") - 2),
                                    lambda i: F.struct(
                                        F.element_at("ws", i + 1).alias("prev"),
                                        F.element_at("ws", i + 2).alias("word"),
                                    ),
                                ),
                                lambda s: (s["prev"] != "")
                                & (s["word"] != ""),
                            ),
                        ).otherwise(empty),
                    )
                ).alias("p")
            ).select("p.prev", "p.word")
        )
        all_counts = (
            both.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("c")).cache()
        )
        uni = _fit_unigram_from_counts(
            all_counts.filter(F.col("prev").isNull()).select("word", "c"),
            V,
            K,
        )
        bi_counts = all_counts.filter(F.col("prev").isNotNull())
        return finish(uni, bi_counts, all_counts)

    def twopass():
        uni = train_unigram_lm(docs, vocab_size=V, add_k=K)
        ws = docs.select(words(F.col("text")).alias("ws"))
        pairs = (
            ws.filter(F.size("ws") >= 2)
            .select(
                F.explode(
                    F.filter(
                        F.transform(
                            F.sequence(F.lit(0), F.size("ws") - 2),
                            lambda i: F.struct(
                                F.element_at("ws", i + 1).alias("prev"),
                                F.element_at("ws", i + 2).alias("word"),
                            ),
                        ),
                        lambda s: (s["prev"] != "") & (s["word"] != ""),
                    )
                ).alias("p")
            )
            .select("p.prev", "p.word")
        )
        bi_counts = (
            pairs.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("c")).cache()
        )
        return finish(uni, bi_counts, bi_counts)

    def twopass_zip():
        uni = train_unigram_lm(docs, vocab_size=V, add_k=K)
        ws = docs.select(words(F.col("text")).alias("ws"))
        n1 = F.greatest(F.size("ws") - 1, F.lit(0))
        pairs = (
            ws.select(
                F.explode(
                    F.filter(
                        F.zip_with(
                            F.slice("ws", F.lit(1), n1),
                            F.slice("ws", F.lit(2), n1),
                            lambda a, b: F.struct(
                                a.alias("prev"), b.alias("word")
                            ),
                        ),
                        lambda s: (s["prev"] != "") & (s["word"] != ""),
                    )
                ).alias("p")
            )
            .select("p.prev", "p.word")
        )
        bi_counts = (
            pairs.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("c")).cache()
        )
        return finish(uni, bi_counts, bi_counts)

    return {
        "A_onepass": onepass,
        "B_twopass": twopass,
        "C_twopass_zip": twopass_zip,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from ethereum_analytical_db_spark.plans.pipeline import docs_table
    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(
        app_name="bigram-trainer-ab",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "10000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = docs_table(spark, sf_dir).select("doc_id", "text")
    variants = trainer_variants(docs)

    # model identity first (collect both tables, sorted)
    def snapshot(lm):
        uni = sorted(map(tuple, lm.unigram.table.collect()))
        bi = sorted(map(tuple, lm.table.collect()))
        scalars = (
            lm.unigram.vocab_size,
            lm.unigram.total_tokens,
            lm.unigram.oov_logp,
            lm.lam,
        )
        lm.release()
        return uni, bi, scalars

    snaps = {}
    for label, fn in variants.items():
        snaps[label] = snapshot(fn())
    base = snaps["A_onepass"]
    identity = {k: (v == base) for k, v in snaps.items()}

    times: dict[str, list[float]] = {k: [] for k in variants}
    exec_ms: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(rounds):
        for label, fn in variants.items():
            e0 = _jobs_executor_ms(sc)
            t0 = time.perf_counter()
            lm = fn()
            times[label].append(round(time.perf_counter() - t0, 4))
            exec_ms[label].append(_jobs_executor_ms(sc) - e0)
            lm.release()

    print(
        json.dumps(
            {
                "metric": "bigram_trainer_ab",
                "sf_dir": sf_dir,
                "rounds": rounds,
                "model_identity_vs_onepass": identity,
                "wall_medians": {
                    k: round(statistics.median(v), 4) for k, v in times.items()
                },
                "wall_samples": times,
                "executor_ms_medians": {
                    k: round(statistics.median(v), 1) for k, v in exec_ms.items()
                },
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
