"""Bigram-scorer token-stream shape A/B (r17 follow-up to the trainer
revert): score_perplexity_bigram builds its (word, prev) struct stream
with an INDEXED transform lambda (``transform(ws, (w, i) -> struct(
when(w != '', w), when(i > 0, get(ws, i-1))))``) — an interpreted
per-element index test plus a per-element array lookup. The zip_with
form pairs ``ws`` with a NULL-headed shifted copy instead:

    zip_with(ws, concat(array(NULL), slice(ws, 1, n-1)),
             (w, p) -> struct(when(w != '', w), p))

Same rows by construction (first token's prev is NULL either way; an
empty-string prev never matches the bigram table, exactly like the
indexed form's ``when(i > 0, ...)`` NULL), so scores are identical —
verified here row-for-row before timing.

Usage: python tools/bigram_scorer_ab.py <sf_dir> [rounds]
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


def _executor_ms(sc) -> float:
    base = sc.uiWebUrl
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete",
            timeout=10,
        )
    )
    return sum(s.get("executorRunTime", 0) for s in stages)


def score_zip(df, lm, text_col="text", id_col="doc_id"):
    """score_perplexity_bigram with the zip_with token-pair stream."""
    from ethereum_analytical_db_spark.operators.text import words

    ws = df.select(F.col(id_col), words(F.col(text_col)).alias("ws"))
    n1 = F.greatest(F.size("ws") - 1, F.lit(0))
    prevs = F.concat(
        F.array(F.lit(None).cast("string")), F.slice("ws", F.lit(1), n1)
    )
    toks = ws.select(
        F.col(id_col),
        F.explode_outer(
            F.zip_with(
                "ws",
                prevs,
                lambda w, p: F.struct(
                    F.when(w != "", w).alias("word"), p.alias("prev")
                ),
            )
        ).alias("t"),
    ).select(id_col, F.col("t.word").alias("word"), F.col("t.prev").alias("prev"))
    uni = lm.unigram
    j = toks.join(
        F.broadcast(uni.table.select("word", F.col("p").alias("_p_uni"))),
        "word",
        "left",
    ).join(F.broadcast(lm.table), ["prev", "word"], "left")
    p_uni = F.coalesce(F.col("_p_uni"), F.lit(uni.oov_p))
    p = F.when(
        F.col("p_bi").isNotNull(),
        F.lit(lm.lam) * F.col("p_bi") + F.lit(1.0 - lm.lam) * p_uni,
    ).otherwise(p_uni)
    scored = j.select(
        F.col(id_col),
        F.col("word"),
        F.when(F.col("word").isNotNull(), F.log(p)).alias("logp"),
    )
    n_tok = F.count(F.col("word"))
    per_doc = scored.groupBy(id_col).agg(
        n_tok.alias("n_tokens"),
        (
            -(F.sum(F.col("logp").cast("decimal(38,8)")).cast("double") / n_tok)
        ).alias("avg_neg_logp"),
    )
    return per_doc.select(
        id_col, "n_tokens", "avg_neg_logp", F.exp("avg_neg_logp").alias("perplexity")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from ethereum_analytical_db_spark.operators.lm import (
        score_perplexity_bigram,
        train_bigram_lm,
    )
    from ethereum_analytical_db_spark.plans.pipeline import docs_table
    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(
        app_name="bigram-scorer-ab",
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
    lm = train_bigram_lm(docs, vocab_size=5000, bigram_size=20000)

    cur = lambda: score_perplexity_bigram(  # noqa: E731
        docs, lm, exact_decimal_sum=True
    )
    new = lambda: score_zip(docs, lm)  # noqa: E731

    # row-for-row identity (exact doubles)
    a = sorted(map(tuple, cur().collect()))
    b = sorted(map(tuple, new().collect()))
    identical = a == b

    variants = {"A_indexed_transform": cur, "B_zip_with": new}
    times: dict[str, list[float]] = {k: [] for k in variants}
    exec_ms: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(rounds):
        for label, fn in variants.items():
            e0 = _executor_ms(sc)
            t0 = time.perf_counter()
            fn().toPandas()
            times[label].append(round(time.perf_counter() - t0, 4))
            exec_ms[label].append(_executor_ms(sc) - e0)

    print(
        json.dumps(
            {
                "metric": "bigram_scorer_ab",
                "sf_dir": sf_dir,
                "rounds": rounds,
                "rows_identical": identical,
                "wall_medians": {
                    k: round(statistics.median(v), 4) for k, v in times.items()
                },
                "executor_ms_medians": {
                    k: round(statistics.median(v), 1) for k, v in exec_ms.items()
                },
                "wall_samples": times,
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
