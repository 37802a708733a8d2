"""At-scale paired A/B evidence for the r16/r17 shape claims (r16
VERDICT item 1): each claim's alternative form is reconstructed verbatim
in this tool and run strictly interleaved with the CURRENT form in the
same session, so ambient load prices both equally. Per-variant wall
medians AND per-phase stage metrics (executor run time, input bytes,
shuffle write — from the UI REST API, attributed by job group) are
reported, so a removed scan/shuffle is visible even where fixed per-job
overheads flatten the wall clock.

Claims covered (name → what the variants are):

- ``dsir_fused``    A: two-frame dsir_select (two tokenize+fit
                       pipelines — the pre-r16 §12 shape)
                    B: fused target_pred single-pass form (current)
- ``lloyd_persist`` A: ivf_train_centroids WITHOUT the (id, vec)
                       persist (pre-r16 §16 — re-scans the source
                       iterations+1 times)
                    B: current persisted loop
- ``bigram_onepass`` A: r15 two-pass trainer (separate unigram corpus
                       pass + sequence/element_at pair pass) + current
                       scorer
                    B: whatever train_bigram_lm currently is. When this
                       was the r16 one-pass trainer it measured a
                       NEGATIVE at sf1 (executor CPU ~3x; see
                       tools/bigram_trainer_ab.py for the isolated
                       3-variant run) and r17 reverted the trainer to
                       two passes with a zip_with pair stream.
- ``lm_scorer_fold`` A: pre-r16 §14 scorer (ids.distinct() re-scan +
                       left join back for token-less docs)
                    B: current explode_outer scorer
- ``lm_token_share`` A: current trainer+scorer (each tokenizes)
                    B: the r17 EXPERIMENT — one materialized
                       (id, word, prev) stream feeding both. Measured
                       a NEGATIVE (see OPTIMIZATION_r17.md) and NOT
                       shipped; kept here so the decision is re-runnable.
- ``unigram_token_share`` same experiment for the unigram chain
                       (clean_corpus's perplexity stage shape).

Usage: python tools/scale_ab_r17.py <sf_dir> <claim> [rounds]
Prints one JSON line; paste the numbers into SCALE.md.
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


def _api(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _stage_metrics(base: str, app_id: str):
    """jobGroup → {executor_run_ms, input_bytes, shuffle_write_bytes,
    n_stages, n_jobs} summed over that group's succeeded jobs' stages."""
    jobs = _api(f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded")
    stages = {
        s["stageId"]: s
        for s in _api(f"{base}/api/v1/applications/{app_id}/stages")
        if s["status"] == "COMPLETE"
    }
    out: dict[str, dict] = {}
    for j in jobs:
        g = j.get("jobGroup") or "_"
        acc = out.setdefault(
            g,
            {
                "executor_run_ms": 0,
                "input_bytes": 0,
                "shuffle_write_bytes": 0,
                "n_stages": 0,
                "n_jobs": 0,
            },
        )
        acc["n_jobs"] += 1
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if s is None:
                continue
            acc["n_stages"] += 1
            acc["executor_run_ms"] += s.get("executorRunTime", 0)
            acc["input_bytes"] += s.get("inputBytes", 0)
            acc["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
    return out


# ------------------------------------------------------------ alt forms


def lloyd_train_no_persist(
    embeddings, n_centroids=16, iterations=3, id_col="vec_id", vec_col="embedding"
):
    """Pre-r16 §16 Lloyd loop: identical arithmetic, NO persist of the
    (id, vec) projection — init + every iteration re-scan the source."""
    from ethereum_analytical_db_spark.operators.similarity import (
        _assign_clusters,
    )

    src = embeddings.select(F.col(id_col), F.col(vec_col))
    init_rows = (
        src.orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]
    if not centroids:
        return centroids
    for _ in range(iterations):
        assigned = _assign_clusters(src, centroids, id_col, vec_col).select(
            F.col("cluster").alias("__cluster"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        means = (
            assigned.groupBy("__cluster", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = {}
        for r in means:
            new.setdefault(r["__cluster"], {})[r["pos"]] = r["m"]
        centroids = [
            [new[i + 1][p] for p in sorted(new[i + 1])] if (i + 1) in new else c
            for i, c in enumerate(centroids)
        ]
    return centroids


def bigram_train_r15(df, text_col="text", vocab_size=5000, bigram_size=20000,
                     add_k=0.5, lam=0.7):
    """r15 two-pass bigram trainer: separate unigram corpus pass + pair
    corpus pass (the pre-§20 shape), same fitted values."""
    from ethereum_analytical_db_spark.operators.lm import (
        BigramLM,
        train_unigram_lm,
    )
    from ethereum_analytical_db_spark.operators.text import words

    uni = train_unigram_lm(df, text_col, vocab_size=vocab_size, add_k=add_k)
    ws = df.select(words(F.col(text_col)).alias("ws"))
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
    bi_counts = pairs.groupBy("prev", "word").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    top_bi = bi_counts.orderBy(
        F.desc("c"), F.asc("prev"), F.asc("word")
    ).limit(bigram_size)
    hist_totals = bi_counts.groupBy("prev").agg(F.sum("c").alias("h"))
    v = uni.vocab_size
    table = (
        hist_totals.join(F.broadcast(top_bi), "prev")
        .select(
            "prev",
            "word",
            (
                (F.col("c") + F.lit(add_k))
                / (F.col("h") + F.lit(add_k) * (v + 1))
            ).alias("p_bi"),
        )
        .cache()
    )
    table.count()
    bi_counts.unpersist()
    return BigramLM(unigram=uni, table=table, lam=lam)


def score_perplexity_pre_r16(df, lm, text_col="text", id_col="doc_id"):
    """Pre-r16 §14 unigram scorer: filtered explode + ids.distinct()
    re-scan + left join back for token-less docs."""
    from ethereum_analytical_db_spark.operators.text import words

    toks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    scored = toks.join(F.broadcast(lm.table), "word", "left").select(
        F.col(id_col),
        F.coalesce(F.col("logp"), F.lit(lm.oov_logp)).alias("logp"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum("logp") / F.count(F.lit(1))).alias("avg_neg_logp"),
    )
    ids = df.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        "avg_neg_logp",
        F.exp("avg_neg_logp").alias("perplexity"),
    )


# --- the r17 shared-token EXPERIMENT (measured negative, not shipped) ---


def token_pair_stream(df, text_col="text", id_col="doc_id"):
    """(id, word, prev) per position — the bigram scorer's stream."""
    from ethereum_analytical_db_spark.operators.text import words

    ws = df.select(F.col(id_col), words(F.col(text_col)).alias("ws"))
    return ws.select(
        F.col(id_col),
        F.explode_outer(
            F.transform(
                "ws",
                lambda w, i: F.struct(
                    F.when(w != "", w).alias("word"),
                    F.when(i > 0, F.get("ws", i - 1)).alias("prev"),
                ),
            )
        ).alias("t"),
    ).select(
        id_col, F.col("t.word").alias("word"), F.col("t.prev").alias("prev")
    )


def token_stream(df, text_col="text", id_col="doc_id"):
    """(id, word) per position — the unigram scorer's stream."""
    from ethereum_analytical_db_spark.operators.text import words

    return df.select(
        F.col(id_col),
        F.explode_outer(
            F.transform(
                words(F.col(text_col)), lambda w: F.when(w != "", w)
            )
        ).alias("word"),
    )


def bigram_train_from_tokens(toks, vocab_size=5000, bigram_size=20000,
                             add_k=0.5, lam=0.7):
    """Bigram trainer over a materialized token_pair_stream: one
    groupBy yields both models' counts (unigram = Σ over prev)."""
    from ethereum_analytical_db_spark.operators.lm import (
        BigramLM,
        _fit_unigram_from_counts,
    )

    all_counts = (
        toks.filter(F.col("word").isNotNull())
        .groupBy(
            F.when(F.col("prev") != "", F.col("prev")).alias("prev"),
            F.col("word"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    uni_src = all_counts.groupBy("word").agg(F.sum("c").alias("c"))
    uni = _fit_unigram_from_counts(uni_src, vocab_size, add_k)
    bi_counts = all_counts.filter(F.col("prev").isNotNull())
    top_bi = bi_counts.orderBy(
        F.desc("c"), F.asc("prev"), F.asc("word")
    ).limit(bigram_size)
    hist_totals = bi_counts.groupBy("prev").agg(F.sum("c").alias("h"))
    v = uni.vocab_size
    table = (
        hist_totals.join(F.broadcast(top_bi), "prev")
        .select(
            "prev",
            "word",
            (
                (F.col("c") + F.lit(add_k))
                / (F.col("h") + F.lit(add_k) * (v + 1))
            ).alias("p_bi"),
        )
        .cache()
    )
    table.count()
    all_counts.unpersist()
    return BigramLM(unigram=uni, table=table, lam=lam)


def score_bigram_from_tokens(toks, lm, id_col="doc_id"):
    """score_perplexity_bigram's body over a pre-built stream
    (exact_decimal_sum form, matching the registry query)."""
    uni = lm.unigram
    j = (
        toks.join(
            F.broadcast(uni.table.select("word", F.col("p").alias("_p_uni"))),
            "word",
            "left",
        )
        .join(F.broadcast(lm.table), ["prev", "word"], "left")
    )
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
            -(
                F.sum(F.col("logp").cast("decimal(38,8)")).cast("double")
                / n_tok
            )
        ).alias("avg_neg_logp"),
    )
    return per_doc.select(
        id_col, "n_tokens", "avg_neg_logp",
        F.exp("avg_neg_logp").alias("perplexity"),
    )


def unigram_train_from_tokens(toks, vocab_size, add_k=0.5):
    from ethereum_analytical_db_spark.operators.lm import (
        _fit_unigram_from_counts,
    )

    counts = (
        toks.filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    return _fit_unigram_from_counts(counts, vocab_size, add_k, unpersist=counts)


def score_unigram_from_tokens(toks, lm, id_col="doc_id"):
    scored = toks.join(F.broadcast(lm.table), "word", "left").select(
        F.col(id_col),
        F.col("word"),
        F.when(
            F.col("word").isNotNull(),
            F.coalesce(F.col("logp"), F.lit(lm.oov_logp)),
        ).alias("logp"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.col("word")).alias("n_tokens"),
        (-F.sum("logp") / F.count(F.col("word"))).alias("avg_neg_logp"),
    )
    return per_doc.select(
        id_col, "n_tokens", "avg_neg_logp",
        F.exp("avg_neg_logp").alias("perplexity"),
    )


# ---------------------------------------------------------------- variants


def build_variants(spark, sf_dir: str, claim: str):
    """claim → ordered {label: zero-arg callable that runs the full
    variant end-to-end (drained with a real action)}."""
    from ethereum_analytical_db_spark.operators import dsir, similarity
    from ethereum_analytical_db_spark.operators.lm import (
        score_perplexity,
        score_perplexity_bigram,
        train_bigram_lm,
        train_unigram_lm,
    )
    from ethereum_analytical_db_spark.operators.materialize import (
        materialize as _mat,
    )
    from ethereum_analytical_db_spark.plans.pipeline import docs_table

    docs = docs_table(spark, sf_dir).select("doc_id", "text")

    if claim == "dsir_fused":
        pred = F.col("doc_id") % 53 == 0

        def two_frame():
            target = docs.filter(pred)
            raw = docs.filter(~pred)
            dsir.dsir_select(raw, target, k=500).toPandas()

        def fused():
            dsir.dsir_select(docs, None, k=500, target_pred=pred).toPandas()

        return {"A_two_frame": two_frame, "B_fused": fused}

    if claim == "lloyd_persist":
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

        def no_persist():
            lloyd_train_no_persist(emb, n_centroids=16, iterations=3)

        def persisted():
            similarity.ivf_train_centroids(emb, n_centroids=16, iterations=3)

        return {"A_no_persist": no_persist, "B_persisted": persisted}

    if claim == "bigram_onepass":

        def r15():
            lm = bigram_train_r15(docs)
            score_perplexity_bigram(
                docs, lm, exact_decimal_sum=True
            ).toPandas()
            lm.release()

        def r16():
            lm = train_bigram_lm(docs, vocab_size=5000, bigram_size=20000)
            score_perplexity_bigram(
                docs, lm, exact_decimal_sum=True
            ).toPandas()
            lm.release()

        return {"A_r15_twopass": r15, "B_r16_onepass": r16}

    if claim == "lm_scorer_fold":
        lm = train_unigram_lm(docs, vocab_size=5000)

        def old():
            score_perplexity_pre_r16(docs, lm).toPandas()

        def new():
            score_perplexity(docs, lm).toPandas()

        return {"A_distinct_backjoin": old, "B_explode_outer": new}

    if claim == "lm_token_share":

        def separate():
            lm = train_bigram_lm(docs, vocab_size=5000, bigram_size=20000)
            score_perplexity_bigram(
                docs, lm, exact_decimal_sum=True
            ).toPandas()
            lm.release()

        def shared():
            toks = _mat(token_pair_stream(docs), "local", eager=False)
            lm = bigram_train_from_tokens(
                toks, vocab_size=5000, bigram_size=20000
            )
            score_bigram_from_tokens(toks, lm).toPandas()
            lm.release()

        return {"A_separate": separate, "B_shared": shared}

    if claim == "unigram_token_share":

        def separate():
            lm = train_unigram_lm(docs, vocab_size=20000)
            score_perplexity(docs, lm).toPandas()
            lm.release()

        def shared():
            toks = token_stream(docs).cache()
            lm = unigram_train_from_tokens(toks, vocab_size=20000)
            score_unigram_from_tokens(toks, lm).toPandas()
            toks.unpersist()
            lm.release()

        return {"A_separate": separate, "B_shared": shared}

    raise SystemExit(f"unknown claim {claim!r}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    claim = sys.argv[2] if len(sys.argv) > 2 else "lm_token_share"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(
        app_name=f"scale-ab-{claim}",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            # keep every run's stages readable by the REST pull at the end
            "spark.ui.retainedJobs": "10000",
            "spark.ui.retainedStages": "10000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    variants = build_variants(spark, sf_dir, claim)

    # warm every path once (JIT, python workers, parquet footers)
    for fn in variants.values():
        fn()

    times: dict[str, list[float]] = {k: [] for k in variants}
    # strictly interleaved; the LAST round of each variant runs under a
    # dedicated job group so its stage metrics are attributable
    for i in range(rounds):
        for label, fn in variants.items():
            group = f"{label}" if i == rounds - 1 else f"warm-{label}-{i}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            fn()
            times[label].append(round(time.perf_counter() - t0, 4))
    sc.setJobGroup("idle", "idle")

    metrics = {}
    try:
        base = sc.uiWebUrl
        per_group = _stage_metrics(base, sc.applicationId)
        metrics = {k: per_group.get(k) for k in variants}
    except Exception as e:  # REST pull is evidence, not correctness
        metrics = {"error": str(e)}

    out = {
        "metric": f"scale_ab_{claim}",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "samples": times,
        "medians": {k: round(statistics.median(v), 4) for k, v in times.items()},
        "last_round_stage_metrics": metrics,
        "loadavg": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
