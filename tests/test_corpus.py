"""End-to-end clean_corpus chain: stage ordering, monotonicity where
the chain only filters, determinism, and each optional stage's effect."""

import pytest
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators.corpus import clean_corpus
from ethereum_analytical_db_spark.plans.registry import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF, "documents").select("doc_id", "text")


def test_stage_chain_and_monotonicity(spark, docs):
    bench = docs.orderBy("doc_id").limit(2).select("text")
    report = clean_corpus(
        docs,
        benchmark=bench,
        langs=["en", "de", "fr", "es", "zh"],
        max_perplexity=1e9,
        strata_fractions={"en": 1.0},
    )
    names = [n for n, _ in report.stages]
    assert names == [
        "input", "exact_dedup", "line_dedup", "quality_filter",
        "lang_filter", "perplexity_filter", "decontaminate", "pii_scrub",
        "balance", "split",
    ]
    counts = [c for _, c in report.stages]
    # every stage filters or transforms — surviving rows never grow
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] == docs.count()
    # the planted benchmark docs are gone
    bench_ids = {r["doc_id"] for r in docs.orderBy("doc_id").limit(2).collect()}
    out_ids = {r["doc_id"] for r in report.df.collect()}
    assert not (bench_ids & out_ids)
    # final frame carries lang + split columns
    assert {"lang", "split"} <= set(report.df.columns)
    assert {r["split"] for r in report.df.collect()} <= {"train", "valid", "test"}


def test_minimal_chain_and_determinism(spark, docs):
    r1 = clean_corpus(docs, collect_stats=True)
    names = [n for n, _ in r1.stages]
    # optional stages absent when not configured
    assert "lang_filter" not in names
    assert "perplexity_filter" not in names
    assert "decontaminate" not in names
    assert "balance" not in names
    r2 = clean_corpus(docs, collect_stats=True)
    assert r1.stages == r2.stages
    a = sorted((r["doc_id"], r["split"]) for r in r1.df.collect())
    b = sorted((r["doc_id"], r["split"]) for r in r2.df.collect())
    assert a == b


def test_lazy_mode_no_counts(spark, docs):
    report = clean_corpus(docs, collect_stats=False)
    assert report.stages == []
    assert report.df.count() > 0


def test_perplexity_stage_drops_high_ppl(spark):
    # distinct texts so exact-dedup keeps them all and the LM the chain
    # trains (post-dedup) sees the same corpus the cap was computed on
    rows = [
        (i, f"the quick brown fox jumps over the lazy dog v{i}")
        for i in range(30)
    ]
    rows.append((99, "zzq qqz jxq wvv xqj zzv qvx jjz"))  # OOV gibberish
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap between the common docs' ppl and the gibberish doc's ppl
    from ethereum_analytical_db_spark.operators.lm import (
        score_perplexity, train_unigram_lm,
    )
    lm = train_unigram_lm(df, vocab_size=50)
    ppls = {r["doc_id"]: r["perplexity"] for r in score_perplexity(df, lm).collect()}
    cap = (ppls[0] + ppls[99]) / 2
    report = clean_corpus(df, max_perplexity=cap, min_tokens=1)
    kept = {r["doc_id"] for r in report.df.collect()}
    assert 99 not in kept and 0 in kept


def test_duplicate_ids_rejected_in_stats_mode(spark):
    from ethereum_analytical_db_spark.operators.corpus import clean_corpus

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (1, "g h i j k l"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="must be unique"):
        clean_corpus(df)


def test_lazy_mode_with_perplexity_and_release(spark, docs):
    report = clean_corpus(
        docs, max_perplexity=1e9, collect_stats=False
    )
    assert report.stages == []
    # the LM prefix the returned plan references is cached and handed
    # back for explicit release
    assert len(report.cached_intermediates) == 1
    assert report.cached_intermediates[0].storageLevel.useMemory
    n = report.df.count()
    assert n > 0
    report.release()
    assert not report.cached_intermediates[0].storageLevel.useMemory


def test_balance_default_fraction_knob(spark, docs):
    # 0.0 restores stratified_sample's drop-unknown behavior
    report = clean_corpus(
        docs,
        strata_fractions={"en": 1.0},
        balance_default_fraction=0.0,
        min_tokens=1,
        max_repetition=1.0,
    )
    langs = {r["lang"] for r in report.df.select("lang").distinct().collect()}
    assert langs <= {"en"}


def test_ground_truth_lang_preserved(spark, docs):
    """Round-5 advice: an input that already carries a lang column is
    trusted — the heuristic must not overwrite real labels (the filter
    and the balance strata run on the provided column)."""
    labeled = docs.withColumn("lang", F.lit("xx"))  # no heuristic emits 'xx'
    report = clean_corpus(labeled, langs=["xx"], collect_stats=True)
    try:
        # nothing dropped by the language filter: the provided label won
        stages = dict(report.stages)
        assert stages["lang_filter"] == stages["quality_filter"]
        assert report.df.select("lang").distinct().collect()[0]["lang"] == "xx"
    finally:
        report.release()


def test_substring_dedup_stage(spark):
    """Optional exact-substring stage: duplicated k-word spans are cut
    from later docs (keep-first), row count unchanged, stage appears in
    order right after exact_dedup."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta unique tail one"),
        (2, "alpha beta gamma delta epsilon zeta eta theta other suffix two"),
        (3, "completely different words with no overlap at all here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    report = clean_corpus(docs, substring_dedup_k=8, min_tokens=1)
    names = [n for n, _ in report.stages]
    assert names[:3] == ["input", "exact_dedup", "substring_dedup"]
    out = {r["doc_id"]: r["text"] for r in report.df.collect()}
    assert len(out) == 3  # spans removed, docs kept
    assert out[1] == rows[0][1]  # first occurrence intact
    assert out[2] == "other suffix two"  # the repeated 8-word span cut
    assert out[3] == rows[2][1]
    report.release()
