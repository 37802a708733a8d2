"""Benchmark decontamination: flag/drop training documents whose n-gram
overlap with a held-out evaluation corpus is too high — the standard
train/eval hygiene pass in large-scale training-data pipelines (beyond
the reference's scope; part of the training-data pack alongside
``operators/dedup.py``).

Scale shape: the benchmark corpus is small (eval sets are thousands of
documents, not billions), so its distinct shingle set is broadcast and
the whole pass is ONE map-side semi-join over the exploded training
shingles plus one groupBy(doc) — no shuffle of the corpus itself beyond
the per-doc aggregation, no driver-side collection. Shingling reuses the
split-once n-gram assembly from dedup (O(words), not O(words²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingled


def benchmark_ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination measurement → (doc, n_shingles,
    n_hit, overlap_frac).

    ``overlap_frac`` = |distinct doc n-grams ∩ benchmark n-grams| /
    |distinct doc n-grams|; docs shorter than ``n`` words produce no
    shingles, are absent from the result, and count as uncontaminated
    (``decontaminate`` keeps them). The benchmark side is reduced to its
    DISTINCT shingle set and broadcast: the join carries no benchmark
    doc identity on purpose (any hit is contamination, no matter which
    eval doc it came from).
    """
    bench_col = bench_text_col or text_col
    # synthetic per-row id: _shingled needs one, and the benchmark's own
    # ids (if any) are irrelevant — identity is dropped before the join
    bench = benchmark.select(F.col(bench_col).alias("_btext")).withColumn(
        "_bid", F.monotonically_increasing_id()
    )
    bench_shingles = (
        _shingled(bench, "_btext", "_bid", n)
        .select(F.explode("ngrams").alias("ngram"))
        .distinct()
    )
    doc_shingles = (
        _shingled(docs, text_col, id_col, n)
        .select("doc", F.explode(F.array_distinct("ngrams")).alias("ngram"))
    )
    hits = doc_shingles.join(
        F.broadcast(bench_shingles).withColumn("_hit", F.lit(1)),
        "ngram",
        "left",
    )
    return hits.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            / F.count(F.lit(1))
        ).alias("overlap_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_overlap: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents whose benchmark overlap exceeds ``max_overlap``
    (keep-side of the standard decontamination filter). Returns the
    surviving rows of ``docs`` unchanged."""
    scores = benchmark_ngram_overlap(docs, benchmark, n, text_col, id_col)
    contaminated = scores.filter(F.col("overlap_frac") > max_overlap).select(
        F.col("doc").alias(id_col)
    )
    return docs.join(contaminated, id_col, "left_anti")
