"""End-to-end corpus cleaning: the training-data pipeline's standard
stage chain composed from this package's operators, in the order the
large-scale pipelines run them (dedup before expensive scoring; model-
based filters after cheap heuristics; decontamination and PII last so
they see only surviving text; balance/split at the very end).

    exact dedup → within-doc line dedup → heuristic quality filter →
    language filter → LM perplexity filter → benchmark decontamination →
    PII scrub → stratified balance → train/valid/test split

Every stage is a narrow transform or an already-scale-audited operator;
the composite adds no new shuffle beyond its parts. Stage-by-stage
surviving-row counts are returned so a pipeline run is auditable (the
counts force one action per stage — pass ``collect_stats=False`` to get
a single fused lazy plan instead, the production mode).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_duplicates
from .decontam import decontaminate
from .lm import score_perplexity, train_unigram_lm
from .sampling import hash_split, stratified_sample
from .text import (
    pii_scrub,
    predicted_lang,
    remove_duplicate_lines,
    repetition_ratio,
    token_count,
)


@dataclass
class CleanCorpusReport:
    df: DataFrame  # cleaned corpus: original columns + lang + split
    stages: list[tuple[str, int]]  # (stage name, rows surviving) in order


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_repetition: float = 0.6,
    langs: list[str] | None = None,
    max_perplexity: float | None = None,
    lm_vocab_size: int = 20_000,
    strata_fractions: dict[str, float] | None = None,
    split_fractions: dict[str, float] | None = None,
    collect_stats: bool = True,
) -> CleanCorpusReport:
    """Run the standard cleaning chain; every knob optional.

    - ``benchmark``: eval-set rows with ``text_col`` → 8-gram
      decontamination (skipped when None).
    - ``langs``: whitelist for the heuristic language ID (skipped when
      None); the predicted language is kept as a ``lang`` column either
      way (it is also the stratification key).
    - ``max_perplexity``: absolute cap under a unigram LM trained on the
      corpus that SURVIVED the earlier stages (skipped when None) — the
      CCNet ordering: cheap filters first so the model never trains on
      obvious junk.
    - ``strata_fractions``: per-language keep rates for corpus
      balancing (skipped when None).
    """
    stages: list[tuple[str, int]] = []
    cached: list[DataFrame] = []

    def mark(name: str, df: DataFrame) -> DataFrame:
        if collect_stats:
            # cache each stage so counting stage N reads stage N-1's
            # materialization instead of recomputing the whole prefix
            # (quadratic otherwise); intermediates are released below
            df = df.cache()
            stages.append((name, df.count()))
            cached.append(df)
        return df

    cur = mark("input", docs)

    canon = exact_duplicates(cur, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    cur = mark("exact_dedup", cur.join(canon, id_col, "left_semi"))

    cur = mark(
        "line_dedup",
        cur.withColumn(text_col, remove_duplicate_lines(F.col(text_col))),
    )

    cur = mark(
        "quality_filter",
        cur.filter(
            (token_count(F.col(text_col)) >= min_tokens)
            & (repetition_ratio(F.col(text_col)) <= max_repetition)
        ),
    )

    cur = cur.withColumn("lang", predicted_lang(F.col(text_col)))
    if langs is not None:
        cur = mark("lang_filter", cur.filter(F.col("lang").isin(langs)))

    if max_perplexity is not None:
        lm = train_unigram_lm(cur, text_col, vocab_size=lm_vocab_size)
        scores = score_perplexity(cur, lm, text_col, id_col).filter(
            F.col("perplexity").isNotNull()
            & (F.col("perplexity") <= max_perplexity)
        )
        cur = mark(
            "perplexity_filter",
            cur.join(scores.select(id_col), id_col, "left_semi"),
        )

    if benchmark is not None:
        cur = mark(
            "decontaminate",
            decontaminate(cur, benchmark, text_col=text_col, id_col=id_col),
        )

    cur = mark("pii_scrub", cur.withColumn(text_col, pii_scrub(F.col(text_col))))

    if strata_fractions is not None:
        cur = mark(
            "balance",
            stratified_sample(
                cur, "lang", strata_fractions, id_col, default_fraction=1.0
            ),
        )

    cur = mark("split", hash_split(cur, id_col, split_fractions))
    # the final frame is cached+counted; its parents can be released
    for df in cached[:-1]:
        df.unpersist()
    return CleanCorpusReport(df=cur, stages=stages)
