"""End-to-end corpus cleaning: the training-data pipeline's standard
stage chain composed from this package's operators, in the order the
large-scale pipelines run them (dedup before expensive scoring; model-
based filters after cheap heuristics; decontamination and PII last so
they see only surviving text; balance/split at the very end).

    exact dedup → [semantic (embedding) dedup] →
    [exact-substring span dedup] → within-doc line dedup →
    heuristic quality filter → language filter → LM perplexity filter →
    benchmark decontamination → PII scrub → stratified balance →
    train/valid/test split

Every stage is a narrow transform or an already-scale-audited operator;
the composite adds no new shuffle beyond its parts. Stage-by-stage
surviving-row counts are returned so a pipeline run is auditable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_duplicates, exact_substring_dedup
from .decontam import decontaminate
from .lm import perplexity_filter, score_perplexity, train_unigram_lm
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
    """``df`` is the cleaned corpus (original columns + ``lang`` +
    ``split``). In stats mode it is left cached (it was just fully
    materialized for the final count); ``cached_intermediates`` lists
    any parent frames the chain had to cache (the LM stage's input in
    lazy mode). Call :meth:`release` when done reading the result in a
    long-lived session."""

    df: DataFrame
    stages: list[tuple[str, int]]  # (stage name, rows surviving) in order
    cached_intermediates: list[DataFrame]
    models: list = field(default_factory=list)  # trained LMs (cached tables)
    # stats mode only: wall seconds per stage, boundary-to-boundary —
    # stage N spans from stage N-1's count returning to N's count
    # returning, so eager work BETWEEN marks (the LM trainer's
    # aggregations) is attributed to the stage that ran it. Empty in
    # lazy mode (nothing is materialized per stage there).
    stage_secs: list[tuple[str, float]] = field(default_factory=list)

    def release(self) -> None:
        """Unpersist everything this run cached (the result frame, any
        cached parents, and any LM model tables trained by the chain)."""
        self.df.unpersist()
        for df in self.cached_intermediates:
            df.unpersist()
        for m in self.models:
            m.release()


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    substring_dedup_k: int | None = None,
    embeddings: DataFrame | None = None,
    semantic_threshold: float | None = None,
    semantic_centroids: int = 16,
    benchmark_embeddings: DataFrame | None = None,
    semantic_decontam_threshold: float | None = None,
    embedding_id_col: str = "vec_id",
    embedding_vec_col: str = "embedding",
    min_tokens: int = 5,
    max_repetition: float = 0.6,
    langs: list[str] | None = None,
    max_perplexity: float | None = None,
    lm_vocab_size: int = 20_000,
    strata_fractions: dict[str, float] | None = None,
    balance_default_fraction: float = 1.0,
    split_fractions: dict[str, float] | None = None,
    collect_stats: bool = True,
) -> CleanCorpusReport:
    """Run the standard cleaning chain; every knob optional.

    Precondition: ``id_col`` values are unique (the dedup semi-join and
    the hash split both key on them). Validated in stats mode (one extra
    aggregate); trusted in lazy mode.

    - ``substring_dedup_k``: corpus-wide exact-substring dedup
      (keep-first removal of duplicated k-word spans) right after the
      whole-doc dedup, on the original text — before line dedup and
      scoring so downstream stages never see the repeated spans
      (skipped when None). Spans removed, not docs: row count is
      unchanged, so the stage's audit line is informational.
    - ``embeddings`` + ``semantic_threshold``: SemDeDup semantic dedup
      (operators/semdedup.py) right after the exact dedup — drop docs
      whose embedding is near-duplicate of a kept one, judged only over
      the embeddings of SURVIVING docs (``embedding_id_col`` must carry
      the same ids as ``id_col``). Docs without an embedding row pass
      through unjudged (can't score what wasn't embedded — documented,
      not silent: the stage's audit line shows what it saw). Skipped
      when both are None; ONE without the other raises (a silent skip
      would ship near-duplicates with no signal).
    - ``benchmark``: eval-set rows with ``text_col`` → 8-gram
      decontamination (skipped when None).
    - ``benchmark_embeddings`` + ``semantic_decontam_threshold`` (r15):
      semantic decontamination right after the 8-gram pass — drop docs
      whose embedding's max cosine against the benchmark embeddings
      reaches the threshold (paraphrased eval leakage has no shingle
      overlap; see operators/decontam.benchmark_embedding_similarity).
      Scores only embeddings of SURVIVING docs; docs without an
      embedding row pass unjudged (the textual pass above still covers
      them). Requires ``embeddings``; one knob without the other
      raises, as does ``embeddings`` with NEITHER semantic stage named.
    - ``langs``: whitelist for the heuristic language ID (skipped when
      None); the predicted language is kept as a ``lang`` column either
      way (it is also the stratification key).
    - ``max_perplexity``: absolute cap under a unigram LM trained on the
      corpus that SURVIVED the earlier stages (skipped when None) — the
      CCNet ordering: cheap filters first so the model never trains on
      obvious junk. LM training is eager (it must see the data to
      produce a model), so this stage materializes its input even in
      lazy mode; the input is cached around it to avoid re-computing
      the prefix for training, scoring, and the keep-join.
    - ``strata_fractions``: per-language keep rates for corpus
      balancing (skipped when None). Unlisted languages keep
      ``balance_default_fraction`` (default 1.0: pass through — the
      composite balances what you name and leaves the rest; pass 0.0
      for ``stratified_sample``'s own drop-unknown behavior).

    Caching: in stats mode each stage is cached just long enough to be
    counted and feed its successor (peak two stages resident, released
    in a ``finally`` even when a stage fails); the final frame and any
    parent the returned plan still needs stay cached until
    ``report.release()``. The caller's ``docs`` is never cached or
    unpersisted — its persistence level stays whatever the caller chose.
    """
    stages: list[tuple[str, int]] = []
    stage_secs: list[tuple[str, float]] = []
    prev_cached: list[DataFrame] = []  # at most one entry: stage N-1
    lazy_cached: list[DataFrame] = []  # lazy-mode LM prefix, if any
    models: list = []  # LMs trained by the chain (hold cached tables)
    ok = False
    last_t = [time.perf_counter()]  # previous stage boundary (stats mode)

    # the mirror misconfigurations: one knob without its pair would
    # silently disable a stage (same bug class as SyncPipeline's
    # compact_tables-without-compact_every). Checked BEFORE any stage
    # executes — r12 advisor find: raising after the input and
    # exact-dedup counts had already run charged two corpus-sized Spark
    # actions for a config error. `embeddings` now serves TWO stages
    # (SemDeDup and semantic decontamination, r15): it is required by
    # either threshold and must not be passed with neither.
    if semantic_threshold is not None and embeddings is None:
        raise ValueError(
            "semantic dedup needs BOTH embeddings and semantic_threshold "
            "— got only semantic_threshold"
        )
    if (
        embeddings is not None
        and semantic_threshold is None
        and semantic_decontam_threshold is None
    ):
        raise ValueError(
            "embeddings were passed but neither semantic_threshold "
            "(SemDeDup) nor semantic_decontam_threshold (benchmark "
            "decontamination) names a stage to use them"
        )
    if (benchmark_embeddings is None) != (semantic_decontam_threshold is None):
        raise ValueError(
            "semantic decontamination needs BOTH benchmark_embeddings and "
            "semantic_decontam_threshold — got only "
            + (
                "benchmark_embeddings"
                if benchmark_embeddings is not None
                else "semantic_decontam_threshold"
            )
        )
    if benchmark_embeddings is not None and embeddings is None:
        raise ValueError(
            "semantic decontamination scores the corpus's OWN embeddings — "
            "pass `embeddings` alongside benchmark_embeddings"
        )

    def mark(name: str, df: DataFrame, cache: bool = True) -> DataFrame:
        if collect_stats:
            # cache stage N, count it (materializing from N-1's cache),
            # then release N-1 — counting stays linear in chain length
            # with at most two stages resident. Register the cache entry
            # BEFORE counting: if the count itself fails (executor OOM,
            # corrupt partition) the finally block must still release
            # the just-cached frame, not only stage N-1.
            if cache:
                df = df.cache()
                prev_cached.append(df)
            stages.append((name, df.count()))
            now = time.perf_counter()
            stage_secs.append((name, round(now - last_t[0], 3)))
            last_t[0] = now
            if len(prev_cached) > 1:
                prev_cached.pop(0).unpersist()
        return df

    try:
        # never cache/unpersist the caller's own frame (it may carry the
        # caller's persistence level); count it directly
        cur = mark("input", docs, cache=False)
        if collect_stats:
            n_ids = docs.select(id_col).distinct().count()
            if n_ids != stages[0][1]:
                raise ValueError(
                    f"{id_col} must be unique: {stages[0][1]} rows but "
                    f"{n_ids} distinct ids"
                )

        canon = exact_duplicates(cur, text_col, id_col).select(
            F.col("canonical_id").alias(id_col)
        )
        cur = mark("exact_dedup", cur.join(canon, id_col, "left_semi"))

        if embeddings is not None and semantic_threshold is not None:
            from .semdedup import semantic_dedup as _semantic_dedup

            # judge only embeddings of docs that survived so far; the
            # semi-join keys embeddings by the doc id they describe
            emb_surv = embeddings.join(
                cur.select(F.col(id_col).alias(embedding_id_col)),
                embedding_id_col,
                "left_semi",
            )
            dropped = (
                _semantic_dedup(
                    emb_surv,
                    threshold=semantic_threshold,
                    n_centroids=semantic_centroids,
                    id_col=embedding_id_col,
                    vec_col=embedding_vec_col,
                )
                .filter(~F.col("kept"))
                .select(F.col(embedding_id_col).alias(id_col))
            )
            cur = mark("semantic_dedup", cur.join(dropped, id_col, "left_anti"))

        if substring_dedup_k is not None:
            deduped = exact_substring_dedup(
                cur, k=substring_dedup_k, text_col=text_col, id_col=id_col
            )
            cur = mark(
                "substring_dedup",
                deduped.withColumn(text_col, F.col("text_clean")).drop(
                    "text_clean", "tokens_removed"
                ),
            )

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

        # an input that already carries a `lang` column is trusted as
        # ground truth (the heuristic predictor is strictly weaker than
        # real labels — round-5 advice); the predictor only fills the
        # column when absent. Either way `lang` drives the language
        # filter AND the stratified-balance key below.
        if "lang" not in cur.columns:
            # pass the NAME: predicted_lang memoizes the ~51 ms
            # expression tree per column name (r17, guide §7.3)
            cur = cur.withColumn("lang", predicted_lang(text_col))
        if langs is not None:
            cur = mark("lang_filter", cur.filter(F.col("lang").isin(langs)))

        decontam_score_src: DataFrame | None = None
        if max_perplexity is not None:
            # the LM trainer runs actions; cache the surviving prefix so
            # training, scoring, and the keep-join share one
            # materialization (in stats mode cur is already cached). The
            # lazy-mode cache must outlive this call — the returned plan
            # still references it — so it is handed to the caller via
            # CleanCorpusReport.cached_intermediates.
            if not collect_stats:
                cur = cur.cache()
                lazy_cached.append(cur)
                # the decontamination stage below scores its overlap on
                # THIS cached frame (a superset of its post-keep-join
                # input with identical text — perplexity only drops
                # rows): the anti-join otherwise references its input
                # twice and a lazy plan re-executes the scorer +
                # keep-join once per reference (guide §7.2; see
                # decontaminate's score_docs contract). Stats mode needs
                # none of this — there every stage is counted off its
                # predecessor's cache, and mark() releases this frame
                # before the decontamination stage would read it.
                decontam_score_src = cur
            lm = train_unigram_lm(cur, text_col, vocab_size=lm_vocab_size)
            models.append(lm)
            scores = score_perplexity(cur, lm, text_col, id_col).filter(
                perplexity_filter(max_perplexity)
            )
            cur = mark(
                "perplexity_filter",
                cur.join(scores.select(id_col), id_col, "left_semi"),
            )

        if benchmark is not None:
            cur = mark(
                "decontaminate",
                decontaminate(
                    cur,
                    benchmark,
                    text_col=text_col,
                    id_col=id_col,
                    score_docs=decontam_score_src,
                ),
            )

        if benchmark_embeddings is not None:
            from .decontam import benchmark_embedding_similarity

            # same survivors-only + unjudged-pass-through contract as
            # semantic_dedup above: score only embeddings of docs still
            # in the corpus; docs without an embedding row can't be
            # judged here (the 8-gram stage above still covers them
            # textually)
            emb_surv = embeddings.join(
                cur.select(F.col(id_col).alias(embedding_id_col)),
                embedding_id_col,
                "left_semi",
            )
            contaminated = (
                benchmark_embedding_similarity(
                    emb_surv,
                    benchmark_embeddings,
                    id_col=embedding_id_col,
                    vec_col=embedding_vec_col,
                )
                .filter(
                    F.col("max_benchmark_cosine")
                    >= semantic_decontam_threshold
                )
                .select(F.col("id").alias(id_col))
            )
            cur = mark(
                "decontaminate_semantic",
                cur.join(contaminated, id_col, "left_anti"),
            )

        cur = mark(
            "pii_scrub", cur.withColumn(text_col, pii_scrub(F.col(text_col)))
        )

        if strata_fractions is not None:
            cur = mark(
                "balance",
                stratified_sample(
                    cur,
                    "lang",
                    strata_fractions,
                    id_col,
                    default_fraction=balance_default_fraction,
                ),
            )

        cur = mark("split", hash_split(cur, id_col, split_fractions))
        if collect_stats and prev_cached and prev_cached[-1] is cur:
            # keep the final frame cached for the caller (see
            # CleanCorpusReport); it is no longer "previous"
            prev_cached.pop()
        ok = True
        return CleanCorpusReport(
            df=cur,
            stages=stages,
            cached_intermediates=list(lazy_cached),
            models=list(models),
            stage_secs=stage_secs,
        )
    finally:
        # release whatever was resident when we left the chain mid-way;
        # on success the lazy LM prefix + model tables stay cached (the
        # returned plan references them) and are released via
        # report.release()
        for df in prev_cached:
            df.unpersist()
        if not ok:
            for df in lazy_cached:
                df.unpersist()
            for m in models:
                m.release()
