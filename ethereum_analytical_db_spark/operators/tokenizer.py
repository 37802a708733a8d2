"""Distributed BPE tokenizer training + encoding over a document corpus.

Beyond the reference's scope (it stores and serves chain data; see
SURVEY north-star additions) — part of the training-data pack alongside
``operators/dedup.py``: a large-scale pipeline that cleans 100 TB of
text usually also TRAINS the tokenizer on it, and the classic
byte-pair-encoding trainer (Sennrich et al. 2016) is a sequence of
corpus-wide aggregations — exactly Spark's shape.

Scale design (the part that matters at 100 TB):

- ``word_frequencies`` is the ONLY corpus-sized operation: one
  explode + groupBy(word) shuffle reduces the corpus to its distinct
  -word frequency table (vocabulary-sized — millions of rows, not
  billions). Everything after runs on that reduction; this is the same
  trick Sennrich's reference trainer uses in one process, expressed as
  one Spark aggregation.
- each training iteration is a pair-count aggregation over the
  vocabulary table (k·|V| work, one |pairs|-sized shuffle) plus a
  driver-side argmax of ONE row — the merge table itself is
  driver-sized by construction (``num_merges`` rows), so collecting
  the winning pair per round is not a driver-side loop over data.
- the per-iteration symbol-array rewrite is a pure JVM ``aggregate``
  fold (no Python in the loop); lineage is cut every iteration via
  ``operators/materialize.py`` (``local`` for speed, ``reliable`` for
  clusters where executor loss is routine — same knob as the
  connected-components loop in dedup).
- ``encode_bpe`` is embarrassingly parallel: Arrow-batched pandas with
  the rank table broadcast, memoized per distinct word within each
  batch (vocabulary ≪ corpus, so most words encode via a dict hit).

Semantics: merges never cross word boundaries (training operates on the
whitespace-split word-frequency table); no explicit end-of-word marker
is appended — the token stream is per-word, GPT-2-style rather than
original-paper ``</w>`` style. Deterministic tie-break everywhere:
(pair frequency DESC, left symbol ASC, right symbol ASC) — pinned by
the pure-Python parity test in tests/test_tokenizer.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import materialize as _materialize


def word_frequencies(
    docs: DataFrame, text_col: str = "text", split: str = " "
) -> DataFrame:
    """(word, freq): the corpus → vocabulary reduction — the one
    corpus-sized shuffle of the whole trainer. Empty tokens (leading /
    trailing / doubled separators) are dropped."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), split)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def char_symbols(word_col) -> F.Column:
    """Initial BPE state: the word as an array of single characters
    (pure Column — transform over 1..length, JVM-side). Empty strings
    yield an empty array — guarded explicitly because Spark's
    ``sequence(1, 0)`` counts DOWN to [1, 0] instead of being empty."""
    col = F.col(word_col) if isinstance(word_col, str) else word_col
    return F.when(
        F.length(col) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: col.substr(i, F.lit(1)),
        )
    )


def symbol_pair_counts(sym_wf: DataFrame, sym_col: str = "symbols") -> DataFrame:
    """(left_sym, right_sym, pair_freq) over a (symbols, freq) table:
    adjacent-pair extraction is a zip of the array against itself
    shifted by one (two ``slice`` calls — no posexplode double-scan, and
    safe on single-symbol words where ``slice`` with length 0 yields an
    empty array, unlike ``sequence(1, 0)`` which would count DOWN)."""
    sym = F.col(sym_col)
    sz = F.size(sym)
    pairs = F.zip_with(
        F.slice(sym, F.lit(1), sz - 1),
        F.slice(sym, F.lit(2), sz - 1),
        lambda a, b: F.struct(a.alias("left_sym"), b.alias("right_sym")),
    )
    return (
        sym_wf.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.left_sym").alias("left_sym"),
            F.col("p.right_sym").alias("right_sym"),
        )
        .agg(F.sum("freq").alias("pair_freq"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top_k: int | None = 100
) -> DataFrame:
    """First-iteration BPE statistics straight off a corpus: character
    -pair frequencies weighted by word frequency, deterministically
    ordered (freq DESC, left ASC, right ASC). This is the fully
    SQL-expressible face of the trainer — the registry's hash-checked
    entry point."""
    wf = word_frequencies(docs, text_col)
    counts = symbol_pair_counts(wf.withColumn("symbols", char_symbols("word")))
    out = counts.orderBy(
        F.col("pair_freq").desc(),
        F.col("left_sym").asc(),
        F.col("right_sym").asc(),
    )
    return out.limit(top_k) if top_k else out


def apply_merge(sym_col, left: str, right: str) -> F.Column:
    """One BPE merge pass over a symbol array, as a pure JVM
    ``aggregate`` fold: left-to-right, non-overlapping (after merging
    [.., left+right], the merged token is the new tail, so an
    overlapping occurrence — e.g. merge (a,a) on [a,a,a] — correctly
    yields [aa, a])."""
    sym = F.col(sym_col) if isinstance(sym_col, str) else sym_col
    merged = left + right

    def step(acc, s):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def train_bpe(
    docs: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    min_freq: int = 2,
    materialize: str = "local",
) -> list[tuple[str, str, int]]:
    """Greedy BPE training: ``num_merges`` rounds of (count pairs →
    argmax → rewrite symbols). Returns the learned merge table as
    [(left, right, pair_freq)] in rank order — driver-sized by
    construction. Stops early when the best remaining pair's frequency
    drops below ``min_freq`` (merging hapax pairs memorizes the corpus).

    Each round is ONE Spark job: the lineage cut is lazy
    (``eager=False``), so the round's argmax action realizes the
    previous round's checkpoint and computes the pair-count top-1 in a
    single pass over the vocabulary-sized symbol table. The corpus
    itself is touched exactly once, in ``word_frequencies``."""
    wf = _materialize(
        word_frequencies(docs, text_col).withColumn(
            "symbols", char_symbols("word")
        ),
        materialize,
        eager=False,
    )
    # right-size the loop's parallelism to the VOCABULARY (the corpus
    # shuffle above inherited spark.sql.shuffle.partitions — 31 distinct
    # words across 32 tasks would pay 16 rounds of empty-task scheduling;
    # a billion-word corpus with a 10M-word vocabulary gets ~150). The
    # count also realizes the lazy checkpoint, so the coalesce below is
    # a narrow op over pinned blocks.
    n_vocab = wf.count()
    parts = max(
        1,
        min(
            docs.sparkSession.sparkContext.defaultParallelism,
            -(-n_vocab // 65536),
        ),
    )
    if wf.rdd.getNumPartitions() > parts:
        wf = wf.coalesce(parts)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            symbol_pair_counts(wf)
            .orderBy(
                F.col("pair_freq").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_freq"] < min_freq:
            break
        left, right, freq = (
            top[0]["left_sym"],
            top[0]["right_sym"],
            int(top[0]["pair_freq"]),
        )
        merges.append((left, right, freq))
        wf = _materialize(
            wf.withColumn("symbols", apply_merge("symbols", left, right)),
            materialize,
            eager=False,
        )
    return merges


def bpe_vocabulary(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """The token vocabulary the learned tokenizer can emit: the corpus's
    distinct characters (every unmerged symbol is reachable) plus one
    token per merge. One small distinct over the vocabulary-sized word
    table; the merge side is driver-sized by construction."""
    spark = docs.sparkSession
    chars = (
        word_frequencies(docs, text_col)
        .select(F.explode(char_symbols("word")).alias("token"))
        .distinct()
        .withColumn("source", F.lit("char"))
    )
    merged = spark.createDataFrame(
        [(l + r, "merge") for l, r, _ in merges], "token string, source string"
    )
    return chars.unionByName(merged)


def merge_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a DataFrame (rank, left_sym, right_sym,
    pair_freq) — the artifact a pipeline persists next to its corpus."""
    return spark.createDataFrame(
        [(i, l, r, f) for i, (l, r, f) in enumerate(merges)],
        "rank int, left_sym string, right_sym string, pair_freq bigint",
    )


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table to a corpus → (id, tokens,
    n_tokens). Arrow-batched pandas with the rank dict broadcast;
    encoding is memoized per distinct word within each batch (the
    vocabulary is far smaller than the corpus, so almost every word is
    a dict hit). The per-word greedy loop (always merge the
    lowest-rank adjacent pair first) matches training replay exactly —
    pinned by the round-trip test."""
    import pandas as pd

    sc = docs.sparkSession.sparkContext
    ranks_bc = sc.broadcast({(l, r): i for i, (l, r, _) in enumerate(merges)})

    src = docs.select(F.col(id_col), F.col(text_col))
    id_type = src.schema[id_col].dataType.simpleString()

    def encode_word(word: str, ranks) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                rank = ranks.get((syms[i], syms[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best, best_rank = i, rank
            if best is None:
                break
            # merge ALL occurrences of the winning pair, left-to-right
            pair = (syms[best], syms[best + 1])
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and (syms[i], syms[i + 1]) == pair
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def run(batches):
        ranks = ranks_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            memo: dict[str, list[str]] = {}

            def enc_text(text) -> list[str]:
                # NULL text tolerated as empty, matching the training
                # side (word_frequencies drops it via split(NULL)→NULL)
                if not isinstance(text, str):
                    return []
                toks: list[str] = []
                for w in text.split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = encode_word(w, ranks)
                    toks.extend(got)
                return toks

            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [enc_text(t) for t in pdf[text_col]],
                }
            )
            out["n_tokens"] = [len(t) for t in out[out_col]]
            yield out

    return src.mapInPandas(
        run,
        schema=f"`{id_col}` {id_type}, `{out_col}` array<string>, n_tokens int",
    )
