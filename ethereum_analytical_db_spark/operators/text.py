"""Text-analysis operators for large-scale training-data pipelines:
tokenization stats, quality signals, language-ID heuristic, document
fingerprinting. All pure Column expressions (JVM-side, codegen) — no
Python in the hot path, so they scale linearly with input splits.

Tokenization is a single-space split throughout: deterministic, locale
independent, and reproducible in any ANSI engine (the DuckDB oracle
mirrors it with string_split).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic marker vocabularies for the language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "value", "row"],
    "de": ["der", "und", "nicht", "table"],
    "fr": ["le", "et", "pas", "join"],
    "es": ["el", "que", "los", "query"],
    "zh": ["de5", "shi4", "bu4", "merge"],
}


def words(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(text)).cast("long")


def stopword_count(text: Column | str, stopwords: list[str]) -> Column:
    ws = words(text)
    return F.size(F.filter(ws, lambda w: w.isin(stopwords))).cast("long")


def stopword_ratio(text: Column | str, stopwords: list[str]) -> Column:
    return stopword_count(text, stopwords).cast("double") / token_count(text).cast(
        "double"
    )


def non_alpha_chars(text: Column | str) -> Column:
    """Count of characters outside [a-z0-9 ] — a punctuation/noise signal."""
    text = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(text, "[a-z0-9 ]", "")).cast("long")


def mean_word_length(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    n = token_count(text)
    # total chars minus separators, over word count
    return (F.length(text) - (n - F.lit(1))).cast("double") / n.cast("double")


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-word hit count per language (n-gram heuristic simplified to
    unigram markers — the structure generalizes to char n-grams)."""
    return {lang: stopword_count(text, ms) for lang, ms in LANG_MARKERS.items()}


def predicted_lang(text: Column | str) -> Column:
    """argmax of lang_scores with deterministic tie-break by language
    order en > de > fr > es > zh (ties fall to the earlier language)."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS.keys())
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def bag_of_words_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    word set. Detects shuffled/duplicated-content docs."""
    ws = F.array_sort(F.array_distinct(words(text)))
    return F.md5(F.array_join(ws, " "))


def content_fingerprint(text: Column | str) -> Column:
    """Exact content fingerprint (normalized-case md5)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(text))


def ngrams_expr(text_col: str, n: int = 3) -> Column:
    """Distinct word n-grams from a named text column.

    Guarded for docs shorter than n words: Spark's sequence(0, -1) would
    *descend* and the out-of-bounds array index would throw under ANSI
    mode, so short docs yield an empty array instead.
    """
    parts = " , ".join(f"split({text_col}, ' ')[i + {k}]" for k in range(n))
    return F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) >= {n} THEN "
        f"array_distinct(transform("
        f"sequence(0, size(split({text_col}, ' ')) - {n}), "
        f"i -> concat_ws(' ', {parts})))"
        f" ELSE array() END"
    )
