"""DSIR — Data Selection via Importance Resampling (training-data
pipeline pack; method from Xie et al. 2023, arXiv:2302.03169).

Given a large RAW corpus and a small TARGET corpus exemplifying the
distribution you want more of (a domain sample, a quality slice), score
every raw document by how much more likely its hashed-n-gram features
are under the target distribution than under the raw distribution, then
resample the raw corpus proportionally:

    log w(doc) = Σ_b count_b(doc) · (log p_target[b] − log p_raw[b])

with features = unigrams + word bigrams hashed into ``n_buckets``
buckets (the paper's 10k default) and add-α smoothed bucket
probabilities. Selection is deterministic Gumbel top-k over
``log w + Gumbel(id)`` — exactly proportional-without-replacement
sampling in expectation, reproducible run-to-run because the Gumbel
noise derives from a salted md5 of the document id (the module-wide
engine-parity convention in ``operators/sampling.py``), never from a
partition-dependent RNG.

Scale design — every step is the bounded-model broadcast shape this
pack uses everywhere (``operators/lm.py``):

- feature extraction is one explode over words + bigrams with a JVM
  ``xxhash64 % n_buckets`` bucket key — narrow, no UDF;
- each model is ONE groupBy(bucket) aggregation truncated at
  ``n_buckets`` rows (10k) no matter the corpus size, then broadcast;
- weighting is explode → broadcast join → per-doc sum: no shuffle of
  the corpus beyond the doc-keyed aggregate;
- top-k lands on ``TakeOrderedAndProject`` (no full sort at the
  driver); k rows come back, the corpus never does.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize as _materialize
from .text import words

DEFAULT_BUCKETS = 10_000


def hashed_ngram_buckets(
    text: Column | str, n_buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Per-document feature multiset: unigram + word-bigram strings
    hashed into ``n_buckets`` buckets (array<int>, one entry per n-gram
    occurrence — counts are carried by repetition, exactly what the
    importance sum needs). Empty tokens from doubled separators are
    dropped; a doc with no tokens yields an empty array."""
    ws = F.filter(words(text), lambda w: w != "")
    bigrams = F.zip_with(
        F.slice(ws, F.lit(1), F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, F.lit(2), F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(ws, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets)).cast("int"),
    )


def fit_hashed_ngram_counts(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Bag-of-hashed-ngrams observation counts → (bucket, cnt), bounded
    at ``n_buckets`` rows regardless of corpus size. Probabilities are
    derived downstream IN-PLAN (add-α over the window-summed total —
    the count table is bounded, so a whole-frame window is a bounded
    single-partition pass, not a corpus shuffle); keeping the fit lazy
    means model building adds no eager driver actions to the weighting
    plan."""
    return (
        docs.select(
            F.explode(hashed_ngram_buckets(F.col(text_col), n_buckets)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    _carry_cols: tuple[str, ...] = (),
    target_pred: Column | None = None,
    materialize: str = "local",
) -> DataFrame:
    """Per raw document → (id, n_features, log_weight): the DSIR
    importance score under hashed-n-gram models fit on ``target_docs``
    and ``raw_docs`` themselves. Docs with zero features get
    log_weight 0 (no evidence either way — rank purely by noise in the
    resample, neither privileged nor excluded).

    ``_carry_cols`` (internal, for :func:`dsir_select_per_domain`):
    per-doc constant columns carried through the feature stream and the
    final aggregate, so a caller needing them does not re-join (and so
    re-scan) the raw corpus. They ride the grouping key; since each is
    functionally dependent on ``id_col``, the groups — and therefore
    every aggregate — are unchanged.

    ``target_pred``: when the target corpus is a SLICE of one source
    frame (the common "hold out every Nth / this domain sample" setup),
    pass the source as ``raw_docs``, ``None`` for ``target_docs`` and
    the slice predicate here. Rows matching the predicate form the
    target model; the rest are the raw corpus (model + scored docs) —
    identical counts, weights and output rows to calling the two-frame
    form with the two filtered slices, but BOTH models come from ONE
    tokenize pass and ONE aggregation over a single materialized
    feature stream instead of two scans + two shuffles (guide §2.4; at
    100 TB this halves the corpus passes of the fit). Rows where the
    predicate is NULL belong to neither side, exactly like rows absent
    from both input frames.

    ``materialize``: how the shared (id, bucket) feature stream is
    pinned — ``local`` | ``reliable`` (operators/materialize.py), the
    same knob every other multi-consumer operator exposes. The stream
    is O(total n-gram occurrences) — corpus-scale — so on a large
    cluster where executor loss is routine, pass ``reliable`` to give
    it a recompute path instead of failing the whole job on one lost
    executor."""
    if (target_docs is None) == (target_pred is None):
        raise ValueError(
            "pass exactly one of target_docs (two-frame form) or "
            "target_pred (fused single-source form)"
        )
    # r16: the raw corpus's features feed BOTH the raw model fit and the
    # per-doc weighting below; materializing the exploded (id, bucket)
    # stream once (narrow: a long + an int per n-gram occurrence) means
    # the tokenize + bigram-assembly + xxhash pipeline — the expensive
    # part — runs ONE pass over the raw corpus instead of two
    # (guide §2.4 shared computation; exact same rows either way).
    # In the fused form the stream covers the whole source with a
    # per-row target flag, so the target fit shares the same single pass.
    flag = [] if target_pred is None else [target_pred.alias("__is_target")]
    feats = _materialize(
        raw_docs.select(
            F.col(id_col),
            *[F.col(c) for c in _carry_cols],
            *flag,
            F.explode_outer(
                hashed_ngram_buckets(F.col(text_col), n_buckets)
            ).alias("bucket"),
        ),
        materialize,
        eager=False,
    )
    cnt_t = F.coalesce(F.col("cnt_t"), F.lit(0))
    cnt_r = F.coalesce(F.col("cnt_r"), F.lit(0))
    if target_pred is None:
        tc = fit_hashed_ngram_counts(target_docs, text_col, n_buckets)
        # identical to fit_hashed_ngram_counts(raw_docs): explode vs
        # explode_outer differ only in the NULL placeholder rows for
        # feature-less docs, which the isNotNull drops
        rc = (
            feats.filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # the joined per-bucket count table: buckets absent from one
        # side smooth to α counts via the coalesce; every raw-doc
        # bucket is present on the raw side by construction (the raw
        # model is fit on these very docs), so the full join covers
        # every bucket the weighting pass can meet.
        counts = tc.withColumnRenamed("cnt", "cnt_t").join(
            rc.withColumnRenamed("cnt", "cnt_r"), "bucket", "full"
        )
    else:
        # fused: ONE aggregation over the shared feature stream yields
        # both models' counts — a target-row occurrence counts toward
        # cnt_t, a raw-row one toward cnt_r (a NULL flag toward
        # neither), so each column equals the corresponding slice's
        # fit_hashed_ngram_counts exactly, union of buckets included
        counts = (
            feats.filter(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.when(F.col("__is_target"), F.lit(1)).otherwise(F.lit(0))
                ).alias("cnt_t"),
                F.sum(
                    F.when(~F.col("__is_target"), F.lit(1)).otherwise(F.lit(0))
                ).alias("cnt_r"),
            )
        )
        feats = feats.filter(F.col("__is_target") == F.lit(False)).drop(
            "__is_target"
        )
    # one broadcast table of per-bucket log ratios, fully lazy: the
    # smoothing denominators are whole-frame window sums over the
    # BOUNDED (≤ n_buckets rows) count table — a one-partition
    # pass over ≤10k rows, never a corpus shuffle and never an eager
    # driver action.
    whole = Window.partitionBy()
    ab = F.lit(alpha * n_buckets)
    ratios = counts.select(
        "bucket",
        (
            F.log((cnt_t + F.lit(alpha)) / (F.sum(cnt_t).over(whole) + ab))
            - F.log((cnt_r + F.lit(alpha)) / (F.sum(cnt_r).over(whole) + ab))
        ).alias("log_ratio"),
    )
    # per-feature contribution: a NULL bucket row is explode_outer's
    # empty-doc placeholder and contributes 0; a real bucket always
    # hits the ratios table (see above), the coalesce is belt-and-braces
    contrib = F.when(F.col("bucket").isNull(), F.lit(0.0)).otherwise(
        F.coalesce(F.col("log_ratio"), F.lit(0.0))
    )
    return (
        feats.join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col, *_carry_cols)
        .agg(
            F.count(F.col("bucket")).alias("n_features"),
            F.coalesce(F.sum(contrib), F.lit(0.0)).alias("log_weight"),
        )
    )


def _gumbel_noise(id_col: Column, salt: str) -> Column:
    """Deterministic standard Gumbel draw per id: u from the first 13
    hex digits of md5(id||salt) (52 bits — exact in a double, never 0
    or 1 thanks to the +0.5 offset), g = -log(-log(u)). Same inputs →
    same noise on any engine/partitioning — the module-wide md5
    convention, applied to Gumbel top-k."""
    u = (
        F.conv(F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 13), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**13))
    return -F.log(-F.log(u))


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame | None,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    salt: str = "dsir",
    target_pred: Column | None = None,
    materialize: str = "local",
) -> DataFrame:
    """Gumbel top-k importance resampling: the k raw documents with the
    highest ``log_weight + Gumbel(md5(id))`` — a without-replacement
    sample proportional to the importance weights (the Gumbel-max
    trick), deterministic in (corpus, target, k, salt). Returns
    (id, n_features, log_weight, gumbel_key) for the selected docs;
    join back on ``id_col`` for the text. Ties on the key (measure-zero
    with real weights) break on id for full determinism.
    ``target_pred`` and ``materialize``: forwarded to
    :func:`dsir_log_weights`."""
    scored = dsir_log_weights(
        raw_docs, target_docs, text_col, id_col, n_buckets, alpha,
        target_pred=target_pred, materialize=materialize,
    )
    keyed = scored.withColumn(
        "gumbel_key", F.col("log_weight") + _gumbel_noise(F.col(id_col), salt)
    )
    return keyed.orderBy(
        F.col("gumbel_key").desc(), F.col(id_col).asc()
    ).limit(k)


def dsir_select_per_domain(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k_per_domain: int,
    domain_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Stratified variant: top-k within each domain partition (window
    rank over the same deterministic key) — the shape for balanced
    per-source selection budgets. One shuffle on ``domain_col``.

    ``domain_col`` rides the weighting pass's own feature stream
    (``_carry_cols``) instead of being re-joined from ``raw_docs`` —
    one less corpus scan and one less shuffle join (r16; the domain is
    constant per doc, so the weighting groups and every aggregate are
    identical to the joined form)."""
    salt = kwargs.pop("salt", "dsir")
    scored = dsir_log_weights(
        raw_docs, target_docs, text_col, id_col,
        _carry_cols=(domain_col,), **kwargs
    )  # kwargs may carry target_pred (fused single-source form) and
    # materialize (local | reliable) for dsir_log_weights
    keyed = scored.select(
        id_col, "n_features", "log_weight", domain_col
    ).withColumn(
        "gumbel_key",
        F.col("log_weight") + _gumbel_noise(F.col(id_col), salt),
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.col("gumbel_key").desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k_per_domain)
        .drop("rk")
    )
