"""Deduplication operators for training-data pipelines (SURVEY north-star
additions): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- exact dedup: one hash-groupBy on a 128-bit content digest — the only
  full shuffle, keyed uniformly (md5), so no skew;
- n-gram Jaccard: explode distinct shingles → self-join on shingle →
  pair-count aggregation. The shingle join is the classic inverted-index
  approach: cost ~ sum over shingles of df(s)^2, NOT n^2 over documents.
  Hot shingles are capped (``max_shingle_df``) exactly like real systems
  drop stop-shingles, bounding worst-case skew;
- MinHash+LSH: per-doc signature of K minima (xxhash64 with K seeds,
  all JVM-side), banded into B buckets; candidate pairs only join within
  a (band, bucket-hash) key → shuffle is O(docs×B), never O(n²);
- SimHash: 64-bit signature via per-bit majority of token hashes,
  computed with explode + bit-arithmetic aggregation (no UDF).
"""

from __future__ import annotations

import logging
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize as _materialize
from .text import ngrams_from_words

_LOG = logging.getLogger(__name__)


@lru_cache(maxsize=None)
def _ngrams_ws_expr(n: int):
    """``ngrams_from_words`` over the fixed ``_ws`` projection name,
    built once per process. Column objects are immutable unresolved
    expression trees keyed by column NAME, so the same tree resolves
    against every ``_shingled`` projection — and building the n=8 tree
    costs ~56 ms of py4j round trips (measured r17), paid per BUILD by
    every shingle pipeline (jaccard, minhash x2, simhash x2, decontam
    x2 per call) without this memo. Guide §7.3 driver-side work."""
    return ngrams_from_words(F.col("_ws"), n)


def _shingled(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(doc, ngrams) with the text split ONCE into a projected array
    column before n-gram assembly — element accesses inside the n-gram
    transform then hit the bound array instead of re-tokenizing the
    document per element (which is O(words²) and dominated runtime)."""
    return df.select(
        F.col(id_col).alias("doc"), F.split(F.col(text_col), " ").alias("_ws")
    ).select("doc", _ngrams_ws_expr(n).alias("ngrams"))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by exact content digest; emit one canonical id + dup count
    per distinct content."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def window_fingerprints(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, pos, fp): md5 fingerprint of every k-word window, pos the
    0-based word offset. The fingerprint is md5 of the space-joined
    window, so any engine (the DuckDB/pure-Python parity tests) can
    reproduce it byte-for-byte — no engine-private hash. Docs shorter
    than k words emit nothing. One projection + posexplode: the split
    happens once per doc, window assembly is a JVM higher-order
    transform over the bound array."""
    src = df.select(
        F.col(id_col).alias("doc"), F.split(F.col(text_col), " ").alias("_ws")
    ).filter(F.size("_ws") >= k)
    fps = F.transform(
        F.sequence(F.lit(0), F.size("_ws") - F.lit(k)),
        lambda i: F.md5(F.concat_ws(" ", F.slice("_ws", i + 1, k))),
    )
    return src.select("doc", F.posexplode(fps).alias("pos", "fp"))


def duplicate_spans(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication (Lee et al. 2022 semantics, re-expressed
    relationally): every k-word window whose fingerprint occurs more than
    once corpus-wide is a duplicated span; the globally FIRST occurrence
    (ordered by doc id, then position) is kept, every other occurrence
    becomes a removal span. Overlapping/adjacent spans within a doc are
    merged. Output: (doc, start, end) word intervals, end exclusive.

    SELF-OVERLAP APPROXIMATION (deliberate, mirrored by every oracle):
    when a duplicated window overlaps the kept first occurrence *within
    the same doc* (a run of >= k+1 identical words makes windows at pos
    0 and 1 share a fingerprint), the removal span cuts into the kept
    copy too — a run of n repeated words collapses to fewer than k
    surviving words rather than exactly one full window. This matches
    how suffix-array span removal behaves on self-overlapping repeats
    (all duplicated byte ranges but one are cut, and with overlap the
    survivor shrinks); exact keep-one-window semantics would require
    subtracting each fingerprint's kept interval from same-doc spans
    before the merge. The pure-Python and DuckDB replicas
    (tests/test_dedup.py) and the SQL oracle implement the SAME
    approximation, so cross-engine parity is exact.

    Scale: the only corpus-sized shuffle keys on the md5 fingerprint —
    uniform, no skew. Both window functions (occurrence count + first-
    occurrence rank) share the one (fp) partitioning. A boilerplate
    window repeated 10^6 times is 10^6 rows in one fp partition — a
    linear sort, not a quadratic join (contrast the Jaccard inverted
    index, which must pair-join its postings). Span merging partitions
    by doc — high-cardinality, bounded per-doc state."""
    wins = window_fingerprints(df, k, text_col, id_col)
    by_fp = Window.partitionBy("fp")
    order = Window.partitionBy("fp").orderBy("doc", "pos")
    dups = (
        wins.withColumn("occ", F.count(F.lit(1)).over(by_fp))
        .withColumn("rn", F.row_number().over(order))
        .filter((F.col("occ") > 1) & (F.col("rn") > 1))
        .select("doc", F.col("pos").alias("start"), (F.col("pos") + k).alias("end"))
    )
    # interval merge: new group whenever a span starts past the running
    # max end of everything before it
    by_doc = Window.partitionBy("doc").orderBy("start", "end")
    prev_max_end = F.max("end").over(by_doc.rowsBetween(Window.unboundedPreceding, -1))
    new_grp = F.when(
        F.col("start") > F.coalesce(prev_max_end, F.lit(-1)), 1
    ).otherwise(0)
    return (
        dups.withColumn(
            "grp",
            F.sum(new_grp).over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc", "grp")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .select("doc", "start", "end")
    )


def exact_substring_dedup(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove duplicated k-word spans from the corpus (keep-first).

    Returns the input plus ``text_clean`` (the doc with removal-span
    words dropped) and ``tokens_removed``. Reconstruction is JVM-side:
    the merged spans arrive as one array column per affected doc
    (bounded: spans never overlap post-merge, so ≤ words/k per doc) and
    a filter-with-index higher-order function drops covered words — no
    Python boundary, no per-token shuffle. Docs without duplicated
    spans pass through the left join untouched."""
    spans = duplicate_spans(df, k, text_col, id_col)
    per_doc = spans.groupBy("doc").agg(
        F.collect_list(F.struct("start", "end")).alias("_cut")
    )
    joined = df.join(per_doc, F.col(id_col) == F.col("doc"), "left").drop("doc")
    words = F.split(F.col(text_col), " ")
    cut = F.coalesce(
        F.col("_cut"), F.array().cast("array<struct<start:int,end:int>>")
    )
    kept = F.filter(
        words, lambda w, i: ~F.exists(cut, lambda s: (i >= s["start"]) & (i < s["end"]))
    )
    return (
        joined.withColumn("text_clean", F.concat_ws(" ", kept))
        .withColumn("tokens_removed", (F.size(words) - F.size(kept)).cast("long"))
        .drop("_cut")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.4,
    max_shingle_df: int | None = None,
    materialize: str = "local",
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold, via a shingle
    inverted index (exact, no approximation).

    jaccard = |A∩B| / (|A| + |B| - |A∩B|), computed on DISTINCT shingle
    sets. Output: (doc_a, doc_b, jaccard), doc_a < doc_b.

    Three prunes (r8) shrink the self-join below the naive
    Σ df(shingle)² string-keyed posting join:

    1. HASHED join keys: the shingle string never enters the index —
       each posting carries a 128-bit shingle identity (two independent
       ``xxhash64`` lanes), so the shuffle/sort payload per posting is
       16 fixed-width bytes instead of a ~n·word-length string, and the
       sort-merge comparisons are long compares. The two lanes use
       DIFFERENT seeds (a literal is prepended, not appended — Spark's
       multi-arg xxhash64 chains the running hash as the next seed, so
       an appended literal would leave lane 2 a pure function of lane
       1). Exact up to a simultaneous two-seed collision between two
       DISTINCT shingles (≈2⁻¹²⁸-scale for truly independent lanes;
       conservatively bounded far below any hardware error rate even if
       the seeded variants correlate); the output and the SQL oracle
       still see true string semantics.
    2. WITNESS filter: a shingle with document frequency 1 cannot be
       shared by any pair — it contributes nothing to any intersection
       count — so only postings with df ∈ [2, max_shingle_df] enter the
       self-join at all. On a deduplicated web-scale corpus singleton
       shingles are the overwhelming majority of the index; on the
       vocab-limited synthetic bench corpus (avg df ≈ 10) this prunes
       ~nothing — both measured, see SCALE.md.
    3. LENGTH filter, applied inside the join condition (Bayardo et al.
       2007): jaccard ≥ t forces t·|A| ≤ |B| ≤ |A|/t — provable from
       i ≥ t·(|A|+|B|)/(1+t) and i ≤ min — so size-incompatible pairs
       never reach the aggregation. Exact: any pruned pair would have
       been filtered by the threshold anyway (t = 0 prunes nothing).

    Set sizes stay the FULL distinct-shingle counts (denominator
    semantics unchanged, mirrored by the SQL oracle); with
    ``max_shingle_df`` only the intersection is computed over capped
    shingles.
    """
    shingled = _shingled(df, text_col, id_col, n).withColumn(
        "set_size", F.size("ngrams")
    )
    exploded = shingled.select(
        "doc",
        "set_size",
        F.explode("ngrams").alias("ngram"),
    ).select(
        "doc",
        "set_size",
        # two DIFFERENT-SEEDED lanes: Spark's multi-arg xxhash64 CHAINS
        # the running hash as the next seed, so xxhash64(ngram, lit(1))
        # would be a pure function of xxhash64(ngram) — a 64-bit
        # identity dressed as 128 (review find). Prepending the literal
        # instead makes h2 = XXH64(ngram, seed'=XXH64(1, 42)) ≠ h1's
        # seed 42, so a collision must hold under two unrelated seeds.
        F.xxhash64("ngram").alias("h1"),
        F.xxhash64(F.lit(1), F.col("ngram")).alias("h2"),
    )
    # witness + df-cap as ONE window over ONE (h1, h2) shuffle (r16):
    # the former groupBy-aggregate + merge-join-back shape computed the
    # witness table and its join ONCE PER SELF-JOIN BRANCH (the plan
    # showed the exploded×witness SortMergeJoin twice — no exchange
    # reuse across the renamed branches, guide §2.4/§7.2); the window
    # form counts each shingle's postings in the same sort the join
    # would have needed, and the filtered result is materialized so
    # both self-join branches read it. Same kept set: count over the
    # (h1, h2) frame == the old witness df, bounds unchanged.
    # (the old standalone checkpoint of `exploded` is gone too: `kept`
    # is now its only consumer, so the shingle pipeline still runs
    # exactly once — inside kept's own materialization job — without a
    # second checkpoint write of the pre-filter postings)
    df_w = F.count(F.lit(1)).over(Window.partitionBy("h1", "h2"))
    kept = exploded.withColumn("_df", df_w).filter(F.col("_df") >= 2)
    if max_shingle_df is not None:
        kept = kept.filter(F.col("_df") <= max_shingle_df)
    kept = _materialize(kept.drop("_df"), materialize, eager=False)
    # rename AFTER the join, not before (r16): identical un-renamed
    # branches canonicalize equal, so AQE's stage cache executes ONE
    # (h1, h2) shuffle and the second branch is a ReusedExchange —
    # renaming first made the branch plans differ and both branches
    # re-shuffled the checkpoint (plan-verified: ShuffleQueryStage 2 is
    # now `ReusedExchange` in the executed plan)
    a = kept.alias("A")
    b = kept.alias("B")
    t = F.lit(float(threshold))
    # sort-merge, not broadcast and not shuffle-hash: the witness index
    # is still O(shared postings) so broadcast is out, and the
    # shuffle-hash build side must FIT IN TASK MEMORY — at a 100x
    # corpus (measured: the 10x/sf10 probe) the per-partition index
    # exceeds the hash-map budget and the join dies with
    # SparkOutOfMemoryError. SMJ sorts spill to disk on both sides, so
    # the same plan degrades to I/O instead of failing (AQE still
    # splits skewed shingle buckets).
    pairs = (
        a.hint("merge")
        .join(
            b,
            (F.col("A.h1") == F.col("B.h1"))
            & (F.col("A.h2") == F.col("B.h2"))
            & (F.col("A.doc") < F.col("B.doc"))
            & (F.col("B.set_size").cast("double") >= t * F.col("A.set_size"))
            & (F.col("A.set_size").cast("double") >= t * F.col("B.set_size")),
        )
        .groupBy(
            F.col("A.doc").alias("doc_a"),
            F.col("B.doc").alias("doc_b"),
            F.col("A.set_size").alias("size_a"),
            F.col("B.set_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jacc = F.col("inter").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("inter")
    ).cast("double")
    return (
        pairs.select("doc_a", "doc_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """K-minima MinHash signature over word n-grams: for each seed k,
    sig[k] = min over shingles of xxhash64(shingle, k).

    Shape: explode shingles, then K ``min(xxhash64(s, k))`` aggregation
    lanes — whole-stage-codegen hash functions with map-side partial
    combine (each partition collapses to one row per doc before the
    shuffle), instead of K interpreted array-transform lambdas per row."""
    shingled = _shingled(df, text_col, id_col, n)
    ex = shingled.select("doc", F.explode("ngrams").alias("s"))
    # ALL lanes in one SQL string parsed JVM-side in a single expr call:
    # num_hashes separate F.expr(...).alias(...) pairs were still
    # 2·num_hashes py4j round trips per build (r16 driver-gap find —
    # one-shot construction halves warm build time on lane-heavy aggs);
    # the aggregate functions and the array reassembly are unchanged
    lanes = ", ".join(f"min(xxhash64(s, {k}))" for k in range(num_hashes))
    return ex.groupBy("doc").agg(F.expr(f"array({lanes})").alias("signature"))


def minhash_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """``(doc, band, bucket)`` LSH band rows: split each doc's MinHash
    signature into ``bands`` groups of ``num_hashes/bands`` lanes and
    hash each group into a 64-bit bucket. One row per (doc, band);
    purely per-doc, so a doc's rows are identical whether it is hashed
    alone or with the whole corpus — which is what makes the frozen
    corpus index (:func:`minhash_index_write`) exact w.r.t. a full
    recompute. This is also the candidate-join key layout
    :func:`minhash_lsh_candidates` self-joins on."""
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: the "
            f"trailing {num_hashes % bands} hash lanes would be paid for "
            "but never influence any bucket, silently changing the LSH "
            "S-curve"
        )
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    band_structs = ", ".join(
        f"struct({b} AS band, xxhash64(array_join(transform("
        f"slice(signature, {b * rows_per_band + 1}, {rows_per_band}), "
        "x -> CAST(x AS STRING)), ',')) AS bucket)"
        for b in range(bands)
    )
    return sigs.selectExpr(
        "doc", f"explode(array({band_structs})) AS bb"
    ).select("doc", "bb.band", "bb.bucket")


def _drop_hot_buckets(band_rows: DataFrame, max_bucket_df: int) -> DataFrame:
    """Remove band rows whose (band, bucket) is shared by more than
    ``max_bucket_df`` docs — the MinHash analogue of SimHash's
    ``max_chunk_df`` and the Jaccard ``max_shingle_df``: a degenerate
    bucket (boilerplate-dominated corpus, near-constant field) makes
    the candidate join O(bucket²), and at 100 TB that single bucket is
    the job. A pair is lost only if EVERY band it agrees on is hot —
    both docs sitting entirely inside degenerate clusters (subset
    property, pinned in tests)."""
    hot = (
        band_rows.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_bucket_df)
        .drop("df")
    )
    return band_rows.join(hot, ["band", "bucket"], "left_anti")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    materialize: str = "local",
    *,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows-per-band
    groups, bucket by the band's hash, emit candidate pairs sharing any
    bucket. Output: (doc_a, doc_b, bands_in_common).

    ``max_bucket_df``: optional hot-bucket cap (see
    :func:`_drop_hot_buckets`); the default (None) keeps exact LSH
    candidate semantics."""
    band_rows = minhash_band_rows(df, text_col, id_col, n, num_hashes, bands)
    # materialize before the self-join so the shingle+minhash pipeline
    # runs once, not once per join branch
    band_rows = _materialize(band_rows, materialize)
    if max_bucket_df is not None:
        band_rows = _drop_hot_buckets(band_rows, max_bucket_df)
    # merge not shuffle-hash: same OOM hazard as the n-gram index join
    # (the band table is O(docs x bands)); SMJ spills, SHJ's build side
    # must fit in task memory. Branches renamed AFTER the join so they
    # canonicalize equal and AQE reuses ONE (band, bucket) shuffle
    # (r16, see ngram_jaccard_pairs)
    a = band_rows.alias("A")
    b = band_rows.alias("B")
    return (
        a.hint("merge")
        .join(
            b,
            (F.col("A.band") == F.col("B.band"))
            & (F.col("A.bucket") == F.col("B.bucket"))
            & (F.col("A.doc") < F.col("B.doc")),
        )
        .groupBy(
            F.col("A.doc").alias("doc_a"), F.col("B.doc").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("bands_in_common"))
    )


def minhash_lsh_candidates_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    materialize: str = "local",
) -> DataFrame:
    """Portable-hash twin of :func:`minhash_lsh_candidates`: the SAME
    shingle → K-min signature → band → bucket self-join pipeline, keyed
    by md5 (a hash family every SQL engine ships) instead of xxhash64.
    Lane k's minimum is ``min(md5('k:' || shingle))`` over the doc's
    distinct shingles (hex strings compare bytewise identically across
    engines), band b's bucket is ``md5(lane_{b·r} || '|' || …)``.

    Exists so the LSH family has an exactly-replayable SQL oracle face
    (r12 VERDICT task 7 — the first hash-checked evidence on the
    approximate-dedup tier); PRODUCTION keeps the xxhash64 pipeline,
    whose 64-bit integer lanes beat 32-char hex strings across the
    shuffle. Same banded scale shape: no all-pairs, cost is
    Σ bucket_df² over bucket groups, map-side-combined min lanes."""
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}"
        )
    r = num_hashes // bands
    sh = _shingled(df, text_col, id_col, n).select(
        "doc", F.explode("ngrams").alias("s")
    )
    # one-shot lane construction (same py4j-round-trip cut as
    # minhash_signatures); sig[k] is the 0-based lane the m{k} columns
    # used to carry — identical min-md5 values, identical buckets
    lanes = ", ".join(
        f"min(md5('{k}:' || s))" for k in range(num_hashes)
    )
    mins = sh.groupBy("doc").agg(F.expr(f"array({lanes})").alias("sig"))
    band_structs = ", ".join(
        "struct({b} AS band, md5(concat_ws('|', {lanes})) AS bucket)".format(
            b=b, lanes=", ".join(f"sig[{k}]" for k in range(b * r, (b + 1) * r))
        )
        for b in range(bands)
    )
    band_rows = mins.selectExpr(
        "doc", f"explode(array({band_structs})) AS bb"
    ).select("doc", "bb.band", "bb.bucket")
    band_rows = _materialize(band_rows, materialize)
    # rename after the join for AQE exchange reuse (r16, see
    # minhash_lsh_candidates)
    a = band_rows.alias("A")
    b = band_rows.alias("B")
    return (
        a.hint("merge")
        .join(
            b,
            (F.col("A.band") == F.col("B.band"))
            & (F.col("A.bucket") == F.col("B.bucket"))
            & (F.col("A.doc") < F.col("B.doc")),
        )
        .groupBy(
            F.col("A.doc").alias("doc_a"), F.col("B.doc").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("bands_in_common"))
    )


_BAND_INDEX_META = "_band_index_meta.json"


def _recover_precompact(spark, path: str) -> bool:
    """Finish a :func:`compact_index` that crashed between its two
    renames: canonical path absent, the only full copy parked at
    ``<path>.precompact``. Every index entry point (ensure/check meta)
    runs this FIRST — without it, a stream restart's sidecar write
    recreates the canonical dir with only the sidecar, the probe
    bootstraps as an empty corpus (silently missing all cross-corpus
    dups), and the next compact sees canonical-present and deletes the
    backup as 'provably stale', destroying the only full copy (review
    find). When canonical exists the backup is left alone —
    ``compact_index`` itself adjudicates staleness. Returns True iff a
    recovery rename happened."""
    from .. import fsutil

    old = path + ".precompact"
    if fsutil.exists(spark, old) and not fsutil.exists(spark, path):
        if not fsutil.rename(spark, old, path):
            raise IOError(
                f"recovery rename {old} -> {path} failed (Hadoop rename "
                "returned false); index left at the backup path"
            )
        return True
    return False


def _write_band_index_meta(spark, path: str, n: int, num_hashes: int, bands: int) -> None:
    """Parameter sidecar (leading-underscore name — Parquet readers skip
    it). Written through the Hadoop FS API (`fsutil`) so HDFS/S3 index
    paths work identically to local ones; temp+rename so a crash can't
    leave truncated JSON blocking every future reader."""
    import json as _json

    from .. import fsutil

    fsutil.write_text_atomic(
        spark,
        f"{path}/{_BAND_INDEX_META}",
        _json.dumps({"kind": "minhash_bands", "n": n, "num_hashes": num_hashes, "bands": bands}),
    )


def _check_band_index_meta(spark, path: str, n: int, num_hashes: int, bands: int) -> None:
    """Refuse to probe or append with parameters other than the ones the
    index was built with — a mismatched shingle width, hash count, or
    band count silently yields wrong buckets (the same footgun
    ivf_index_append's centroid digest guards against)."""
    import json as _json

    from .. import fsutil

    _recover_precompact(spark, path)
    try:
        meta = _json.loads(fsutil.read_text(spark, f"{path}/{_BAND_INDEX_META}"))
    except FileNotFoundError:
        raise ValueError(
            f"no {_BAND_INDEX_META} sidecar at {path}: index was not "
            "written by minhash_index_write/near_dedup_stream, cannot "
            "validate probe parameters"
        ) from None
    except ValueError as e:  # json.JSONDecodeError ⊂ ValueError
        raise ValueError(
            f"{_BAND_INDEX_META} sidecar at {path} is corrupt ({e}): "
            "likely a crash mid-write by an older writer — rebuild the "
            "index (minhash_index_write) or restore the sidecar by hand"
        ) from None
    want = {"kind": "minhash_bands", "n": n, "num_hashes": num_hashes, "bands": bands}
    if meta != want:
        raise ValueError(
            f"band index at {path} was built with {meta}, used with "
            f"{want} — mismatched parameters would corrupt every result"
        )


def _ensure_band_index_meta(spark, path: str, n: int, num_hashes: int, bands: int) -> None:
    """Write the sidecar iff absent; otherwise VALIDATE against it.
    The wiring-time call in ``near_dedup_stream`` must not blindly
    rewrite: a stream restarted with drifted parameters (bands=4 over a
    bands=8 index) would stamp the new parameters over the old sidecar
    and turn the mismatch guard into a rubber stamp — every probe then
    joins incompatible bucket spaces silently (review find)."""
    from .. import fsutil

    _recover_precompact(spark, path)
    if fsutil.exists(spark, f"{path}/{_BAND_INDEX_META}"):
        _check_band_index_meta(spark, path, n, num_hashes, bands)
    else:
        _write_band_index_meta(spark, path, n, num_hashes, bands)


def minhash_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> None:
    """Materialize the corpus's LSH band index (``(doc, band, bucket)``)
    as Parquet at ``path``, partitioned by ``band``. This is the
    pay-the-hashing-once half of incremental dedup: the corpus's
    shingle→minhash→band pipeline runs exactly once here, and every
    future :func:`minhash_probe_candidates` call only *scans* the
    result. Band partitioning keeps per-directory files bounded and lets
    a probe configured with fewer bands prune whole directories."""
    minhash_band_rows(df, text_col, id_col, n, num_hashes, bands).write.mode(
        "overwrite"
    ).partitionBy("band").parquet(path)
    _write_band_index_meta(df.sparkSession, path, n, num_hashes, bands)


def minhash_index_append(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> None:
    """Fold a probed shard into the frozen index: append its band rows
    (validated against the parameter sidecar the index was written with
    — a mismatched shingle/hash/band count raises instead of corrupting
    every future probe) so the next shard's probe sees it as corpus.
    ``probe → append`` per shard is the complete incremental-ingest
    loop: no corpus row is ever re-hashed, and after K shards the index
    equals :func:`minhash_index_write` over the union (parity pinned in
    tests). Parquet append only adds files — existing data files are
    never rewritten, so at 100 TB this is an O(shard) metadata+write
    operation (run :func:`compact_index` over the small files on
    whatever cadence the scan profile needs, exactly like any
    log-structured table)."""
    _check_band_index_meta(df.sparkSession, path, n, num_hashes, bands)
    minhash_band_rows(df, text_col, id_col, n, num_hashes, bands).write.mode(
        "append"
    ).partitionBy("band").parquet(path)


def compact_index(spark, path: str, partition_cols: list[str]) -> None:
    """Rewrite a frozen-index directory to ONE file per partition
    directory — the compaction the append operators delegate to
    ("run a compaction over small files on whatever cadence the store
    needs"): K appends leave K small files per partition, and at some K
    the scan's file-open overhead beats the rewrite cost. Works for any
    of the append-able layouts (band index ``["band"]``, SimHash chunk
    index ``["blk"]``, a streaming index ``["batch", "band"]`` — batch
    dirs survive, as the earlier-only probe requires; IVF/LSH via their
    partition column).

    Crash-safe the same way ``Warehouse.compact`` is: write to
    ``<path>.compact``, copy every ``_*.json`` sidecar, then two
    metadata renames — the data always exists in full at one of the
    paths, and a leftover ``.precompact`` from a crash is recovered
    (canonical missing → the backup IS the index) or cleaned (canonical
    present → provably stale) on the next compact. All FS ops go
    through the Hadoop API (fsutil), so HDFS/S3 index paths work;
    note object stores make `rename` a copy, the standard caveat."""
    _rewrite_index(spark, path, partition_cols)


def _gen_dir_id(name: str) -> tuple[int, str] | None:
    """Parse a pairs GENERATION dir name: ``gen=b<k>`` (live, one
    micro-batch) → (k, 'b'); ``gen=f<k>`` (folded, the union of live
    gens merged at batch k+1) → (k, 'f'); anything else → None."""
    if not name.startswith("gen="):
        return None
    val = name[len("gen="):]
    if len(val) < 2 or val[0] not in ("b", "f"):
        return None
    try:
        return int(val[1:]), val[0]
    except ValueError:
        return None


def drop_stale_pair_gens(spark, path: str, batch_id: int) -> list[str]:
    """Replay hygiene for the generational pairs layout: delete every
    ``gen=b<k>``/``gen=f<k>`` dir with ``k >= batch_id`` at batch start.
    Same contract as :func:`drop_stale_batch_dirs` (see its docstring
    for why dynamic overwrite alone cannot clean a from-scratch replay):
    a replay's batch 0 wipes both live and folded generations from the
    previous life and rebuilds deterministically; a mid-stream retry of
    batch b drops only its own crashed ``gen=b<b>`` (a fold created
    during the crashed attempt is ``f<b-1>``, strictly earlier, and
    survives correctly). Non-empty drops are exceptional and logged."""
    from .. import fsutil

    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    dropped: list[str] = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        parsed = _gen_dir_id(name)
        if parsed is not None and parsed[0] >= batch_id:
            fs.delete(status.getPath(), True)
            dropped.append(name)
    if dropped:
        _LOG.warning(
            "drop_stale_pair_gens(%s, batch_id=%d): dropped %s — a "
            "retry/replay is rebuilding these generations",
            path, batch_id, sorted(dropped),
        )
    return sorted(dropped)


def _recover_pair_fold(spark, path: str) -> None:
    """Finish a :func:`fold_pairs_gens` that crashed mid-protocol:
    leftover ``.compact.gen=f<k>`` tmp dirs are always incomplete
    merges — delete them; a folded ``gen=f<k>`` dir proves every live
    ``gen=b<id>`` with ``id <= k`` was merged into the fold chain (the
    fold reads ALL live gens strictly earlier than its batch), so any
    such survivor is a crashed source-delete — remove it, or its rows
    would be permanently duplicated beside their folded copy."""
    from .. import fsutil

    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return
    names = [st.getPath().getName() for st in fs.listStatus(jpath)]
    max_f = None
    for name in names:
        if name.startswith(".compact.gen="):
            fsutil.delete(spark, f"{path}/{name}")
        parsed = _gen_dir_id(name)
        if parsed is not None and parsed[1] == "f":
            max_f = parsed[0] if max_f is None else max(max_f, parsed[0])
    if max_f is None:
        return
    for name in names:
        parsed = _gen_dir_id(name)
        if parsed is not None and parsed[1] == "b" and parsed[0] <= max_f:
            _LOG.warning(
                "pairs fold recovery: deleting %s/%s (already merged "
                "into gen=f%d by a fold whose source-delete crashed)",
                path, name, max_f,
            )
            fsutil.delete(spark, f"{path}/{name}")


def fold_pairs_gens(spark, path: str, current_batch: int) -> list[int]:
    """Bound the pairs log's DIRECTORY count with a generational fold —
    the pairs twin of :func:`fold_stream_index` (VERDICT r11 task 2).

    The generational layout keeps ``batch`` as a DATA column inside the
    files (user-facing provenance — "which shard found this pair" —
    preserved verbatim, never relabeled) while the partition dir is the
    engine-owned ``gen`` column: each micro-batch lands in ``gen=b<id>``
    and every fold merges all live gens STRICTLY EARLIER than
    ``current_batch`` into one single-file ``gen=f<current_batch - 1>``
    dir, then removes the sources. Folded gens are terminal — never
    re-read by later folds — so each pairs row is rewritten exactly
    once ever (per-fold cost is O(batches since the last fold), unlike
    a whole-history rewrite) and after B batches at cadence N the
    layout holds ≤ B/N folded dirs + N live dirs: directory count is
    bounded by a constant × generation count no matter the stream age.

    Why strictly-earlier is replay-safe (same argument as
    :func:`fold_stream_index`): foreachBatch commits serially, so gens
    < b can never retry; a retry of b itself rewrites only its own
    ``gen=b<b>`` (dynamic overwrite + :func:`drop_stale_pair_gens`),
    which no fold has touched. Crash protocol: merge into a
    dot-prefixed tmp (invisible to partition discovery), one rename,
    then source deletes; :func:`_recover_pair_fold` finishes the
    source-delete window (a folded gen proves its sources stale) and
    clears tmps. The single fold rename makes the new generation
    appear atomically; an out-of-band reader scanning during the
    source-delete window may transiently see a merged row twice —
    same transient-duplication semantics as any eventually-consistent
    log compaction, resolved by the next listing. Returns the live
    batch ids merged ([] when none, e.g. a retry after the fold
    completed)."""
    from .. import fsutil

    _recover_pair_fold(spark, path)
    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    live: list[int] = []
    for status in fs.listStatus(jpath):
        parsed = _gen_dir_id(status.getPath().getName())
        if parsed is not None and parsed[1] == "b" and parsed[0] < current_batch:
            live.append(parsed[0])
    if not live:
        return []
    fold_id = current_batch - 1
    dst = f"{path}/gen=f{fold_id}"
    tmp = f"{path}/.compact.gen=f{fold_id}"
    fsutil.delete(spark, tmp)
    src_dirs = [f"{path}/gen=b{k}" for k in sorted(live)]
    # reading the bare partition dirs yields exactly the file content
    # (batch is a data column; gen lives only in the dir name);
    # coalesce(1): no shuffle, one file per generation — the fold is
    # also the file compaction for the merged window
    spark.read.parquet(*src_dirs).coalesce(1).write.parquet(tmp)
    if not fsutil.rename(spark, tmp, dst):
        raise IOError(
            f"pairs fold: rename {tmp} -> {dst} failed; live gens left "
            "untouched"
        )
    for sdir in src_dirs:
        fsutil.delete(spark, sdir)
    return sorted(live)


def migrate_pairs_layout(spark, path: str) -> list[int]:
    """One-time upgrade of a pre-r12 pairs log (``batch=<k>`` partition
    dirs, batch encoded ONLY in the dir name) to the generational
    layout (``gen=b<k>`` dirs with ``batch`` as a data column). Without
    this, a mixed root fails Spark partition discovery outright
    ('Conflicting partition column names': batch vs gen) and the
    replay-hygiene sweep (:func:`drop_stale_pair_gens`) would never
    match the old names.

    Called from the stream's per-batch preamble (a no-op listing in
    steady state). Each legacy dir is rewritten with its ``batch``
    value materialized as a column into a dot-prefixed tmp (invisible
    to discovery), renamed to ``gen=b<k>``, then the legacy dir is
    deleted — the same crash protocol as :func:`fold_pairs_gens`. A
    crash between rename and source-delete leaves both dirs; this runs
    BEFORE any new-era write, so a coexisting ``gen=b<k>`` proves the
    migration of ``batch=<k>`` already completed and the legacy dir is
    simply deleted on resume. Returns the migrated batch ids."""
    from .. import fsutil

    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    legacy: list[int] = []
    names = {st.getPath().getName() for st in fs.listStatus(jpath)}
    for name in names:
        if name.startswith("batch="):
            try:
                legacy.append(int(name[len("batch="):]))
            except ValueError:
                continue
    if not legacy:
        return []
    _LOG.warning(
        "migrate_pairs_layout(%s): upgrading legacy batch= dirs %s to "
        "the generational gen=b<k> layout",
        path, sorted(legacy),
    )
    for k in sorted(legacy):
        src = f"{path}/batch={k}"
        dst = f"{path}/gen=b{k}"
        if f"gen=b{k}" in names:
            # rename completed in a previous (crashed) migration; only
            # the source-delete is outstanding
            fsutil.delete(spark, src)
            continue
        tmp = f"{path}/.compact.gen=b{k}"
        fsutil.delete(spark, tmp)
        from pyspark.sql import functions as F  # local: keep module top light

        # batch must be written with the SAME physical type the stream's
        # new-era gens use (F.lit(batch_id) -> INT32): a root mixing
        # INT32 and INT64 footers for one column fails reads with
        # PARQUET_COLUMN_DATA_TYPE_MISMATCH whenever the int-typed
        # footer wins schema inference — recreating the mixed-root
        # failure this migration exists to prevent (r12 advisor find,
        # pinned by test_migrated_and_native_gens_fold_and_read).
        spark.read.parquet(src).withColumn(
            "batch", F.lit(k).cast("int")
        ).coalesce(1).write.parquet(tmp)
        if not fsutil.rename(spark, tmp, dst):
            raise IOError(
                f"pairs migration: rename {tmp} -> {dst} failed; legacy "
                "dir left untouched"
            )
        fsutil.delete(spark, src)
    return sorted(legacy)


def _recover_pair_repairs(spark, path: str) -> None:
    """Finish :func:`repair_pairs_batch_types` swaps that crashed
    mid-rename: a ``.prerepair.gen=<x>`` backup without its canonical
    dir IS that generation — rename it back; with the canonical present
    it is provably stale — delete it. Leftover ``.repair.gen=<x>`` tmp
    dirs are always incomplete writes and are removed. Same protocol as
    :func:`_recover_pair_dir_swaps`."""
    from .. import fsutil

    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith(".repair.gen="):
            fs.delete(status.getPath(), True)
        elif name.startswith(".prerepair.gen="):
            canon = f"{path}/{name[len('.prerepair.'):]}"
            if fsutil.exists(spark, canon):
                fs.delete(status.getPath(), True)
            elif not fsutil.rename(spark, f"{path}/{name}", canon):
                raise IOError(
                    f"pairs repair recovery rename {name} failed; "
                    "generation left at the backup path"
                )


def repair_pairs_batch_types(spark, path: str) -> list[str]:
    """One-time repair of generational pairs dirs whose FILES carry the
    ``batch`` column as INT64 — the r12 migration wrote migrated gens
    with ``.cast('long')`` while the stream's native gens write INT32,
    so a root migrated by that code mixes parquet physical types for
    one column and fails reads with PARQUET_COLUMN_DATA_TYPE_MISMATCH
    whenever an int footer wins schema inference (r13 review find: the
    r13 int-cast fix only covered FUTURE migrations). Each long-typed
    gen dir is rewritten with batch cast to int via a tmp + two-rename
    swap (crash windows closed by :func:`_recover_pair_repairs`, wired
    into the stream's per-batch preamble).

    Cost: one footer-only schema read per gen dir — bounded by the fold
    cadence — so it is called from ``near_dedup_stream``'s WIRING, once
    per stream start, not per batch. Returns the repaired dir names."""
    from pyspark.sql import functions as F  # local: keep module top light

    from .. import fsutil

    _recover_pair_repairs(spark, path)
    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    repaired: list[str] = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if _gen_dir_id(name) is None:
            continue
        sub = f"{path}/{name}"
        types = {
            f.name: f.dataType.simpleString()
            for f in spark.read.parquet(sub).schema.fields
        }
        if types.get("batch") != "bigint":
            continue
        tmp = f"{path}/.repair.{name}"
        bak = f"{path}/.prerepair.{name}"
        fsutil.delete(spark, tmp)
        fsutil.delete(spark, bak)
        spark.read.parquet(sub).withColumn(
            "batch", F.col("batch").cast("int")
        ).coalesce(1).write.parquet(tmp)
        if not fsutil.rename(spark, sub, bak):
            raise IOError(f"pairs repair: rename {sub} -> {bak} failed")
        if not fsutil.rename(spark, tmp, sub):
            raise IOError(
                f"pairs repair: rename {tmp} -> {sub} failed; original "
                f"parked at {bak} (recovered by _recover_pair_repairs)"
            )
        fsutil.delete(spark, bak)
        _LOG.warning(
            "repair_pairs_batch_types(%s): rewrote %s batch INT64 -> "
            "INT32 (r12-migration artifact)", path, name,
        )
        repaired.append(name)
    return repaired


def drop_stale_batch_dirs(spark, path: str, batch_id: int) -> list[int]:
    """Delete ``batch=<id>`` directories with ``id >= batch_id`` from a
    stream-owned layout. Normal serial streaming never has one (batches
    commit monotonically, so batch b only ever sees dirs < b); they
    exist only after (a) a mid-batch crash — the retry's own partial
    ``batch=<b>`` write — or (b) a from-scratch replay over a surviving
    index (checkpoint lost), where the previous life's dirs — including
    :func:`fold_stream_index`'s relabeled union dir — would otherwise
    duplicate the rows the replay re-writes. Dynamic partition
    overwrite alone cannot clean (b): it replaces only the partition
    values the replayed batch itself produces, so folded-union rows
    under OTHER partition values (a sparse digest-prefix batch, a
    coarser replay chunking) survived as permanent duplicate index rows
    and duplicate emitted pairs (r10 advice). Returns the dropped ids
    (driver-side directory listing; empty in steady state).

    DESTRUCTIVE ON CHECKPOINT LOSS, by design: starting a stream with a
    fresh checkpoint (batch_id restarts at 0) over an EXISTING layout
    deletes every prior batch dir — correct when the same source
    replays in full (the replay rebuilds everything), but a replay over
    a different or partial source permanently loses the difference.
    Non-empty drops are always exceptional and are logged with the ids
    so an unintended wipe is visible, not silent."""
    from .. import fsutil

    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    dropped: list[int] = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not name.startswith("batch="):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid >= batch_id:
            fs.delete(status.getPath(), True)
            dropped.append(bid)
    if dropped:
        _LOG.warning(
            "drop_stale_batch_dirs(%s, batch_id=%d): dropped batch dirs "
            "%s — a retry/replay is rebuilding them (a fresh checkpoint "
            "over an existing index/pairs path wipes prior state unless "
            "the full original source replays)",
            path, batch_id, sorted(dropped),
        )
    return sorted(dropped)


def _recover_pair_dir_swaps(spark, path: str) -> None:
    """Finish :func:`compact_pairs_dirs` swaps that crashed mid-rename:
    a ``.precompact.batch=<k>`` backup without its canonical
    ``batch=<k>`` dir IS that batch's pairs — rename it back; with the
    canonical present it is provably stale — delete it. Leftover
    ``.compact.batch=<k>`` tmp dirs are always incomplete writes and
    are removed. Dot-prefixed names keep both invisible to Parquet
    partition discovery throughout."""
    from .. import fsutil

    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith(".compact.batch="):
            fs.delete(status.getPath(), True)
        elif name.startswith(".precompact.batch="):
            canon = f"{path}/{name[len('.precompact.'):]}"
            if fsutil.exists(spark, canon):
                fs.delete(status.getPath(), True)
            elif not fsutil.rename(spark, f"{path}/{name}", canon):
                raise IOError(
                    f"pairs recovery rename {name} failed (Hadoop rename "
                    "returned false); batch left at the backup path"
                )


def compact_pairs_dirs(spark, path: str) -> list[int]:
    """Compact a pairs output (``batch=<id>`` dirs, never relabeled —
    the batch column is user-facing provenance) INCREMENTALLY: rewrite
    only batch dirs holding more than one data file, to exactly one
    file each. The whole-path :func:`compact_index` re-read and
    re-wrote the ENTIRE pairs history every cadence — linear cost per
    fold, quadratic total work over the stream's life (r10 advice);
    here an already-compacted dir (1 file) is skipped by inspection, so
    each batch dir is rewritten at most once ever and the per-cadence
    cost is O(new batches). No high-water-mark sidecar needed: the
    1-file state is self-describing and survives replays that overwrite
    a dir.

    Residual small-files dimension, deliberately unbounded: the
    DIRECTORY count still grows one per micro-batch forever, because
    batch dirs must survive un-merged to keep their provenance. At a
    batch per minute that is ~0.5 M directories/year — acceptable for a
    pairs LOG on HDFS, but a deployment that reads the full history per
    query should periodically export it to a date-partitioned table.

    Per-dir crash-safe swap (tmp ``.compact.batch=<k>`` → backup
    ``.precompact.batch=<k>``, both dot-prefixed so partition discovery
    never sees them); :func:`_recover_pair_dir_swaps` finishes crashed
    swaps and runs first here and at every stream batch start. Returns
    the batch ids rewritten.

    CONCURRENT-READER CAVEAT: each swap has a transient window (between
    rename dir→backup and rename tmp→dir) in which a full-history scan
    by an out-of-band reader sees that one batch missing entirely. The
    serial stream itself never reads pairs, so it is safe — but the
    pairs log is a user-facing output: do not run this compaction
    concurrently with external full-history reads, or accept that a
    scan racing a swap can transiently miss one batch (it reappears,
    complete and identical, on the next listing)."""
    from .. import fsutil

    _recover_pair_dir_swaps(spark, path)
    fs, jpath = fsutil._fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    rewritten: list[int] = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not name.startswith("batch="):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        n_files = sum(
            1
            for s in fs.listStatus(status.getPath())
            if s.getPath().getName().endswith(".parquet")
        )
        if n_files <= 1:
            continue
        dir_path = f"{path}/{name}"
        tmp = f"{path}/.compact.batch={bid}"
        backup = f"{path}/.precompact.batch={bid}"
        fsutil.delete(spark, tmp)
        # reading the bare partition dir yields exactly the file content
        # (the batch column lives in the dir name, as in the original
        # write); coalesce(1), not repartition: no shuffle, one file
        spark.read.parquet(dir_path).coalesce(1).write.parquet(tmp)
        if not fsutil.rename(spark, dir_path, backup):
            raise IOError(
                f"pairs compact: rename {dir_path} -> {backup} failed; "
                "batch left untouched"
            )
        if not fsutil.rename(spark, tmp, dir_path):
            if not fsutil.rename(spark, backup, dir_path):
                raise IOError(
                    f"pairs compact: swap AND rollback failed for "
                    f"{dir_path}; data intact at {backup}"
                )
            raise IOError(
                f"pairs compact: swap failed for {dir_path}; rolled back"
            )
        fsutil.delete(spark, backup)
        rewritten.append(bid)
    return sorted(rewritten)


def fold_stream_index(
    spark, path: str, index_partition: str, current_batch: int
) -> None:
    """Compact a STREAMING index (``batch=<id>/<band|blk>=...`` layout,
    the one :func:`~..streaming.dedupe_stream.near_dedup_stream`
    writes): merge every batch STRICTLY EARLIER than ``current_batch``
    into the single directory ``batch=<current_batch - 1>`` and rewrite
    one file per partition dir. Without this the loop appends one
    file-set per micro-batch forever — at a batch per minute the index
    is a small-files problem in days; with a fold every N batches the
    layout holds at most N+1 batch directories regardless of stream
    age.

    Why relabeling is safe: foreachBatch batches commit serially, so
    when batch b runs, every batch < b is committed and can never
    retry; a RETRY of b itself probes ``batch < b``, which still
    matches the folded ``b-1`` directory (content unchanged — exactly
    the union of batches 0..b-1), and its dynamic overwrite touches
    only ``batch=b``, which the fold never rewrites. A from-scratch
    replay (checkpoint lost) over the surviving folded index is NOT
    safe by overwrite alone — the replay's ``batch=b-1`` dynamic
    overwrite replaces only the partition values its own data
    produces, so folded-union rows under other values (a sparse
    digest-prefix batch, a coarser replay chunking) would survive as
    permanent duplicates (r10 advice). ``near_dedup_stream`` therefore
    drops every ``batch >= id`` dir at each batch start
    (:func:`drop_stale_batch_dirs`): replay batch 0 clears the
    surviving dirs and the replay rebuilds the index from scratch,
    deterministically. Crash-safety is the same swap as
    :func:`compact_index` (``.precompact`` recovery wired into every
    index entry point)."""
    fold_to = current_batch - 1
    _rewrite_index(
        spark,
        path,
        ["batch", index_partition],
        transform=lambda df: df.withColumn(
            "batch",
            F.when(F.col("batch") < current_batch, F.lit(fold_to)).otherwise(
                F.col("batch")
            ),
        ),
    )


def _rewrite_index(spark, path: str, partition_cols: list[str], transform=None) -> None:
    """The crash-safe full-rewrite body shared by :func:`compact_index`
    and :func:`fold_stream_index` (see compact_index for the swap
    protocol). ``transform`` optionally rewrites the DataFrame between
    read and write (the fold's batch relabeling)."""
    import posixpath

    from .. import fsutil

    tmp, old = path + ".compact", path + ".precompact"
    _recover_precompact(spark, path)  # finish a crashed prior compact
    if not fsutil.exists(spark, path):
        raise ValueError(f"no index directory at {path}")
    if fsutil.exists(spark, old):
        fsutil.delete(spark, old)  # canonical present → backup is stale
    fsutil.delete(spark, tmp)
    df = spark.read.parquet(path)
    if transform is not None:
        df = transform(df)
    # repartition BY the partition values: each value's rows land whole
    # in one task → exactly one file per partition directory
    df.repartition(*[F.col(c) for c in partition_cols]).write.partitionBy(
        *partition_cols
    ).parquet(tmp)
    fs, jpath = fsutil._fs_and_path(spark, path)
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("_") and name.endswith(".json"):  # sidecars
            fsutil.write_text(
                spark,
                posixpath.join(tmp, name),
                fsutil.read_text(spark, posixpath.join(path, name)),
            )
    # Hadoop FileSystem.rename reports most failures by returning false,
    # not raising — unchecked, a failed second rename followed by
    # delete(old) would destroy the only full copy (review find). Check
    # both; on a failed swap put the backup back so the canonical path
    # never stops existing.
    if not fsutil.rename(spark, path, old):
        raise IOError(
            f"index rewrite: rename {path} -> {old} failed (Hadoop "
            "rename returned false); index left untouched"
        )
    if not fsutil.rename(spark, tmp, path):
        restored = fsutil.rename(spark, old, path)
        raise IOError(
            f"index rewrite: rename {tmp} -> {path} failed; original "
            + ("restored" if restored else f"left at {old} (restore rename ALSO failed)")
        )
    fsutil.delete(spark, old)


def minhash_probe_candidates(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    broadcast_new: bool = True,
    index_filter=None,
    materialize: str = "local",
    *,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Incremental dedup: candidate pairs between a NEW document batch
    and a frozen corpus index (:func:`minhash_index_write`), plus pairs
    within the new batch itself. Output matches
    :func:`minhash_lsh_candidates` — (doc_a, doc_b, bands_in_common),
    doc_a < doc_b — restricted to pairs touching the new batch: because
    band rows are purely per-doc, the result is EXACTLY the full
    recompute over (corpus ∪ batch) filtered to pairs with a new-batch
    side (pinned by tests/test_dedup.py). Doc ids must be disjoint from
    the indexed corpus — re-submitting an indexed doc would pair it with
    itself under two row identities.

    100 TB story: the corpus never re-hashes and never shuffles — the
    incoming shard's band rows broadcast to the index scan
    (BroadcastHashJoin, zero Exchange above the corpus-side Parquet
    scan; plan-asserted in tests), so per-shard cost is O(shard hashing
    + corpus scan + matches), not O(corpus hashing). For a shard too
    large to broadcast, ``broadcast_new=False`` falls back to a
    sort-merge join that shuffles both sides (still O(docs×bands) keys,
    the same bound as the batch form); the within-batch self-join then
    inherits the same merge hint (shard-sized band table, same SHJ task
    -memory hazard the batch form documents). ``materialize`` is the
    standard local|reliable lineage-cut knob (operators/materialize.py).

    ``max_bucket_df``: the hot-bucket cap, computed over (index ∪
    batch) so the result stays EXACTLY the capped batch recompute
    filtered to batch-touching pairs. Costs one extra map-side-combined
    aggregation pass over the index per probe (the price of an exact
    corpus-wide document frequency); the hot set broadcasts into
    anti-joins on both sides, so the index branch stays Exchange-free
    below the probe join. Default None keeps single-scan probes."""
    _check_band_index_meta(spark, index_path, n, num_hashes, bands)
    new_rows = minhash_band_rows(new_df, text_col, id_col, n, num_hashes, bands)
    # computed once, consumed by two join branches (index probe + batch
    # self-join): cut lineage so the shingle+minhash pipeline runs once
    new_rows = _materialize(new_rows, materialize)
    idx = spark.read.parquet(index_path)
    if index_filter is not None:
        # e.g. exclude a retried micro-batch's own rows (a partition
        # predicate on the streaming index's `batch` column — prunes
        # directories, see streaming/dedupe_stream.near_dedup_stream)
        idx = idx.filter(index_filter)
    if max_bucket_df is not None:
        hot = F.broadcast(
            idx.select("band", "bucket")
            .unionByName(new_rows.select("band", "bucket"))
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_bucket_df)
            .drop("df")
        )
        idx = idx.join(hot, ["band", "bucket"], "left_anti")
        new_rows = new_rows.join(hot, ["band", "bucket"], "left_anti")
    probe = F.broadcast(new_rows) if broadcast_new else new_rows.hint("merge")
    cross = (
        idx.join(probe.withColumnRenamed("doc", "doc_new"), ["band", "bucket"])
        .filter(F.col("doc") != F.col("doc_new"))
        .select(
            F.least("doc", "doc_new").alias("doc_a"),
            F.greatest("doc", "doc_new").alias("doc_b"),
        )
    )
    a = new_rows.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = new_rows.select(F.col("doc").alias("doc_b"), "band", "bucket")
    if not broadcast_new:
        a = a.hint("merge")
    within = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    return (
        cross.unionByName(within)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("bands_in_common"))
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """SimHash: per-bit majority vote over token xxhash64 values.
    explode(words) → for each bit, sum ±1 → reassemble the signature.
    One shuffle (groupBy id), bit lanes are column expressions."""
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).withColumn("h", F.xxhash64("w"))
    # per-bit set count n_b = sum((h >> b) & 1) — branch-free lanes;
    # majority vote is 2·n_b > n_tokens (≡ the classic ±1 sum > 0).
    # The WHOLE signature — all `bits` sum-lanes and the reassembly —
    # is ONE SQL string parsed JVM-side in a single expr call: the
    # Column-API form was ~600 py4j round trips (~1 s of driver time)
    # per build at 64 bits (r14), and even one-expr-per-lane still paid
    # 2·bits round trips (r16 driver-gap find). Catalyst dedupes the
    # repeated count(1) aggregate; the per-lane sums and the final
    # integer arithmetic are unchanged, so signatures are identical.
    sig_sql = " | ".join(
        f"shiftleft(CASE WHEN 2 * sum(shiftright(h, {b}) & 1) > count(1) "
        f"THEN 1L ELSE 0L END, {b})"
        for b in range(bits)
    )
    return tokens.groupBy("doc").agg(F.expr(sig_sql).alias("simhash"))


def _hamming_pairs(chunked: DataFrame, max_hamming: int) -> DataFrame:
    """The block-permutation candidate join + full-signature Hamming
    verify shared by the xxhash64 and md5 SimHash faces: self-join the
    ``(doc, simhash, blk, chunk)`` rows per (blk, chunk), verify on
    bit_count(xor), dedupe pairs that share several chunks."""
    # rename after the join for AQE exchange reuse (r16, see
    # ngram_jaccard_pairs); merge not shuffle-hash: spills under a hot
    # chunk instead of OOMing the build-side hash map (sf10 lesson from
    # the n-gram join)
    a = chunked.alias("A")
    b = chunked.alias("B")
    hamming = F.bit_count(
        F.col("A.simhash").bitwiseXOR(F.col("B.simhash"))
    )
    return (
        a.hint("merge")
        .join(
            b,
            (F.col("A.blk") == F.col("B.blk"))
            & (F.col("A.chunk") == F.col("B.chunk"))
            & (F.col("A.doc") < F.col("B.doc")),
        )
        .select(
            F.col("A.doc").alias("doc_a"),
            F.col("B.doc").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _chunked_signatures(sigs: DataFrame, blocks: int, bits: int = 64) -> DataFrame:
    """``(doc, simhash, blk, chunk)`` rows: the ``bits``-wide signature
    split into ``blocks`` bit chunks (the block-permutation candidate
    key). Purely per-doc — a doc's rows are identical alone or with the
    whole corpus, which is what makes the frozen SimHash index
    (:func:`simhash_index_write`) exact w.r.t. a full recompute."""
    chunk_bits = bits // blocks
    mask = (1 << chunk_bits) - 1
    chunk_structs = ", ".join(
        f"struct({i} AS blk, "
        f"shiftright(simhash, {i * chunk_bits}) & {mask}L AS chunk)"
        for i in range(blocks)
    )
    return sigs.selectExpr(
        "doc", "simhash", f"explode(array({chunk_structs})) AS c"
    ).select("doc", "simhash", "c.blk", "c.chunk")


_SIMHASH_INDEX_META = "_simhash_index_meta.json"


def _write_simhash_index_meta(spark, path: str, blocks: int) -> None:
    import json as _json

    from .. import fsutil

    fsutil.write_text_atomic(
        spark,
        f"{path}/{_SIMHASH_INDEX_META}",
        _json.dumps({"kind": "simhash_blocks", "bits": 64, "blocks": blocks}),
    )


def _check_simhash_index_meta(spark, path: str, blocks: int) -> None:
    import json as _json

    from .. import fsutil

    _recover_precompact(spark, path)
    try:
        meta = _json.loads(fsutil.read_text(spark, f"{path}/{_SIMHASH_INDEX_META}"))
    except FileNotFoundError:
        raise ValueError(
            f"no {_SIMHASH_INDEX_META} sidecar at {path}: index was not "
            "written by simhash_index_write, cannot validate parameters"
        ) from None
    except ValueError as e:  # json.JSONDecodeError ⊂ ValueError
        raise ValueError(
            f"{_SIMHASH_INDEX_META} sidecar at {path} is corrupt ({e}): "
            "likely a crash mid-write by an older writer — rebuild the "
            "index (simhash_index_write) or restore the sidecar by hand"
        ) from None
    want = {"kind": "simhash_blocks", "bits": 64, "blocks": blocks}
    if meta != want:
        raise ValueError(
            f"simhash index at {path} was built with {meta}, used with "
            f"{want} — mismatched parameters would corrupt every result"
        )


def _ensure_simhash_index_meta(spark, path: str, blocks: int) -> None:
    """Write-iff-absent / validate-if-present — same restart-drift guard
    as :func:`_ensure_band_index_meta` (review find)."""
    from .. import fsutil

    _recover_precompact(spark, path)
    if fsutil.exists(spark, f"{path}/{_SIMHASH_INDEX_META}"):
        _check_simhash_index_meta(spark, path, blocks)
    else:
        _write_simhash_index_meta(spark, path, blocks)


def simhash_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocks: int = 4,
) -> None:
    """Materialize the corpus's SimHash chunk index (``(doc, simhash,
    blk, chunk)``) as Parquet at ``path``, partitioned by ``blk`` —
    the SimHash twin of :func:`minhash_index_write`: the corpus's
    tokenize→64-lane-vote pipeline runs exactly once here."""
    chunked = _chunked_signatures(
        simhash_signatures(df, text_col, id_col), blocks
    )
    chunked.write.mode("overwrite").partitionBy("blk").parquet(path)
    _write_simhash_index_meta(df.sparkSession, path, blocks)


def simhash_index_append(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocks: int = 4,
) -> None:
    """Fold a probed shard into the frozen SimHash index (validated
    against the parameter sidecar); ``probe → append`` per shard is the
    same incremental-ingest loop :func:`minhash_index_append` documents
    — O(shard) writes, resident files untouched."""
    _check_simhash_index_meta(df.sparkSession, path, blocks)
    _chunked_signatures(simhash_signatures(df, text_col, id_col), blocks).write.mode(
        "append"
    ).partitionBy("blk").parquet(path)


def simhash_probe_candidates(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    partial_recall: bool = False,
    broadcast_new: bool = True,
    index_filter=None,
    materialize: str = "local",
    *,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Incremental SimHash near-dup: pairs (Hamming <= max_hamming)
    between a NEW batch and a frozen chunk index, plus pairs within the
    batch — EXACTLY :func:`simhash_near_duplicates` over (corpus ∪
    batch) filtered to pairs touching the batch (chunk rows are purely
    per-doc; parity pinned in tests/test_dedup.py). Same pigeonhole
    guarantee/opt-out and the same broadcast-probe plan shape as
    :func:`minhash_probe_candidates`: the corpus side never re-hashes
    and never shuffles. ``max_chunk_df`` is the hot-chunk cap computed
    over (index ∪ batch), exactly the batch op's semantics — one extra
    aggregation pass over the index per probe when set. Doc ids must be
    disjoint from the index."""
    if max_hamming >= blocks and not partial_recall:
        raise ValueError(
            f"max_hamming={max_hamming} >= blocks={blocks} voids the "
            "block-permutation recall guarantee (a pair can differ in "
            "every chunk); raise blocks past max_hamming or pass "
            "partial_recall=True to accept the heuristic"
        )
    _check_simhash_index_meta(spark, index_path, blocks)
    new_rows = _materialize(
        _chunked_signatures(simhash_signatures(new_df, text_col, id_col), blocks),
        materialize,
    )
    idx = spark.read.parquet(index_path)
    if index_filter is not None:
        # e.g. the streaming twin's strictly-earlier-batches predicate
        # (a directory-pruning partition filter) — see
        # streaming/dedupe_stream.near_dedup_stream
        idx = idx.filter(index_filter)
    if max_chunk_df is not None:
        hot = F.broadcast(
            idx.select("blk", "chunk")
            .unionByName(new_rows.select("blk", "chunk"))
            .groupBy("blk", "chunk")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_chunk_df)
            .drop("df")
        )
        idx = idx.join(hot, ["blk", "chunk"], "left_anti")
        new_rows = new_rows.join(hot, ["blk", "chunk"], "left_anti")
    probe = F.broadcast(new_rows) if broadcast_new else new_rows.hint("merge")
    hamming_x = F.bit_count(F.col("simhash").bitwiseXOR(F.col("sig_new")))
    cross = (
        idx.join(
            probe.withColumnsRenamed({"doc": "doc_new", "simhash": "sig_new"}),
            ["blk", "chunk"],
        )
        .filter(F.col("doc") != F.col("doc_new"))
        .select(
            F.least("doc", "doc_new").alias("doc_a"),
            F.greatest("doc", "doc_new").alias("doc_b"),
            hamming_x.alias("hamming"),
        )
    )
    a = new_rows.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sig_a"), "blk", "chunk"
    )
    b = new_rows.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sig_b"), "blk", "chunk"
    )
    if not broadcast_new:
        a = a.hint("merge")
    within = (
        a.join(b, ["blk", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
    )
    return (
        cross.unionByName(within)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    max_chunk_df: int | None = None,
    partial_recall: bool = False,
    materialize: str = "local",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, using
    the standard block-permutation trick: split 64 bits into ``blocks``
    chunks; any pair within distance d < blocks must share at least one
    exact chunk → join per chunk, verify Hamming on the full signature.

    The pigeonhole guarantee needs ``max_hamming < blocks``; configs
    outside it silently MISS pairs whose differing bits spread across
    every chunk, so they are rejected loudly unless the caller opts in
    with ``partial_recall=True`` (a legitimate cheap heuristic — more
    blocks means a quadratic candidate-join cost on small chunks).

    Signatures are materialized before the self-join (``materialize=``:
    ``local`` | ``reliable`` — see operators/materialize.py for the
    executor-loss trade-off): otherwise both join branches recompute
    the explode + 64-lane aggregation. At warehouse scale this step is
    "write the signature table, then join it to itself".

    ``max_chunk_df``: optional hot-bucket cap, the SimHash analogue of
    the shingle-df cap (``ngram_jaccard_pairs``): chunk values shared by
    more than this many docs are dropped from the candidate join. On a
    skewed corpus (boilerplate-dominated, a stopword that swamps the
    per-bit vote) one chunk value can collect a large fraction of all
    docs and the self-join on it is O(bucket²) — at 100 TB that single
    bucket is the job. A pair is lost only if ALL its shared chunks are
    hot, i.e. both docs sit entirely inside degenerate clusters; the
    default (None) keeps exact candidate semantics."""
    if max_hamming >= blocks and not partial_recall:
        raise ValueError(
            f"max_hamming={max_hamming} >= blocks={blocks} voids the "
            "block-permutation recall guarantee (a pair can differ in "
            "every chunk); raise blocks past max_hamming or pass "
            "partial_recall=True to accept the heuristic"
        )
    sigs = _materialize(simhash_signatures(df, text_col, id_col), materialize)
    chunked = _chunked_signatures(sigs, blocks)
    if max_chunk_df is not None:
        hot = (
            chunked.groupBy("blk", "chunk")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_chunk_df)
            .drop("df")
        )
        chunked = chunked.join(hot, ["blk", "chunk"], "left_anti")
    return _hamming_pairs(chunked, max_hamming)


def simhash_near_duplicates_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    blocks: int = 4,
    partial_recall: bool = False,
    materialize: str = "local",
) -> DataFrame:
    """Portable-hash twin of :func:`simhash_near_duplicates` — the
    SimHash analogue of :func:`minhash_lsh_candidates_md5` (r13 VERDICT
    task 4): the SAME tokenize → per-bit majority vote → block-
    permutation candidate join → Hamming verify pipeline, with token
    bits drawn from md5 (a hash family every SQL engine ships) instead
    of xxhash64: ONE md5 per token, bit ``b`` = 1 iff hex char ``b+1``
    of ``md5(token)`` is >= '8' (the top bit of each nibble — 32 fair,
    independent coins from one hash; computing md5 once per token in a
    projection instead of per (token, lane) was a measured 32x hash-
    cost cut). Majority is the same strict ``2·n_set > n`` vote;
    signatures are ``bits``-wide integers split into ``blocks`` chunks
    for the pigeonhole join; pairs verify on full-signature Hamming
    distance.

    Exists so the SimHash family has an exactly-replayable SQL oracle
    face; PRODUCTION keeps the xxhash64 pipeline
    (:func:`simhash_near_duplicates` — one 64-bit hash per token beats
    ``bits`` md5 calls per token, and 64-bit signatures discriminate
    better). Same scale shape: one groupBy(doc) shuffle for the vote,
    candidate cost Σ chunk_df² over chunk groups — which is why the
    default is 32 bits / 8-bit chunks, NOT 16/4: 4-bit chunks have
    only 16 distinct values per block, so every block's join collapses
    into 16 O(n²/16) buckets (measured: 22.7k mostly-noise pairs at
    sf0.01; random 16-bit signatures land within Hamming 3 of each
    other ~1% of the time).

    Output: (doc_a, doc_b, hamming), distinct."""
    if bits % blocks:
        raise ValueError(f"blocks={blocks} must divide bits={bits}")
    if max_hamming >= blocks and not partial_recall:
        raise ValueError(
            f"max_hamming={max_hamming} >= blocks={blocks} voids the "
            "block-permutation recall guarantee; raise blocks or pass "
            "partial_recall=True"
        )
    if bits > 32:
        raise ValueError(
            f"bits={bits} > 32: one md5 yields 32 hex chars, one "
            "independent bit each — the portable face stops there "
            "(production simhash_near_duplicates has the 64-bit lanes)"
        )
    # the wide lane/signature expressions are built as SQL strings —
    # one JVM parse per expression instead of hundreds of py4j Column
    # round trips, which measured ~1.3 s of pure driver time per build
    # at bits=32 (the disjoint power-of-two terms make + equal to OR).
    # r16: the per-token bit test is integer arithmetic, not string
    # comparison — hex char b+1 of md5(w) is ≥ '8' exactly when the top
    # bit of its nibble is set, so each 8-hex-char block is parsed ONCE
    # with conv() into a 32-bit integer and every lane reads its bit
    # with shiftright/& (guide §1.2 per-task work: 32 interpreted
    # substring+string-compare evaluations per token became
    # ceil(bits/8) convs + 32 codegen'd shift-ands; identical bits by
    # construction)
    n_segs = (bits + 7) // 8
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).withColumn("h", F.md5("w"))
    tokens = tokens.selectExpr(
        "doc",
        *[
            f"cast(conv(substring(h, {s * 8 + 1}, 8), 16, 10) as bigint)"
            f" AS m{s}"
            for s in range(n_segs)
        ],
    )
    # one expr call for all lanes + reassembly (same r16 py4j cut as
    # simhash_signatures); count(1) dedupes in the aggregate, the lane
    # sums and the disjoint power-of-two terms are unchanged
    sig_sql = " + ".join(
        f"(CASE WHEN 2 * sum(shiftright(m{b // 8}, {31 - 4 * (b % 8)}) & 1) "
        f"> count(1) THEN {1 << b}L ELSE 0L END)"
        for b in range(bits)
    )
    sigs = tokens.groupBy("doc").agg(F.expr(sig_sql).alias("simhash"))
    # materialize before the self-join (same reason as the xxhash64
    # twin): both join branches would otherwise re-run the tokenize +
    # md5 + {bits}-lane vote pipeline (r14 review find)
    sigs = _materialize(sigs, materialize)
    return _hamming_pairs(
        _chunked_signatures(sigs, blocks, bits), max_hamming
    )


def connected_components_twophase(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 50,
    stats: dict | None = None,
    materialize: str = "local",
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) → (doc, component), component = MIN reachable id.

    Converges in O(log n) rounds on ANY graph shape — the alternative to
    ``connected_components`` (min-label propagation, O(diameter) rounds)
    for adversarial long-chain graphs. Per round: two groupBy-min +
    two joins, all shuffling on node id; edge set never grows beyond the
    input (stars only shrink it).

    - large-star: every node's neighbors LARGER than it re-attach to the
      minimum of its neighborhood (incl. itself);
    - small-star: edges are directed larger→smaller; each node and its
      smaller neighbors re-attach to the neighborhood minimum.

    ``stats``: optional dict; receives {"rounds": n} for observability
    (the chain-graph test asserts the O(log n) bound through it).
    ``materialize``: ``local`` | ``reliable`` — per-round lineage cut
    mode (operators/materialize.py); the truncation itself is mandatory
    here, only its fault-tolerance is a knob.
    """
    edges = pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    cur = _materialize(
        edges.filter(F.col("u") != F.col("v")).distinct(), materialize
    )
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # large-star
        sym = cur.unionAll(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over larger→smaller directed edges
        dirred = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = (
            dirred.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        small = (
            dirred.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(mins2.select(F.col("u"), F.col("m").alias("v")))
        )
        new = _materialize(
            small.filter(F.col("u") != F.col("v")).distinct(),
            materialize,
            eager=False,
        )
        # converged when the (distinct) edge set is unchanged: same size
        # and nothing in new that wasn't in cur
        n_new = new.count()
        if n_new == cur.count() and new.exceptAll(cur).isEmpty():
            cur = new
            break
        cur = new
    else:
        # O(log n) convergence means this never fires legitimately —
        # returning the unconverged labeling would be silently wrong
        raise RuntimeError(
            f"connected_components_twophase did not converge in "
            f"{max_iterations} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
    roots = cur.select(F.col("v").alias("u"), F.col("v")).distinct()
    return (
        cur.unionAll(roots)
        .distinct()
        .select(F.col("u").alias("doc"), F.col("v").alias("component"))
    )


def _components_driver_local(
    rows, spark, doc_type: str
) -> DataFrame:
    """Union-find over a COLLECTED pair list → (doc, component) with
    component = MIN reachable id — exactly the fixpoint the distributed
    min-label loop converges to, computed in one pass. Union is
    symmetric and idempotent, so the raw pair rows work directly: no
    symmetrization, dedup or distinct of the edge set is needed first
    (r16: the fast path reads the materialized pair projection and
    skips the symmetrize+distinct shuffle and the loop entirely). Only
    called for pair sets under ``driver_max_edges`` (the caller bounds
    the collect), the same small-side-collapses-to-one-node reasoning
    as a broadcast join."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        u, v = r[0], r[1]
        for n in (u, v):
            if n not in parent:
                parent[n] = n
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN root so every root IS its component's min id
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    out = [(n, find(n)) for n in parent]
    out.sort()
    # slice at parallelize time: createDataFrame(list) would split the
    # local rows into defaultParallelism near-empty Python slices (one
    # worker round-trip each per action). NOT .coalesce(n) — a coalesced
    # task re-reads every parent python-RDD slice at ~150 ms each
    # (measured: coalesce(1) 4.7 s vs 0.3 s for a 1-slice parallelize).
    return spark.createDataFrame(
        spark.sparkContext.parallelize(out, max(1, len(out) // 200_000)),
        f"doc {doc_type}, component {doc_type}",
    )


# Edge-count bound for the driver-local components fast path: 2M edges
# ≈ 32 MB of ids on an 8 GB driver — comfortably collectable, far past
# any candidate-pair graph the test corpora produce, far below what a
# 100 TB near-dup graph can reach (which takes the distributed loop).
COMPONENTS_DRIVER_MAX_EDGES = 2_000_000


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 20,
    materialize: str = "local",
    driver_max_edges: int | None = COMPONENTS_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Connected components over a candidate-pair graph → (doc,
    component), component = MIN doc id reachable. The step real dedup
    pipelines run after pair generation: a near-dup CLUSTER keeps one
    canonical doc.

    Algorithm: iterative min-label propagation. Each round every node
    takes min(own label, neighbors' labels); converges in O(graph
    diameter) rounds (near-dup clusters are small and dense, so 2-4
    rounds in practice — the loop exits early on a converged round via
    one cheap count per iteration). Each round is one join + one
    aggregate, both shuffling on node id; labels are materialized each
    round (``materialize=``: ``local`` | ``reliable``, see operators/
    materialize.py) so the lineage (and its re-execution) doesn't grow
    per round.

    Deterministic: min() over ids, no ordering sensitivity.

    ``driver_max_edges`` (r16): when the pair set is at or under this
    row count, the components are computed with one driver-local
    union-find over the collected pairs instead of the iterative join
    loop — identical output (component = MIN reachable id; union is
    symmetric and idempotent, so the raw pairs need no symmetrization
    or distinct first). The 2-column pair projection is materialized
    ONCE and both regimes read it: the gate is a bounded
    ``limit(n+1).collect()`` against the pinned blocks, the fast path
    union-finds those collected rows, and the big-graph path derives
    the symmetric edge set from the same checkpoint — so the upstream
    pair pipeline is computed exactly once either way (never re-run
    for the gate), while the small graph skips the symmetrize+distinct
    shuffle, the gate count and the O(diameter) join+count rounds —
    all pure scheduling overhead there (measured: the registry's
    256-pair graph spent ~1.6 s in loop rounds and another ~0.4 s in
    edge-set materialization + gate jobs). The cost above the bound is
    the pair-projection checkpoint itself (~16 bytes/row before the
    ~2x-larger symmetric edge set replaces it) plus one cheap bounded
    read. Pass ``None`` to force the loop with no extra
    materialization (the executor-loss harness does: its scenarios
    test the loop's fault behavior).
    """
    proj = pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    if driver_max_edges is not None:
        proj = _materialize(proj, materialize)
        rows = proj.limit(driver_max_edges + 1).collect()
        if len(rows) <= driver_max_edges:
            # id type = the WIDENED type of src ∪ dst — exactly what the
            # distributed loop's symmetrize union produces, so the two
            # regimes return identical schemas even for mixed-width id
            # columns (int src vs bigint dst; r16 advice). Driver-only
            # schema analysis, no job.
            widened = (
                proj.select(F.col("s").alias("x"))
                .unionAll(proj.select(F.col("d").alias("x")))
                .schema["x"]
                .dataType.simpleString()
            )
            return _components_driver_local(
                rows, pairs.sparkSession, widened
            )
    edges = _materialize(
        proj.unionAll(
            proj.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct(),
        materialize,
    )
    labels = _materialize(
        edges.select(F.col("s").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc")),
        materialize,
        # lazy: the first round's join realizes it — one fewer eager
        # job per build (r16); edges above stays eager because BOTH the
        # label init and every round's join read it
        eager=False,
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.s == labels.doc)
            .groupBy(F.col("d").alias("doc2"))
            .agg(F.min("label").alias("nmin"))
        )
        # carry the previous label through the merge: one join computes
        # the new label AND the convergence delta (no second join, no
        # separate materialization job — the count() realizes the lazy
        # checkpoint)
        merged = _materialize(
            labels.join(neighbor_min, labels.doc == F.col("doc2"), "left")
            .select(
                "doc",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            ),
            materialize,
            eager=False,
        )
        changed = merged.filter(F.col("label") != F.col("__old")).count()
        labels = merged.select("doc", "label")
        if changed == 0:
            break
    else:
        # O(diameter) didn't fit the budget (adversarial long-path
        # component). Returning the partial labeling would silently split
        # one real component into many — fail loudly and point at the
        # O(log n) variant, same contract as connected_components_twophase.
        raise RuntimeError(
            f"connected_components (min-label) did not converge in "
            f"{max_iterations} rounds — graph diameter exceeds the budget; "
            "use connected_components_twophase for long-chain graphs"
        )
    return labels.select(F.col("doc"), F.col("label").alias("component"))


# ---- incremental EXACT dedup (digest index + probe) ----
# The exact member of the frozen-index serve-path trio (MinHash and
# SimHash above): continuous ingest should not re-digest or shuffle the
# corpus per shard, and the streaming alternative
# (dropDuplicates[WithinWatermark]) keeps one digest per distinct doc in
# EXECUTOR state stores — unbounded at 100 TB. Here the state is the
# on-disk index: probe classifies a shard's rows against it with one
# broadcast join (zero Exchange above the index scan), append folds the
# survivors in, compact_index/fold_stream_index bound the file counts.

_EXACT_INDEX_META = "_exact_index_meta.json"


def exact_digest_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc, digest, pfx)`` — the exact-dedup analogue of band rows:
    purely per-doc (a doc's row is identical alone or with the corpus,
    which is what makes the frozen index append-able). ``digest`` is
    md5 of the content (cross-engine reproducible, same choice as
    :func:`exact_duplicates`); ``pfx`` = its first hex char, the index
    partition key — 16 uniformly-filled directories give compaction and
    the streaming layout their partition unit WITHOUT multiplying file
    counts (a 256-way first-byte split was measured to cost the probe
    5× in file-open overhead at sf1; pruning never applies here — a
    probe touches all digests — so more dirs buy nothing)."""
    return df.select(
        F.col(id_col).alias("doc"), F.md5(F.col(text_col)).alias("digest")
    ).withColumn("pfx", F.substring("digest", 1, 1))


def _write_exact_index_meta(spark, path: str) -> None:
    import json as _json

    from .. import fsutil

    fsutil.write_text_atomic(
        spark, f"{path}/{_EXACT_INDEX_META}", _json.dumps({"kind": "exact_md5"})
    )


def _check_exact_index_meta(spark, path: str) -> None:
    """No parameters can drift (md5 is md5), but the sidecar still
    guards against pointing an exact probe at a BAND or chunk index —
    the join key would silently be garbage — and hosts the crashed-
    compact recovery hook like every other index entry point."""
    import json as _json

    from .. import fsutil

    _recover_precompact(spark, path)
    try:
        meta = _json.loads(fsutil.read_text(spark, f"{path}/{_EXACT_INDEX_META}"))
    except FileNotFoundError:
        raise ValueError(
            f"no {_EXACT_INDEX_META} sidecar at {path}: index was not "
            "written by exact_index_write, cannot validate"
        ) from None
    except ValueError as e:  # json.JSONDecodeError ⊂ ValueError
        raise ValueError(
            f"{_EXACT_INDEX_META} sidecar at {path} is corrupt ({e}): "
            "likely a crash mid-write by an older writer — rebuild the "
            "index (exact_index_write) or restore the sidecar by hand"
        ) from None
    if meta != {"kind": "exact_md5"}:
        raise ValueError(
            f"index at {path} is {meta}, not an exact_md5 digest index"
        )


def _ensure_exact_index_meta(spark, path: str) -> None:
    from .. import fsutil

    _recover_precompact(spark, path)
    if fsutil.exists(spark, f"{path}/{_EXACT_INDEX_META}"):
        _check_exact_index_meta(spark, path)
    else:
        _write_exact_index_meta(spark, path)


def exact_index_write(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize the corpus's digest index at ``path`` (pay the
    corpus's hashing — and more importantly its TEXT scan — exactly
    once; every future probe only scans 32-byte digests). Repartitioned
    BY the partition value so each dir gets one file per write, not one
    per upstream input split."""
    exact_digest_rows(df, text_col, id_col).repartition(F.col("pfx")).write.mode(
        "overwrite"
    ).partitionBy("pfx").parquet(path)
    _write_exact_index_meta(df.sparkSession, path)


def exact_index_append(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Fold a probed shard into the index (typically after filtering to
    the probe's survivors — appending known duplicates is allowed but
    makes them extra canonical-candidates forever). Parquet append only
    adds files; run :func:`compact_index` (``["pfx"]``) on cadence."""
    _check_exact_index_meta(df.sparkSession, path)
    exact_digest_rows(df, text_col, id_col).repartition(F.col("pfx")).write.mode(
        "append"
    ).partitionBy("pfx").parquet(path)


def _exact_pairs_from_groups(bagg: DataFrame) -> DataFrame:
    """(digest, bmin, bdocs) → (doc_a=bmin, doc_b, digest) pairs — the
    within-batch (bootstrap) expansion; bdocs is batch-sized."""
    return bagg.select(
        F.col("bmin").alias("doc_a"),
        F.explode(F.array_remove(F.col("bdocs"), F.col("bmin"))).alias("doc_b"),
        "digest",
    )


def exact_probe_duplicates(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_new: bool = True,
    index_filter=None,
    materialize: str = "local",
) -> DataFrame:
    """Classify a new shard against the frozen digest index: one row
    ``(doc_a, doc_b, digest)`` per duplicate relation touching the
    shard, ``doc_a`` the content's canonical (the global MIN doc id
    over index ∪ shard holders). The result is EXACTLY the batch
    semantics — ``exact_duplicates`` over (corpus ∪ shard), expanded to
    (canonical, other) pairs — filtered to pairs with a shard side
    (pinned in tests): a shard doc duplicating the corpus pairs with
    the corpus canonical; a shard doc that UNDERCUTS the corpus ids
    (out-of-order ingest) becomes the new canonical and pairs with the
    indexed holders it displaces. Doc ids must be disjoint from the
    indexed corpus, same contract as the MinHash probe.

    Shard rows to KEEP (then :func:`exact_index_append`) are the ones
    absent from ``doc_b``: ``shard.join(pairs, shard.doc_id == doc_b,
    "left_anti")``.

    100 TB story: the shard's digests broadcast to the index scan
    (BroadcastHashJoin — zero Exchange above the corpus-side Parquet
    scan, plan-asserted in tests), so per-shard cost is O(shard hashing
    + corpus scan + matches); the corpus never re-digests.
    ``broadcast_new=False`` falls back to a merge join for a shard too
    large to broadcast. No per-key array is ever built over INDEX rows:
    a degenerate corpus (the same content appended blindly across a
    million shards) pairs through a distributed join in the rare
    undercut case, not a collect_list that concentrates one content's
    million holders into a single aggregation buffer; the only arrays
    are batch-sized (per-shard, caller-bounded)."""
    _check_exact_index_meta(spark, index_path)
    new_rows = _materialize(exact_digest_rows(new_df, text_col, id_col), materialize)
    idx = spark.read.parquet(index_path)
    if index_filter is not None:
        idx = idx.filter(index_filter)
    probe = F.broadcast(new_rows) if broadcast_new else new_rows.hint("merge")
    matched = idx.join(probe.select("digest").distinct(), "digest")
    # SCALAR per digest — never a holder list over index rows
    iagg = matched.groupBy("digest").agg(F.min("doc").alias("imin"))
    bagg = new_rows.groupBy("digest").agg(
        F.min("doc").alias("bmin"), F.collect_list("doc").alias("bdocs")
    )
    # iagg is match-sized (≤ shard digests): broadcast it so the outer
    # join costs no second shuffle of the shard aggregates
    if broadcast_new:
        iagg = F.broadcast(iagg)
    joined = _materialize(bagg.join(iagg, "digest", "left"), materialize)
    # batch-side pairs: canonical vs the batch docs (the index side of
    # the canon=bmin case is handled by the undercut join below)
    canon = F.when(
        F.col("imin").isNull() | (F.col("bmin") < F.col("imin")), F.col("bmin")
    ).otherwise(F.col("imin"))
    partners = F.when(
        F.col("imin").isNull() | (F.col("bmin") < F.col("imin")),
        F.array_remove(F.col("bdocs"), F.col("bmin")),
    ).otherwise(F.col("bdocs"))
    batch_pairs = joined.select(
        canon.alias("doc_a"), F.explode(partners).alias("doc_b"), "digest"
    ).filter(F.col("doc_a") != F.col("doc_b"))
    # undercut case (rare: a shard id below every indexed holder): the
    # new canonical pairs with each displaced index holder — a JOIN
    # against the matched index rows, distributed over however many
    # holders a hot content has
    undercut = joined.filter(
        F.col("imin").isNotNull() & (F.col("bmin") < F.col("imin"))
    ).select("digest", "bmin")
    # ``joined`` is already materialized, so probing it for undercuts is
    # a cheap local job — and when there are none (the overwhelmingly
    # common in-order-ingest case) the undercut branch is dropped
    # ENTIRELY, halving the probe's index-scan cost: ``matched`` feeds
    # both iagg (realized into the checkpoint above) and this branch,
    # so keeping an always-empty union arm re-scanned the whole index a
    # second time at action time for zero rows (r11 self-review; the
    # sf100 warm A/B showed the probe at 1.33x the recompute with the
    # double scan).
    if undercut.isEmpty():
        return batch_pairs
    if broadcast_new:
        undercut = F.broadcast(undercut)
    undercut_pairs = matched.join(undercut, "digest").select(
        F.col("bmin").alias("doc_a"), F.col("doc").alias("doc_b"), "digest"
    )
    return batch_pairs.unionByName(undercut_pairs)


def exact_within_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-batch exact-duplicate pairs ``(doc_a, doc_b, digest)`` —
    the bootstrap (no corpus yet) branch of the probe; equals
    :func:`exact_duplicates` expanded to (canonical, other) pairs."""
    bagg = exact_digest_rows(df, text_col, id_col).groupBy("digest").agg(
        F.min("doc").alias("bmin"), F.collect_list("doc").alias("bdocs")
    )
    return _exact_pairs_from_groups(bagg)
