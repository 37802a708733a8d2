"""DSIR importance resampling (operators/dsir.py) against exact
pure-Python math: the hashed-feature models, per-doc log weights, the
deterministic md5 Gumbel keys, and both selection shapes."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import dsir

B = 64  # small bucket space so collisions are exercised


def _corpus(spark):
    """Raw corpus with a planted 'legal' domain; target = legal-only."""
    legal = [
        "the party of the first part hereby agrees to the terms",
        "pursuant to the agreement the parties shall indemnify",
        "the court finds the defendant liable for the damages",
    ]
    chat = [
        "lol that movie was great tbh",
        "see you at the game tonight ok",
        "haha yeah no worries about it",
    ]
    raw = []
    for i in range(30):
        base = legal[i % 3] if i % 5 == 0 else chat[i % 3]
        raw.append((i, f"{base} v{i}"))
    raw.append((97, ""))  # empty doc: zero features
    target = [(100 + i, t) for i, t in enumerate(legal)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    planted = {i for i in range(30) if i % 5 == 0}
    return mk(raw), mk(target), planted


def _py_buckets(text: str) -> list[int] | None:
    """Expected feature multiset, using Spark itself only for the
    xxhash64 values (the hash is JVM-side by design; the TEST pins the
    n-gram assembly and modulo against a python reference)."""
    ws = [w for w in text.split(" ") if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def test_hashed_ngram_buckets_assembly(spark):
    """Feature extraction = unigrams + adjacent bigrams, one bucket per
    OCCURRENCE, empty tokens dropped, empty docs -> empty array; the
    bucket of each n-gram equals xxhash64(gram) pmod B (checked via a
    literal-hash probe so the assembly and the modulo are both pinned)."""
    rows = [(0, "a b  a"), (1, ""), (2, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            dsir.hashed_ngram_buckets(F.col("text"), B).alias("b"),
        ).collect()
    }
    grams0 = _py_buckets("a b  a")
    assert grams0 == ["a", "b", "a", "a b", "b a"]
    want_hash = {
        g: spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(g)), F.lit(B)).cast("int").alias("h"))
        .first()["h"]
        for g in set(grams0) | {"solo"}
    }
    assert got[0] == [want_hash[g] for g in grams0]
    assert got[1] == []
    assert got[2] == [want_hash["solo"]]


def test_dsir_log_weights_exact_math(spark):
    """log_weight per doc == Σ_b c_b (log p_t[b] - log p_r[b]) with
    add-α smoothing, computed independently in python from the same
    bucket multisets; empty docs get n_features=0 and log_weight=0."""
    raw, target, _ = _corpus(spark)
    alpha = 1.0

    def buckets_of(df):
        return {
            r["doc_id"]: list(r["b"])
            for r in df.select(
                "doc_id", dsir.hashed_ngram_buckets(F.col("text"), B).alias("b")
            ).collect()
        }

    raw_b, tgt_b = buckets_of(raw), buckets_of(target)
    raw_counts = Counter(b for bs in raw_b.values() for b in bs)
    tgt_counts = Counter(b for bs in tgt_b.values() for b in bs)

    def logp(counts):
        denom = sum(counts.values()) + alpha * B
        return lambda b: math.log((counts.get(b, 0) + alpha) / denom)

    lp_t, lp_r = logp(tgt_counts), logp(raw_counts)
    got = {
        r["doc_id"]: r
        for r in dsir.dsir_log_weights(
            raw, target, n_buckets=B, alpha=alpha
        ).collect()
    }
    assert set(got) == set(raw_b)  # every raw doc scored, incl. empty
    for did, bs in raw_b.items():
        want = sum(lp_t(b) - lp_r(b) for b in bs)
        assert got[did]["n_features"] == len(bs)
        assert got[did]["log_weight"] == pytest.approx(want, rel=1e-12), did
    assert got[97]["n_features"] == 0 and got[97]["log_weight"] == 0.0


def test_dsir_select_gumbel_determinism_and_ranking(spark):
    """Selection is deterministic (same inputs+salt -> same set; new
    salt -> generally different set), keys equal log_weight + the md5
    Gumbel draw replicated in python, and the planted target-domain
    docs dominate the selection."""
    raw, target, planted = _corpus(spark)
    k = 6
    sel = dsir.dsir_select(raw, target, k=k, n_buckets=B)
    rows = sel.collect()
    assert len(rows) == k
    # python replica of the deterministic gumbel key
    weights = {
        r["doc_id"]: r["log_weight"]
        for r in dsir.dsir_log_weights(raw, target, n_buckets=B).collect()
    }

    def gumbel(did, salt="dsir"):
        h = hashlib.md5(f"{did}{salt}".encode()).hexdigest()[:13]
        u = (int(h, 16) + 0.5) / 16**13
        return -math.log(-math.log(u))

    for r in rows:
        assert r["gumbel_key"] == pytest.approx(
            weights[r["doc_id"]] + gumbel(r["doc_id"]), rel=1e-12
        )
    want = sorted(weights, key=lambda d: (-(weights[d] + gumbel(d)), d))[:k]
    assert sorted(r["doc_id"] for r in rows) == sorted(want)
    # determinism + salt sensitivity
    again = {r["doc_id"] for r in dsir.dsir_select(raw, target, k=k, n_buckets=B).collect()}
    assert again == {r["doc_id"] for r in rows}
    # a new salt redraws every Gumbel key (the selected SET may
    # coincide on a tiny corpus, the keys cannot — short of an md5
    # collision)
    other_keys = {
        r["doc_id"]: r["gumbel_key"]
        for r in dsir.dsir_select(
            raw, target, k=k, n_buckets=B, salt="s2"
        ).collect()
    }
    for did, key in other_keys.items():
        assert key == pytest.approx(
            weights[did] + gumbel(did, salt="s2"), rel=1e-12
        )
        assert key != pytest.approx(weights[did] + gumbel(did), rel=1e-12)
    # the planted legal docs carry the k highest weights by a wide
    # margin, so even with gumbel noise most of the selection is planted
    assert len({r["doc_id"] for r in rows} & planted) >= k - 2
    # top-k plan: no full sort materialization at the driver
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_dsir_fused_target_pred_matches_two_frame_form(spark):
    """The fused single-source form (target_pred over one frame — the
    r16 one-pass fit) returns EXACTLY the two-frame form's rows: same
    weights bit-for-bit, same selection, same per-domain budgets; rows
    where the predicate is NULL belong to neither side. Misuse (both or
    neither target spec) raises."""
    raw, target, _ = _corpus(spark)
    # one source frame whose %5 slice plays the target; add a NULL-pred
    # row that must land on neither side
    combined = raw.unionByName(target).withColumn(
        "is_t",
        F.when(F.col("doc_id") == 97, F.lit(None).cast("boolean")).otherwise(
            F.col("doc_id") >= 100
        ),
    )
    two = {
        r["doc_id"]: r
        for r in dsir.dsir_log_weights(
            raw.filter(F.col("doc_id") != 97), target, n_buckets=B
        ).collect()
    }
    fused = {
        r["doc_id"]: r
        for r in dsir.dsir_log_weights(
            combined, None, n_buckets=B, target_pred=F.col("is_t")
        ).collect()
    }
    assert set(fused) == set(two)
    for did, r in two.items():
        assert fused[did]["n_features"] == r["n_features"]
        assert fused[did]["log_weight"] == r["log_weight"], did  # exact
    sel_two = dsir.dsir_select(
        raw.filter(F.col("doc_id") != 97), target, k=6, n_buckets=B
    ).collect()
    sel_fused = dsir.dsir_select(
        combined, None, k=6, n_buckets=B, target_pred=F.col("is_t")
    ).collect()
    key = lambda r: (r["doc_id"], r["n_features"], r["log_weight"], r["gumbel_key"])  # noqa: E731
    assert sorted(map(key, sel_two)) == sorted(map(key, sel_fused))
    dom = dsir.dsir_select_per_domain(
        combined.withColumn(
            "domain",
            F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"),
        ),
        None,
        k_per_domain=3,
        domain_col="domain",
        n_buckets=B,
        target_pred=F.col("is_t"),
    ).collect()
    assert Counter(r["domain"] for r in dom) == {"even": 3, "odd": 3}
    with pytest.raises(ValueError, match="exactly one"):
        dsir.dsir_log_weights(raw, target, target_pred=F.lit(True))
    with pytest.raises(ValueError, match="exactly one"):
        dsir.dsir_log_weights(raw, None)


def test_dsir_select_per_domain_budgets(spark):
    raw, target, planted = _corpus(spark)
    domained = raw.withColumn(
        "domain", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    out = dsir.dsir_select_per_domain(
        domained, target, k_per_domain=3, domain_col="domain", n_buckets=B
    )
    rows = out.collect()
    by_dom = Counter(r["domain"] for r in rows)
    assert by_dom == {"even": 3, "odd": 3}
    # within each domain, the kept rows are that domain's top-3 keys
    all_keys = {
        (r["domain"], r["doc_id"]): r["gumbel_key"]
        for r in dsir.dsir_select_per_domain(
            domained, target, k_per_domain=10**6, domain_col="domain",
            n_buckets=B,
        ).collect()
    }
    for dom in ("even", "odd"):
        dom_sorted = sorted(
            (k for k in all_keys if k[0] == dom),
            key=lambda k: (-all_keys[k], k[1]),
        )[:3]
        assert {r["doc_id"] for r in rows if r["domain"] == dom} == {
            d for _, d in dom_sorted
        }
