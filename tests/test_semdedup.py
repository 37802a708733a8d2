"""SemDeDup (operators/semdedup.py) against a pure-numpy reference of
the paper's upper-triangular prune: same centroids, same assignment
rule, same (centroid_sim ASC, id ASC) order, same threshold — the
distributed pass must reproduce the sequential one exactly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import semdedup
from ethereum_analytical_db_spark.operators.similarity import (
    ivf_train_centroids,
)


def make_embeddings(spark, n=120, dim=8, dups=6, seed=0):
    """Deterministic corpus with planted EXACT duplicate groups: ids
    n..n+dups-1 copy vectors 0..dups-1 verbatim."""
    rng = np.random.RandomState(seed)
    base = rng.randn(n, dim).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    rows += [(n + j, [float(x) for x in base[j]]) for j in range(dups)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(5)


def py_semdedup(rows, centroids, threshold):
    """Sequential reference: numpy, one cluster at a time."""
    ids = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows], dtype=np.float64)
    cmat = np.asarray(centroids, dtype=np.float64)
    off = (cmat * cmat).sum(axis=1) / 2.0
    cluster = (v @ cmat.T - off).argmax(axis=1) + 1

    kept = {}
    for c in np.unique(cluster):
        sel = cluster == c
        cid, cv = ids[sel], v[sel]
        norms = np.linalg.norm(cv, axis=1)
        unit = cv / np.where(norms == 0, 1.0, norms)[:, None]
        cc = cmat[c - 1]
        cn = np.linalg.norm(cc)
        csim = (unit @ cc) / cn if cn > 0 else np.zeros(len(cv))
        csim = np.where(norms == 0, 0.0, csim)
        order = np.lexsort((cid, csim))
        u = unit[order].astype(np.float32)
        s = u @ u.T
        dropped = np.zeros(len(cv), dtype=bool)
        for i in range(1, len(cv)):
            if (s[i, :i] >= threshold - 1e-6).any():
                dropped[i] = True
        for pos, d in zip(order, dropped):
            kept[int(cid[pos])] = not bool(d)
    return kept


@pytest.fixture(scope="module")
def emb(spark):
    return make_embeddings(spark)


def test_exact_numpy_parity(spark, emb):
    centroids = ivf_train_centroids(emb, n_centroids=5, iterations=2)
    got = {
        r["vec_id"]: r["kept"]
        for r in semdedup.semantic_dedup(
            emb, threshold=0.9, centroids=centroids
        ).collect()
    }
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    want = py_semdedup(rows, centroids, 0.9)
    assert got == want


def test_exact_duplicates_reduce_to_one(spark, emb):
    out = semdedup.semantic_dedup(emb, threshold=0.999, n_centroids=4, iterations=2)
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    for j in range(6):
        pair = [kept[j], kept[120 + j]]
        assert sorted(pair) == [False, True], (j, pair)


def test_deterministic_across_partitioning(spark, emb):
    centroids = ivf_train_centroids(emb, n_centroids=5, iterations=2)
    a = sorted(
        map(
            tuple,
            semdedup.semantic_dedup(emb, 0.9, centroids=centroids)
            .select("vec_id", "cluster", "kept")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            semdedup.semantic_dedup(
                emb.repartition(13), 0.9, centroids=centroids
            )
            .select("vec_id", "cluster", "kept")
            .collect(),
        )
    )
    assert a == b


def test_salt_split_never_separates_exact_duplicates(spark, emb):
    """max_cluster_rows small enough to force splits: exact duplicates
    hash to the same salt (the salt is over the VECTOR, not the id), so
    each planted pair still reduces to one survivor."""
    out = semdedup.semantic_dedup(
        emb, threshold=0.999, n_centroids=2, iterations=1, max_cluster_rows=10
    )
    kept = {r["vec_id"]: r["kept"] for r in out.collect()}
    assert len(kept) == 126  # every vector got a verdict
    for j in range(6):
        assert sorted([kept[j], kept[120 + j]]) == [False, True]


def test_zero_vector_kept_with_zero_centroid_sim(spark):
    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(20)]
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in semdedup.semantic_dedup(
            df, threshold=0.5, n_centroids=2, iterations=1
        ).collect()
    }
    assert out[99]["kept"] is True
    assert out[99]["centroid_sim"] == 0.0


def test_filter_applies_keep_side(spark, emb):
    docs = emb.select(F.col("vec_id").alias("doc_id"), F.lit("x").alias("text"))
    verdict = semdedup.semantic_dedup(emb, threshold=0.999, n_centroids=4, iterations=2)
    kept_ids = {
        r["vec_id"] for r in verdict.filter(F.col("kept")).collect()
    }
    got = {
        r["doc_id"]
        for r in semdedup.semantic_dedup_filter(docs, verdict).collect()
    }
    assert got == kept_ids
    assert len(got) < 126  # something was actually dropped
