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


# ------------------------------------------------- incremental serve path


def py_online_semdedup(batches, centroids, threshold, seed_kept=None):
    """Sequential reference for the ONLINE contract: greedy
    retained-set dedup in (batch, centroid_sim, id) order — a new point
    drops iff within threshold of a KEPT suppressor (kept resident or
    earlier kept new point of any prior position). ``seed_kept`` maps
    cluster -> list of float32 unit vectors already retained."""
    cmat = np.asarray(centroids, dtype=np.float64)
    off = (cmat * cmat).sum(axis=1) / 2.0
    kept_units = {k: list(v) for k, v in (seed_kept or {}).items()}
    verdicts = {}
    for rows in batches:
        ids = np.array([r[0] for r in rows])
        v = np.array([r[1] for r in rows], dtype=np.float64)
        cluster = (v @ cmat.T - off).argmax(axis=1) + 1
        for c in np.unique(cluster):
            sel = cluster == c
            cid, cv = ids[sel], v[sel]
            norms = np.linalg.norm(cv, axis=1)
            unit = cv / np.where(norms == 0, 1.0, norms)[:, None]
            cc = cmat[c - 1]
            cn = np.linalg.norm(cc)
            csim = (unit @ cc) / cn if cn > 0 else np.zeros(len(cv))
            csim = np.where(norms == 0, 0.0, csim)
            for pos in np.lexsort((cid, csim)):
                u32 = unit[pos].astype(np.float32)
                sup = kept_units.get(int(c), [])
                hit = any(float(u32 @ s) >= threshold - 1e-6 for s in sup)
                verdicts[int(cid[pos])] = not hit
                if not hit:
                    kept_units.setdefault(int(c), []).append(u32)
    return verdicts


def _kept_units_from_index(spark, path, centroids):
    """Rebuild the reference's retained-set seed from the index's kept
    members (cluster -> float32 unit vectors)."""
    seed = {}
    for r in spark.read.parquet(path).filter("kept").collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        n = np.linalg.norm(v)
        u = (v / (n if n else 1.0)).astype(np.float32)
        seed.setdefault(int(r["cluster"]), []).append(u)
    return seed


def _batches(n_batches=3, per=40, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    out, nid = [], 0
    for b in range(n_batches):
        rows = [
            (nid + i, [float(x) for x in rng.randn(dim)]) for i in range(per)
        ]
        if b > 0:
            # plant cross-batch exact duplicates of batch 0's rows 1/2
            rows[0] = (rows[0][0], out[0][1][1])
            rows[1] = (rows[1][0], out[0][2][1])
        out.append(rows)
        nid += per
    return out


@pytest.fixture()
def served(spark, tmp_path):
    """A fresh index per test (probe tests mutate via append)."""
    path = str(tmp_path / "semdedup_idx")
    batches = _batches()
    df0 = spark.createDataFrame(
        batches[0], "vec_id long, embedding array<float>"
    )
    centroids = semdedup.semdedup_index_write(
        df0, path, threshold=0.9, n_centroids=3, iterations=2
    )
    return path, centroids, batches


def test_probe_append_matches_sequential_model(spark, served):
    """K batches through probe+append == the pure-Python greedy
    retained-set replay seeded with the index's kept members, verdict
    for verdict."""
    path, centroids, batches = served
    seed = _kept_units_from_index(spark, path, centroids)
    got = {}
    for rows in batches[1:]:
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semdedup.semdedup_index_append(df, path, centroids)
        for r in out.collect():
            got[r["vec_id"]] = r["kept"]
    ref = py_online_semdedup(batches[1:], centroids, 0.9, seed_kept=seed)
    assert got == ref
    assert sum(1 for v in got.values() if not v) >= 2  # planted dups dropped


def test_probe_idempotent_and_residents_stable(spark, served, tmp_path):
    """Verdicts are append-only: re-probing the same batch (no append)
    is idempotent, and appending a batch never changes any resident's
    stored verdict. (Arrival ORDER matters by contract — merging two
    batches into one may legitimately differ from probing sequentially,
    so that is deliberately NOT asserted.)"""
    path, centroids, batches = served
    before = {
        r["vec_id"]: r["kept"] for r in spark.read.parquet(path).collect()
    }
    df = spark.createDataFrame(
        batches[1], "vec_id long, embedding array<float>"
    )
    p1 = {
        r["vec_id"]: r["kept"]
        for r in semdedup.semdedup_probe(df, path, centroids).collect()
    }
    p2 = {
        r["vec_id"]: r["kept"]
        for r in semdedup.semdedup_probe(df, path, centroids).collect()
    }
    assert p1 == p2
    ap = {
        r["vec_id"]: r["kept"]
        for r in semdedup.semdedup_index_append(df, path, centroids).collect()
    }
    assert ap == p1  # append's verdicts are the probe's verdicts
    after = {
        r["vec_id"]: r["kept"] for r in spark.read.parquet(path).collect()
    }
    assert {k: v for k, v in after.items() if k in before} == before
    assert {k: v for k, v in after.items() if k not in before} == p1


def test_probe_prunes_partitions_and_validates(spark, served):
    path, centroids, batches = served
    df = spark.createDataFrame(
        batches[1][:5], "vec_id long, embedding array<float>"
    )
    # eager=False keeps the verdict frame lazy so its executed plan —
    # the pruning evidence — stays inspectable; the default eager exit
    # checkpoints it into a Scan ExistingRDD. Release the assignment
    # cache ourselves afterwards (the eager=False contract).
    lazy = semdedup.semdedup_probe(df, path, centroids, eager=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "cluster" in pf[1][:200]

    bad = [[c + 1.0 for c in row] for row in centroids]
    with pytest.raises(ValueError, match="centroids do not match"):
        semdedup.semdedup_probe(df, path, bad)
    with pytest.raises(ValueError, match="threshold"):
        semdedup.semdedup_probe(df, path, centroids, threshold=0.5)
    from ethereum_analytical_db_spark.operators import similarity as sim

    sim._write_index_meta(spark, path + "_k", {"kind": "ivf"})
    with pytest.raises(ValueError, match="not semdedup"):
        semdedup.semdedup_probe(df, path + "_k", centroids)


def test_planted_cross_batch_duplicates_dropped(spark, served):
    """Replicas of batch 0's KEPT vectors must be dropped by the probe
    (cosine 1.0 to a kept resident)."""
    path, centroids, batches = served
    kept0 = {r["vec_id"]: r["kept"] for r in spark.read.parquet(path).collect()}
    df = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["kept"]
        for r in semdedup.semdedup_probe(df, path, centroids).collect()
    }
    assert len(out) == len(batches[1])  # probe covers the whole batch
    checked = 0
    for dup_id, src_id in [
        (batches[1][0][0], batches[0][1][0]),
        (batches[1][1][0], batches[0][2][0]),
    ]:
        if kept0[src_id]:
            assert not out[dup_id]
            checked += 1
    assert checked >= 1  # the fixture really exercised the resident hit


def test_probe_chunked_path_matches_single_pass(spark, served):
    """A max_cluster_rows below the resident counts arms the two-phase
    chunked plan (resident-hit per capped (cluster, chunk) task, then
    the greedy pass per cluster); verdicts must be identical to the
    single-pass plan — the r12 advisor find was that the single-pass
    group input is unbounded on runaway clusters, and the fix may not
    change semantics."""
    path, centroids, batches = served
    df = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    single = {
        r["vec_id"]: (r["kept"], r["cluster"], round(r["centroid_sim"], 9))
        for r in semdedup.semdedup_probe(df, path, centroids).collect()
    }
    chunked = {
        r["vec_id"]: (r["kept"], r["cluster"], round(r["centroid_sim"], 9))
        for r in semdedup.semdedup_probe(
            df, path, centroids, max_cluster_rows=3
        ).collect()
    }
    assert chunked == single
    # the cap really armed the chunked plan: with 40 batch-0 rows over
    # 3 clusters, at least one touched cluster holds > 3 kept residents
    kept_per_cluster: dict[int, int] = {}
    for r in spark.read.parquet(path).filter("kept").collect():
        kept_per_cluster[r["cluster"]] = kept_per_cluster.get(r["cluster"], 0) + 1
    assert max(kept_per_cluster.values()) > 3


def test_probe_append_chunked_matches_sequential_model(spark, served):
    """The full probe+append loop under a tiny max_cluster_rows (every
    batch runs the chunked plan) still equals the pure-Python greedy
    retained-set replay — the online contract is path-independent."""
    path, centroids, batches = served
    seed = _kept_units_from_index(spark, path, centroids)
    got = {}
    for rows in batches[1:]:
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semdedup.semdedup_index_append(
            df, path, centroids, max_cluster_rows=2
        )
        for r in out.collect():
            got[r["vec_id"]] = r["kept"]
    ref = py_online_semdedup(batches[1:], centroids, 0.9, seed_kept=seed)
    assert got == ref


def test_sidecar_kept_counts_maintained_and_probe_equivalent(spark, served):
    """r13: the index sidecar caches the per-cluster kept-count census
    so probes size the runaway-cluster guard without a per-probe scan.
    Write seeds it, append maintains it (write+append == fresh census),
    a probe with the sidecar counts equals one forced onto the census
    fallback, and a pre-census index (key absent) never gets a partial
    seed from an append."""
    from ethereum_analytical_db_spark.operators.similarity import (
        _read_index_meta,
        _write_index_meta,
    )

    path, centroids, batches = served

    def census():
        out = {}
        for r in spark.read.parquet(path).filter("kept").collect():
            out[str(r["cluster"])] = out.get(str(r["cluster"]), 0) + 1
        return out

    meta = _read_index_meta(spark, path)
    assert meta["kept_per_cluster"] == census()

    df = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    semdedup.semdedup_index_append(df, path, centroids)
    meta = _read_index_meta(spark, path)
    assert meta["kept_per_cluster"] == census()

    # probe parity: sidecar counts vs census fallback (key stripped)
    df2 = spark.createDataFrame(batches[2], "vec_id long, embedding array<float>")
    with_meta = {
        r["vec_id"]: (r["kept"], r["cluster"])
        for r in semdedup.semdedup_probe(df2, path, centroids).collect()
    }
    stripped = dict(meta)
    stripped.pop("kept_per_cluster")
    _write_index_meta(spark, path, stripped)
    without_meta = {
        r["vec_id"]: (r["kept"], r["cluster"])
        for r in semdedup.semdedup_probe(df2, path, centroids).collect()
    }
    assert with_meta == without_meta

    # pre-census index: append must NOT seed a partial count map
    semdedup.semdedup_index_append(df2, path, centroids)
    assert "kept_per_cluster" not in _read_index_meta(spark, path)


def test_sidecar_self_heals_after_simulated_crash_drift(spark, served):
    """r13 advisor: the parquet append and the sidecar update are not
    atomic — a crash between them leaves the cluster undercounted, and
    delta arithmetic would carry that drift forever. The append now
    REBUILDS the touched clusters' counts from the index, so a
    deliberately-corrupted (undercounted) sidecar heals on the next
    append that touches the cluster."""
    from ethereum_analytical_db_spark.operators.similarity import (
        _read_index_meta,
        _write_index_meta,
    )

    path, centroids, batches = served
    meta = _read_index_meta(spark, path)
    corrupted = {k: 1 for k in meta["kept_per_cluster"]}  # deep undercount
    meta["kept_per_cluster"] = corrupted
    _write_index_meta(spark, path, meta)

    df = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    touched = {
        str(r["cluster"])
        for r in semdedup.semdedup_index_append(df, path, centroids)
        .select("cluster")
        .distinct()
        .collect()
    }
    census = {}
    for r in spark.read.parquet(path).filter("kept").collect():
        census[str(r["cluster"])] = census.get(str(r["cluster"]), 0) + 1
    healed = _read_index_meta(spark, path)["kept_per_cluster"]
    for c in touched:
        assert healed[c] == census.get(c, 0), (c, healed, census)
    for c in set(corrupted) - touched:  # untouched clusters stay stale
        assert healed[c] == 1


def test_probe_near_limit_census_belt(spark, served):
    """r13 advisor, probe side: an undercounted sidecar near the
    chunking limit must not silently disarm the runaway-cluster guard.
    When any touched count reaches half of max_cluster_rows the probe
    pays the census and takes max(sidecar, census) — so a sidecar
    reporting just-under-limit on a genuinely over-limit cluster still
    arms the chunked plan. (A DEEP undercount below the half band keeps
    the single-pass plan by design — bounded-cost trade covered by the
    self-healing append recount.)"""
    from ethereum_analytical_db_spark.operators.similarity import (
        _read_index_meta,
        _write_index_meta,
    )

    path, centroids, batches = served
    census = {}
    for r in spark.read.parquet(path).filter("kept").collect():
        census[str(r["cluster"])] = census.get(str(r["cluster"]), 0) + 1
    big = max(census, key=census.get)
    limit = census[big] - 1  # the big cluster is genuinely over-limit
    assert limit >= 2

    meta = _read_index_meta(spark, path)
    near = dict(meta["kept_per_cluster"])
    near[big] = (limit + 1) // 2  # near-limit undercount: belt triggers
    meta["kept_per_cluster"] = near
    _write_index_meta(spark, path, meta)

    df = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    stats: dict = {}
    out = semdedup.semdedup_probe(
        df, path, centroids, max_cluster_rows=limit, stats=stats
    )
    assert stats["plan"] == "chunked", stats
    assert stats["res_counts"][int(big)] == census[big]
    # and the verdicts equal a fresh-census probe (counts pick the plan,
    # never the answer)
    ref = semdedup.semdedup_probe(df, path, centroids, max_cluster_rows=limit)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))


def test_probe_releases_assignment_cache(spark, served):
    """r13 advisor: semdedup_probe persisted the batch assignment and
    never unpersisted it — one leaked cached DataFrame per micro-batch
    for the life of a semantic stream. The verdict frame is now
    materialized eagerly (it is micro-batch-sized) and the cache
    released before returning. Pinned via the CacheManager (plan-level
    caches are never GC-reclaimed — the leak class) rather than
    getPersistentRDDs (which also lists the checkpoint's RDD blocks,
    legitimately alive while the returned frame is referenced and
    ContextCleaner-reclaimed once it is dropped)."""
    path, centroids, batches = served
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    df = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    out = semdedup.semdedup_probe(df, path, centroids)
    assert out.count() == len(batches[1])
    assert cm.isEmpty()  # no plan-level cache left behind
    # eager=False is the documented opt-out: the cache stays, owned by
    # the caller
    out2 = semdedup.semdedup_probe(df, path, centroids, eager=False)
    assert out2.count() == len(batches[1])
    assert not cm.isEmpty()
    spark.catalog.clearCache()


def test_semdedup_index_compact_bounds_files_and_keeps_verdicts(spark, served):
    """r13 VERDICT task 5: the batch incremental-ingest loop
    (semdedup_index_append) lands one parquet file per batch×cluster
    forever; compact_index over the semdedup root must (a) bound the
    layout at one file per cluster directory, (b) carry the meta
    sidecar — kept-count census included — verbatim, (c) leave the
    index content and a post-compact probe's verdicts identical, and
    (d) keep the append loop working afterwards."""
    import glob

    from ethereum_analytical_db_spark.operators import dedup
    from ethereum_analytical_db_spark.operators.similarity import (
        _read_index_meta,
    )

    path, centroids, batches = served
    df1 = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    semdedup.semdedup_index_append(df1, path, centroids)
    df2 = spark.createDataFrame(batches[2], "vec_id long, embedding array<float>")
    probe_before = sorted(
        map(tuple, semdedup.semdedup_probe(df2, path, centroids).collect())
    )
    content_before = sorted(
        (r["vec_id"], r["cluster"], r["kept"])
        for r in spark.read.parquet(path).collect()
    )
    meta_before = _read_index_meta(spark, path)
    n_clusters = len({c for _, c, _ in content_before})
    files_before = glob.glob(f"{path}/cluster=*/*.parquet")
    assert len(files_before) > n_clusters  # appends did fragment it

    dedup.compact_index(spark, path, ["cluster"])

    files_after = glob.glob(f"{path}/cluster=*/*.parquet")
    assert len(files_after) == n_clusters  # one file per cluster dir
    assert _read_index_meta(spark, path) == meta_before  # census survives
    content_after = sorted(
        (r["vec_id"], r["cluster"], r["kept"])
        for r in spark.read.parquet(path).collect()
    )
    assert content_after == content_before
    probe_after = sorted(
        map(tuple, semdedup.semdedup_probe(df2, path, centroids).collect())
    )
    assert probe_after == probe_before
    # the loop keeps going: append after compact, sidecar stays truthful
    out = semdedup.semdedup_index_append(df2, path, centroids)
    assert out.count() == len(batches[2])
    census = {}
    for r in spark.read.parquet(path).filter("kept").collect():
        census[str(r["cluster"])] = census.get(str(r["cluster"]), 0) + 1
    healed = _read_index_meta(spark, path)["kept_per_cluster"]
    for c, n in census.items():
        assert healed.get(c) == n


def test_train_fraction_deterministic_and_equivalent_shape(spark, emb):
    """Sampled-quantizer training: deterministic for a fixed fraction,
    same output shape/coverage; with fraction=1.0 it is byte-identical
    to the unsampled path."""
    a = sorted(
        map(
            tuple,
            semdedup.semantic_dedup(
                emb, 0.9, n_centroids=5, iterations=2, train_fraction=0.5
            )
            .select("vec_id", "cluster", "kept")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            semdedup.semantic_dedup(
                emb.repartition(9), 0.9, n_centroids=5, iterations=2,
                train_fraction=0.5,
            )
            .select("vec_id", "cluster", "kept")
            .collect(),
        )
    )
    assert a == b
    assert len(a) == 126
    full = sorted(
        map(
            tuple,
            semdedup.semantic_dedup(
                emb, 0.9, n_centroids=5, iterations=2, train_fraction=1.0
            )
            .select("vec_id", "cluster", "kept")
            .collect(),
        )
    )
    unsampled = sorted(
        map(
            tuple,
            semdedup.semantic_dedup(emb, 0.9, n_centroids=5, iterations=2)
            .select("vec_id", "cluster", "kept")
            .collect(),
        )
    )
    assert full == unsampled


def test_empty_embeddings_returns_empty_verdict(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semdedup.semantic_dedup(df, threshold=0.9, n_centroids=4, iterations=1)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "cluster", "centroid_sim", "kept"}


def test_probe_blocked_gemm_matches_unblocked(spark, served, monkeypatch):
    """Forcing the probe's slab size to 3 must not change a single
    verdict — the blocked resident/greedy path is pure evaluation
    order."""
    path, centroids, batches = served
    df = spark.createDataFrame(batches[1], "vec_id long, embedding array<float>")
    base = {
        r["vec_id"]: r["kept"]
        for r in semdedup.semdedup_probe(df, path, centroids).collect()
    }
    monkeypatch.setattr(semdedup, "_BLOCK", 3)
    small = {
        r["vec_id"]: r["kept"]
        for r in semdedup.semdedup_probe(df, path, centroids).collect()
    }
    assert base == small
