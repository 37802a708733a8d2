"""Deterministic hash-split operator."""

from ethereum_analytical_db_spark.operators.sampling import hash_split


def test_split_deterministic_and_proportional(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out = hash_split(df, "id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] / 2000 - 0.90) < 0.03
    assert abs(counts["valid"] / 2000 - 0.05) < 0.02
    assert abs(counts["test"] / 2000 - 0.05) < 0.02
    # stable across partitionings and reruns
    again = {r["id"]: r["split"] for r in hash_split(df.repartition(7), "id").collect()}
    first = {r["id"]: r["split"] for r in out.collect()}
    assert first == again


def test_split_salt_independence(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = {r["id"]: r["split"] for r in hash_split(df, "id", salt="a").collect()}
    b = {r["id"]: r["split"] for r in hash_split(df, "id", salt="b").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 0  # different salts give a genuinely different split


def test_stratified_sample_matches_duckdb(spark):
    """The kept row set is exactly reproducible in DuckDB (same salted
    md5 thresholds) — i.e. the sample is engine-independent."""
    import duckdb

    from ethereum_analytical_db_spark.operators.sampling import (
        _hex4,
        stratified_sample,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    fr = {"en": 0.5, "de": 0.25}
    kept = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", fr, "doc_id", salt="s1", default_fraction=0.1
        ).collect()
    }
    oracle = {
        row[0]
        for row in duckdb.sql(
            f"""
            SELECT doc_id FROM read_parquet('{sf}/documents.parquet')
            WHERE substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 4) <
                  CASE lang
                    WHEN 'en' THEN '{_hex4(0.5)}'
                    WHEN 'de' THEN '{_hex4(0.25)}'
                    ELSE '{_hex4(0.1)}'
                  END
            """
        ).fetchall()
    }
    assert kept == oracle and len(kept) > 0


def test_stratified_sample_rates_and_determinism(spark):
    from ethereum_analytical_db_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(6000)],
        "id long, stratum string",
    )
    fr = {"a": 1.0, "b": 0.3, "c": 0.0}
    out = stratified_sample(df, "stratum", fr, "id")
    counts = {
        r["stratum"]: r["count"]
        for r in out.groupBy("stratum").count().collect()
    }
    assert counts.get("a") == 2000          # fraction 1.0 keeps everything
    assert "c" not in counts                # fraction 0.0 drops everything
    assert abs(counts["b"] / 2000 - 0.3) < 0.04
    # partition-layout independence (sampleBy can't promise this)
    a = {r["id"] for r in out.collect()}
    b = {
        r["id"]
        for r in stratified_sample(
            df.repartition(11), "stratum", fr, "id"
        ).collect()
    }
    assert a == b

    # unknown stratum + default_fraction=1.0 passes through
    full = stratified_sample(
        df, "stratum", {"zzz": 0.5}, "id", default_fraction=1.0
    )
    assert full.count() == 6000


def test_stratified_sample_monotone_in_fraction(spark):
    """Threshold sampling's signature invariant (Bernoulli sampling has
    no analogue): raising a stratum's fraction only ADDS rows — the
    smaller sample is a strict subset of the larger one. This is what
    makes iterative corpus re-balancing reproducible: bumping one
    source's rate never churns the rows already selected."""
    from ethereum_analytical_db_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "s") for i in range(3000)], "id long, stratum string"
    )
    small = {r["id"] for r in stratified_sample(df, "stratum", {"s": 0.2}, "id").collect()}
    big = {r["id"] for r in stratified_sample(df, "stratum", {"s": 0.6}, "id").collect()}
    assert small < big  # strict subset


def test_stratified_sample_null_ids_always_dropped(spark):
    """NULL ids have no deterministic hash assignment; they are dropped
    uniformly — including in fraction-1.0 strata — instead of the
    discontinuous keep-at-1.0 / drop-below-1.0 a naive NULL-comparison
    filter would produce."""
    from ethereum_analytical_db_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(None, "a"), (1, "a"), (None, "b"), (2, "b")],
        "id long, stratum string",
    )
    out = stratified_sample(df, "stratum", {"a": 1.0, "b": 0.999}, "id")
    ids = {r["id"] for r in out.collect()}
    assert None not in ids
    assert 1 in ids  # fraction-1.0 stratum keeps every non-null row


def test_dataset_split_kept_flag_is_shuffle_free_and_matches_filter_form(spark):
    """The split/kept columns (hosted by text_quality since fold #6,
    r15; formerly the standalone dataset_split query) derive `kept`
    from the stratified_sample PREDICATE as a column (keep_column) —
    the filter-then-join-back form shuffled the full table twice for a
    per-row literal CASE (review find). Pin both halves: the physical
    plan holds no Exchange and no Join, and the flag agrees row-for-row
    with the filter form's membership."""
    import os

    from ethereum_analytical_db_spark.operators.sampling import stratified_sample
    from ethereum_analytical_db_spark.plans.pipeline import text_quality

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    out = text_quality(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the host's one Exchange is docs_table's deliberate round-robin
    # scan-parallelism repartition (present before the fold); the pin is
    # that the kept/split columns add no KEYED shuffle and no join
    assert plan.count("Exchange") == plan.count(
        "Exchange RoundRobinPartitioning"
    ), plan
    assert "Join" not in plan, plan

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    kept_ids = {
        r["doc_id"]
        for r in stratified_sample(
            docs, "lang", {"en": 1.0, "de": 0.3, "fr": 0.1}, "doc_id",
            default_fraction=0.05,
        ).select("doc_id").collect()
    }
    rows = out.select("doc_id", "kept").collect()
    assert {r["doc_id"] for r in rows if r["kept"]} == kept_ids
    assert all(r["kept"] is not None for r in rows)


def test_mixture_resample_semantics(spark):
    """Deterministic mixture resampling: integer weights replicate
    exactly, fractional weights hit the expected rate, w<=1 reduces to
    the stratified_sample keep set, copy indexes are contiguous from 0,
    NULL ids drop, negative weights raise, and the plan is shuffle-free
    (projection + explode only)."""
    import pytest

    from ethereum_analytical_db_spark.operators.sampling import (
        mixture_resample,
        stratified_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)] + [(None, "a")]
    df = spark.createDataFrame(rows, "id long, dom string")
    out = mixture_resample(df, "dom", {"a": 3.0, "b": 0.4}, "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan

    pdf = out.toPandas()
    assert not pdf["id"].isna().any()  # NULL id contributes nothing
    a = pdf[pdf.dom == "a"]
    assert len(a) == 3000  # integer weight: exactly 3 copies each
    assert set(a.groupby("id")["copy"].apply(lambda s: tuple(sorted(s)))) == {(0, 1, 2)}
    b = pdf[pdf.dom == "b"]
    assert set(b["copy"]) == {0}
    assert 0.3 * 1000 < len(b) < 0.5 * 1000  # ~40% of 1000
    # w <= 1: the surviving id set IS the stratified_sample keep set
    # (same salt, same threshold)
    kept = {
        r["id"]
        for r in stratified_sample(
            df, "dom", {"b": 0.4}, "id", salt="mixture"
        ).filter("dom = 'b'").collect()
    }
    assert set(b["id"]) == kept
    # determinism: a second plan collects the identical multiset
    again = mixture_resample(df, "dom", {"a": 3.0, "b": 0.4}, "id").toPandas()
    assert sorted(map(tuple, pdf.values.tolist())) == sorted(map(tuple, again.values.tolist()))
    # unknown stratum with default_weight=0 vanishes
    extra = spark.createDataFrame([(7, "zz")], "id long, dom string")
    assert mixture_resample(extra, "dom", {"a": 1.0}, "id").count() == 0
    with pytest.raises(ValueError, match="< 0"):
        mixture_resample(df, "dom", {"a": -1.0}, "id").count()


def test_mixture_resample_refuses_column_collisions(spark):
    """withColumn silently replaces same-named columns, so inputs that
    already carry `copy` (default copy_col) or `_copies` are refused
    (review find)."""
    import pytest

    from ethereum_analytical_db_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame([(1, "a", 0)], "id long, dom string, copy long")
    with pytest.raises(ValueError, match="overwrite"):
        mixture_resample(df, "dom", {"a": 1.0}, "id")
    out = mixture_resample(df, "dom", {"a": 1.0}, "id", copy_col="replica")
    assert out.columns == ["id", "dom", "copy", "replica"]
    df2 = spark.createDataFrame([(1, "a", 0)], "id long, dom string, _copies long")
    with pytest.raises(ValueError, match="overwrite"):
        mixture_resample(df2, "dom", {"a": 1.0}, "id")


def test_mixture_and_chunk_run_on_streams(spark, tmp_path):
    """mixture_resample and chunk_documents are stateless projections,
    so they run DIRECTLY on streaming frames (no foreachBatch needed)
    and equal their batch results — the property that makes the
    continuous-ingest story free for these stages."""
    from ethereum_analytical_db_spark.operators.packing import chunk_documents
    from ethereum_analytical_db_spark.operators.sampling import mixture_resample
    from ethereum_analytical_db_spark.streaming import stream as st

    rows = [(i, ["a", "b"][i % 2], " ".join(f"w{i}x{j}" for j in range(10))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, dom string, text string")
    src = tmp_path / "docs"
    src.mkdir()
    df.coalesce(2).write.mode("append").parquet(str(src))
    stream = st.stream_from_files(spark, str(src), df.schema)

    for name, fn in (
        ("mix", lambda d: mixture_resample(d.select("doc_id", "dom"), "dom", {"a": 2.0, "b": 0.5}, "doc_id")),
        ("chunk", lambda d: chunk_documents(d, max_tokens=4, overlap=1)),
    ):
        q = (
            fn(stream).writeStream.format("memory").queryName(f"s_{name}")
            .outputMode("append").trigger(availableNow=True).start()
        )
        st.run_available_now(q)
        got = sorted(map(tuple, spark.table(f"s_{name}").collect()))
        want = sorted(map(tuple, fn(df).collect()))
        assert got == want
