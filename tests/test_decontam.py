"""Benchmark decontamination + PII scrubbing (training-data hygiene
pack): planted-contamination behavior, and a DuckDB cross-check of the
overlap math on the same synthetic corpus (these operators are
registered rows-only — the driver's 50-entry correctness window is full
— so the engine-vs-engine check lives here instead)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.operators import decontam, text as t


def _mk_corpus(spark):
    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(300)]
    bench_rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(30))) for i in range(5)
    ]
    docs = []
    for i in range(20):
        docs.append((i, " ".join(rnd.choice(vocab) for _ in range(40))))
    # doc 100: verbatim copy of a benchmark doc (fully contaminated)
    docs.append((100, bench_rows[0][1]))
    # doc 101: half benchmark words, half fresh (partially contaminated)
    half = bench_rows[1][1].split()[:15]
    docs.append((101, " ".join(half + [rnd.choice(vocab) for _ in range(15)])))
    # doc 102: shorter than n words (no shingles — must survive)
    docs.append((102, "tiny doc"))
    bench = spark.createDataFrame(bench_rows, "bid long, text string")
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    return corpus, bench, bench_rows, docs


def test_planted_contamination_flagged_and_dropped(spark):
    corpus, bench, _, docs = _mk_corpus(spark)
    scores = {
        r["doc"]: r["overlap_frac"]
        for r in decontam.benchmark_ngram_overlap(corpus, bench, n=8).collect()
    }
    assert scores[100] == pytest.approx(1.0)
    assert scores[101] > 0.2
    assert 102 not in scores  # sub-n-word doc produces no shingles
    clean_scores = [v for k, v in scores.items() if k < 100]
    assert max(clean_scores) < 0.05  # random docs share no 8-gram

    kept = decontam.decontaminate(corpus, bench, n=8, max_overlap=0.1)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 100 not in kept_ids and 101 not in kept_ids
    assert 102 in kept_ids and all(i in kept_ids for i in range(20))


def test_decontaminate_score_docs_superset_parity(spark):
    """r17: scoring contamination over a SUPERSET frame (identical
    text for shared ids) must keep exactly the same rows — extra
    superset rows only produce contaminated ids the anti-join's left
    side doesn't contain. This is the clean_corpus wiring: the cached
    pre-perplexity prefix scores the post-keep-join stream."""
    corpus, bench, _, _ = _mk_corpus(spark)
    # docs = a filtered slice of corpus that still contains planted
    # contamination (drop doc 100, keep 101) plus clean rows
    docs = corpus.filter(F.col("doc_id") != 100).filter(
        F.col("doc_id") % 3 != 1
    )
    default = sorted(
        map(tuple, decontam.decontaminate(docs, bench, n=8).collect())
    )
    superset = sorted(
        map(
            tuple,
            decontam.decontaminate(
                docs, bench, n=8, score_docs=corpus
            ).collect(),
        )
    )
    assert default == superset and len(default) > 0


def test_overlap_matches_duckdb(spark):
    """Engine-vs-engine: the same shingle/overlap math in DuckDB SQL."""
    corpus, bench, bench_rows, docs = _mk_corpus(spark)
    got = {
        (r["doc"], r["n_shingles"], r["n_hit"])
        for r in decontam.benchmark_ngram_overlap(corpus, bench, n=8).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    con.execute("CREATE TABLE bench (bid BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO bench VALUES (?, ?)", bench_rows)
    want = set(
        map(
            tuple,
            con.execute(
                """
        WITH shingle AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(words) - 6, 1)),
                   i -> list_aggregate(words[i:i+7], 'string_agg', ' ')
                 ))) AS ngram
          FROM (SELECT doc_id, string_split(text, ' ') AS words FROM docs)
          WHERE len(words) >= 8
        ),
        bshingle AS (
          SELECT DISTINCT unnest(list_transform(
                   range(1, greatest(len(words) - 6, 1)),
                   i -> list_aggregate(words[i:i+7], 'string_agg', ' ')
                 )) AS ngram
          FROM (SELECT string_split(text, ' ') AS words FROM bench)
          WHERE len(words) >= 8
        )
        SELECT s.doc_id, count(*) AS n_shingles,
               sum(CASE WHEN b.ngram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM shingle s LEFT JOIN bshingle b USING (ngram)
        GROUP BY s.doc_id
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_pii_counts_and_scrub(spark):
    rows = [
        (0, "contact bob.smith+x@example.co.uk or 10.0.0.1 now"),
        (1, "call +1 (555) 123-4567 twice"),
        (2, "clean text with no identifiers at all"),
        (3, "two mails a@b.io c@d.org and ip 192.168.0.255"),
        # space-separated digit runs are NOT phones (round-4 advice: the
        # old separator class swallowed year lists / numeric table rows)
        (4, "years 2021 2022 2023 and row 10 250 3700 42"),
        (5, "dial (020) 7946 0958 or 555-123-4567"),
        # hyphen-grouped NON-phones: year ranges, ISO dates, dated names
        # (round-5 review: the first hyphen branch swallowed these)
        (6, "range 2021-2022-2023 file log-2023-10-05-1234.txt on 2026-08-14"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = t.pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("email"),
            counts["ipv4"].alias("ipv4"),
            counts["phone"].alias("phone"),
            t.pii_scrub("text").alias("scrubbed"),
        ).collect()
    }
    assert (out[0]["email"], out[0]["ipv4"]) == (1, 1)
    assert out[1]["phone"] == 1
    assert (out[2]["email"], out[2]["ipv4"], out[2]["phone"]) == (0, 0, 0)
    assert (out[3]["email"], out[3]["ipv4"]) == (2, 1)
    assert "[EMAIL]" in out[0]["scrubbed"] and "[IPV4]" in out[0]["scrubbed"]
    assert "@" not in out[3]["scrubbed"]
    assert "[PHONE]" in out[1]["scrubbed"]
    assert out[2]["scrubbed"] == rows[2][1]  # clean text untouched
    # clean numeric text must come through the scrub byte-identical
    assert out[4]["phone"] == 0 and out[4]["scrubbed"] == rows[4][1]
    assert out[5]["phone"] == 2
    assert out[5]["scrubbed"] == "dial [PHONE] or [PHONE]"
    assert out[6]["phone"] == 0 and out[6]["scrubbed"] == rows[6][1]

    # engine-vs-engine on all three counters (patterns are RE2-compatible)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    for kind in ("email", "ipv4", "phone"):
        want = dict(
            con.execute(
                "SELECT doc_id, len(regexp_extract_all(text, ?)) FROM d",
                [t.PII_PATTERNS[kind]],
            ).fetchall()
        )
        assert {k: v[kind] for k, v in out.items()} == want


def _emb_tables(spark, n_docs=40, n_bench=6, dim=8, seed=3):
    """Training vectors with a few planted near-copies of benchmark
    vectors (slightly perturbed) plus noise vectors."""
    rng = random.Random(seed)
    bench = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n_bench)
    ]
    docs, planted = [], set()
    for i in range(n_docs):
        if i % 10 == 0:  # planted contamination: tiny perturbation
            b = bench[(i // 10) % n_bench][1]
            docs.append((i, [v + rng.uniform(-0.01, 0.01) for v in b]))
            planted.add(i)
        else:
            docs.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    docs.append((n_docs, None))  # unscorable: NULL embedding
    docs.append((n_docs + 1, []))  # unscorable: empty embedding
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(docs, schema).repartition(5),
        spark.createDataFrame(bench, schema),
        planted,
    )


def test_semantic_decontamination_numpy_parity_and_semantics(spark):
    """benchmark_embedding_similarity matches an exact pure-numpy
    reference row-for-row (max cosine AND argmax id); planted
    near-copies score ~1 and are dropped by decontaminate_semantic;
    unscorable rows get NULL scores and are KEPT; the scoring pass
    plan holds no Exchange and no Join (broadcast-matrix + one
    mapInPandas — the no-shuffle contract)."""
    import numpy as np

    docs, bench, planted = _emb_tables(spark)
    scored = decontam.benchmark_embedding_similarity(docs, bench)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == plan.count(
        "Exchange RoundRobinPartitioning"
    ), plan  # repartition(5) in the fixture is the only exchange
    assert "Join" not in plan, plan

    rows = {r["id"]: r for r in scored.collect()}
    bm = np.array([r["embedding"] for r in bench.orderBy("vec_id").collect()])
    bm = (bm.T / np.linalg.norm(bm, axis=1)).T
    for r in docs.collect():
        got = rows[r["vec_id"]]
        if not r["embedding"]:
            assert got["max_benchmark_cosine"] is None
            assert got["nearest_benchmark_id"] is None
            continue
        v = np.array(r["embedding"], dtype=np.float64)
        sims = (v / np.linalg.norm(v)) @ bm.T
        assert got["max_benchmark_cosine"] == pytest.approx(
            float(sims.max()), abs=1e-12
        )
        assert got["nearest_benchmark_id"] == int(sims.argmax())

    kept = decontam.decontaminate_semantic(docs, bench, threshold=0.98)
    kept_ids = {r["vec_id"] for r in kept.collect()}
    assert kept_ids.isdisjoint(planted)  # planted near-copies dropped
    assert {40, 41} <= kept_ids  # unscorable rows kept
    # at threshold > 1 nothing can be contaminated
    all_kept = decontam.decontaminate_semantic(docs, bench, threshold=1.01)
    assert all_kept.count() == docs.count()


def test_semantic_decontamination_guards(spark):
    docs, bench, _ = _emb_tables(spark)
    with pytest.raises(ValueError, match="max_benchmark"):
        decontam.benchmark_embedding_similarity(docs, bench, max_benchmark=3)
    empty = bench.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="no scorable"):
        decontam.benchmark_embedding_similarity(docs, empty)
    # a zero vector in the benchmark scores 0 against everything
    # instead of dividing by zero
    import numpy as np  # noqa: F401

    zb = spark.createDataFrame(
        [(0, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    out = decontam.benchmark_embedding_similarity(docs, zb).collect()
    scores = [
        r["max_benchmark_cosine"]
        for r in out
        if r["max_benchmark_cosine"] is not None
    ]
    assert scores and all(s == 0.0 for s in scores)
