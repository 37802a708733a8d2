"""Text-analysis DataFrame operators (Column exprs are covered by the
oracle suite; this file tests the aggregation-shaped ones)."""

from ethereum_analytical_db_spark.operators import text


def test_top_ngram_share(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 2-grams: ab,ba,ab,ba,ab → 3/5
            (2, "u v w x y z"),      # all 2-grams distinct → 1/5
            (3, "x"),                # shorter than n → 0.0
            (4, "spam spam spam"),   # "spam spam" ×2 → 2/2
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["top_ngram_share"]
        for r in text.top_ngram_share(docs, n=2).collect()
    }
    assert got[1] == 3 / 5
    assert got[2] == 1 / 5
    assert got[3] == 0.0
    assert got[4] == 1.0
