"""ANY JOIN semantics (SURVEY §2.3 preamble, §4.2.1)."""

from pyspark.sql import Row

from ethereum_analytical_db_spark.operators.joins import any_join, anti_join, semi_join


def test_any_left_join_one_match_per_left_row(spark):
    left = spark.createDataFrame([Row(k="a", x=1), Row(k="b", x=2)])
    right = spark.createDataFrame(
        [Row(k="a", v=10), Row(k="a", v=20), Row(k="c", v=30)]
    )
    out = any_join(left, right, keys="k", how="left", order_by=["v"]).collect()
    assert len(out) == 2  # no row multiplication
    by_k = {r["k"]: r["v"] for r in out}
    assert by_k == {"a": 10, "b": None}


def test_any_inner_join(spark):
    left = spark.createDataFrame([Row(k="a"), Row(k="b")])
    right = spark.createDataFrame([Row(k="a", v=2), Row(k="a", v=1)])
    out = any_join(left, right, keys="k", how="inner", order_by=["v"]).collect()
    assert len(out) == 1
    assert out[0]["v"] == 1


def test_any_join_deterministic_without_order(spark):
    right = spark.createDataFrame([Row(k="a", v=5), Row(k="a", v=9)])
    left = spark.createDataFrame([Row(k="a")])
    picks = {
        any_join(left, right, keys="k").first()["v"] for _ in range(3)
    }
    assert len(picks) == 1  # stable digest tie-break


def test_semi_and_anti(spark):
    left = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    right = spark.createDataFrame([Row(k=2), Row(k=2)])
    assert sorted(r["k"] for r in semi_join(left, right, "k").collect()) == [2]
    assert sorted(r["k"] for r in anti_join(left, right, "k").collect()) == [1, 3]
