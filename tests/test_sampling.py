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
