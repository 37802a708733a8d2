"""Driver-visible query for the X7 gas-price model pipeline.

Rows-only: a trained RandomForest has no portable SQL form, so there is
no DuckDB oracle — correctness evidence is tests/test_ml_gas.py (feature
parity with the oracle-checked ``compat_notebook_gas`` plan, metric
edge-cases, seed determinism, expanding-window split semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register


@register(
    "gas_price_model_eval",
    None,
    note="X7 — reference gas_price_estimation.ipynb cells 12-26 as a "
    "pyspark.ml pipeline: block-threshold time split, distributed "
    "RandomForestRegressor fit, LMFAO metric as one aggregate. "
    "Rows-only (a fitted forest is not SQL-expressible); feature parity "
    "and metric semantics are pytest-verified in tests/test_ml_gas.py.",
)
def gas_price_model_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.gas_price import (
        gas_price_features,
        lmfao,
        split_by_block,
        train_gas_model,
    )

    from .registry import table

    # The notebook's fixed 1000-block bucket assumes millions of blocks;
    # scale the bucket to the fixture so the feature frame is always a
    # few hundred rows. Sized from the distinct-block count, not the max
    # (block-id spaces can be sparse — e.g. a corpus stitched from
    # disjoint ranges — and a span-based width would collapse every
    # populated range into one bucket). One scalar reaches the driver.
    n_blocks = (
        table(spark, sf_dir, "events")
        .agg(F.approx_count_distinct("event_id").alias("n"))
        .first()["n"]
    ) or 0
    bucket = max(10, int(n_blocks) // 500)
    # coalesce(1): the frame is a few hundred rows by construction, and
    # MLlib tree induction runs one distributed aggregate per depth
    # level — on a wide empty partitioning that is all task overhead.
    # (At real scale the bucket count, and hence partitioning, grows
    # with the data and this coalesce would be dropped.)
    features = (
        gas_price_features(spark, sf_dir, bucket=bucket, min_block=bucket)
        .coalesce(1)
        .cache()
    )
    try:
        cut = features.select(
            F.percentile(F.col("block"), F.lit(2 / 3)).alias("c")
        ).first()["c"]
        if cut is None:  # empty feature frame (tiny/filtered-out fixture)
            # 1 slice: a 1-row local list otherwise becomes
            # defaultParallelism single-row task launches per action
            return spark.createDataFrame(
                spark.sparkContext.parallelize([(0, 0, 0, 10, None)], 1),
                "n_features BIGINT, n_train BIGINT, n_test BIGINT, "
                "n_estimators INT, lmfao DOUBLE",
            )
        train, test = split_by_block(features, float(cut))
        model = train_gas_model(train, n_estimators=10, seed=7)
        score = lmfao(model, test)
        # ONE job for all three row counts (r16: three sequential
        # count() jobs over the same cached frame became one aggregate;
        # guide §7.3 driver-side work). n_test counted explicitly with
        # the split's own predicate (block > cut) rather than n −
        # n_train, so a NULL-block row falls in NEITHER split — exactly
        # split_by_block's semantics (r16 advice; identical values on
        # the fixture, whose block is non-null derived arithmetic).
        sizes = features.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("block") <= F.lit(float(cut))).cast("long")).alias(
                "n_train"
            ),
            F.sum((F.col("block") > F.lit(float(cut))).cast("long")).alias(
                "n_test"
            ),
        ).first()
        return spark.createDataFrame(
            spark.sparkContext.parallelize(
                [
                    (
                        sizes["n"],
                        sizes["n_train"],
                        sizes["n_test"],
                        10,
                        round(float(score), 6),
                    )
                ],
                1,  # 1-row result: 1 task, not defaultParallelism
            ),
            "n_features BIGINT, n_train BIGINT, n_test BIGINT, "
            "n_estimators INT, lmfao DOUBLE",
        )
    finally:
        features.unpersist()
