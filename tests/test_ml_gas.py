"""X7 — gas-price estimation pipeline (reference
examples/gas_price_estimation/gas_price_estimation.ipynb) on pyspark.ml."""

import pytest

from ethereum_analytical_db_spark.ml import (
    FEATURE_COLS,
    gas_price_features,
    grid_search_gas_model,
    lmfao,
    time_series_splits,
    train_gas_model,
)
from ethereum_analytical_db_spark.ml.gas_price import split_by_block

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def features(spark):
    # tiny fixture: shrink the block bucket so sf0.001's 1000 events
    # yield ~100 feature rows (the notebook's data spans millions of blocks)
    df = gas_price_features(spark, SF, bucket=10, min_block=10).cache()
    df.count()
    yield df
    df.unpersist()


def test_parity_with_compat_notebook_plan(spark):
    """At the notebook's default constants the native feature builder
    reproduces the oracle-checked compat_notebook_gas plan exactly."""
    from ethereum_analytical_db_spark.plans.compat_queries import compat_notebook_gas

    cols = ["block", "p50_gwei", "p20_gwei", *FEATURE_COLS[:4]]
    sf = "/root/testdata/sf0.01"
    native = gas_price_features(spark, sf)
    compat = compat_notebook_gas(spark, sf)
    n = sorted(
        tuple(r) for r in
        native.selectExpr(*[f"CAST({c} AS DOUBLE) AS {c}" for c in cols]).collect()
    )
    c = sorted(
        tuple(r) for r in
        compat.selectExpr(*[f"CAST({c} AS DOUBLE) AS {c}" for c in cols]).collect()
    )
    assert n == c and len(n) > 0


def test_feature_schema_and_rows(features):
    assert set(FEATURE_COLS) <= set(features.columns)
    assert {"p50_gwei", "p20_gwei"} <= set(features.columns)
    assert features.count() > 10
    # all feature columns are numeric doubles (VectorAssembler precondition)
    for c in FEATURE_COLS:
        assert dict(features.dtypes)[c] == "double"


def test_train_score_deterministic(features):
    blocks = sorted(r["block"] for r in features.select("block").collect())
    cut = blocks[len(blocks) * 2 // 3]
    train, test = split_by_block(features, cut)
    assert train.count() + test.count() == features.count()
    model = train_gas_model(train, n_estimators=5, seed=7)
    s1 = lmfao(model, test)
    s2 = lmfao(train_gas_model(train, n_estimators=5, seed=7), test)
    assert 0.0 <= s1 <= 1.0
    assert s1 == s2  # fixed seed → identical forest → identical metric


def test_lmfao_perfect_and_stuck(spark):
    # y_pred == y_true and above low price → every row proper (score 1.0)
    df = spark.createDataFrame(
        [(10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1000.0)],
        ["p50_gwei", "dayofmonth", "dayofweek", "hour", "minute", "x", "block"],
    ).selectExpr("*", "p50_gwei * 0 + 0.5 AS p20_gwei")
    model = train_gas_model(
        df.selectExpr(
            "p50_gwei", "p20_gwei", "dayofmonth", "dayofweek", "hour",
            "minute", "block",
        ),
        n_estimators=1,
        seed=1,
    )
    assert lmfao(model, df) == 1.0
    # raise the stuck floor above any possible prediction → score 0.0
    stuck = df.withColumn("p20_gwei", df.p50_gwei * 0 + 1e9)
    assert lmfao(model, stuck) == 0.0


def test_time_series_splits_expanding(features):
    splits = time_series_splits(features, n_splits=3)
    assert len(splits) == 3
    prev_train = 0
    total = features.count()
    for train, val in splits:
        n_train, n_val = train.count(), val.count()
        assert n_train > prev_train  # expanding window
        assert n_val > 0
        prev_train = n_train
        # validation strictly after the training window on the block axis
        max_train = train.agg({"block": "max"}).first()[0]
        min_val = val.agg({"block": "min"}).first()[0]
        assert min_val > max_train
    assert prev_train < total


def test_grid_search_selects_from_grid(features):
    out = grid_search_gas_model(
        features, n_estimators_grid=(3, 6), n_splits=2, seed=7
    )
    assert out["best_n_estimators"] in (3, 6)
    assert set(out["scores"]) == {3, 6}
    assert out["best_score"] == max(out["scores"].values())
    preds = out["model"].transform(features)
    assert preds.filter(preds.prediction.isNull()).count() == 0


def test_time_series_splits_rejects_too_few_blocks(spark):
    """sklearn TimeSeriesSplit raises when n_samples <= n_splits; the
    block-valued analogue must fail loudly instead of yielding empty
    validation folds that score 0.0 into every grid candidate."""
    df = spark.createDataFrame(
        [(1000.0, 5.0, 1.0, 1.0, 1.0, 1.0, 1.0),
         (2000.0, 6.0, 1.0, 2.0, 2.0, 2.0, 2.0)],
        ["block", "p50_gwei", "p20_gwei", "dayofmonth", "dayofweek",
         "hour", "minute"],
    )
    with pytest.raises(ValueError, match="distinct blocks"):
        time_series_splits(df, n_splits=3)


def test_model_eval_query_empty_frame(spark, tmp_path):
    """gas_price_model_eval on a fixture whose rows are all filtered out
    (value <= 0 → no call rows survive) returns the zero summary row
    instead of crashing on float(None)."""
    import datetime

    from ethereum_analytical_db_spark.plans.ml_queries import gas_price_model_eval

    rows = [
        (i, i % 5, 0.0, "view", datetime.datetime(2020, 1, 1, 0, i % 60))
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, value double, event_type string, ts timestamp"
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = gas_price_model_eval(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["n_features"] == 0 and out[0]["lmfao"] is None


def test_time_series_splits_rejects_coincident_cuts(spark):
    """Round-5 advice: a skewed block distribution that collapses two
    equal-frequency percentile cuts (or pushes the last cut onto the max
    block) must raise, not yield empty folds that score 0.0."""
    from ethereum_analytical_db_spark.ml.gas_price import time_series_splits

    # 97% of rows on one block → every cut lands on block 100
    rows = [(100, float(i), 0.0, 0.0, 0) for i in range(97)]
    rows += [(b, 1.0, 0.0, 0.0, 0) for b in (1, 2, 3)]
    skewed = spark.createDataFrame(
        rows, "block long, avg_gas_price double, p25 double, p75 double, n int"
    )
    with pytest.raises(ValueError, match="skew"):
        time_series_splits(skewed, n_splits=3)
