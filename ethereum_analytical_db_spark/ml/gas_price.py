"""Gas-price estimation pipeline (SURVEY X7) — the reference notebook
re-expressed with pyspark.ml so every step is distributed.

Reference shape (examples/gas_price_estimation/gas_price_estimation.ipynb):

* cell 6   — per-1000-block gas stats SQL (median + p20 gas price joined
             to block timestamps).  Here: the already-oracle-checked
             ``compat_notebook_gas`` plan, which runs that cell's
             ClickHouse SQL verbatim through ``eads.compat``.
* cell 10  — pandas ``dt.day/dayofweek/hour/minute`` features.  Here:
             the same columns, computed JVM-side in the plan.
* cell 12  — time split at a block threshold.  Here:
             :func:`split_by_block`.
* cell 16  — ``GWEI_THRESHOLD = 5``; ``low_price`` = the p20 ("minGas")
             series indexed by block.  Here: ``p20_gwei`` stays a column
             of the feature row, so the metric needs no driver-side
             ``.loc`` lookup.
* cell 17  — the LMFAO metric ("Likely Mined / Fees Are OK"): a
             prediction is *proper* unless it overpays by more than the
             threshold (``y_true - y_pred > GWEI_THRESHOLD`` — note the
             notebook flags *under*-prediction of the median as
             overpayment risk for the user who must outbid it) or would
             get stuck (``y_pred < low_price``).  Here: :func:`lmfao`,
             one distributed aggregate.
* cell 19  — sklearn ``TimeSeriesSplit(10)`` + ``GridSearchCV`` over
             ``n_estimators``.  Here: :func:`time_series_splits`
             (expanding windows over block-ordered folds) and
             :func:`grid_search_gas_model` (a driver loop over a small
             scalar grid — each *fit* and each *score* is a distributed
             job, so the loop is O(grid × splits) tiny driver steps,
             never a data collect).

Scale notes: features are one row per 1000-block bucket, so even 100 TB
of raw transactions reduce to ~20k feature rows per 20M blocks — the
model input is always small relative to the cluster; what must (and
does) stay distributed is the aggregation that *produces* the features
and the scoring scans.  ``RandomForestRegressor`` trains on the
executors via MLlib's distributed tree induction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Notebook cell 12: columns_for_prediction.
FEATURE_COLS = ["dayofmonth", "dayofweek", "hour", "minute", "block"]
LABEL_COL = "p50_gwei"
LOW_PRICE_COL = "p20_gwei"  # notebook cell 16: low_price = minGas series
GWEI_THRESHOLD = 5.0  # notebook cell 16


def gas_price_features(
    spark: SparkSession,
    sf_dir: str,
    bucket: int = 1000,
    min_block: int = 1000,
) -> DataFrame:
    """Feature table for the model: cell 6's SQL + cell 10's features,
    as native DataFrame ops over the same eth-view mapping the
    oracle-checked ``compat_notebook_gas`` plan uses (parity is asserted
    in tests/test_ml_gas.py at the default parameters).

    ``bucket``/``min_block`` default to the notebook's 1000-block
    constants; smaller values let tiny fixtures produce enough feature
    rows to train on (the notebook's own data spans millions of blocks).
    """
    from ..plans.registry import table

    ev = table(spark, sf_dir, "events")
    itx = ev.select(
        F.col("event_id").cast("bigint").alias("blockNumber"),
        F.col("value").alias("gasPrice"),
        F.col("user_id").cast("string").alias("to_addr"),
        F.col("value").alias("val"),
        F.when(F.col("event_id") % 7 == 0, "create")
        .otherwise("call")
        .alias("typ"),
        F.concat(
            F.col("event_id").cast("string"),
            F.lit("."),
            (F.col("event_id") % 3).cast("string"),
        ).alias("tid"),
    )
    contracts = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 3 == 0))
        .select(F.col("user_id").cast("string").alias("address"))
        .distinct()
    )
    g = (
        itx.withColumn(
            "block",
            (F.floor(F.col("blockNumber") / bucket) * bucket).cast("bigint"),
        )
        .filter(
            (F.col("block") > min_block)
            & (F.col("val") > 0)
            & (F.col("typ") == "call")
            & F.col("tid").like("%.0")
        )
        # NOT IN (SELECT address FROM eth_contract): the contract set is
        # tiny relative to transactions — broadcast left-anti join.
        .join(F.broadcast(contracts), F.col("to_addr") == F.col("address"), "left_anti")
        .groupBy("block")
        .agg(
            (F.percentile(F.col("gasPrice"), F.lit(0.5)) * 1e9).alias(LABEL_COL),
            (F.percentile(F.col("gasPrice"), F.lit(0.2)) * 1e9).alias(LOW_PRICE_COL),
        )
    )
    blocks = ev.select(
        F.col("event_id").cast("bigint").alias("block"),
        F.col("ts").alias("timestamp"),
    )
    df = g.join(blocks, "block").select(
        "block",
        LABEL_COL,
        LOW_PRICE_COL,
        F.dayofmonth("timestamp").alias("dayofmonth"),
        F.weekday("timestamp").alias("dayofweek"),
        F.hour("timestamp").alias("hour"),
        F.minute("timestamp").alias("minute"),
    )
    casts = [F.col(c).cast("double").alias(c) for c in FEATURE_COLS]
    return df.select(
        F.col(LABEL_COL).cast("double").alias(LABEL_COL),
        F.col(LOW_PRICE_COL).cast("double").alias(LOW_PRICE_COL),
        *casts,
    )


def split_by_block(
    features: DataFrame, train_max_block: float, test_max_block: float | None = None
) -> tuple[DataFrame, DataFrame]:
    """Notebook cell 12: train on ``block <= train_max_block``, test on
    the ``(train_max_block, test_max_block)`` window."""
    train = features.filter(F.col("block") <= F.lit(train_max_block))
    test = features.filter(F.col("block") > F.lit(train_max_block))
    if test_max_block is not None:
        test = test.filter(F.col("block") < F.lit(test_max_block))
    return train, test


def train_gas_model(
    train: DataFrame, n_estimators: int = 20, seed: int = 7
) -> PipelineModel:
    """RandomForestRegressor over the notebook's five features.

    sklearn's default unlimited depth is not reproducible distributed;
    MLlib's default depth 5 is kept — the notebook's own eli5 cell shows
    the signal lives in coarse block/hour splits, not deep trees.
    """
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features")
    rf = RandomForestRegressor(
        featuresCol="features",
        labelCol=LABEL_COL,
        numTrees=n_estimators,
        seed=seed,
    )
    return Pipeline(stages=[assembler, rf]).fit(train)


def lmfao(
    model: PipelineModel, df: DataFrame, gwei_threshold: float = GWEI_THRESHOLD
) -> float:
    """Notebook cell 17's metric as one distributed aggregate.

    proper := NOT (y_true - y_pred > threshold) AND NOT (y_pred < low_price)
    returns sum(proper) / count(*); 0.0 on an empty frame.
    """
    scored = model.transform(df)
    high_fee = (F.col(LABEL_COL) - F.col("prediction")) > F.lit(gwei_threshold)
    will_stuck = F.col("prediction") < F.col(LOW_PRICE_COL)
    row = scored.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(~(high_fee | will_stuck), 1).otherwise(0)).alias("proper"),
    ).first()
    return float(row["proper"] / row["n"]) if row["n"] else 0.0


def time_series_splits(
    features: DataFrame, n_splits: int = 3
) -> list[tuple[DataFrame, DataFrame]]:
    """sklearn ``TimeSeriesSplit`` semantics on the block axis: the
    block range is cut into ``n_splits + 1`` equal-frequency folds; split
    *i* trains on folds ``0..i`` and validates on fold ``i+1``.

    Only the ``n_splits`` scalar cut points reach the driver (exact
    percentiles over the block column — the feature table is one row per
    block bucket, tiny by construction).  Each returned pair is a lazy
    filter over the cached feature frame, so downstream fits re-scan but
    never re-shuffle.
    """
    if n_splits < 1:
        raise ValueError("n_splits must be >= 1")
    # folds are bounded by block VALUES, so distinct blocks is the sample
    # unit; mirror sklearn's loud failure instead of silently producing
    # empty validation folds that would score 0.0 into every candidate
    n_distinct = features.select("block").distinct().count()
    if n_distinct <= n_splits:
        raise ValueError(
            f"need more than n_splits={n_splits} distinct blocks, "
            f"got {n_distinct}"
        )
    qs = [i / (n_splits + 1) for i in range(1, n_splits + 1)]
    row = features.select(
        F.percentile(F.col("block"), F.lit(qs)).alias("cuts"),
        F.max("block").alias("max_block"),
    ).first()
    cuts = list(row["cuts"] or [])
    # a skewed block distribution can make two equal-frequency cuts
    # coincide (or push the last cut onto the max block), which would
    # yield an empty validation fold that silently scores 0.0 into every
    # grid candidate — fail loudly instead (round-5 advice)
    distinct_cuts = sorted(set(cuts))
    if len(distinct_cuts) < n_splits or distinct_cuts[-1] >= row["max_block"]:
        raise ValueError(
            f"block distribution too skewed for n_splits={n_splits}: "
            f"cuts {cuts} over max block {row['max_block']} leave an "
            "empty validation fold"
        )
    splits: list[tuple[DataFrame, DataFrame]] = []
    for i, cut in enumerate(cuts):
        train = features.filter(F.col("block") <= F.lit(cut))
        upper = cuts[i + 1] if i + 1 < len(cuts) else None
        val = features.filter(F.col("block") > F.lit(cut))
        if upper is not None:
            val = val.filter(F.col("block") <= F.lit(upper))
        splits.append((train, val))
    return splits


def grid_search_gas_model(
    features: DataFrame,
    n_estimators_grid: Sequence[int] = (10, 20),
    n_splits: int = 3,
    seed: int = 7,
    gwei_threshold: float = GWEI_THRESHOLD,
) -> dict:
    """Notebook cells 19-20: grid search over ``n_estimators`` scored by
    mean LMFAO across the time-series splits.

    The loop runs on the driver but touches only scalars; every fit and
    every score inside it is a distributed Spark job.  Returns
    ``{"best_n_estimators", "best_score", "scores": {n: mean_lmfao},
    "model"}`` where ``model`` is refit on the full feature frame with
    the winning parameter (GridSearchCV's ``refit=True`` behavior).
    """
    if not n_estimators_grid:
        raise ValueError("empty grid")
    features = features.cache()
    try:
        splits = time_series_splits(features, n_splits=n_splits)
        scores: dict[int, float] = {}
        for n in n_estimators_grid:
            fold_scores = []
            for train, val in splits:
                model = train_gas_model(train, n_estimators=n, seed=seed)
                fold_scores.append(lmfao(model, val, gwei_threshold))
            scores[n] = sum(fold_scores) / len(fold_scores)
        # max() over insertion order: first grid entry wins ties, like
        # GridSearchCV's first-best behavior.
        best_n = max(scores, key=lambda n: scores[n])
        best_model = train_gas_model(features, n_estimators=best_n, seed=seed)
        return {
            "best_n_estimators": best_n,
            "best_score": scores[best_n],
            "scores": scores,
            "model": best_model,
        }
    finally:
        features.unpersist()
