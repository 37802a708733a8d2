"""gas_price_model_eval's RF fit: is the ~1.2 s inter-job driver gap
attackable without changing the fitted model? (r16 VERDICT item 5.)

MLlib tree induction runs one collectAsMap job per node GROUP; groups
are sized by ``maxMemoryInMB`` (default 256). On a 2-partition
few-hundred-row frame the per-job cost is pure scheduling, so fewer
groups = fewer jobs = less driver gap — IF the grouping does not change
the fitted model. Grouping only batches node-statistics aggregation
(each node's best split is computed from its own sufficient statistics,
and the bagging seeds are per-tree), so the forest should be
bit-identical; this tool VERIFIES that (full toDebugString equality +
prediction parity + LMFAO metric equality) rather than assuming it.

Also A/Bs ``cacheNodeIds`` (default False) the same way.

Usage: python tools/gas_rf_ab.py [sf_dir] [rounds]
Prints one JSON line with per-variant fit-wall medians, job counts and
model-identity verdicts.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from ethereum_analytical_db_spark.ml.gas_price import (
        FEATURE_COLS,
        LABEL_COL,
        gas_price_features,
        lmfao,
        split_by_block,
    )
    from ethereum_analytical_db_spark.plans.registry import table
    from ethereum_analytical_db_spark.session import get_spark

    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    spark = get_spark(
        app_name="gas-rf-ab",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    n_blocks = (
        table(spark, sf_dir, "events")
        .agg(F.approx_count_distinct("event_id").alias("n"))
        .first()["n"]
    ) or 0
    bucket = max(10, int(n_blocks) // 500)
    features = (
        gas_price_features(spark, sf_dir, bucket=bucket, min_block=bucket)
        .coalesce(1)
        .cache()
    )
    cut = features.select(
        F.percentile(F.col("block"), F.lit(2 / 3)).alias("c")
    ).first()["c"]
    train, test = split_by_block(features, float(cut))

    def fit(max_mem: int, cache_ids: bool):
        assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features")
        rf = RandomForestRegressor(
            featuresCol="features",
            labelCol=LABEL_COL,
            numTrees=10,
            seed=7,
            maxMemoryInMB=max_mem,
            cacheNodeIds=cache_ids,
        )
        return Pipeline(stages=[assembler, rf]).fit(train)

    variants = {
        "A_default_256": (256, False),
        "B_maxmem_1024": (1024, False),
        "C_cache_node_ids": (256, True),
    }

    # model identity, verified once per variant against the default
    base = fit(256, False)
    base_trees = base.stages[-1].trees
    base_debug = base.stages[-1].toDebugString
    base_pred = [
        (round(r["prediction"], 12),)
        for r in base.transform(test).select("prediction").collect()
    ]
    base_lmfao = lmfao(base, test)
    identity = {}
    for label, (mm, ci) in variants.items():
        m = fit(mm, ci)
        same_debug = m.stages[-1].toDebugString == base_debug
        pred = [
            (round(r["prediction"], 12),)
            for r in m.transform(test).select("prediction").collect()
        ]
        identity[label] = {
            "debug_string_equal": same_debug,
            "predictions_equal": pred == base_pred,
            "lmfao_equal": lmfao(m, test) == base_lmfao,
            "n_trees": len(m.stages[-1].trees) == len(base_trees),
        }

    def job_count() -> int:
        base_url = sc.uiWebUrl
        jobs = json.load(
            urllib.request.urlopen(
                f"{base_url}/api/v1/applications/{sc.applicationId}/jobs",
                timeout=10,
            )
        )
        return len(jobs)

    times: dict[str, list[float]] = {k: [] for k in variants}
    jobs_per: dict[str, int] = {}
    for i in range(rounds):
        for label, (mm, ci) in variants.items():
            j0 = job_count()
            t0 = time.perf_counter()
            fit(mm, ci)
            times[label].append(round(time.perf_counter() - t0, 4))
            jobs_per[label] = job_count() - j0

    print(
        json.dumps(
            {
                "metric": "gas_rf_ab",
                "sf_dir": sf_dir,
                "rounds": rounds,
                "medians": {
                    k: round(statistics.median(v), 4) for k, v in times.items()
                },
                "samples": times,
                "jobs_per_fit": jobs_per,
                "model_identity_vs_default": identity,
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
