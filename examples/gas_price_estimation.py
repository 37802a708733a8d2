"""Gas-price estimation end-to-end — the reference's
examples/gas_price_estimation/gas_price_estimation.ipynb as a runnable
distributed script (cells 6-26: feature SQL → time split →
RandomForest → LMFAO → grid search), no pandas/sklearn on the driver.

    python examples/gas_price_estimation.py /root/testdata/sf0.01
    python examples/gas_price_estimation.py /root/testdata/sf0.1 \
        --bucket 200 --grid 10 50 100 --splits 5

The model and metric live in ``ethereum_analytical_db_spark.ml``; this
script is the notebook's narrative: train, report per-candidate CV
scores, evaluate the refit model on the held-out tail.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as `python examples/gas_price_estimation.py` without an
# installed package: the repo root is one level up from this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("sf_dir", help="directory with events.parquet")
    p.add_argument("--bucket", type=int, default=None,
                   help="block bucket width (default: auto ≈500 buckets)")
    p.add_argument("--grid", type=int, nargs="+", default=[10, 20],
                   help="n_estimators candidates")
    p.add_argument("--splits", type=int, default=3)
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from ethereum_analytical_db_spark.ml import (
        gas_price_features,
        grid_search_gas_model,
        lmfao,
    )
    from ethereum_analytical_db_spark.ml.gas_price import split_by_block
    from ethereum_analytical_db_spark.plans.registry import table
    from ethereum_analytical_db_spark.session import get_spark

    spark = get_spark(app_name="gas-price-estimation", cpus=args.cpus)
    bucket = args.bucket
    if bucket is None:
        n_blocks = (
            table(spark, args.sf_dir, "events")
            .agg(F.approx_count_distinct("event_id").alias("n"))
            .first()["n"]
        ) or 0
        bucket = max(10, int(n_blocks) // 500)
    feats = gas_price_features(
        spark, args.sf_dir, bucket=bucket, min_block=bucket
    ).cache()
    n = feats.count()
    print(f"feature rows: {n} (bucket width {bucket})")
    if n < args.splits + 2:
        print("not enough feature rows — lower --bucket")
        return 1

    cut = feats.select(
        F.percentile(F.col("block"), F.lit(2 / 3)).alias("c")
    ).first()["c"]
    train, test = split_by_block(feats, float(cut))
    print(f"train {train.count()} / test {test.count()} (cut block {cut:.0f})")

    try:
        out = grid_search_gas_model(
            train, n_estimators_grid=tuple(args.grid), n_splits=args.splits
        )
    except ValueError as e:
        # time_series_splits needs > --splits distinct TRAIN blocks
        print(f"cannot cross-validate: {e} — lower --bucket or --splits")
        return 1
    for cand, score in sorted(out["scores"].items()):
        print(f"  n_estimators={cand:4d}  cv LMFAO={score:.4f}")
    print(f"best: n_estimators={out['best_n_estimators']}")
    print(f"held-out LMFAO: {lmfao(out['model'], test):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
