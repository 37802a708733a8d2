"""Distributed ML consumers of the engine (SURVEY §2.10 / X7).

The reference keeps its one ML workload — gas-price estimation — in a
notebook that consumes the warehouse
(reference examples/gas_price_estimation/gas_price_estimation.ipynb).
This package re-expresses that consumer Spark-first with ``pyspark.ml``
so the whole loop (feature SQL → model → custom metric → grid search)
runs distributed instead of collecting to pandas/sklearn.
"""

from .gas_price import (
    FEATURE_COLS,
    GWEI_THRESHOLD,
    gas_price_features,
    grid_search_gas_model,
    lmfao,
    time_series_splits,
    train_gas_model,
)

__all__ = [
    "FEATURE_COLS",
    "GWEI_THRESHOLD",
    "gas_price_features",
    "grid_search_gas_model",
    "lmfao",
    "time_series_splits",
    "train_gas_model",
]
