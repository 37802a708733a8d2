"""spark-chain-analytics: a PySpark-native analytics engine with the
query and data-processing capabilities of cyber-drop/ethereum_analytical_db.

Layout:
- ``session``     — SparkSession factory tuned for the target cluster shape
- ``schemas``     — explicit StructTypes for every reference table (SURVEY §1)
- ``catalog``     — Parquet warehouse with last-write-wins dedup-on-read
                    (ReplacingMergeTree/FINAL semantics)
- ``functions``   — Column-expression layer (uint256 decode, topic→address …)
- ``operators``   — any_join, predicate builders, dedup (exact/minhash/simhash),
                    similarity search, text analysis, windows
- ``plans``       — the analytics query surface (balances, dashboards, derived
                    tables) + the driver-facing query registry
- ``sources``     — pluggable ingestion adapters (file-backed fakes for tests)
- ``streaming``   — watermark-table incremental batch framework
"""

__version__ = "0.1.0"
