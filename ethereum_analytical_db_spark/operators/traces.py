"""Trace-tree operators (reference SURVEY §2.10 X4/X5).

The reference enumerates each transaction's trace entries positionally to
build ids (`operations/internal_transactions.py:235-251`) and propagates
errors from a failing call to all its descendant calls with a per-tx
pygtrie walk (`operations/internal_transactions.py:253-274`; tests
`tests/internal_transactions_tests.py:269-345`).

Spark-first re-expression — no per-row Python:

- positional ids are a `row_number()` window per transaction. The
  reference relies on trace arrival order (depth-first `trace_block`
  output); we order by an explicit canonical key (SURVEY §7.3 risk (c):
  lexicographic traceAddress, or any caller-chosen sort column), which
  is deterministic under retries where arrival order is not.
- parent-error propagation is a prefix self-join: a row is poisoned iff
  some failing row in the same transaction has a traceAddress that is a
  strict prefix of its own. Trace trees are tiny (tens of entries), so
  the within-tx join explodes nothing; both joins shuffle by the tx key
  only, which is the natural partitioning for 100 TB of traces. The
  `applyInPandas`-per-tx variant the reference's trie suggests would move
  every row through Python for no gain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_trace_ids(
    df: DataFrame,
    tx_col: str = "transactionHash",
    order_col: str | Column = "traceAddress",
    id_col: str = "id",
) -> DataFrame:
    """X5: id = '{txHash}.{position}' with position = rank of the trace
    entry inside its transaction under a canonical ordering."""
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(tx_col).orderBy(order)
    pos = F.row_number().over(w) - 1
    return df.withColumn(
        id_col, F.concat_ws(".", F.col(tx_col).cast("string"), pos.cast("string"))
    )


def propagate_parent_errors(
    df: DataFrame,
    tx_col: str = "transactionHash",
    trace_addr_col: str = "traceAddress",
    error_col: str = "error",
    id_col: str = "id",
    out_col: str = "parent_error",
) -> DataFrame:
    """X4: mark every trace entry whose ancestor (strict traceAddress
    prefix, same transaction) failed.

    Requires unique ``id_col`` per row (the engine's trace ids are).
    Returns df + boolean ``out_col``: True iff a failing strict-prefix
    ancestor exists, NULL otherwise. The failing row itself is NOT
    marked (the reference's shortest_prefix != node check), and clean
    rows stay NULL — the reference's Nullable(UInt8) tri-state, which
    downstream consumers (derived.contracts, the balances SQL) filter
    with ``parent_error IS NULL``.
    """
    failing = df.filter(F.col(error_col).isNotNull()).select(
        F.col(tx_col).alias("_ftx"), F.col(trace_addr_col).alias("_fta")
    )
    ta = F.col(trace_addr_col)
    cond = (
        (F.col(tx_col) == F.col("_ftx"))
        & (F.size(ta) > F.size(F.col("_fta")))
        & (F.slice(ta, 1, F.size(F.col("_fta"))) == F.col("_fta"))
    )
    victims = (
        df.join(failing, cond, "left_semi")
        .select(F.col(id_col).alias("_vid"))
        .withColumn("_pe", F.lit(True))
    )
    return (
        df.join(victims, df[id_col] == victims["_vid"], "left")
        .withColumn(out_col, F.col("_pe"))
        .drop("_vid", "_pe")
    )
