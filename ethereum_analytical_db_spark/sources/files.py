"""File sources and sinks (SURVEY §2.1 S14-S16).

- S14 genesis allocations: the reference loads a JSON list of
  {hash, to, from, blockHash, blockNumber, value} rows and inserts them
  as block-0 internal transactions
  (operations/internal_transactions.py:342-361).
- S15 static token metadata (tokens.json, 627 records) used as a
  broadcast dim (operations/contract_methods.py:60-70).
- S16 CSV export: ``INTO OUTFILE ... FORMAT CSVWithNames``
  (examples/sql_balances/balances.sql:62-63) → single-file CSV with
  header.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_genesis(spark: SparkSession, path: str) -> DataFrame:
    """S14: genesis.json → block-0 internal-transaction rows. Values are
    already decimal wei strings in the file; stored as float64 ether to
    match the engine's value semantics (F6)."""
    df = spark.read.option("multiLine", "true").json(path)
    return df.select(
        F.col("hash").alias("id"),
        F.lit(0).cast("long").alias("blockNumber"),
        F.col("from").alias("from"),
        F.col("to").alias("to"),
        (F.col("value").cast("double") / F.lit(1e18)).alias("value"),
        F.col("blockHash").alias("blockHash"),
        F.col("hash").alias("transactionHash"),
        F.lit("call").alias("type"),
    )


def load_token_metadata(spark: SparkSession, path: str) -> DataFrame:
    """S15: tokens.json static dim (address, symbol, cmc_id, ...) —
    small enough to broadcast into any join."""
    return spark.read.option("multiLine", "true").json(path)


def export_jsonl(
    df: DataFrame,
    path: str,
    shard_max_rows: int | None = None,
    compress: bool = False,
    order_by: str | None = None,
    shuffle_by: str | None = None,
    shuffle_salt: str = "shuffle",
    within_order: str | None = None,
) -> int:
    """Training-data delivery: JSONL shards (the standard corpus
    interchange format). Returns the shard count.

    ``shard_max_rows`` sizes shards by a row budget: the shard count is
    ceil(rows / budget) (one count() job) and the frame is repartitioned
    to exactly that many files — without it, shards mirror the upstream
    partitioning (no extra shuffle, the 100 TB default). ``order_by``
    range-partitions instead, so shard k holds a contiguous key range
    (reproducible corpus ordering); ``compress`` writes gzip parts. The
    write is fully distributed — one file per task, nothing driver-side.

    ``shuffle_by``: deterministic GLOBAL shuffle — the standard last
    step before pretraining (decorrelate adjacent documents so a
    sequential reader sees an unbiased stream). Orders the corpus by
    ``md5(id || shuffle_salt)``: a pure function of (id, salt), so the
    same corpus shuffles identically on any cluster/partitioning (vs
    ``orderBy(rand())``, which is neither reproducible nor restart-
    stable), and a new salt draws an independent permutation for the
    next epoch. Costs exactly the one range-partition shuffle any
    total order costs. Mutually exclusive with ``order_by``.

    ``within_order``: secondary sort under whichever primary ordering
    is active — for multi-row units (a packed sequence's rows share
    ``seq_id``), ordering or shuffling by the unit id keeps the unit's
    rows adjacent, and this keeps them in reading order (``seq_pos``)
    instead of arbitrary task order. Tie order under a bare ``order_by``
    is otherwise UNDEFINED (sortWithinPartitions is not stable across
    the preceding shuffle), so any consumer that concatenates rows in
    file order wants this set. Requires ``order_by`` or ``shuffle_by``:
    without a primary ordering there is no unit key colocating a unit's
    rows, so "reading order within the unit" is unsatisfiable — sorting
    a partition by position alone would interleave units. Raises rather
    than silently shipping rows in arbitrary task order (review find).
    """
    path = os.path.abspath(path)
    if within_order is not None and order_by is None and shuffle_by is None:
        raise ValueError(
            "export_jsonl(within_order=...) needs order_by or shuffle_by: "
            "with no primary ordering a unit's rows are not colocated, so "
            "within-unit reading order cannot be delivered"
        )
    sort_cols = [within_order] if within_order is not None else []
    if shuffle_by is not None:
        if order_by is not None:
            raise ValueError("order_by and shuffle_by are mutually exclusive")
        key = "_shuffle_key"
        if key in df.columns:
            # withColumn would silently REPLACE it and the drop below
            # would delete the caller's data (review find)
            raise ValueError(
                f"export_jsonl(shuffle_by=...) needs the {key!r} column name "
                "for its sort key; rename that input column"
            )
        df = df.withColumn(
            key,
            F.md5(F.concat(F.col(shuffle_by).cast("string"), F.lit(shuffle_salt))),
        )
        order_by = key
    if shard_max_rows is not None:
        n = df.count()
        shards = max(1, -(-n // shard_max_rows))
        if order_by is not None:
            df = df.repartitionByRange(shards, order_by).sortWithinPartitions(
                order_by, *sort_cols
            )
        else:
            df = df.repartition(shards)
    elif order_by is not None:
        df = df.repartitionByRange(order_by).sortWithinPartitions(order_by, *sort_cols)
    if shuffle_by is not None:
        # a projection preserves the within-partition sort (no exchange)
        df = df.drop("_shuffle_key")
    w = df.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
    return len(glob.glob(os.path.join(path, "part-*")))


def export_csv(df: DataFrame, path: str, header: bool = True) -> str:
    """S16: single CSV file with header. ``coalesce(1)`` is deliberate —
    the reference's OUTFILE is a single file; for TB-scale exports use
    ``df.write.csv`` un-coalesced instead.

    Returns the final file path.
    """
    # absolutize against the PYTHON cwd before Spark sees the path: the
    # JVM resolves relative paths against its own startup cwd, which
    # diverges from os.getcwd() after any chdir — the write would land
    # in one directory and the glob/rename below look in another
    path = os.path.abspath(path)
    tmp = path + "._spark_tmp"
    df.coalesce(1).write.mode("overwrite").option(
        "header", str(header).lower()
    ).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.replace(part, path)
    shutil.rmtree(tmp)
    return path
