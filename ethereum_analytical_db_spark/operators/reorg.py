"""Chain-reorg reconciliation — the one semantic the reference leaves
on the table.

The reference stores ``blockHash`` on every fact row
(schema/schema.py:7) but never reconciles: rows ingested from a fork
that later loses the canonical race stay in the warehouse forever.
This operator closes that gap with the machinery the engine already
has: find fact rows whose (blockNumber, blockHash) disagrees with the
canonical chain and tombstone them through the ordinary ``_seq``
upsert — ``Warehouse.read(final=True)`` then drops them, and
``Warehouse.compact`` removes them physically.

Scale shape: one equi-join per fact table between the table and the
canonical (number, hash) dim on blockNumber — AQE broadcasts the dim
while the reconciled window is small (the common case: reconcile the
recent N thousand blocks where reorgs can still happen) and falls back
to a co-partitioned shuffle join for a full-history audit. Nothing is
collected; the tombstone write is an ordinary distributed append that
follows the table's existing ``_block_range`` layout so partition
pruning keeps working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_analytical_db_spark import schemas
from ethereum_analytical_db_spark.catalog import Warehouse

# fact tables carrying (blockNumber, blockHash) — the reconcilable set
REORG_TABLES = ("internal_transaction", "event")


def _is_block_partitioned(wh: Warehouse, table: str) -> bool:
    """True when the table directory uses the ``_block_range`` hive
    layout — appended tombstones must match it or the mixed layout
    breaks the reader."""
    return wh.has_block_partitions(table)


def orphaned_rows(
    facts: DataFrame,
    canonical_blocks: DataFrame,
    number_col: str = "number",
    hash_col: str = "hash",
) -> DataFrame:
    """Fact rows whose block number IS covered by ``canonical_blocks``
    but whose blockHash is not the canonical one (case-normalized — the
    ingest path lowercases, an external writer may not). Rows outside
    the canonical frame's coverage are left alone: reconcile what you
    can vouch for, touch nothing else."""
    canon = canonical_blocks.select(
        F.col(number_col).cast("long").alias("_c_number"),
        F.lower(F.col(hash_col)).alias("_c_hash"),
    )
    return (
        facts.join(
            canon,
            facts["blockNumber"].cast("long") == F.col("_c_number"),
            "inner",
        )
        .filter(F.lower(F.col("blockHash")) != F.col("_c_hash"))
        .drop("_c_number", "_c_hash")
    )


def reconcile_chain(
    wh: Warehouse,
    canonical_blocks: DataFrame,
    tables: tuple[str, ...] = REORG_TABLES,
    number_col: str = "number",
    hash_col: str = "hash",
) -> dict[str, int]:
    """Tombstone every fact row orphaned by a chain reorg.

    ``canonical_blocks``: (number, hash) for the block range being
    reconciled — typically the recent reorg-able window re-fetched from
    the node (sources/rpc.py block timestamps source carries hashes).

    Returns {table: tombstoned row count}. Idempotent: already-
    tombstoned keys are invisible to the FINAL read that seeds the
    orphan scan, so a second pass over the same window tombstones
    nothing. Re-ingesting the canonical block afterwards writes fresh
    rows under fresh ids (trace/log ids derive from the canonical
    transaction hashes) with higher ``_seq``; a key that is genuinely
    re-inserted after its tombstone wins back via last-write-wins.
    """
    results: dict[str, int] = {}
    for table in tables:
        if not wh.exists(table):
            continue
        facts = wh.read(table, final=True)
        if "blockHash" not in facts.columns or "blockNumber" not in facts.columns:
            continue
        keys = schemas.primary_key(table)
        tomb = (
            orphaned_rows(facts, canonical_blocks, number_col, hash_col)
            .select(*keys, "blockNumber")
            .withColumn("_tombstone", F.lit(1).cast("byte"))
            .cache()
        )
        try:
            n = tomb.count()
            if n:
                wh.write(
                    table,
                    tomb,
                    block_partition=(
                        "blockNumber" if _is_block_partitioned(wh, table) else None
                    ),
                )
            results[table] = n
        finally:
            tomb.unpersist()
    return results


def make_reconcile_stage(canonical_fn, tables: tuple[str, ...] = REORG_TABLES):
    """Package reconciliation as a ``SyncPipeline`` stage.

    ``canonical_fn(wh) -> DataFrame | None``: the canonical
    (number, hash) dim for the reorg-able window — typically the recent
    N-thousand-block tail re-fetched from the node (the block-timestamp
    source in ``sources/rpc.py`` carries hashes). Returning None skips
    the pass (node unreachable, nothing synced yet). The stage slots
    into the ordinary sync loop AFTER ingest, so every pass ends with
    the warehouse agreeing with the chain the node currently believes
    in:

        SyncPipeline(wh, stages=[
            ("ingest", ingest_stage),
            ("reconcile", make_reconcile_stage(fetch_canonical_tail)),
        ])
    """

    def stage(wh: Warehouse) -> None:
        canon = canonical_fn(wh)
        if canon is not None:
            reconcile_chain(wh, canon, tables=tables)

    return stage
