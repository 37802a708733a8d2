"""Reorg reconciliation: orphaned fork rows tombstone via the ordinary
_seq upsert and disappear from FINAL reads — the semantic the reference
leaves unimplemented (it stores blockHash, schema/schema.py:7, but
never reconciles)."""

from pyspark.sql import functions as F

from ethereum_analytical_db_spark.catalog import Warehouse
from ethereum_analytical_db_spark.operators.reorg import (
    orphaned_rows,
    reconcile_chain,
)

TX_DDL = (
    "id string, blockNumber long, `to` string, callType string, type string, "
    "input string, blockHash string, subtraces int, "
    "traceAddress array<int>, transactionHash string"
)


def _tx(i, block, bh, prefix="0xT"):
    return (
        f"{prefix}{i}.0", block, "0xa", "call", "call", "0x",
        bh, 0, [], f"{prefix}{i}",
    )


def test_reconcile_fork_end_to_end(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    canonical_rows = [_tx(1, 1, "0xa1"), _tx(2, 2, "0xa2")]
    fork_rows = [_tx(9, 2, "0xb2", prefix="0xF")]
    beyond = [_tx(5, 5, "0xe5", prefix="0xZ")]  # outside canon coverage
    wh.write(
        "internal_transaction",
        spark.createDataFrame(canonical_rows + fork_rows + beyond, TX_DDL),
    )
    # canonical hash arrives checksummed-uppercase for block 1: the
    # comparison must be case-normalized on both sides
    canon = spark.createDataFrame(
        [(1, "0xA1"), (2, "0xa2")], "number long, hash string"
    )

    res = reconcile_chain(wh, canon)
    assert res == {"internal_transaction": 1}

    final_ids = {
        r["id"] for r in wh.read("internal_transaction").select("id").collect()
    }
    # fork row gone; canonical rows AND the uncovered block-5 row stay
    assert final_ids == {"0xT1.0", "0xT2.0", "0xZ5.0"}
    raw = wh.read("internal_transaction", final=False)
    assert raw.filter("_tombstone = 1").count() == 1

    # idempotent: the tombstoned key is invisible to the next scan
    assert reconcile_chain(wh, canon) == {"internal_transaction": 0}

    # compact removes the orphan (and its tombstone) physically
    wh.compact("internal_transaction")
    assert wh.read("internal_transaction", final=False).count() == 3

    # a genuine re-insert of a tombstoned key wins back via _seq
    res = reconcile_chain(
        wh, spark.createDataFrame([(5, "0xffff")], "number long, hash string")
    )
    assert res == {"internal_transaction": 1}
    assert wh.read("internal_transaction").count() == 2
    wh.write(
        "internal_transaction",
        spark.createDataFrame([_tx(5, 5, "0xffff", prefix="0xZ")], TX_DDL),
    )
    revived = wh.read("internal_transaction").filter(F.col("id") == "0xZ5.0")
    assert revived.count() == 1
    assert revived.first()["blockHash"] == "0xffff"


def test_reconcile_respects_block_range_partitioning(spark, tmp_path):
    """A _block_range-partitioned table must receive tombstones in the
    same hive layout (a flat append would break the partitioned read)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rows = [_tx(i, i * 100_000, f"0xa{i}") for i in range(4)]
    fork = [_tx(7, 100_000, "0xdead", prefix="0xF")]
    wh.write(
        "internal_transaction",
        spark.createDataFrame(rows + fork, TX_DDL),
        block_partition="blockNumber",
    )
    canon = spark.createDataFrame(
        [(i * 100_000, f"0xa{i}") for i in range(4)], "number long, hash string"
    )
    assert reconcile_chain(wh, canon) == {"internal_transaction": 1}
    got = wh.read("internal_transaction")
    assert got.count() == 4
    # pruning still works on the mixed (data + tombstone) partition dirs
    pruned = got.filter(F.col("blockNumber") >= 200_000)
    assert pruned.count() == 2


def test_reconcile_event_table_and_missing_tables(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = spark.createDataFrame(
        [
            ("0xE1", "mined", 0, 0, "0x", 0, "0xc", "0xT1", "0xa1", 1, ["0xt"]),
            ("0xE2", "mined", 0, 0, "0x", 0, "0xc", "0xT2", "0xbad", 1, ["0xt"]),
        ],
        "id string, type string, logIndex int, transactionLogIndex int, "
        "data string, transactionIndex int, address string, "
        "transactionHash string, blockHash string, blockNumber int, "
        "topics array<string>",
    )
    wh.write("event", ev)
    canon = spark.createDataFrame([(1, "0xa1")], "number long, hash string")
    # internal_transaction doesn't exist: skipped, not an error
    res = reconcile_chain(wh, canon)
    assert res == {"event": 1}
    assert {r["id"] for r in wh.read("event").collect()} == {"0xE1"}


def test_orphaned_rows_is_pure_plan(spark):
    facts = spark.createDataFrame(
        [("a", 1, "0xh1"), ("b", 1, "0xh2")],
        "id string, blockNumber long, blockHash string",
    )
    canon = spark.createDataFrame([(1, "0xh1")], "number long, hash string")
    got = orphaned_rows(facts, canon).collect()
    assert [r["id"] for r in got] == ["b"]
    # no cartesian / nested-loop in the plan
    plan = orphaned_rows(facts, canon)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tombstones_survive_pre_upgrade_part_files(spark, tmp_path):
    """A warehouse whose OLD part files lack the _tombstone column must
    still honor tombstones written later: the reader uses the explicit
    registered schema, so which part file Spark would have sampled for
    inference can't decide whether orphans resurface."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    # simulate a pre-reorg-era file: no _tombstone column on disk
    legacy = spark.createDataFrame(
        [("0xT1.0", 1, "0xa1", 10)],
        "id string, blockNumber long, blockHash string, _seq long",
    )
    legacy.write.mode("append").parquet(wh._path("internal_transaction"))
    # newer write-path rows carry the column implicitly (null)
    wh.write(
        "internal_transaction",
        spark.createDataFrame([_tx(2, 2, "0xa2")], TX_DDL),
    )
    # tombstone the legacy row through the ordinary upsert
    wh.write(
        "internal_transaction",
        spark.createDataFrame(
            [("0xT1.0", 1, "0xa1")], "id string, blockNumber long, blockHash string"
        ).withColumn("_tombstone", F.lit(1).cast("byte")),
    )
    final = wh.read("internal_transaction", final=True)
    assert "_tombstone" in final.columns  # deterministic schema
    ids = {r["id"] for r in final.select("id").collect()}
    assert ids == {"0xT2.0"}  # legacy row tombstoned, new row alive


def test_compact_fully_tombstoned_partitioned_table(spark, tmp_path):
    """compact() on a block-partitioned table whose FINAL view is empty
    (every key tombstoned) must not crash on the zero-data-file
    read-back, and must leave a readable (empty) table."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rows = spark.createDataFrame([_tx(1, 1, "0xa1"), _tx(2, 150_000, "0xa2")], TX_DDL)
    wh.write("internal_transaction", rows, block_partition="blockNumber")
    tomb = rows.select("id", "blockNumber", "blockHash").withColumn(
        "_tombstone", F.lit(1).cast("byte")
    )
    wh.write("internal_transaction", tomb, block_partition="blockNumber")
    assert wh.read("internal_transaction", final=True).count() == 0
    wh.compact("internal_transaction")
    assert wh.read("internal_transaction", final=False).count() == 0
    assert wh.read("internal_transaction", final=True).count() == 0


def test_reconcile_stage_in_sync_loop(spark, tmp_path):
    """make_reconcile_stage slots reorg reconciliation into the ordinary
    sync loop: after run_once, fork rows are tombstoned; a None canon
    (node unreachable) skips cleanly."""
    from ethereum_analytical_db_spark.operators.reorg import make_reconcile_stage
    from ethereum_analytical_db_spark.streaming.incremental import SyncPipeline

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write(
        "internal_transaction",
        spark.createDataFrame([_tx(1, 1, "0xa1"), _tx(2, 2, "0xFORK")], TX_DDL),
    )
    canon = spark.createDataFrame([(1, "0xa1"), (2, "0xa2")], "number long, hash string")

    calls = []
    pipe = SyncPipeline(
        wh,
        stages=[
            ("noop_ingest", lambda w: calls.append("ingest")),
            ("reconcile", make_reconcile_stage(lambda w: canon)),
        ],
    )
    pipe.run_once()
    assert calls == ["ingest"]
    ids = {r["id"] for r in wh.read("internal_transaction", final=True).select("id").collect()}
    assert ids == {"0xT1.0"}  # the fork row is gone

    # unreachable node: canonical_fn returns None -> pass is a no-op
    skip = SyncPipeline(wh, stages=[("reconcile", make_reconcile_stage(lambda w: None))])
    skip.run_once()
    assert {r["id"] for r in wh.read("internal_transaction", final=True).select("id").collect()} == {"0xT1.0"}
