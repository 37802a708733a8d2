"""CLI entry point — the reference's ``extractor.py`` command surface
(reference extractor.py:6-43: a click group dispatching named operations
like prepare-database / start / extract-traces over one database),
re-expressed over the Spark warehouse:

    python -m ethereum_analytical_db_spark prepare    --warehouse DIR
    python -m ethereum_analytical_db_spark sync-once  --warehouse DIR --fixtures DIR
    python -m ethereum_analytical_db_spark sync       --warehouse DIR --fixtures DIR --max-passes N
    python -m ethereum_analytical_db_spark export-csv --warehouse DIR --table T --out PATH

``prepare`` materializes the warehouse layout (reference
prepare-database = prepare_indices_and_views); ``sync-once`` runs one
``SyncPipeline`` pass — blocks → traces → events → derived refresh —
exactly the reference's ``synchronize`` stage order
(operations/clickhouse.py:151-172); ``sync`` loops it; ``export-csv`` is
the S16 sink. The JSON-RPC side runs through the file-backed transport
(--fixtures) or a real node (--rpc-url); both are picklable factories,
so the per-partition fetches stay on executors.
"""

from __future__ import annotations

import argparse
import functools
import sys

from pyspark.sql import functions as F

from . import schemas
from .catalog import Warehouse
from .plans import derived
from .session import get_spark
from .sources import files, rpc
from .streaming import incremental as inc


def _file_transport(fixture_dir: str) -> rpc.FileJsonRpcTransport:
    return rpc.FileJsonRpcTransport(fixture_dir)


def _http_transport(url: str) -> rpc.RetryTransport:
    # real-node path gets the bounded-backoff retry wrapper (T6); the
    # fixture transport is deterministic and needs none
    return rpc.RetryTransport(rpc.HttpJsonRpcTransport(url))


def make_transport_factory(args):
    if args.fixtures:
        return functools.partial(_file_transport, args.fixtures)
    if args.rpc_url:
        return functools.partial(_http_transport, args.rpc_url)
    raise SystemExit("need --fixtures DIR or --rpc-url URL for sync commands")


def _latest_block(args, factory) -> int:
    """Chain head: --max-block wins, else ask the node (eth_blockNumber,
    like the reference's utils.get_max_block)."""
    if args.max_block is not None:
        return int(args.max_block)
    resp = rpc._post_matched(
        factory(),
        [{"jsonrpc": "2.0", "id": 0, "method": "eth_blockNumber", "params": []}],
    )[0]
    result = resp.get("result")
    if result is None:
        raise SystemExit(
            "eth_blockNumber returned nothing — pass --max-block explicitly"
        )
    return int(str(result), 0)


# ---- stages (each: Warehouse -> None, idempotent by upsert + flags) ----


def extract_blocks(wh: Warehouse, factory, head: int) -> None:
    """Reference extract-blocks (operations/blocks.py): insert block rows
    [0, head] that the warehouse doesn't have yet, with timestamps."""
    want = wh.spark.range(0, head + 1).select(F.col("id").alias("number"))
    if wh.exists("block"):
        have = wh.read("block").select("number")
        want = want.join(have, "number", "left_anti")
    if want.isEmpty():
        return
    blocks = rpc.fetch_block_timestamps(wh.spark, want, factory)
    wh.write("block", blocks)


def _flags(wh: Warehouse):
    """block_flag table, or an empty frame on a fresh warehouse (sync
    before prepare) — nothing is flagged yet either way."""
    if wh.exists("block_flag"):
        return wh.read("block_flag")
    return wh.spark.createDataFrame([], schemas.TABLES["block_flag"])


def extract_traces(wh: Warehouse, factory) -> None:
    """Reference extract-traces: trace_block for every block not yet
    flagged, decode, upsert, then flag (flags after data, so a crash
    between the two re-extracts rather than skips)."""
    todo = inc.unprocessed_blocks(
        wh.read("block"), _flags(wh), "traces_extracted"
    )
    if todo.isEmpty():
        return
    raw = rpc.fetch_traces(wh.spark, todo.select("number"), factory)
    # block-range hive partitioning: incremental sync appends only tail
    # directories and block predicates prune at the scan (catalog.py
    # write() docstring — the 100 TB layout, on the production path)
    wh.write(
        "internal_transaction",
        rpc.decode_traces(raw),
        block_partition="blockNumber",
    )
    inc.write_block_flags(wh, todo.select("id"), "traces_extracted")


def extract_events(wh: Warehouse, factory, range_size: int) -> None:
    """Reference extract-events: eth_getLogs over range windows of the
    not-yet-flagged blocks (operations/events.py EVENTS_RANGE_SIZE)."""
    todo = inc.unprocessed_blocks(
        wh.read("block"), _flags(wh), "events_extracted"
    )
    if todo.isEmpty():
        return
    ranges = inc.block_ranges(todo, range_size)
    events = rpc.fetch_events(wh.spark, ranges, factory)
    wh.write("event", events, block_partition="blockNumber")
    inc.write_block_flags(wh, todo.select("id"), "events_extracted")


def derived_refresh(wh: Warehouse) -> None:
    """Reference prepare-contracts-view + prepare-erc-transactions-view:
    refresh the derived tables from the raw ones after each pass."""
    if wh.exists("internal_transaction"):
        wh.write("contract", derived.contracts(wh.read("internal_transaction")))
    if wh.exists("event") and wh.exists("contract_description"):
        dim = wh.read("contract_description")
        if not dim.isEmpty():
            wh.write(
                "token_transaction",
                derived.token_transactions(wh.read("event"), dim),
            )


def build_pipeline(wh: Warehouse, args) -> inc.SyncPipeline:
    factory = make_transport_factory(args)
    # resolve the chain head lazily INSIDE the blocks stage so a looping
    # `sync` re-reads eth_blockNumber each pass and keeps ingesting blocks
    # mined after startup (reference synchronize re-reads the max block per
    # pass); an explicit --max-block still pins it
    stages = [
        ("blocks", lambda w: extract_blocks(w, factory, _latest_block(args, factory))),
        ("traces", lambda w: extract_traces(w, factory)),
        ("events", lambda w: extract_events(w, factory, args.range_size)),
    ]
    return inc.SyncPipeline(wh, stages, derived_refresh=derived_refresh)


# ---- commands ----


def cmd_prepare(wh: Warehouse, args) -> int:
    for name, schema in schemas.TABLES.items():
        if not wh.exists(name):
            wh.write(name, wh.spark.createDataFrame([], schema))
    wh.register_views()
    print(f"prepared {len(schemas.TABLES)} tables at {wh.root}")
    return 0


def cmd_sync_once(wh: Warehouse, args) -> int:
    if getattr(args, "full", False):
        # reference start-full (synchronize_full): re-extract everything —
        # drop the processed-flags table so every block is unprocessed
        # again; data writes stay idempotent upserts by id
        wh.drop("block_flag")
    build_pipeline(wh, args).run_once()
    print("sync pass complete")
    return 0


def cmd_sync(wh: Warehouse, args) -> int:
    build_pipeline(wh, args).run_forever(
        sleep_s=args.sleep, max_passes=args.max_passes
    )
    print("sync loop done")
    return 0


def cmd_export_csv(wh: Warehouse, args) -> int:
    out = files.export_csv(wh.read(args.table), args.out)
    print(f"exported {args.table} -> {out}")
    return 0


def cmd_extract_blocks(wh: Warehouse, args) -> int:
    factory = make_transport_factory(args)
    extract_blocks(wh, factory, _latest_block(args, factory))
    return 0


def cmd_extract_traces(wh: Warehouse, args) -> int:
    extract_traces(wh, make_transport_factory(args))
    return 0


def cmd_extract_events(wh: Warehouse, args) -> int:
    extract_events(wh, make_transport_factory(args), args.range_size)
    return 0


def cmd_prepare_views(wh: Warehouse, args) -> int:
    """prepare-contracts-view + prepare-erc-transactions-view in one:
    refresh the derived tables from whatever raw tables exist."""
    derived_refresh(wh)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m ethereum_analytical_db_spark")
    p.add_argument("--warehouse", required=True, help="warehouse directory")
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("prepare", help="create the warehouse tables + views")
    sub.add_parser(
        "prepare-views", help="refresh derived tables (contracts, token txs)"
    )

    for name in ("sync-once", "sync", "extract-blocks", "extract-traces",
                 "extract-events"):
        sp = sub.add_parser(name, help=f"{name} over the JSON-RPC sources")
        sp.add_argument("--fixtures", help="FileJsonRpcTransport fixture dir")
        sp.add_argument("--rpc-url", help="HTTP JSON-RPC endpoint")
        sp.add_argument(
            "--max-block", type=int, default=None,
            help="chain head override (else eth_blockNumber)",
        )
        sp.add_argument("--range-size", type=int, default=1000)
        if name == "sync-once":
            sp.add_argument(
                "--full", action="store_true",
                help="re-extract everything (reference start-full): "
                "clears the block flags first",
            )
        if name == "sync":
            sp.add_argument("--sleep", type=float, default=10.0)
            sp.add_argument("--max-passes", type=int, default=None)

    ex = sub.add_parser("export-csv", help="export a table to CSV (S16)")
    ex.add_argument("--table", required=True)
    ex.add_argument("--out", required=True)
    return p


COMMANDS = {
    "prepare": cmd_prepare,
    "prepare-views": cmd_prepare_views,
    "sync-once": cmd_sync_once,
    "sync": cmd_sync,
    "export-csv": cmd_export_csv,
    "extract-blocks": cmd_extract_blocks,
    "extract-traces": cmd_extract_traces,
    "extract-events": cmd_extract_events,
}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="eads-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wh = Warehouse(spark, args.warehouse)
    return COMMANDS[args.cmd](wh, args)


if __name__ == "__main__":
    sys.exit(main())
