"""End-to-end CLI drive: prepare → sync-once (fixture transport) →
export-csv, the reference's extractor.py operator flow (extractor.py:6-43,
operations/clickhouse.py synchronize) against a temp warehouse."""

import csv
import json

from ethereum_analytical_db_spark.__main__ import main
from ethereum_analytical_db_spark.catalog import Warehouse


def _write_fixtures(d):
    d.mkdir()
    (d / "eth_blockNumber_.json").write_text(json.dumps(hex(2)))
    # block timestamps (block 0 uses the genesis default)
    (d / "eth_getBlockByNumber_0x0.json").write_text(json.dumps({"timestamp": None}))
    (d / "eth_getBlockByNumber_0x1.json").write_text(
        json.dumps({"timestamp": hex(1_500_000_000)})
    )
    (d / "eth_getBlockByNumber_0x2.json").write_text(
        json.dumps({"timestamp": hex(1_500_000_600)})
    )
    # traces: block 1 has a value call + a create; blocks 0 and 2 are empty
    (d / "trace_block_0x0.json").write_text(json.dumps([]))
    (d / "trace_block_0x1.json").write_text(
        json.dumps(
            [
                {
                    "transactionHash": "0xT1",
                    "traceAddress": [],
                    "type": "call",
                    "action": {
                        "callType": "call",
                        "from": "0xAA",
                        "to": "0xBB",
                        "value": hex(10**18),
                        "gas": "0x5208",
                    },
                    "result": {"gasUsed": "0x5208", "output": "0x"},
                },
                {
                    "transactionHash": "0xT2",
                    "traceAddress": [],
                    "type": "create",
                    "action": {"from": "0xAA", "value": "0x0"},
                    "result": {"gasUsed": "0x0", "address": "0xC0",
                               "code": "0x6060"},
                },
            ]
        )
    )
    (d / "trace_block_0x2.json").write_text(json.dumps([]))
    # eth_getLogs fixture key is the engine's half-open '{lo}-{hi}' form
    (d / "eth_getLogs_0-1000.json").write_text(
        json.dumps(
            [
                {
                    "address": "0xDEAD",
                    "topics": ["0xTOPIC"],
                    "data": "0x01",
                    "blockNumber": "0x1",
                    "transactionHash": "0xT1",
                    "transactionLogIndex": "0x0",
                    "logIndex": "0x0",
                    "blockHash": "0xB1",
                    "type": "mined",
                }
            ]
        )
    )


def test_cli_fixture_sync_end_to_end(spark, tmp_path):
    fixtures = tmp_path / "rpc"
    _write_fixtures(fixtures)
    whdir = str(tmp_path / "wh")
    base = ["--warehouse", whdir, "--cpus", "4"]

    assert main(base + ["prepare"]) == 0
    assert main(base + ["sync-once", "--fixtures", str(fixtures)]) == 0

    wh = Warehouse(spark, whdir)
    blocks = {r["number"]: r for r in wh.read("block").collect()}
    assert sorted(blocks) == [0, 1, 2]
    assert blocks[0]["timestamp"] is not None  # genesis default applied

    itx = wh.read("internal_transaction").collect()
    assert {r["transactionHash"] for r in itx} == {"0xT1", "0xT2"}
    call = next(r for r in itx if r["type"] == "call")
    assert call["value"] == 1.0  # wei → ether float

    events = wh.read("event").collect()
    assert len(events) == 1 and events[0]["id"] == "0xT1.0"

    # derived refresh ran: the create trace became an eth_contract row
    contracts = wh.read("contract").collect()
    assert len(contracts) == 1 and contracts[0]["address"] == "0xC0"

    flags = wh.read("block_flag").collect()
    assert {(r["id"], r["name"]) for r in flags} == {
        (str(b), f) for b in range(3)
        for f in ("traces_extracted", "events_extracted")
    }

    # second pass is a no-op (steady state), not a re-extract
    assert main(base + ["sync-once", "--fixtures", str(fixtures)]) == 0
    assert wh.read("internal_transaction").count() == 2

    out = tmp_path / "export.csv"
    assert main(base + ["export-csv", "--table", "block", "--out", str(out)]) == 0
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert {r["number"] for r in rows} == {"0", "1", "2"}


def test_cli_sync_loop_bounded(spark, tmp_path):
    """`sync --max-passes 2 --sleep 0` drives the run_forever loop twice
    and converges to the same steady state as two sync-once passes."""
    fixtures = tmp_path / "rpc"
    _write_fixtures(fixtures)
    whdir = str(tmp_path / "wh")
    base = ["--warehouse", whdir, "--cpus", "4"]

    assert main(base + ["prepare"]) == 0
    assert main(
        base
        + ["sync", "--fixtures", str(fixtures), "--max-passes", "2", "--sleep", "0"]
    ) == 0
    wh = Warehouse(spark, whdir)
    assert wh.read("internal_transaction").count() == 2
    assert wh.read("block_flag").filter("name = 'traces_extracted'").count() == 3


def test_cli_per_stage_commands(spark, tmp_path):
    """The reference's individual extract-* commands compose to the same
    state one sync-once pass reaches."""
    fixtures = tmp_path / "rpc"
    _write_fixtures(fixtures)
    whdir = str(tmp_path / "wh")
    base = ["--warehouse", whdir, "--cpus", "4"]
    fx = ["--fixtures", str(fixtures)]

    assert main(base + ["prepare"]) == 0
    assert main(base + ["extract-blocks"] + fx) == 0
    assert main(base + ["extract-traces"] + fx) == 0
    assert main(base + ["extract-events"] + fx) == 0
    assert main(base + ["prepare-views"]) == 0

    wh = Warehouse(spark, whdir)
    assert wh.read("block").count() == 3
    assert wh.read("internal_transaction").count() == 2
    assert wh.read("event").count() == 1
    assert wh.read("contract").count() == 1

    # start-full analogue: --full clears flags and re-extracts; upsert
    # dedup keeps the table at the same row count
    assert main(base + ["sync-once", "--full"] + fx) == 0
    assert wh.read("internal_transaction").count() == 2
    assert wh.read("block_flag").filter("name = 'traces_extracted'").count() == 3
