"""Derived-table goldens, ported from the reference's live-DB tests
(SURVEY §5 pattern 1): token_transaction derivation incl. duplicate-event
dedup (tests/token_holders_tests.py:74-133) and contract standard flags
(tests/contract_transactions_tests.py:29-110).
"""

import pytest
from pyspark.sql import Row

from ethereum_analytical_db_spark.catalog import Warehouse
from ethereum_analytical_db_spark.functions import ethereum as eth
from ethereum_analytical_db_spark.plans import derived

TRANSFER = eth.TRANSFER_EVENT_TOPIC


def _event(spark_id, tx, block, address, topics, data):
    return Row(
        id=spark_id, type="mined", logIndex=0, transactionLogIndex=0,
        data=data, transactionIndex=0, address=address,
        transactionHash=tx, blockHash="0xb", blockNumber=block, topics=topics,
    )


def _word(v: int) -> str:
    return format(v, "064x")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_token_transaction_derivation(spark, wh):
    """Transfer event of 100 tokens (18 decimals) → value 100.0, from/to
    extracted from topics — reference tests/token_holders_tests.py:74-105."""
    events = [
        _event(
            "0x1.0", "0x1", 10, "0x01",
            [TRANSFER,
             "0x" + _word(0xA1), "0x" + _word(0xB2)],
            "0x" + _word(100 * 10**18),
        ),
        # non-transfer event must be ignored
        _event("0x2.0", "0x2", 10, "0x01", ["0xdead"], "0x" + _word(5)),
    ]
    descriptions = [Row(id="0x01", decimals=18)]
    wh.create("event"); wh.create("contract_description")
    wh.write("event", spark.createDataFrame(events))
    wh.write("contract_description", spark.createDataFrame(descriptions))

    out = derived.token_transactions(
        wh.read("event"), wh.read("contract_description")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value"] == pytest.approx(100.0)
    assert r["from"] == "0x" + _word(0xA1)[-40:]
    assert r["to"] == "0x" + _word(0xB2)[-40:]
    assert r["token"] == "0x01"
    assert r["blockNumber"] == 10


def test_token_transaction_duplicate_events_dedup(spark, wh):
    """Duplicate event ids collapse to one row — reference
    tests/token_holders_tests.py:110-119 (ReplacingMergeTree semantics)."""
    ev = _event(
        "0x1.0", "0x1", 10, "0x01",
        [TRANSFER, "0x" + _word(1), "0x" + _word(2)],
        "0x" + _word(10**18),
    )
    wh.create("event"); wh.create("contract_description")
    wh.write("event", spark.createDataFrame([ev]))
    wh.write("event", spark.createDataFrame([ev]))  # replay
    wh.write("contract_description", spark.createDataFrame([Row(id="0x01", decimals=18)]))
    out = derived.token_transactions(
        wh.read("event"), wh.read("contract_description")
    ).collect()
    assert len(out) == 1


def test_token_transaction_no_decimals_no_row(spark, wh):
    """ANY INNER JOIN drops events whose token has no description —
    reference tests/token_holders_tests.py:121-133."""
    ev = _event(
        "0x1.0", "0x1", 10, "0xunknown",
        [TRANSFER, "0x" + _word(1), "0x" + _word(2)],
        "0x" + _word(10**18),
    )
    wh.create("event"); wh.create("contract_description")
    wh.write("event", spark.createDataFrame([ev]))
    wh.write("contract_description", spark.createDataFrame([Row(id="0x01", decimals=18)]))
    assert (
        derived.token_transactions(
            wh.read("event"), wh.read("contract_description")
        ).count()
        == 0
    )


_TRACE_DDL = (
    "id string, blockNumber long, address string, code string, type string, "
    "error string, parent_error tinyint, `from` string, blockHash string, "
    "subtraces int, traceAddress array<int>"
)


def _create_trace(addr, code, error=None, parent_error=None, type_="create"):
    return (addr + ".0", 1, addr, code, type_, error, parent_error,
            "0xowner", "0xb", 0, [])


def test_contract_standard_detection(spark):
    """Bytecode containing all six ERC-20 selectors → standard_erc20=1;
    missing one → 0 — reference tests/contract_transactions_tests.py:53-78."""
    erc20_code = "0x6060" + "".join(eth.ERC20_SELECTORS)
    partial_code = "0x6060" + "".join(eth.ERC20_SELECTORS[:-1])
    traces = [
        _create_trace("0xgood", erc20_code),
        _create_trace("0xpartial", partial_code),
        _create_trace("0xfailed", erc20_code, error="Out of gas"),
        _create_trace("0xcall", erc20_code, type_="call"),
    ]
    itx = spark.createDataFrame(traces, schema=_TRACE_DDL)
    out = {r["address"]: r for r in derived.contracts(itx).collect()}
    assert set(out) == {"0xgood", "0xpartial"}  # errored + non-create excluded
    assert out["0xgood"]["standard_erc20"] == 1
    assert out["0xpartial"]["standard_erc20"] == 0
    assert out["0xgood"]["owner"] == "0xowner"
    assert out["0xgood"]["id"] == "0xgood"


def test_bancor_trades_decode(spark):
    """Conversion event decoded: amount from word1 (last 120 bits — the
    reference's 64-char-slice quirk), return from word2, decimals joined
    per from/to token — reference operations/bancor_trades.py:13-74."""
    amount = 5 * 10**18
    ret = 7 * 10**18
    data = "0x" + _word(amount) + _word(ret)
    events = spark.createDataFrame([
        _event(
            "0x1.0", "0x1", 10, "0xconv",
            [eth.BANCOR_CONVERSION_TOPIC,
             "0x" + _word(0xF1), "0x" + _word(0xF2), "0x" + _word(0xABC)],
            data,
        )
    ])
    contracts_df = spark.createDataFrame(
        [Row(address="0xconv", standard_bancor_converter=1)]
    )
    from_addr = "0x" + _word(0xF1)[-40:]
    to_addr = "0x" + _word(0xF2)[-40:]
    descriptions = spark.createDataFrame(
        [Row(id=from_addr, decimals=18), Row(id=to_addr, decimals=6)]
    )
    out = derived.bancor_trades(events, contracts_df, descriptions).collect()
    assert len(out) == 1
    r = out[0]
    assert r["from_token"] == from_addr
    assert r["trader"] == "0x" + _word(0xABC)[-40:]
    # amount decodes last 120 bits of word1: amount < 2^120 so intact
    assert r["amount"] == pytest.approx(5.0)
    assert r["return"] == pytest.approx(ret / 10**6)


def test_bancor_trades_reference_decimals_goldens(spark):
    """Ported verbatim from reference tests/bancor_trades_tests.py:84-123
    (test_extract_values_with_decimals): amount 100·10^16 with
    decimals=16 → 100; return for a token with NO description decodes
    with the default 18 decimals (100·10^18 → 100); return 100 with
    decimals=0 → 100. The event data is amount-word + return-word +
    a third (ignored) word, as _create_conversion_event builds it."""
    def conv_event(i, from_tok, to_tok, amount, ret):
        return _event(
            hex(i), f"0xtx{i}", 10, "0x0",
            [eth.BANCOR_CONVERSION_TOPIC,
             "0x" + _word(from_tok), "0x" + _word(to_tok), "0x" + _word(1)],
            "0x" + _word(amount) + _word(ret) + _word(10),
        )

    events = spark.createDataFrame([
        conv_event(0, 0x1, 0x2, 100 * 10**16, 100),
        conv_event(1, 0x1, 0x3, 100 * 10**16, 100 * 10**18),
    ])
    contracts_df = spark.createDataFrame(
        [Row(address="0x0", standard_bancor_converter=1)]
    )
    addr = lambda v: "0x" + format(v, "040x")  # noqa: E731
    descriptions = spark.createDataFrame([
        Row(id=addr(0x1), decimals=16),
        Row(id=addr(0x2), decimals=0),
        # 0x3 deliberately absent → default 18 decimals
    ])
    got = {
        r["id"]: r
        for r in derived.bancor_trades(events, contracts_df, descriptions).collect()
    }
    assert got["0x0"]["from_token"] == addr(0x1)
    assert got["0x0"]["to_token"] == addr(0x2)
    assert got["0x0"]["amount"] == pytest.approx(100.0)
    assert got["0x0"]["return"] == pytest.approx(100.0)
    assert got["0x1"]["amount"] == pytest.approx(100.0)
    assert got["0x1"]["return"] == pytest.approx(100.0)


def test_bancor_trades_non_converter_excluded(spark):
    events = spark.createDataFrame([
        _event(
            "0x1.0", "0x1", 10, "0xnotconv",
            [eth.BANCOR_CONVERSION_TOPIC,
             "0x" + _word(1), "0x" + _word(2), "0x" + _word(3)],
            "0x" + _word(5) + _word(6),
        )
    ])
    contracts_df = spark.createDataFrame(
        [Row(address="0xconv", standard_bancor_converter=1)]
    )
    descriptions = spark.createDataFrame([Row(id="0xtok", decimals=18)])
    assert derived.bancor_trades(events, contracts_df, descriptions).count() == 0
