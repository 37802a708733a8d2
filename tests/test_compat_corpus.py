"""Full-corpus verbatim replay: every query the reference actually
ships — all Grafana dashboard queries (grafana/dashboards/*.json) and
both balances SQL files (examples/sql_balances/*.sql) — read from the
reference tree AT TEST TIME (nothing copied into this repo) and executed
through the ClickHouse compat layer against fixture eth_* views. This is
the mechanical form of the switch-compatibility claim: a reference user
can run the query text they run today.

Value-level parity for the join/agg shapes is covered by the oracle-
checked compat_* registry queries; this corpus pass asserts the ENTIRE
shipped text executes (translation + analysis + execution), with the
documented join_use_nulls deviation on NULL-fill arithmetic.
"""

import glob
import json
import os
import re

import pytest
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.compat import ClickHouseCompat, grafana_macros

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not present"
)

# the substitutions Grafana would make for a wide dashboard time range
MACROS = grafana_macros("1970-01-01 00:00:01", "2030-01-01 00:00:00")


def _dashboard_queries():
    if not os.path.isdir(REF):
        return []
    out = []
    for f in sorted(glob.glob(f"{REF}/grafana/dashboards/*.json")):
        queries = []

        def walk(o):
            if isinstance(o, dict):
                for k, v in o.items():
                    if k == "query" and isinstance(v, str) and "SELECT" in v.upper():
                        queries.append(v)
                    else:
                        walk(v)
            elif isinstance(o, list):
                for x in o:
                    walk(x)

        walk(json.load(open(f)))
        out += [(os.path.basename(f), q) for q in queries]
    return out


@pytest.fixture(scope="module")
def compat(spark):
    c = ClickHouseCompat(spark)
    c.register_table(
        "eth_block",
        spark.createDataFrame(
            [(n, f"2020-01-0{i + 1} 12:00:00") for i, n in enumerate((1, 2, 3, 6_501_000))],
            "number long, ts string",
        ).select("number", F.col("ts").cast("timestamp").alias("timestamp")),
    )
    c.register_table(
        "eth_internal_transaction",
        spark.createDataFrame(
            [
                ("0xT1.0", 1, "0xaa", "0xbb", 1.5, 21000, 2e-9, "call", "call", None, None, None),
                ("0xT1.1", 1, "0xaa", "0xc0", 0.2, 9000, 2e-9, "call", "call", None, None, None),
                ("0xT2.0", 1, "0xaa", "0xc0", 0.0, 0, 0.0, "create", None, None, None, None),
                ("0xR.0", 1, None, None, 3.0, 0, 0.0, "reward", None, "0xminer", "block", None),
                ("0xT3.0", 2, "0xbb", "0xaa", 0.7, 21000, 3e-9, "call", "call", None, None, None),
                # rows inside the gas notebook's block > 6500000 window
                ("0xT9.0", 6_501_234, "0xee", "0xff", 1.0, 21000, 30.0, "call", "call", None, None, None),
                ("0xT9b.0", 6_501_567, "0xee", "0xff", 2.0, 21000, 50.0, "call", "call", None, None, None),
            ],
            "id string, blockNumber long, `from` string, `to` string, "
            "value double, gasUsed int, gasPrice double, type string, "
            "callType string, author string, rewardType string, error string",
        ),
    )
    c.register_table(
        "eth_contract",
        spark.createDataFrame(
            [("0xc0", 1, 1), ("0xd0", 2, 0)],
            "address string, blockNumber long, standard_erc20 int",
        ),
    )
    c.register_table(
        "eth_contract_description",
        spark.createDataFrame(
            [("0xc0", "Token", 2)], "id string, token_name string, decimals int"
        ),
    )
    c.register_table(
        "eth_contract_abi",
        spark.createDataFrame([("0xc0", "[]")], "id string, abi string"),
    )
    c.register_table(
        "eth_token_transaction",
        spark.createDataFrame(
            [
                ("0xc0", "0xaa", "0xbb", 5.0, 1),
                ("0xc0", "0xbb", "0xaa", 1.0, 2),
                ("0xc0", "0xbb", "0xcc", 2.0, 2),
            ],
            "token string, `from` string, `to` string, value double, blockNumber long",
        ),
    )
    c.register_table(
        "eth_event",
        spark.createDataFrame([("0xT1.0", 1)], "id string, blockNumber long"),
    )
    c.register_table(
        "eth_transaction_input",
        spark.createDataFrame([("0xT1.0",)], "id string"),
    )
    c.register_table(
        "eth_event_input",
        spark.createDataFrame([("0xT1.0",)], "id string"),
    )
    return c


def test_corpus_is_fully_enumerated():
    """Pin the corpus size: if the reference shipped more dashboard
    queries than this suite replays, this fails and the list below is
    stale (26 across the three dashboards)."""
    qs = _dashboard_queries()
    assert len(qs) == 26
    assert {n for n, _ in qs} == {
        "erc20_tokens.json", "ethereum.json", "insights.json"
    }


@pytest.mark.parametrize("dash,query", _dashboard_queries())
def test_grafana_query_replays_verbatim(compat, dash, query):
    df = compat.sql(query, macros=MACROS)
    df.collect()  # translation + analysis + real execution


def test_balances_sql_file_replays_verbatim(compat, tmp_path, monkeypatch):
    """examples/sql_balances/balances.sql byte-for-byte: the 4-level
    join pyramid plus its INTO OUTFILE CSV sink."""
    monkeypatch.chdir(tmp_path)  # the file names a relative OUTFILE path
    text = open(f"{REF}/examples/sql_balances/balances.sql").read()
    rows = compat.sql(text).collect()
    assert {r["address"] for r in rows} >= {"0xaa", "0xbb", "0xminer"}
    assert (tmp_path / "balances.csv").exists()


def test_notebook_gas_sql_replays_verbatim(compat):
    """The gas-price notebook's cell-6 query, extracted from the .ipynb
    at test time: quantile(q)(x) rewrites, select-list alias (`block`)
    substituted into WHERE inside the subquery scope, NOT IN subquery,
    ANY INNER JOIN to the block dim."""
    nb = json.load(
        open(f"{REF}/examples/gas_price_estimation/gas_price_estimation.ipynb")
    )
    cell = next(
        "".join(c["source"])
        for c in nb["cells"]
        if "quantile(0.5)" in "".join(c["source"])
    )
    sql = re.search(r'"""(.*?)"""', cell, re.S).group(1)
    rows = compat.sql(sql).collect()
    # both fixture txs land in bucket 6501000 (> 6500000 strictly) and
    # join the matching eth_block row; medians over {30, 50} gwei-scaled
    assert len(rows) == 1
    r = rows[0]
    assert r["block"] == 6_501_000 and r["timestamp"] is not None


def test_token_balances_sql_file_replays_verbatim(compat, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    text = open(f"{REF}/examples/sql_balances/token_balances.sql").read()
    rows = compat.sql(text).collect()
    # 0xbb: income 5.0 - outcome 3.0 = 2.0 (> the 0.01 dust filter);
    # 0xaa nets -4.0 and is filtered by the alias-in-WHERE predicate
    assert [(r["token"], r["address"], r["balance"]) for r in rows] == [
        ("0xc0", "0xbb", 2.0)
    ]
    assert (tmp_path / "token_balances.csv").exists()


def test_register_warehouse_and_example_runner(spark, tmp_path, monkeypatch):
    """The examples/run_reference_sql.py switch path: a Warehouse's
    tables registered under reference physical names, the shipped
    token_balances.sql executed against them via the example's main()."""
    import sys

    from ethereum_analytical_db_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("token_transaction", spark.createDataFrame(
        [("0xT.0", "0xaa", "0xbb", 5.0, "0xc0", 1),
         ("0xT.1", "0xbb", "0xaa", 1.0, "0xc0", 2)],
        "id string, `from` string, `to` string, value double, "
        "token string, blockNumber long",
    ))
    sys.path.insert(0, f"{os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}/examples")
    try:
        import run_reference_sql
    finally:
        sys.path.pop(0)
    monkeypatch.chdir(tmp_path)  # OUTFILE writes token_balances.csv here
    rc = run_reference_sql.main([
        f"{REF}/examples/sql_balances/token_balances.sql",
        "--warehouse", str(tmp_path / "wh"), "--cpus", "4",
    ])
    assert rc == 0
    assert (tmp_path / "token_balances.csv").exists()
    got = open(tmp_path / "token_balances.csv").read().splitlines()
    assert got[0] == "token,address,balance"
    assert "0xc0,0xbb,4.0" in got[1:]  # income 5 - outcome 1
