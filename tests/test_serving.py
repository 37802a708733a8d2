"""REST serving layer S17 — Flask over spark.sql views, reference
balances arithmetic (J15): income − outcome + reward − fee + fee_reward,
floored at 0 (examples/balances_api tests' semantics)."""

import pytest
from pyspark.sql import Row

from ethereum_analytical_db_spark.serving import api


@pytest.fixture()
def chain_views(spark):
    itx_cols = (
        "id string, blockNumber long, `from` string, `to` string, value double, "
        "gasUsed int, gasPrice double, type string, rewardType string, "
        "author string, error string, parent_error boolean"
    )
    rows = [
        # block 1: a→b 10 ETH top-level, fee 21000 * 1e-9
        Row(id="0xT1.0", blockNumber=1, **{"from": "0xa"}, to="0xb", value=10.0,
            gasUsed=21000, gasPrice=1e-9, type="call", rewardType=None,
            author=None, error=None, parent_error=False),
        # failed tx: must not move value
        Row(id="0xT2.0", blockNumber=1, **{"from": "0xb"}, to="0xa", value=99.0,
            gasUsed=0, gasPrice=0.0, type="call", rewardType=None,
            author=None, error="Reverted", parent_error=False),
        # block reward to miner m + fee_reward from block 1 fees
        Row(id="0xR1.0", blockNumber=1, **{"from": None}, to=None, value=2.0,
            gasUsed=None, gasPrice=None, type="reward", rewardType="block",
            author="0xm", error=None, parent_error=False),
    ]
    spark.createDataFrame(rows, itx_cols).createOrReplaceTempView(
        "internal_transaction"
    )
    tt = [
        Row(id="0xE1.0", token="0xtok", **{"from": "0xa"}, to="0xb", value=7.5),
        Row(id="0xE2.0", token="0xtok", **{"from": "0xb"}, to="0xc", value=2.5),
    ]
    spark.createDataFrame(
        tt, "id string, token string, `from` string, `to` string, value double"
    ).createOrReplaceTempView("token_transaction")


def test_compute_balances(spark, chain_views):
    out = {r["address"]: r["balance"] for r in api.compute_balances(spark).collect()}
    fee = 21000 * 1e-9
    assert out["0xb"] == pytest.approx(10.0)        # received 10; failed send ignored
    assert out["0xa"] == pytest.approx(0.0)          # 0 - 10 - fee → floored at 0
    assert out["0xm"] == pytest.approx(2.0 + fee)    # block reward + fee_reward


def test_flask_endpoints(spark, chain_views):
    app = api.create_app(spark)
    client = app.test_client()

    resp = client.post("/balances/", json={"addresses": ["0xB", "0xM"]})
    assert resp.status_code == 200
    body = resp.get_json()
    assert set(body) == {"0xb", "0xm"}
    assert body["0xb"] == pytest.approx(10.0)

    resp = client.post("/token_balances/0xTOK")
    body = resp.get_json()
    assert body["0xb"] == pytest.approx(7.5 - 2.5)
    assert body["0xc"] == pytest.approx(2.5)
    assert body["0xa"] == pytest.approx(-7.5)  # token balances are not floored
