"""REST serving layer (SURVEY §2.1 S17, §2.3 J15).

The reference serves balances over Flask: POST /balances/ with a JSON
address list, POST /token_balances/<token>
(examples/balances_api/server.py:8-18). Each handler combines five
per-address aggregates in Python dicts — income − outcome + reward −
fee + fee_reward, floored at 0
(examples/balances_api/actions/balances.py:68-83,
token_balances.py:26-35).

Here the combine is a chain of full-outer joins + coalesce arithmetic
executed by Spark SQL over the warehouse's registered views (the
analytics read path, SURVEY §3.3) — the engine does the distributed
work; Flask only shapes JSON. Balance semantics follow
examples/sql_balances/balances.sql:1-63: fees count only top-level
calls (id LIKE '%.0'), rewards only type='reward', and a miner earns
each block's total fees (fee_reward).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BALANCES_SQL = """
WITH universe AS (
  SELECT DISTINCT address FROM (
    SELECT `to` AS address FROM internal_transaction
    UNION ALL SELECT `from` AS address FROM internal_transaction
    UNION ALL SELECT author AS address FROM internal_transaction
  ) WHERE address IS NOT NULL
),
income AS (
  SELECT `to` AS address, SUM(value) AS v FROM internal_transaction
  WHERE type != 'reward' AND error IS NULL
    AND (parent_error IS NULL OR CAST(parent_error AS INT) = 0)
  GROUP BY `to`
),
outcome AS (
  SELECT `from` AS address, SUM(value) AS v FROM internal_transaction
  WHERE error IS NULL
    AND (parent_error IS NULL OR CAST(parent_error AS INT) = 0)
  GROUP BY `from`
),
reward AS (
  SELECT author AS address, SUM(value) AS v FROM internal_transaction
  WHERE type = 'reward' GROUP BY author
),
fee AS (
  SELECT `from` AS address, SUM(gasUsed * gasPrice) AS v
  FROM internal_transaction WHERE id LIKE '%.0' GROUP BY `from`
),
block_fee AS (
  SELECT blockNumber, SUM(gasUsed * gasPrice) AS v
  FROM internal_transaction WHERE id LIKE '%.0' GROUP BY blockNumber
),
fee_reward AS (
  SELECT m.author AS address, SUM(bf.v) AS v
  FROM (SELECT author, blockNumber FROM internal_transaction
        WHERE type = 'reward' AND rewardType = 'block') m
  JOIN block_fee bf USING (blockNumber)
  GROUP BY m.author
)
SELECT u.address,
       GREATEST(
         COALESCE(i.v, 0) - COALESCE(o.v, 0) + COALESCE(r.v, 0)
         - COALESCE(f.v, 0) + COALESCE(fr.v, 0),
         0
       ) AS balance
FROM universe u
LEFT JOIN income i ON u.address = i.address
LEFT JOIN outcome o ON u.address = o.address
LEFT JOIN reward r ON u.address = r.address
LEFT JOIN fee f ON u.address = f.address
LEFT JOIN fee_reward fr ON u.address = fr.address
"""

TOKEN_BALANCES_SQL = """
SELECT COALESCE(o.token, i.token) AS token,
       COALESCE(o.address, i.address) AS address,
       COALESCE(i.v, 0) - COALESCE(o.v, 0) AS balance
FROM (
  SELECT token, `from` AS address, SUM(value) AS v
  FROM token_transaction GROUP BY token, `from`
) o
FULL OUTER JOIN (
  SELECT token, `to` AS address, SUM(value) AS v
  FROM token_transaction GROUP BY token, `to`
) i ON o.token = i.token AND o.address = i.address
"""


def compute_balances(
    spark: SparkSession, addresses: list[str] | None = None
) -> DataFrame:
    df = spark.sql(BALANCES_SQL)
    # None = no filter (full scan is the explicit ask); an EMPTY list
    # means "these zero addresses" and must return zero rows — the
    # falsy-list check previously collected the whole address universe
    # for a request that asked for nothing
    if addresses is not None:
        df = df.filter(df["address"].isin([a.lower() for a in addresses]))
    return df


def compute_token_balances(spark: SparkSession, token: str) -> DataFrame:
    df = spark.sql(TOKEN_BALANCES_SQL)
    return df.filter(df["token"] == token.lower()).select("address", "balance")


def create_app(spark: SparkSession):
    """Flask app factory (import-gated: serving is optional)."""
    from flask import Flask, jsonify, request

    app = Flask("spark-chain-analytics")

    @app.post("/balances/")
    def balances():
        payload = request.get_json(silent=True)
        # accept both body shapes: {"addresses": [...]} and a bare JSON
        # list (the reference clients post the latter) — .get on a list
        # was a 500
        if isinstance(payload, list):
            addrs = payload
        else:
            addrs = (payload or {}).get("addresses")
        rows = compute_balances(spark, addrs).collect()
        return jsonify({r["address"]: r["balance"] for r in rows})

    @app.post("/token_balances/<token>")
    def token_balances(token: str):
        rows = compute_token_balances(spark, token).collect()
        return jsonify({r["address"]: r["balance"] for r in rows})

    return app
