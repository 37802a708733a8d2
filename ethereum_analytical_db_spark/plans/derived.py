"""Derived tables — the reference's materialized views and views.

ClickHouse MVs update on every insert (SURVEY T8); here each is a pure
DataFrame transformation recomputed per batch (or registered as a lazy
view) — equivalent at batch boundaries, which is where correctness is
checked (SURVEY §7.3 risk (e)).

Scale notes: `contracts` is a filter+project over the trace fact table —
fully pushed down to the Parquet scan. `token_transactions` joins the
event fact to the token-decimals dim: the dim is tiny (one row per token
contract), so it is broadcast — no shuffle of the 100-TB fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import ethereum as eth
from ..operators.joins import any_join
from ..operators.predicates import topic_equals


def contracts(internal_transactions: DataFrame) -> DataFrame:
    """The eth_contract MV (reference operations/contract_transactions.py:82-112):
    deployed contracts from `type='create'` traces with error-free parents,
    plus bytecode-LIKE standard flags (SURVEY P6/F7).
    """
    itx = internal_transactions
    out = itx.filter(
        (F.col("type") == "create")
        & F.col("error").isNull()
        & F.col("parent_error").isNull()
    ).select(
        F.coalesce(F.col("address"), F.col("id")).alias("id"),
        F.col("blockNumber"),
        F.col("address"),
        F.col("from").alias("owner"),
        F.col("code").alias("bytecode"),
        eth.bytecode_standard_flag("code", eth.ERC20_SELECTORS).alias("standard_erc20"),
        eth.bytecode_standard_flag("code", eth.ERC223_SELECTORS).alias("standard_erc223"),
        eth.bytecode_standard_flag("code", eth.BANCOR_CONVERTER_SELECTORS).alias(
            "standard_bancor_converter"
        ),
    )
    return out


def token_transactions(events: DataFrame, contract_descriptions: DataFrame) -> DataFrame:
    """The eth_token_transaction MV (reference operations/token_holders.py:20-51):
    ERC-20 Transfer events decoded and scaled by token decimals.

    ANY INNER JOIN → broadcast inner join against the deduped dim
    (SURVEY J5); the uint256 decode is the F1 Column expression.
    """
    transfers = events.filter(
        topic_equals("topics", 1, eth.TRANSFER_EVENT_TOPIC)
    )
    dim = contract_descriptions.select(
        F.col("id").alias("address"), F.col("decimals")
    )
    joined = any_join(transfers, dim, keys="address", how="inner", broadcast=True)
    return joined.select(
        eth.topic_to_address("topics", 2).alias("from"),
        eth.topic_to_address("topics", 3).alias("to"),
        eth.hex_word_to_float("data", "decimals").alias("value"),
        F.col("id"),
        F.col("address").alias("token"),
        F.col("transactionHash"),
        F.col("blockNumber"),
    )


def bancor_trades(
    events: DataFrame,
    contracts_df: DataFrame,
    contract_descriptions: DataFrame,
) -> DataFrame:
    """The eth_bancor_trade view (reference operations/bancor_trades.py:13-74):
    Bancor Conversion events from converter contracts, with amount/return
    decoded per from/to token decimals.

    Reference quirks preserved: `substring(data, 65, 66)` (66 chars from
    position 65) feeds the F1 decode, whose own substring(·,35) lands on
    the last 32 hex chars of the second data word; topic address slices
    use substring(topic, 27) to end-of-string (40 chars).
    """
    conv = events.filter(topic_equals("topics", 1, eth.BANCOR_CONVERSION_TOPIC))
    converter_addresses = contracts_df.filter(
        F.col("standard_bancor_converter") == 1
    ).select("address")
    conv = conv.join(F.broadcast(converter_addresses), on="address", how="left_semi")

    def topic_addr(i: int):
        t = F.get(F.col("topics"), i - 1)
        return F.concat(F.lit("0x"), t.substr(F.lit(27), F.length(t)))

    conv = conv.select(
        F.col("id"),
        topic_addr(2).alias("from_token"),
        topic_addr(3).alias("to_token"),
        topic_addr(4).alias("trader"),
        F.substring(F.col("data"), 3, 64).alias("amount_raw"),
        F.substring(F.col("data"), 65, 66).alias("return_raw"),
        F.col("transactionHash"),
    )

    from_dim = contract_descriptions.select(
        F.col("id").alias("from_token"), F.col("decimals")
    )
    to_dim = contract_descriptions.select(
        F.col("id").alias("to_token"), F.col("decimals").alias("to_decimals")
    )
    conv = any_join(conv, from_dim, keys="from_token", how="left", broadcast=True)
    conv = conv.withColumn(
        "amount", eth.hex_word_to_float("amount_raw", "decimals")
    ).drop("decimals")
    conv = any_join(conv, to_dim, keys="to_token", how="left", broadcast=True)
    conv = conv.withColumn(
        "return", eth.hex_word_to_float("return_raw", "to_decimals")
    )
    return conv.select(
        "id", "from_token", "to_token", "trader", "amount", "return", "transactionHash"
    )
