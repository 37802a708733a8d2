"""Explicit StructTypes for every reference table.

Mirrors /root/reference/schema/schema.py (SURVEY §1.1-§1.2, FIXTURES.md).
Every table carries the reference's forced ``id STRING``
(reference operations/indices.py:31) plus our engine's ``_seq LONG``
ingest sequence used for last-write-wins dedup-on-read — the Spark
analogue of ClickHouse ReplacingMergeTree + SELECT ... FINAL
(reference clients/custom_clickhouse.py:31-38).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name, dtype, nullable=True):
    return StructField(name, dtype, nullable)


def with_engine_columns(schema: StructType) -> StructType:
    """Force-add id/_seq the way the reference force-adds id, plus the
    ``_tombstone`` marker the reorg reconciler sets (operators/reorg.py):
    a FINAL row whose latest version carries _tombstone=1 is dropped by
    ``Warehouse.read(final=True)`` — the upsert-shaped DELETE the
    reference never implements (it stores blockHash but never reconciles
    orphaned forks, schema/schema.py:7)."""
    names = {f.name for f in schema.fields}
    fields = list(schema.fields)
    if "id" not in names:
        fields.insert(0, _f("id", StringType()))
    if "_seq" not in names:
        fields.append(_f("_seq", LongType()))
    if "_tombstone" not in names:
        fields.append(_f("_tombstone", ByteType()))
    return StructType(fields)


# reference schema/schema.py:2-5 (number Int64 / timestamp DateTime are
# non-Nullable in the reference DDL; mirrored here so the ClickHouse DDL
# generator reproduces the exact reference statements)
BLOCK = StructType([
    _f("id", StringType()),
    _f("number", LongType(), nullable=False),
    _f("timestamp", TimestampType(), nullable=False),
])

# reference schema/schema.py:6-33 (FIXTURES.md §2)
INTERNAL_TRANSACTION = StructType([
    _f("id", StringType()),
    _f("blockNumber", LongType(), nullable=False),
    _f("from", StringType()),
    _f("to", StringType()),
    _f("value", DoubleType()),          # float64 ether = wei / 1e18
    _f("input", StringType()),
    _f("output", StringType()),
    _f("gas", StringType()),
    _f("gasUsed", IntegerType()),
    _f("gasPrice", DoubleType()),
    _f("blockHash", StringType(), nullable=False),
    _f("transactionHash", StringType()),
    _f("transactionPosition", IntegerType()),
    _f("subtraces", IntegerType(), nullable=False),
    _f("traceAddress", ArrayType(IntegerType()), nullable=False),
    _f("type", StringType(), nullable=False),
    _f("callType", StringType()),
    _f("address", StringType()),
    _f("code", StringType()),
    _f("init", StringType()),
    _f("refundAddress", StringType()),
    _f("error", StringType()),
    _f("parent_error", ByteType()),
    _f("balance", StringType()),
    _f("author", StringType()),
    _f("rewardType", StringType()),
    _f("result", StringType()),
])

# reference schema/schema.py:34-37; primary key (id, name)
BLOCK_FLAG = StructType([
    _f("id", StringType()),
    _f("name", StringType(), nullable=False),
    _f("value", ByteType()),
])

# reference schema/schema.py:42-45; primary key (id, name)
CONTRACT_BLOCK = StructType([
    _f("id", StringType()),
    _f("name", StringType(), nullable=False),
    _f("value", LongType(), nullable=False),
])

# reference schema/schema.py:38-41
CONTRACT_ABI = StructType([
    _f("id", StringType()),
    _f("abi_extracted", ByteType()),
    _f("abi", StringType()),
])

# reference schema/schema.py:46-57 (FIXTURES.md §5)
EVENT = StructType([
    _f("id", StringType()),
    _f("type", StringType(), nullable=False),
    _f("logIndex", IntegerType(), nullable=False),
    _f("transactionLogIndex", IntegerType(), nullable=False),
    _f("data", StringType(), nullable=False),
    _f("transactionIndex", IntegerType(), nullable=False),
    _f("address", StringType(), nullable=False),
    _f("transactionHash", StringType(), nullable=False),
    _f("blockHash", StringType(), nullable=False),
    _f("blockNumber", IntegerType(), nullable=False),
    _f("topics", ArrayType(StringType()), nullable=False),
])

# reference schema/schema.py:58-61 — ClickHouse Nested(type,value) becomes
# two parallel arrays (SURVEY §1.2, risk (d))
TRANSACTION_INPUT = StructType([
    _f("id", StringType()),
    _f("name", StringType(), nullable=False),
    _f("params_type", ArrayType(StringType()), nullable=False),
    _f("params_value", ArrayType(StringType()), nullable=False),
])

EVENT_INPUT = TRANSACTION_INPUT  # reference schema/schema.py:62-65 (same shape)

# reference schema/schema.py:66-72
PRICE = StructType([
    _f("id", StringType()),          # '{address}_{YYYY-mm-dd}'
    _f("address", StringType(), nullable=False),
    _f("USD", DoubleType(), nullable=False),
    _f("BTC", DoubleType(), nullable=False),
    _f("ETH", DoubleType(), nullable=False),
    _f("timestamp", TimestampType(), nullable=False),
])

# reference schema/schema.py:73-81
CONTRACT_DESCRIPTION = StructType([
    _f("id", StringType()),          # token contract address
    _f("token_name", StringType()),
    _f("token_symbol", StringType()),
    _f("decimals", ByteType()),
    _f("total_supply", LongType()),
    _f("token_owner", StringType()),
    _f("cmc_id", StringType()),
    _f("website_slug", StringType()),
])

# derived table (MV in the reference, operations/contract_transactions.py:82-94)
CONTRACT = StructType([
    _f("id", StringType()),
    _f("address", StringType()),
    _f("blockNumber", LongType()),
    _f("owner", StringType()),
    _f("bytecode", StringType()),
    _f("standard_erc20", ByteType()),
    _f("standard_erc223", ByteType()),
    _f("standard_bancor_converter", ByteType()),
])

# derived table (MV in the reference, operations/token_holders.py:26-43)
TOKEN_TRANSACTION = StructType([
    _f("id", StringType()),
    _f("from", StringType()),
    _f("to", StringType()),
    _f("value", DoubleType()),
    _f("token", StringType()),
    _f("transactionHash", StringType()),
    _f("blockNumber", IntegerType()),
])

# logical table set, keyed like reference config.py:14-32 INDICES
TABLES: dict[str, StructType] = {
    "block": BLOCK,
    "internal_transaction": INTERNAL_TRANSACTION,
    "block_flag": BLOCK_FLAG,
    "contract_block": CONTRACT_BLOCK,
    "contract_abi": CONTRACT_ABI,
    "event": EVENT,
    "transaction_input": TRANSACTION_INPUT,
    "event_input": EVENT_INPUT,
    "price": PRICE,
    "contract_description": CONTRACT_DESCRIPTION,
    "contract": CONTRACT,
    "token_transaction": TOKEN_TRANSACTION,
}

# tables whose upsert key is (id, name), not id — reference operations/indices.py:7-10
COMPOSITE_KEY_TABLES: dict[str, list[str]] = {
    "block_flag": ["id", "name"],
    "contract_block": ["id", "name"],
}


def primary_key(table: str) -> list[str]:
    return COMPOSITE_KEY_TABLES.get(table, ["id"])
