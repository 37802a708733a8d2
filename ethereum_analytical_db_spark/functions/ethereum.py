"""Ethereum-specific scalar functions as pure Column expressions (no UDFs).

The centerpiece is the uint256-hex → Float64 decode with token-decimals
scaling, reproducing reference ``utils.py:5-20`` (``generate_sql_for_value``)
bit-for-bit — golden vectors in reference ``tests/token_holders_tests.py:34-58``:

  ClickHouse:
    substring(data, 35)                       -- keep last 128 bits (32 hex chars)
    hi = reinterpretAsUInt64(reverse(unhex(first_half)))
    lo = reinterpretAsUInt64(reverse(unhex(last_16_chars)))
    toFloat64(((toDecimal128(hi,0) * 2^32) * 2^32) + lo) / POW(10, COALESCE(decimals, 18))

  Spark equivalent here:
    conv(half, 16, 10) :: DECIMAL(38,0) exact integer arithmetic, cast to
    double only at the end, then divide by pow(10, coalesce(decimals, 18)).

Overflow parity: ClickHouse Decimal128 holds < ~1.7e38; Spark DECIMAL(38,0)
holds < 1e38. Values needing more than ~126 bits overflow in BOTH engines,
so the observable domain matches the reference's.

Everything in this module is JVM-side (whole-stage codegen eligible); no
Python executes per-row.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from . import keccak as _keccak

_TWO_POW_64 = "18446744073709551616"  # 2**64, as a decimal literal string


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hex_word_to_float(data: Column | str, decimals: Column | str | int | None = None) -> Column:
    """Decode the LAST 128 bits of a hex string into a double, scaled by
    10^-coalesce(decimals, 18).

    ``data`` is a '0x'-prefixed hex blob; like the reference, character
    positions are 1-based and the first 34 chars ('0x' + 16 bytes) are
    skipped. Reference: utils.py:5-20.
    """
    data = _col(data)
    # substring(data, 35) — ClickHouse substring to end of string
    partial = data.substr(F.lit(35), F.greatest(F.length(data) - F.lit(34), F.lit(0)))
    xlen = F.length(partial)
    first = partial.substr(F.lit(1), F.greatest(xlen - F.lit(16), F.lit(0)))
    last = partial.substr(F.greatest(xlen - F.lit(15), F.lit(1)), F.lit(16))
    # conv('',16,10) is not a number; ClickHouse reinterpret of empty = 0
    first = F.when(F.length(first) == 0, F.lit("0")).otherwise(first)
    last = F.when(F.length(last) == 0, F.lit("0")).otherwise(last)
    high = F.conv(first, 16, 10).cast(DecimalType(38, 0))
    low = F.conv(last, 16, 10).cast(DecimalType(38, 0))
    mult = F.lit(_TWO_POW_64).cast(DecimalType(38, 0))
    # try_* → NULL on overflow (> ~1e38): same representable domain as the
    # reference's Decimal128, but a poison row can't fail a whole job.
    raw = F.try_add(F.try_multiply(high, mult), low).cast("double")
    if decimals is None:
        dec = F.lit(18)
    elif isinstance(decimals, int):
        dec = F.lit(decimals)
    else:
        dec = F.coalesce(_col(decimals).cast("int"), F.lit(18))
    return raw / F.pow(F.lit(10.0), dec.cast("double"))


# alias matching the reference's naming (the generated column was {field}_value)
uint256_value = hex_word_to_float


def topic_to_address(topics: Column | str, index: int) -> Column:
    """Extract a 20-byte address from a 32-byte topic word:
    concat('0x', substring(topics[index], 27, 40)).

    ``index`` is 1-based like ClickHouse array access.
    Reference: operations/token_holders.py:27-28, operations/bancor_trades.py:34-36.
    """
    # null-safe get: a short topics array gives NULL (not an ANSI error)
    topic = F.get(_col(topics), index - 1)
    return F.concat(F.lit("0x"), F.substring(topic, 27, 40))


def keccak_selector(signature: str) -> str:
    """4-byte keccak-256 selector hex for a function signature, e.g.
    'transfer(address,uint256)' → 'a9059cbb'.

    The reference derives these with Web3.sha3 at import time
    (operations/contract_transactions.py:11-25); ours come from the
    pure-Python keccak in ``keccak.py``. Driver-side constants, not a
    data-path function (SURVEY §2.8 F7).
    """
    return _keccak.selector(signature)


# Standard-detection selector sets, exactly the reference's
# _extract_methods_signatures (operations/contract_transactions.py:27-51):
# a contract matches a standard iff its bytecode contains ALL selectors.
ERC20_SELECTORS = [
    keccak_selector(sig)
    for sig in (
        "totalSupply()",
        "balanceOf(address)",
        "allowance(address,address)",
        "transfer(address,uint256)",
        "transferFrom(address,address,uint256)",
        "approve(address,uint256)",
    )
]
ERC223_SELECTORS = [keccak_selector("tokenFallback(address,uint256,bytes)")]
BANCOR_CONVERTER_SELECTORS = [keccak_selector("convert(address,address,uint256,uint256)")]

# Event topic constants
TRANSFER_EVENT_TOPIC = (
    "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
)  # reference operations/token_holders.py:5
BANCOR_CONVERSION_TOPIC = (
    "0x276856b36cbc45526a0ba64f44611557a2a8b68662c5388e9fe6d72e86e1c8cb"
)  # reference operations/bancor_trades.py:5


def bytecode_standard_flag(bytecode: Column | str, selectors: list[str]) -> Column:
    """AND-chain of `bytecode LIKE '%selector%'` as a 0/1 flag
    (reference operations/contract_transactions.py:27-69, SURVEY P6)."""
    bc = _col(bytecode)
    cond = F.lit(True)
    for sig in selectors:
        cond = cond & bc.contains(sig)
    return cond.cast("tinyint")


MAX_TOTAL_SUPPLY = 1 << 62  # reference operations/contract_methods.py:12 quirk:
# `MAX_TOTAL_SUPPLY = 1 << 63 - 1` binds as 1 << (63-1) = 2**62


def supply_rounded(supply: Column | str, decimals: Column | str) -> Column:
    """total supply scaled by decimals, rounded, clamped to 2^62
    (reference operations/contract_methods.py:93-114 incl. the
    operator-precedence quirk in MAX_TOTAL_SUPPLY)."""
    scaled = F.round(_col(supply) / F.pow(F.lit(10.0), _col(decimals).cast("double")))
    return F.least(scaled, F.lit(float(MAX_TOTAL_SUPPLY)))


def register_sql_functions(spark: SparkSession) -> None:
    """Register ClickHouse-dialect shims usable from spark.sql() text
    (SURVEY §4.2.3): uint256_value(data, decimals), topic_address(topics, i).

    Implemented as Spark SQL scalar UDFs (CREATE FUNCTION ... RETURN expr),
    which inline into the plan at analysis time — still whole-stage
    codegen, no Python per row.
    """
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION uint256_value(data STRING, decimals INT)
        RETURNS DOUBLE
        RETURN CAST(try_add(
            try_multiply(
                CAST(conv(CASE WHEN length(substring(data, 35)) > 16
                               THEN substring(substring(data, 35), 1, length(substring(data, 35)) - 16)
                               ELSE '0' END, 16, 10) AS DECIMAL(38,0)),
                CAST('18446744073709551616' AS DECIMAL(38,0))),
            CAST(conv(substring(substring(data, 35),
                                greatest(length(substring(data, 35)) - 15, 1), 16),
                      16, 10) AS DECIMAL(38,0)))
            AS DOUBLE) / pow(10.0, CAST(coalesce(decimals, 18) AS DOUBLE))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION topic_address(topics ARRAY<STRING>, i INT)
        RETURNS STRING
        RETURN concat('0x', substring(element_at(topics, i), 27, 40))
        """
    )
