"""HTTP enrichment sources (SURVEY §2.1 S11-S13, §2.10 X3).

Small-dimension enrichments the reference performs with process pools
over HTTP APIs:

- S11 ERC-20 constants via eth_call with per-type fallback
  (operations/contract_methods.py:33-51,116-187): try ``string``, fall
  back to ``bytes32``, substitute placeholder defaults on failure.
- S12 Etherscan ABI (operations/contracts.py:9-35,55-72, Pool of 10).
- S13 CryptoCompare daily prices (operations/token_prices.py:131-156).

These enrich tiny dim tables (thousands of contracts, not TB), so the
fetch runs driver-side on a thread pool — shipping a 100-row HTTP job to
a cluster would be pure overhead — and the result lands as a DataFrame
for broadcast joins downstream. Fetchers are injected callables so tests
(and the node-less driver environment) pass fixtures.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

# reference operations/contract_methods.py:44-51 placeholder defaults
NAME_DEFAULT = None
SYMBOL_DEFAULT = None
DECIMALS_DEFAULT = 18
# float: the result schema types totalSupply as double (raw uint256
# supplies overflow long), and createDataFrame rejects int 0 for a
# DoubleType field when every eth_call fails and the default is used
TOTAL_SUPPLY_DEFAULT = 0.0

CONSTANT_TYPES: dict[str, list[str]] = {
    # reference tries these return types in order (string first, then bytes32)
    "name": ["string", "bytes32"],
    "symbol": ["string", "bytes32"],
    "decimals": ["uint8"],
    "totalSupply": ["uint256"],
    "owner": ["address"],
}


def read_contract_constants(
    spark: SparkSession,
    addresses: list[str],
    call: Callable[[str, str, str], object | None],
    pool_size: int = 10,
) -> DataFrame:
    """S11: per-address ERC-20 constants with per-type fallback.

    ``call(address, method, return_type)`` returns the decoded value or
    None (failure). For each method the types are tried in declared
    order; all-None falls to the placeholder default.
    """

    def one(addr: str) -> dict:
        row: dict = {"address": addr}
        for method, types in CONSTANT_TYPES.items():
            val = None
            for t in types:
                val = call(addr, method, t)
                if val is not None:
                    break
            if val is None:
                val = {
                    "name": NAME_DEFAULT,
                    "symbol": SYMBOL_DEFAULT,
                    "decimals": DECIMALS_DEFAULT,
                    "totalSupply": TOTAL_SUPPLY_DEFAULT,
                    "owner": None,
                }[method]
            row[method] = val
        return row

    with ThreadPoolExecutor(max_workers=pool_size) as ex:
        rows = list(ex.map(one, addresses))
    return spark.createDataFrame(
        rows,
        "address string, name string, symbol string, decimals int, "
        "totalSupply double, owner string",
    )


def fetch_contract_abis(
    spark: SparkSession,
    addresses: list[str],
    fetch_abi: Callable[[str], str | None],
    pool_size: int = 10,
) -> DataFrame:
    """S12: ABI JSON per address; ``abi_extracted`` records the attempt
    so unverified contracts are not retried forever (reference J4
    anti-join on abi_extracted IS NULL)."""

    def one(addr: str) -> dict:
        abi = fetch_abi(addr)
        return {"id": addr, "abi": abi, "abi_extracted": True}

    with ThreadPoolExecutor(max_workers=pool_size) as ex:
        rows = list(ex.map(one, addresses))
    return spark.createDataFrame(
        rows, "id string, abi string, abi_extracted boolean"
    )


def fetch_daily_prices(
    spark: SparkSession,
    tokens: list[tuple[str, str]],
    fetch_history: Callable[[str], list[dict]],
    pool_size: int = 10,
) -> DataFrame:
    """S13: daily close series per (address, symbol); row id is
    '{address}_{YYYY-mm-dd}' (reference operations/token_prices.py:60).
    ``fetch_history(symbol)`` yields dicts with time (unix) and close."""

    def one(tok: tuple[str, str]) -> list[dict]:
        address, symbol = tok
        out = []
        for day in fetch_history(symbol) or []:
            import datetime as dt

            d = dt.datetime.utcfromtimestamp(int(day["time"])).strftime("%Y-%m-%d")
            out.append(
                {
                    "id": f"{address}_{d}",
                    "address": address,
                    "timestamp": int(day["time"]),
                    "close": float(day["close"]),
                }
            )
        return out

    with ThreadPoolExecutor(max_workers=pool_size) as ex:
        nested = list(ex.map(one, tokens))
    rows = [r for chunk in nested for r in chunk]
    return spark.createDataFrame(
        rows, "id string, address string, timestamp long, close double"
    )
