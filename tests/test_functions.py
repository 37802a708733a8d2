"""Golden-vector conformance for the scalar function layer.

Vectors come from the reference's own tests
(tests/token_holders_tests.py:34-58) — SURVEY §5 pattern 2.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ethereum_analytical_db_spark.functions import (
    hex_word_to_float,
    keccak_selector,
    register_sql_functions,
    topic_to_address,
)

def _word(value: int) -> str:
    return "0x" + format(value, "064x")


# (data hex word, decimals, expected) — reference tests/token_holders_tests.py:34-58
GOLDEN = [
    (_word(0x4BF53596C1B5F580000), 18, 22418.8),
    (_word(1), 18, 1e-18),
    (_word(0x10000000000000000000000000000000), 0, float(0x10000000000000000000000000000000)),
]


@pytest.mark.parametrize("data,decimals,expected", GOLDEN)
def test_uint256_golden_vectors(spark, data, decimals, expected):
    df = spark.createDataFrame([Row(data=data, decimals=decimals)])
    got = df.select(
        hex_word_to_float("data", "decimals").alias("v")
    ).first()["v"]
    assert got == pytest.approx(expected, rel=1e-12)


def test_uint256_exact_python_parity(spark):
    """For any 64-hex word, result == int(last 32 hex, 16) / 10**decimals
    computed in float64 — the reference's observable semantics."""
    import random

    random.seed(7)
    rows = []
    for _ in range(50):
        # stay inside the Decimal128/DECIMAL(38,0) domain: only the LAST
        # 32 hex chars are decoded, so zero their top byte (< 2^120).
        # The reference's ClickHouse Decimal128 has the same 1e38 ceiling.
        word = (
            "".join(random.choice("0123456789abcdef") for _ in range(32))
            + "00"
            + "".join(random.choice("0123456789abcdef") for _ in range(30))
        )
        dec = random.choice([0, 6, 8, 18, None])
        rows.append(Row(data="0x" + word, decimals=dec))
    df = spark.createDataFrame(rows)
    out = df.select("data", "decimals", hex_word_to_float("data", "decimals").alias("v")).collect()
    for r in out:
        raw = int(r["data"][34:], 16)
        d = 18 if r["decimals"] is None else r["decimals"]
        expected = float(raw) / float(10.0 ** d)
        assert r["v"] == pytest.approx(expected, rel=1e-12), r["data"]


def test_uint256_constant_decimals(spark):
    df = spark.createDataFrame([Row(data="0x" + "0" * 63 + "a")])
    assert df.select(hex_word_to_float("data", 0).alias("v")).first()["v"] == 10.0
    # None → coalesce default 18
    assert df.select(hex_word_to_float("data").alias("v")).first()["v"] == pytest.approx(1e-17)


def test_topic_to_address(spark):
    topics = [
        "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef",
        "0x000000000000000000000000a1b2c3d4e5f60718293a4b5c6d7e8f9012345678",
    ]
    df = spark.createDataFrame([Row(topics=topics)])
    got = df.select(topic_to_address("topics", 2).alias("a")).first()["a"]
    assert got == "0xa1b2c3d4e5f60718293a4b5c6d7e8f9012345678"


def test_keccak_selectors_public_constants():
    assert keccak_selector("transfer(address,uint256)") == "a9059cbb"
    assert keccak_selector("balanceOf(address)") == "70a08231"


def test_sql_function_registration(spark):
    register_sql_functions(spark)
    v = spark.sql(
        "SELECT uint256_value('0x{}', 18) AS v".format("0" * 63 + "1")
    ).first()["v"]
    assert v == pytest.approx(1e-18)
    a = spark.sql(
        "SELECT topic_address(array('0xsig', '0x000000000000000000000000abcdefabcdefabcdefabcdefabcdefabcdefabcd'), 2) AS a"
    ).first()["a"]
    assert a == "0xabcdefabcdefabcdefabcdefabcdefabcdefabcd"


def test_uint256_hypothesis_property(spark):
    """Property: for arbitrary hex blobs (any length, incl. degenerate
    < 35 chars) and decimals, the decode equals the reference's Python
    semantics: int(data[34:], 16) / 10**coalesce(decimals, 18), with
    empty slices decoding to 0 (ClickHouse reinterpret-of-empty).
    Batched: one Spark job per example list."""
    from hypothesis import given, settings, strategies as st

    hexchars = "0123456789abcdef"
    word = st.text(alphabet=hexchars, min_size=0, max_size=63).map(lambda s: "0x" + s)

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(word, st.one_of(st.none(), st.integers(0, 30))),
            min_size=1,
            max_size=20,
        )
    )
    def check(cases):
        rows = [Row(data=d, decimals=dec) for d, dec in cases]
        df = spark.createDataFrame(rows, "data string, decimals int")
        out = df.select(
            "data", "decimals", hex_word_to_float("data", "decimals").alias("v")
        ).collect()
        for r in out:
            tail = r["data"][34:]
            raw = int(tail, 16) if tail else 0
            d = 18 if r["decimals"] is None else r["decimals"]
            expected = float(raw) / float(10.0**d)
            assert r["v"] == pytest.approx(expected, rel=1e-12, abs=1e-300), r["data"]

    check()


def test_poison_rows_degrade_not_raise(spark):
    """The 100 TB poison-row contract (SCALE.md): malformed hex blobs,
    empty/short/NULL topics arrays — every one degrades to NULL/0/false
    under ANSI mode; none may raise and fail a scan."""
    from ethereum_analytical_db_spark.operators.predicates import topic_equals

    blobs = spark.createDataFrame(
        [("0x" + "zz" * 32,), ("0x",), ("0xabc",), (None,), ("garbage",)],
        "data string",
    )
    vals = [
        r["v"] for r in blobs.select(hex_word_to_float("data", 18).alias("v")).collect()
    ]
    assert vals == [0.0, 0.0, 0.0, None, 0.0]

    topics = spark.createDataFrame(
        [([],), (["0xonly"],), (None,)], "topics array<string>"
    )
    addrs = [
        r["a"] for r in topics.select(topic_to_address("topics", 3).alias("a")).collect()
    ]
    assert addrs == [None, None, None]
    assert topics.filter(topic_equals("topics", 1, "0xsig")).count() == 0


def test_supply_clamp_reference_golden(spark):
    """Reference tests/contract_methods_tests.py:61-63
    (test_round_supply_big_value): _round_supply(MAX_TOTAL_SUPPLY + 100,
    decimals=0) clamps to MAX_TOTAL_SUPPLY = 1 << 63 - 1 (the preserved
    operator-precedence quirk: 2^62, not 2^63 - 1)."""
    from ethereum_analytical_db_spark.functions.ethereum import (
        MAX_TOTAL_SUPPLY,
        supply_rounded,
    )

    assert MAX_TOTAL_SUPPLY == 1 << 63 - 1 == 2**62
    df = spark.createDataFrame(
        [(float(MAX_TOTAL_SUPPLY + 100), 0), (1234.4, 0), (1234.6e18, 18)],
        "supply double, decimals int",
    )
    got = [
        r["s"] for r in df.select(supply_rounded("supply", "decimals").alias("s")).collect()
    ]
    assert got == [float(MAX_TOTAL_SUPPLY), 1234.0, 1235.0]
