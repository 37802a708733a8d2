"""Oracle-checked end-to-end runs of the reference's flagship derived
tables (plans/derived.py): eth_token_transaction, eth_contract,
eth_bancor_trade — the reference's actual product surface.

Each query synthesizes REALISTIC event rows from the driver's parquet
tables — topics arrays with the real Transfer/Conversion topic hashes,
64-char hex data words, a token-decimals dim with duplicate rows and
NULL decimals — runs the real derived-table transformation, and the
DuckDB oracle reproduces the F1 uint256 arithmetic and selector flags
with direct integer math on the same construction.

The token-transaction fixture additionally embeds the reference's own
golden decode vectors (reference tests/token_holders_tests.py:34-58):
(0x…04bf53596c1b5f580000, 18) → 22418.8, (0x…01, 18) → 1e-18,
(0x…10000000000000000000000000000000, 0) → 2^124.

Determinism notes:
- every decoded value is an exact integer divided by a power of ten;
  both engines cast the exact integer (DECIMAL(38,0) / HUGEINT) to
  double with round-to-nearest and perform one IEEE division —
  bit-identical results;
- the selector flags are verified by substring CONTAINMENT on both
  sides (not by mirroring the modular construction), so an accidental
  selector collision inside a concatenated bytecode can never diverge
  the two engines;
- duplicate dim rows are identical copies → the ANY-join dedup is
  observationally DISTINCT, which the oracle mirrors (a non-deduped
  join would multiply rows and fail the row-count check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import ethereum as eth
from . import derived
from .registry import register, table

# ---------------------------------------------------------------- shared

# golden decode vectors from reference tests/token_holders_tests.py:34-58:
# (64-hex data word, token key with that decimals value, exact integer)
_G1_WORD = "0000000000000000000000000000000000000000000004bf53596c1b5f580000"
_G2_WORD = "0000000000000000000000000000000000000000000000000000000000000001"
_G3_WORD = "0000000000000000000000000000000010000000000000000000000000000000"
_G1_INT = "22418800000000000000000"  # 0x4bf53596c1b5f580000
_G2_INT = "1"
_G3_INT = "21267647932558653966460912964485513216"  # 2**124

_ERC20_CAT = "".join(eth.ERC20_SELECTORS)
_ERC223 = eth.ERC223_SELECTORS[0]
_BANCOR = eth.BANCOR_CONVERTER_SELECTORS[0]

# a 64-hex topic word whose low 40 chars are the padded hex of ``key``
_word = lambda key: F.lpad(F.lower(F.hex(key)), 64, "0")  # noqa: E731
_topic = lambda key: F.concat(F.lit("0x"), _word(key))  # noqa: E731

_NOT_TRANSFER_TOPIC = "0x" + "ab" * 32  # some unrelated event signature


def _fix_limit(sf_dir: str) -> int:
    """Fixture size: constant 4000 source events regardless of scale
    factor, so the derived-table queries measure the transformation (not
    fixture synthesis) and stay comparable across sf."""
    return 4000


# ------------------------------------------------- eth_token_transaction

TOKEN_TX_ORACLE = f"""
WITH dim AS (
  SELECT concat('0xtok', lpad(CAST(i AS VARCHAR), 2, '0')) AS address,
         CASE WHEN i = 0 THEN NULL
              WHEN i % 2 = 1 THEN 6
              ELSE 18 END AS decimals
  FROM range(7) t(i)          -- token 7 exists in events but NOT here →
                              -- its transfers drop at the INNER join
  UNION ALL SELECT '0xgold18', 18
  UNION ALL SELECT '0xgold00', 0
),
fix AS (
  SELECT 'ev' || CAST(event_id AS VARCHAR) AS id,
         concat('0xtok', lpad(CAST(event_id % 8 AS VARCHAR), 2, '0')) AS token,
         lpad(lower(hex(user_id)), 64, '0') AS w_from,
         lpad(lower(hex(event_id % 1000)), 64, '0') AS w_to,
         CAST(event_id * 37 + 11 AS HUGEINT) AS vint,
         '0xhash' || CAST(event_id AS VARCHAR) AS transactionHash,
         event_id % 10000 AS blockNumber
  FROM events
  WHERE event_id < 4000 AND event_id % 5 <> 0   -- %5=0 rows carry a
                                                -- non-Transfer topic1
  UNION ALL SELECT 'g1', '0xgold18', lpad(lower(hex(1)), 64, '0'),
         lpad(lower(hex(2)), 64, '0'), CAST('{_G1_INT}' AS HUGEINT), '0xhg1', 1
  UNION ALL SELECT 'g2', '0xgold18', lpad(lower(hex(3)), 64, '0'),
         lpad(lower(hex(4)), 64, '0'), CAST('{_G2_INT}' AS HUGEINT), '0xhg2', 2
  UNION ALL SELECT 'g3', '0xgold00', lpad(lower(hex(5)), 64, '0'),
         lpad(lower(hex(6)), 64, '0'), CAST('{_G3_INT}' AS HUGEINT), '0xhg3', 3
)
SELECT concat('0x', substring(f.w_from, 25, 40)) AS "from",
       concat('0x', substring(f.w_to, 25, 40)) AS "to",
       CAST(f.vint AS DOUBLE) / pow(10, COALESCE(d.decimals, 18)) AS value,
       f.id,
       f.token,
       f.transactionHash,
       f.blockNumber,
       -- fold #3 (r12): the F10 supply scale+round+clamp columns from the
       -- retired uint256_decode micro-query, rebuilt on this query's rows.
       -- The supply basis k*37+11 reconstructs the fixture's vint for the
       -- 'ev<k>' rows (golden rows fall back to blockNumber); at 1e17/1e15
       -- scale every ROUND input exceeds 2^53 (integer-valued doubles →
       -- ROUND is exact identity on both engines) and the row set
       -- straddles the 2^62 clamp in both columns
       LEAST(ROUND((CAST((COALESCE(TRY_CAST(substring(f.id, 3) AS BIGINT),
                                   f.blockNumber) * 37 + 11) AS DOUBLE)
                    * 1e17) / POW(10, 2)),
             4611686018427387904.0) AS supply_dec2,
       LEAST(ROUND((CAST((COALESCE(TRY_CAST(substring(f.id, 3) AS BIGINT),
                                   f.blockNumber) * 37 + 11) AS DOUBLE)
                    * 1e15) / POW(10, 0)),
             4611686018427387904.0) AS supply_dec0
FROM fix f
JOIN dim d ON f.token = d.address
"""


@register(
    "derived_token_transactions",
    TOKEN_TX_ORACLE,
    note="eth_token_transaction MV end-to-end (reference "
    "operations/token_holders.py:20-51): Transfer-topic filter over a "
    "realistic topics array, F1 uint256 data-word decode, F2 topic→"
    "address, ANY INNER JOIN to a decimals dim with dup rows + NULL "
    "decimals + absent tokens; includes the reference's golden decode "
    "vectors (tests/token_holders_tests.py:34-58). Since r12 (fold #3) "
    "also carries the F10 supply scale+round+clamp columns supply_dec2/"
    "supply_dec0 (reference operations/contract_methods.py:12,93-114 "
    "incl. the `1 << 63 - 1` precedence quirk) from the retired "
    "uint256_decode micro-query — both clamp branches hash-checked "
    "across the row set; F1's high-limb decode stays covered by the G1 "
    "(both limbs nonzero) and G3 (2^124) golden vectors",
)
def derived_token_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_id") < _fix_limit(sf_dir)
    )
    e = F.col("event_id")
    topic1 = F.when(e % 5 == 0, F.lit(_NOT_TRANSFER_TOPIC)).otherwise(
        F.lit(eth.TRANSFER_EVENT_TOPIC)
    )
    events_fix = ev.select(
        F.concat(F.lit("ev"), e.cast("string")).alias("id"),
        F.concat(
            F.lit("0xtok"), F.lpad((e % 8).cast("string"), 2, "0")
        ).alias("address"),
        F.array(topic1, _topic(F.col("user_id")), _topic(e % 1000)).alias("topics"),
        F.concat(F.lit("0x"), _word(e * 37 + 11)).alias("data"),
        F.concat(F.lit("0xhash"), e.cast("string")).alias("transactionHash"),
        (e % 10000).alias("blockNumber"),
    )

    def golden(gid: str, token: str, word: str, k1: int, k2: int, bn: int):
        return (
            gid,
            token,
            [eth.TRANSFER_EVENT_TOPIC,
             "0x" + format(k1, "x").zfill(64),
             "0x" + format(k2, "x").zfill(64)],
            "0x" + word,
            "0xh" + gid,
            bn,
        )

    golden_fix = spark.createDataFrame(
        [
            golden("g1", "0xgold18", _G1_WORD, 1, 2, 1),
            golden("g2", "0xgold18", _G2_WORD, 3, 4, 2),
            golden("g3", "0xgold00", _G3_WORD, 5, 6, 3),
        ],
        "id string, address string, topics array<string>, data string, "
        "transactionHash string, blockNumber long",
    )
    # r16: the fixture union (parquet leg + 3-row golden LocalRelation)
    # is materialized before the MV transformation — leaving the Union
    # under the join/decode made every expression above it execute per
    # union leg and measured +0.4 s on a 4000-row fixture (guide §7.2
    # duplicated subtrees); the checkpoint is one cheap pass and the
    # decode runs once over a single input
    fixture = events_fix.unionByName(golden_fix).localCheckpoint(eager=False)

    # r16: the decimals dim as ONE LocalRelation carrying the identical
    # 12 rows the old range(7) ∪ gold ∪ limit(3) three-leg plan built —
    # same values, same NULL decimals, same duplicate (identical) rows
    # the ANY-join must dedup (or the row-count check fails with
    # multiplied output); one plan leg instead of three cuts the
    # broadcast-side AQE stages
    dim_rows = [
        (f"0xtok{i:02d}", None if i == 0 else (6 if i % 2 == 1 else 18))
        for i in range(7)
    ] + [("0xgold18", 18), ("0xgold00", 0)]
    dim = spark.createDataFrame(
        spark.sparkContext.parallelize(dim_rows + dim_rows[:3], 1),
        "id string, decimals long",
    )  # 12-row broadcast build side: 1 slice → 1 task
    out = derived.token_transactions(fixture, dim)
    # fold #3 (r12): F10 supply clamp columns on the MV output — a pure
    # per-row projection (no new shuffle, same grain), see the oracle's
    # comment for the numeric-exactness argument
    k = F.coalesce(
        F.expr("try_cast(substring(id, 3) as long)"), F.col("blockNumber")
    )
    v = (k * 37 + 11).cast("double")
    return out.withColumn(
        "supply_dec2", eth.supply_rounded(v * F.lit(1e17), F.lit(2))
    ).withColumn("supply_dec0", eth.supply_rounded(v * F.lit(1e15), F.lit(0)))


# ----------------------------------------------------------- eth_contract

# shared contracts-fixture CTE: also feeds the bancor oracle below.
# flags are containment checks on the SAME selector literals the Spark
# side embeds — never a re-derivation from the modular construction
_ERC20_FLAG = " AND ".join(
    f"position('{s}' IN code) > 0" for s in eth.ERC20_SELECTORS
)
_CONTRACTS_CTE = f"""
  itx AS (
    SELECT event_id AS e, user_id, event_type FROM events
    WHERE event_id < 4000
  ),
  contracts_fix AS (
    SELECT COALESCE(addr, 'tx' || CAST(e AS VARCHAR)) AS id,
           e % 10000 AS blockNumber,
           addr AS address,
           '0xu' || CAST(user_id AS VARCHAR) AS owner,
           code AS bytecode,
           CAST(CASE WHEN {_ERC20_FLAG} THEN 1 ELSE 0 END AS TINYINT)
             AS standard_erc20,
           CAST(CASE WHEN position('{_ERC223}' IN code) > 0 THEN 1 ELSE 0 END
                AS TINYINT) AS standard_erc223,
           CAST(CASE WHEN position('{_BANCOR}' IN code) > 0 THEN 1 ELSE 0 END
                AS TINYINT) AS standard_bancor_converter
    FROM (
      SELECT e, user_id,
             CASE WHEN e % 17 = 0 THEN NULL
                  ELSE '0xc' || lpad(lower(hex(e)), 40, '0') END AS addr,
             '0x6060'
               || CASE WHEN e % 3 = 0 THEN '{_ERC20_CAT}' ELSE '' END
               || CASE WHEN e % 6 = 0 THEN '{_ERC223}' ELSE '' END
               || CASE WHEN e % 7 = 0 THEN '{_BANCOR}' ELSE '' END
               || lower(hex(e)) AS code
      FROM itx
      WHERE e % 4 = 0 AND event_type <> 'error' AND e % 13 <> 0
    )
  )
"""

CONTRACTS_ORACLE = f"""
WITH {_CONTRACTS_CTE}
SELECT * FROM contracts_fix
"""


def _itx_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic internal-transaction fact: create/call types, error and
    tri-state parent_error columns, NULL-able deployed address, bytecode
    concatenated from the REAL keccak selector constants + a hex salt."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_id") < _fix_limit(sf_dir)
    )
    e = F.col("event_id")
    code = F.concat(
        F.lit("0x6060"),
        F.when(e % 3 == 0, F.lit(_ERC20_CAT)).otherwise(F.lit("")),
        F.when(e % 6 == 0, F.lit(_ERC223)).otherwise(F.lit("")),
        F.when(e % 7 == 0, F.lit(_BANCOR)).otherwise(F.lit("")),
        F.lower(F.hex(e)),
    )
    return ev.select(
        F.concat(F.lit("tx"), e.cast("string")).alias("id"),
        (e % 10000).alias("blockNumber"),
        F.when(e % 4 == 0, F.lit("create")).otherwise(F.lit("call")).alias("type"),
        F.when(F.col("event_type") == "error", F.lit("Out of gas")).alias("error"),
        F.when(e % 13 == 0, F.lit(True)).alias("parent_error"),
        F.when(e % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("0xc"), F.lpad(F.lower(F.hex(e)), 40, "0")))
        .alias("address"),
        F.concat(F.lit("0xu"), F.col("user_id").cast("string")).alias("from"),
        code.alias("code"),
    )


@register(
    "derived_contracts",
    CONTRACTS_ORACLE,
    note="eth_contract MV end-to-end (reference "
    "operations/contract_transactions.py:82-112): create-trace filter "
    "with error + tri-state parent_error null checks, coalesce(address, "
    "id), and the P6 bytecode LIKE AND-chains over the real keccak "
    "selector sets (ERC-20 ×6, ERC-223, Bancor converter); oracle "
    "verifies flags by substring containment on the same literals",
)
def derived_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived.contracts(_itx_fixture(spark, sf_dir))


# ------------------------------------------------------- eth_bancor_trade

BANCOR_ORACLE = f"""
WITH {_CONTRACTS_CTE},
converters AS (
  SELECT address FROM contracts_fix WHERE standard_bancor_converter = 1
),
tok_dim AS (
  SELECT concat('0x', lpad(lower(hex(i)), 40, '0')) AS id,
         CASE WHEN i = 0 THEN NULL
              WHEN i % 2 = 1 THEN 6
              ELSE 18 END AS decimals
  FROM range(5) t(i)      -- token 5 absent → LEFT join NULL → decimals 18
),
conv AS (
  SELECT 'cv' || CAST(event_id AS VARCHAR) AS id,
         concat('0x', lpad(lower(hex(event_id % 6)), 40, '0')) AS from_token,
         concat('0x', lpad(lower(hex((event_id + 1) % 6)), 40, '0')) AS to_token,
         concat('0x', lpad(lower(hex(user_id)), 40, '0')) AS trader,
         CAST(event_id * 13 + 7 AS HUGEINT) AS amount_int,
         CAST(event_id * 11 + 3 AS HUGEINT) AS return_int,
         '0xbh' || CAST(event_id AS VARCHAR) AS transactionHash,
         concat('0xc', lpad(lower(hex((event_id % 50) * 28)), 40, '0')) AS address
  FROM events
  WHERE event_id < 4000 AND event_id % 2 = 1   -- odd ids carry the
                                               -- Conversion topic1
)
SELECT c.id, c.from_token, c.to_token, c.trader,
       CAST(c.amount_int AS DOUBLE) / pow(10, COALESCE(fd.decimals, 18)) AS amount,
       CAST(c.return_int AS DOUBLE) / pow(10, COALESCE(td.decimals, 18)) AS "return",
       c.transactionHash
FROM conv c
JOIN converters cv ON c.address = cv.address
LEFT JOIN tok_dim fd ON c.from_token = fd.id
LEFT JOIN tok_dim td ON c.to_token = td.id
"""


@register(
    "derived_bancor_trades",
    BANCOR_ORACLE,
    note="eth_bancor_trade view end-to-end (reference "
    "operations/bancor_trades.py:13-74), CHAINED through derived."
    "contracts: Conversion-topic filter, converter semi-join against the "
    "contracts MV's standard_bancor_converter flag, the substring(data,"
    "3,64)/substring(data,65,66) word-slicing quirks, per-token decimals "
    "via two ANY LEFT JOINs (NULL decimals → 18), topic substring-to-end "
    "address slices",
)
def derived_bancor_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    contracts_df = derived.contracts(_itx_fixture(spark, sf_dir))

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_id") < _fix_limit(sf_dir)
    )
    e = F.col("event_id")
    topic1 = F.when(e % 2 == 1, F.lit(eth.BANCOR_CONVERSION_TOPIC)).otherwise(
        F.lit(_NOT_TRANSFER_TOPIC)
    )
    conv_fix = ev.select(
        F.concat(F.lit("cv"), e.cast("string")).alias("id"),
        F.concat(
            F.lit("0xc"), F.lpad(F.lower(F.hex((e % 50) * 28)), 40, "0")
        ).alias("address"),
        F.array(
            topic1,
            _topic(e % 6),
            _topic((e + 1) % 6),
            _topic(F.col("user_id")),
        ).alias("topics"),
        F.concat(
            F.lit("0x"), _word(e * 13 + 7), _word(e * 11 + 3)
        ).alias("data"),
        F.concat(F.lit("0xbh"), e.cast("string")).alias("transactionHash"),
    )

    i = F.col("id")
    tok_dim = spark.range(5).select(
        F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(i)), 40, "0")).alias("id"),
        F.when(i == 0, F.lit(None))
        .when(i % 2 == 1, F.lit(6))
        .otherwise(F.lit(18))
        .cast("long")
        .alias("decimals"),
    )
    # identical duplicate rows → ANY LEFT JOIN dedup must collapse them.
    # (r16 note: a consolidated LocalRelation dim — the change that wins
    # on derived_token_transactions — was A/B-measured HERE at ~1.8×
    # SLOWER across both ANY LEFT joins (0.43–0.60 s → 0.76–0.96 s
    # noop in one session), so this query keeps the range-based dim;
    # broadcast-build shapes are empirical, not transferable.)
    tok_dim = tok_dim.unionByName(tok_dim.limit(2))
    return derived.bancor_trades(conv_fix, contracts_df, tok_dim)
