"""Trace-tree operators X4/X5 — same tree shapes as the reference's
tests/internal_transactions_tests.py:235-345 (id enumeration, trie-based
parent-error marking), re-verified against the window/prefix-join
re-expression."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ethereum_analytical_db_spark.operators.traces import (
    assign_trace_ids,
    propagate_parent_errors,
)

SCHEMA = StructType(
    [
        StructField("transactionHash", StringType()),
        StructField("traceAddress", ArrayType(LongType())),
        StructField("error", StringType()),
    ]
)


def make_traces(spark, rows):
    return spark.createDataFrame(
        [Row(transactionHash=tx, traceAddress=ta, error=err) for tx, ta, err in rows],
        SCHEMA,
    )


def test_trace_ids_enumerate_within_tx(spark):
    df = make_traces(
        spark,
        [
            ("0xA", [], None),
            ("0xA", [0], None),
            ("0xA", [0, 0], None),
            ("0xA", [1], None),
            ("0xB", [], None),
        ],
    )
    out = {
        tuple(r["traceAddress"]): r["id"]
        for r in assign_trace_ids(df).filter(F.col("transactionHash") == "0xA").collect()
    }
    # lexicographic traceAddress order: [] < [0] < [0,0] < [1]
    assert out == {(): "0xA.0", (0,): "0xA.1", (0, 0): "0xA.2", (1,): "0xA.3"}
    b = assign_trace_ids(df).filter(F.col("transactionHash") == "0xB").collect()
    assert b[0]["id"] == "0xB.0"


def test_parent_error_marks_descendants_only(spark):
    # [0] fails → [0,1] and [0,1,2] poisoned; [1] and root stay NULL
    # (reference Nullable(UInt8) tri-state); the failing row itself is
    # NOT marked (reference shortest_prefix excludes the node itself)
    df = make_traces(
        spark,
        [
            ("0xA", [], None),
            ("0xA", [0], "Bad instruction"),
            ("0xA", [0, 1], None),
            ("0xA", [0, 1, 2], None),
            ("0xA", [1], None),
        ],
    )
    df = assign_trace_ids(df)
    out = {
        tuple(r["traceAddress"]): r["parent_error"]
        for r in propagate_parent_errors(df).collect()
    }
    assert out == {
        (): None,
        (0,): None,
        (0, 1): True,
        (0, 1, 2): True,
        (1,): None,
    }


def test_parent_error_no_cross_tx_leak(spark):
    df = make_traces(
        spark,
        [
            ("0xA", [0], "fail"),
            ("0xB", [0, 1], None),  # same prefix shape, different tx
        ],
    )
    df = assign_trace_ids(df)
    out = {r["transactionHash"]: r["parent_error"] for r in propagate_parent_errors(df).collect()}
    assert out == {"0xA": None, "0xB": None}


def test_root_failure_poisons_whole_tree(spark):
    df = make_traces(
        spark,
        [
            ("0xA", [], "out of gas"),
            ("0xA", [0], None),
            ("0xA", [2, 3], None),
        ],
    )
    df = assign_trace_ids(df)
    out = {
        tuple(r["traceAddress"]): r["parent_error"]
        for r in propagate_parent_errors(df).collect()
    }
    assert out == {(): None, (0,): True, (2, 3): True}
