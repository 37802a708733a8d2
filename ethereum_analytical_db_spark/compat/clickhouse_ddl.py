"""ClickHouse DDL generation from the package's Spark StructTypes.

BASELINE's stated architecture is "Parquet + ClickHouse connector";
``Warehouse.export_jdbc`` already ships FINAL-deduped rows to any JDBC
target, but a drop-in ClickHouse deployment also needs the target
tables to exist with the reference's exact engine semantics:

    CREATE TABLE IF NOT EXISTS t (...) ENGINE = ReplacingMergeTree()
    ORDER BY (id)

(reference ``operations/indices.py:18-37``: ReplacingMergeTree with the
primary key as ORDER BY, ``id String`` forced onto every table, and the
two composite-key tables ordering by ``(id, name)``). This module
produces those statements from ``schemas.py`` so schema evolution stays
single-sourced — the StructTypes drive both the parquet warehouse and
the ClickHouse DDL.

Type mapping (verified field-for-field against reference
``schema/schema.py``): String/Int64/Int32/UInt8/Float64/DateTime with
``Nullable(...)`` wrapping driven by StructField.nullable, and
``Array(inner)`` for ArrayType — ClickHouse arrays are never Nullable
at the top level, and ORDER BY key columns must not be Nullable, both
enforced here.

The sandbox has no ClickHouse server, so execution stays behind the
``export_jdbc``/statement-runner seam; the statements themselves are
pinned byte-for-byte by tests/test_catalog.py against the reference's
known DDL shape.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

from ethereum_analytical_db_spark import schemas

_SCALAR = {
    StringType: "String",
    LongType: "Int64",
    IntegerType: "Int32",
    ShortType: "Int16",
    ByteType: "UInt8",  # reference uses UInt8 for its flag/decimals bytes
    DoubleType: "Float64",
    FloatType: "Float32",
    TimestampType: "DateTime",
    DateType: "Date",
}


def clickhouse_type(dtype: DataType, nullable: bool) -> str:
    """One Spark type → ClickHouse type. Arrays recurse on the element
    (element nullability is ignored: ClickHouse Array elements are
    non-Nullable in the reference schema and Nullable-in-Array is a
    storage pessimization we don't emit)."""
    if isinstance(dtype, ArrayType):
        return f"Array({clickhouse_type(dtype.elementType, nullable=False)})"
    for spark_t, ch_t in _SCALAR.items():
        if isinstance(dtype, spark_t):
            return f"Nullable({ch_t})" if nullable else ch_t
    raise TypeError(f"no ClickHouse mapping for Spark type {dtype}")


def create_table_ddl(
    table: str,
    schema: StructType | None = None,
    primary_key: list[str] | None = None,
    engine: str = "ReplacingMergeTree()",
) -> str:
    """The reference's CREATE statement for one table.

    ``schema`` defaults to ``schemas.TABLES[table]``; ``primary_key``
    to ``schemas.primary_key(table)``. Engine-internal columns (``_seq``
    and friends) never appear — a ClickHouse target carries the
    reference schema, with ReplacingMergeTree's background merge playing
    the role our ``_seq`` + FINAL dedup-on-read plays on parquet.
    """
    schema = schema if schema is not None else schemas.TABLES[table]
    pk = primary_key if primary_key is not None else schemas.primary_key(table)
    missing = [k for k in pk if k not in {f.name for f in schema.fields}]
    if missing:
        raise ValueError(f"primary key column(s) {missing} not in schema")
    cols = []
    for f in schema.fields:
        if f.name.startswith("_"):
            continue  # engine-internal, stays in the parquet warehouse
        # ORDER BY columns must not be Nullable in ClickHouse
        nullable = f.nullable and f.name not in pk
        cols.append(f"`{f.name}` {clickhouse_type(f.dataType, nullable)}")
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)}) "
        f"ENGINE = {engine} ORDER BY ({', '.join(pk)})"
    )


def prepare_indices_sql(tables: dict[str, StructType] | None = None) -> dict[str, str]:
    """All CREATE statements, keyed by table — the reference's
    ``prepare_indices`` operation as pure statement generation. Run them
    through any ClickHouse client (or the export_jdbc writer seam)."""
    tables = tables if tables is not None else schemas.TABLES
    return {name: create_table_ddl(name, schema) for name, schema in tables.items()}
