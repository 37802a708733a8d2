"""Live-ClickHouse-optional round-trip for the export path — the
engine's analogue of the reference's actual sink
(/root/reference/clients/custom_clickhouse.py:167-189, which INSERTs
over the ClickHouse HTTP interface). Skipped unless
``TEST_CLICKHOUSE_URL`` points at an answering ClickHouse HTTP endpoint
(mirrors the ``TEST_RPC_NODE`` gate in test_rpc_live.py), so the suite
stays green in sandboxes while the one seam that talks to a real
ClickHouse — generated ReplacingMergeTree DDL + ``export_jdbc``-shipped
rows + SELECT ... FINAL readback — is exercised end-to-end wherever a
server exists.

Run with e.g.::

    TEST_CLICKHOUSE_URL=http://localhost:8123 pytest tests/test_clickhouse_live.py

Optional auth: ``TEST_CLICKHOUSE_USER`` / ``TEST_CLICKHOUSE_PASSWORD``
(sent as X-ClickHouse-* headers). The insert leg drives
``Warehouse.export_jdbc``'s injectable writer seam with an HTTP
JSONEachRow writer — the same wire protocol the reference sink uses;
where a ClickHouse JDBC driver jar is on Spark's classpath the default
(no-writer) JDBC path is config, not code (pinned against embedded
Derby in test_catalog.py).
"""

import json
import os
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import Row

URL = os.environ.get("TEST_CLICKHOUSE_URL")

pytestmark = pytest.mark.skipif(
    not URL, reason="TEST_CLICKHOUSE_URL not set (live-ClickHouse gate)"
)


def _ch(query: str, body: bytes = b"") -> str:
    """One statement against the ClickHouse HTTP interface."""
    req = urllib.request.Request(
        URL.rstrip("/") + "/?" + urllib.parse.urlencode({"query": query}),
        data=body or None,
        method="POST",
    )
    user = os.environ.get("TEST_CLICKHOUSE_USER")
    if user:
        req.add_header("X-ClickHouse-User", user)
        req.add_header(
            "X-ClickHouse-Key", os.environ.get("TEST_CLICKHOUSE_PASSWORD", "")
        )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read().decode()


def _http_jsoneachrow_writer(df, url, dbtable, mode, options):
    """export_jdbc writer seam → ClickHouse HTTP INSERT (JSONEachRow),
    the reference sink's wire format. Collect is bounded here (fixture
    table); the production default path is Spark's distributed JDBC
    writer."""
    if mode == "overwrite":
        _ch(f"TRUNCATE TABLE {dbtable}")
    payload = "\n".join(
        json.dumps(r.asDict(), default=str) for r in df.collect()
    ).encode()
    _ch(f"INSERT INTO {dbtable} FORMAT JSONEachRow", payload)


def test_ddl_exports_and_final_readback_roundtrip(spark, tmp_path):
    """create from generated DDL → upsert fixture warehouse → export →
    SELECT ... FINAL equals the warehouse's own FINAL read, including
    last-write-wins on the duplicated key (ReplacingMergeTree semantics
    standing in for the parquet engine's _seq + dedup-on-read)."""
    from ethereum_analytical_db_spark.catalog import Warehouse
    from ethereum_analytical_db_spark.compat.clickhouse_ddl import create_table_ddl

    table = "spark_graft_live_block_flag"
    wh = Warehouse(spark, str(tmp_path))
    wh.create("block_flag")
    wh.write(
        "block_flag",
        spark.createDataFrame(
            [Row(id=str(i), name="traces_extracted", value=i % 2) for i in range(6)]
        ),
    )
    # second write on the same keys: FINAL must show these, not the first
    wh.write(
        "block_flag",
        spark.createDataFrame(
            [Row(id=str(i), name="traces_extracted", value=1) for i in range(3)]
        ),
    )

    ddl = create_table_ddl("block_flag").replace(
        "CREATE TABLE IF NOT EXISTS block_flag", f"CREATE TABLE IF NOT EXISTS {table}", 1
    )
    assert "ENGINE = ReplacingMergeTree()" in ddl and "ORDER BY (id, name)" in ddl
    _ch(f"DROP TABLE IF EXISTS {table}")
    try:
        _ch(ddl)
        wh.export_jdbc(
            "block_flag",
            URL,
            dbtable=table,
            mode="overwrite",
            writer=_http_jsoneachrow_writer,
        )
        got = {
            (r["id"], r["name"]): r["value"]
            for r in (
                json.loads(ln)
                for ln in _ch(
                    f"SELECT id, name, value FROM {table} FINAL FORMAT JSONEachRow"
                ).splitlines()
                if ln.strip()
            )
        }
        want = {
            (r["id"], r["name"]): r["value"]
            for r in wh.read("block_flag", final=True)
            .select("id", "name", "value")
            .collect()
        }
        assert got == want
        assert got[("0", "traces_extracted")] == 1  # last write won
        assert len(got) == 6
    finally:
        _ch(f"DROP TABLE IF EXISTS {table}")


def test_prepare_indices_sql_all_tables_accepted(spark):
    """Every generated CREATE statement parses and executes on a real
    server — the byte-for-byte DDL assertions in test_catalog.py pin the
    shape, this pins that ClickHouse actually accepts it."""
    from ethereum_analytical_db_spark.compat.clickhouse_ddl import prepare_indices_sql

    prefix = "spark_graft_live_ddl_"
    for name, ddl in prepare_indices_sql().items():
        scoped = ddl.replace(
            f"CREATE TABLE IF NOT EXISTS {name}",
            f"CREATE TABLE IF NOT EXISTS {prefix}{name}",
            1,
        )
        _ch(f"DROP TABLE IF EXISTS {prefix}{name}")
        try:
            _ch(scoped)
            # table exists and is a ReplacingMergeTree
            engine = _ch(
                "SELECT engine FROM system.tables WHERE name = "
                f"'{prefix}{name}' AND database = currentDatabase()"
            ).strip()
            assert engine == "ReplacingMergeTree", (name, engine)
        finally:
            _ch(f"DROP TABLE IF EXISTS {prefix}{name}")
