"""Real-Postgres JDBC integration (reference parity: the reference's
source of truth is Postgres, test_cdc.py:34-63).

Skipped unless BOTH a PostgreSQL server installation and a PostgreSQL
JDBC driver jar are discoverable on this machine. When available, the
test initdb's a throwaway cluster, starts it on a free localhost port,
and runs the Spark side in a SUBPROCESS (the suite's shared session
cannot add driver jars after JVM start):

  1. batch JDBC read of a seeded table through the URI interface
  2. JDBC write (append) from Spark, read back
  3. reference-parity final state: INSERT + UPDATE + DELETE applied in
     Postgres, the JDBC read sees exactly the surviving rows
     (mirrors the reference's verification queries, test_cdc.py:79-96)
"""

from __future__ import annotations

import glob
import os
import socket
import subprocess
import textwrap

import pytest

PG_BIN = "/usr/lib/postgresql/15/bin"

_JAR_CANDIDATES = [
    os.environ.get("SPARK_GRAFT_PG_JAR", ""),
    *glob.glob("/opt/spark*/jars/postgresql-*.jar"),
    *glob.glob("/usr/share/java/postgresql-*.jar"),
    # the reference deployment bundles the public PostgreSQL JDBC
    # driver for its Debezium connector; any discovered copy works
    *glob.glob("/root/reference/kafka/plugins/*/postgresql-*.jar"),
]


def _find_jar() -> str | None:
    for p in _JAR_CANDIDATES:
        if p and os.path.exists(p):
            return p
    return None


pytestmark = pytest.mark.skipif(
    not (os.path.exists(f"{PG_BIN}/initdb") and _find_jar()),
    reason="needs a local PostgreSQL install and a postgresql JDBC jar",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _su_pg(cmd: str) -> None:
    subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        check=True,
        cwd="/tmp",
        capture_output=True,
    )


@pytest.fixture(scope="module")
def pg_url():
    import shutil
    import tempfile

    # NOT pytest's tmp_path: its /tmp/pytest-of-root ancestors are 0700
    # root-only, so the postgres-user server process cannot traverse
    base = tempfile.mkdtemp(prefix="pg-e2e-", dir="/tmp")
    os.chmod(base, 0o777)
    subprocess.run(["chown", "postgres:postgres", base], check=True)
    data = os.path.join(base, "data")
    port = _free_port()
    _su_pg(f"{PG_BIN}/initdb -D {data} -A trust -U postgres")
    _su_pg(
        f"{PG_BIN}/pg_ctl -D {data} -o '-p {port} -k {base} "
        f"-c listen_addresses=localhost -c wal_level=logical' "
        f"-l {base}/log start"
    )
    try:
        yield f"jdbc:postgresql://localhost:{port}/postgres?user=postgres"
    finally:
        _su_pg(f"{PG_BIN}/pg_ctl -D {data} stop -m immediate")
        shutil.rmtree(base, ignore_errors=True)


def _psql(url: str, sql: str) -> None:
    port = url.split("localhost:")[1].split("/")[0]
    subprocess.run(
        ["psql", "-h", "localhost", "-p", port, "-U", "postgres", "-c", sql],
        check=True,
        cwd="/tmp",
        capture_output=True,
    )


def test_jdbc_read_write_and_cdc_final_state(pg_url):
    _psql(
        pg_url,
        "CREATE TABLE customers (id INT PRIMARY KEY, email TEXT);"
        "INSERT INTO customers VALUES (1,'a@x'),(2,'b@y'),(3,'c@z');",
    )
    # the reference harness's I/U/D sequence applied at the source
    _psql(
        pg_url,
        "INSERT INTO customers VALUES (4,'d@w');"
        "UPDATE customers SET email='b2@y' WHERE id=2;"
        "DELETE FROM customers WHERE id=3;",
    )
    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from flink_stream_spark.sources.connectors import read_batch
        spark = (SparkSession.builder.master("local[2]")
                 .appName("jdbc-e2e")
                 .config("spark.jars", {_find_jar()!r})
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        opts = dict(driver="org.postgresql.Driver")
        # 1+3: final state after I/U/D — exactly the surviving rows
        got = sorted(map(tuple, read_batch(
            spark, "jdbc:{pg_url}#customers", **opts).collect()))
        assert got == [(1, 'a@x'), (2, 'b2@y'), (4, 'd@w')], got
        # 2: Spark -> Postgres write, read back through the same URI
        df = spark.createDataFrame([(10, 'x@q'), (11, 'y@q')],
                                   "id int, email string")
        (df.write.format("jdbc")
           .option("url", "{pg_url}")
           .option("dbtable", "from_spark")
           .option("driver", "org.postgresql.Driver")
           .mode("overwrite").save())
        back = sorted(map(tuple, read_batch(
            spark, "jdbc:{pg_url}#from_spark", **opts).collect()))
        assert back == [(10, 'x@q'), (11, 'y@q')], back
        print("JDBC_E2E_OK")
        spark.stop()
        """
    )
    res = subprocess.run(
        ["python", "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "JDBC_E2E_OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]


def test_logical_decoding_cdc_round_trip(pg_url):
    """REAL change-data-capture without Debezium/Kafka: the WAL change
    stream of a live Postgres, pulled through a logical replication
    slot over JDBC, replayed by cdc/pg_logical.py — the derived final
    state must equal the actual table contents."""
    _psql(
        pg_url,
        "SELECT pg_create_logical_replication_slot('cdc_slot', 'test_decoding');",
    )
    _psql(
        pg_url,
        "CREATE TABLE cdc_items (id INT PRIMARY KEY, name TEXT);"
        "INSERT INTO cdc_items VALUES (1,'one'),(2,'two'),(3,'three');"
        "UPDATE cdc_items SET name='TWO' WHERE id=2;"
        "DELETE FROM cdc_items WHERE id=1;"
        "INSERT INTO cdc_items VALUES (4, 'it''s');",
    )
    # Postgres-side row_number preserves WAL order across the JDBC scan
    slot_q = (
        "(SELECT row_number() OVER () AS seq, data FROM "
        "pg_logical_slot_peek_changes('cdc_slot', NULL, NULL)) src"
    )
    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from flink_stream_spark.sources.connectors import read_batch
        from flink_stream_spark.cdc.pg_logical import (
            parse_test_decoding, cdc_final_state_from_log)
        spark = (SparkSession.builder.master("local[2]")
                 .appName("pg-cdc-e2e")
                 .config("spark.jars", {_find_jar()!r})
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        opts = dict(driver="org.postgresql.Driver")
        # a replication slot is SINGLE-CONSUMER: pin ONE snapshot of the
        # peek before the multi-pass replay (the truncate side of
        # cdc_final_state_from_log re-scans its input, and two
        # concurrent slot reads fail with "slot is active for PID") —
        # the same eager-localCheckpoint discipline cdc/slot_stream.py
        # and parse_pgoutput apply
        changes = read_batch(
            spark, "jdbc:{pg_url}#{slot_q}", **opts
        ).localCheckpoint(eager=True)
        parsed = parse_test_decoding(changes).filter(
            "tbl = 'public.cdc_items'")
        final = cdc_final_state_from_log(parsed, "id")
        got = sorted((int(r["id"]), r["after"]["name"])
                     for r in final.collect())
        live = sorted(map(tuple, read_batch(
            spark, "jdbc:{pg_url}#cdc_items", **opts).collect()))
        assert got == live == [(2, 'TWO'), (3, 'three'), (4, "it's")], (
            got, live)
        print("PG_CDC_OK")
        spark.stop()
        """
    )
    res = subprocess.run(
        ["python", "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "PG_CDC_OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]


def test_pgoutput_binary_cdc_round_trip(pg_url):
    """The BINARY ``pgoutput`` protocol — the exact plugin the
    reference's Debezium connector consumes (connect-postgres-source
    .json: "plugin.name": "pgoutput") — decoded from a live slot:
    changes pulled as bytea through ``pg_logical_slot_peek_binary_
    changes`` over JDBC, parsed by cdc/pgoutput.py, replayed by the
    same ``cdc_final_state_from_log`` as the text plugin; the derived
    state must equal the actual table contents."""
    _psql(pg_url, "CREATE PUBLICATION cdc_pub FOR ALL TABLES;")
    _psql(pg_url, "CREATE TABLE pgout_items (id INT PRIMARY KEY, name TEXT);")
    # a logical slot cannot be created in a transaction that has
    # performed writes — separate statement, separate psql session
    _psql(
        pg_url,
        "SELECT pg_create_logical_replication_slot('pgout_slot', 'pgoutput');",
    )
    _psql(
        pg_url,
        "INSERT INTO pgout_items VALUES (1,'one'),(2,'two'),(3,'three');"
        "UPDATE pgout_items SET name='TWO' WHERE id=2;"
        "DELETE FROM pgout_items WHERE id=1;"
        "INSERT INTO pgout_items VALUES (4, 'it''s');"
        "INSERT INTO pgout_items VALUES (5, NULL);",
    )
    slot_q = (
        "(SELECT row_number() OVER () AS seq, data FROM "
        "pg_logical_slot_peek_binary_changes('pgout_slot', NULL, NULL, "
        "'proto_version', '1', 'publication_names', 'cdc_pub')) src"
    )
    script = textwrap.dedent(
        f"""
        import sys; sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from flink_stream_spark.sources.connectors import read_batch
        from flink_stream_spark.cdc.pg_logical import cdc_final_state_from_log
        from flink_stream_spark.cdc.pgoutput import parse_pgoutput
        spark = (SparkSession.builder.master("local[2]")
                 .appName("pgoutput-e2e")
                 .config("spark.jars", {_find_jar()!r})
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        opts = dict(driver="org.postgresql.Driver")
        changes = read_batch(spark, "jdbc:{pg_url}#{slot_q}", **opts)
        parsed = parse_pgoutput(changes).filter(
            "tbl = 'public.pgout_items'")
        final = cdc_final_state_from_log(parsed, "id")
        got = sorted((int(r["id"]), r["after"].get("name"))
                     for r in final.collect())
        live = sorted(map(tuple, read_batch(
            spark, "jdbc:{pg_url}#pgout_items", **opts).collect()))
        assert got == live == [(2, 'TWO'), (3, 'three'), (4, "it's"),
                               (5, None)], (got, live)
        print("PGOUTPUT_CDC_OK")
        spark.stop()
        """
    )
    res = subprocess.run(
        ["python", "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "PGOUTPUT_CDC_OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]


def test_debezium_golden_capture_matches_live_postgres(pg_url, spark, tmp_path):
    """Anchor the crafted Debezium capture to reality: execute the
    REFERENCE'S OWN SQL (seed/001_insert.sql + manual/001-003) against
    the live Postgres, then compare its final table state with the
    state the golden capture replays into the managed warehouse
    (tests/test_debezium_golden.py). If the capture ever drifts from
    what those scripts actually do, this fails."""
    import csv
    import io

    from tests.test_debezium_golden import _final_state, _replay_pipeline

    _psql(
        pg_url,
        "CREATE SCHEMA commerce;"
        "CREATE TABLE commerce.account (user_id SERIAL PRIMARY KEY,"
        " email VARCHAR(255) UNIQUE NOT NULL,"
        " created_at TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP);"
        "CREATE TABLE commerce.product (product_id SERIAL PRIMARY KEY,"
        " product_name VARCHAR(255) UNIQUE NOT NULL,"
        " created_at TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP);",
    )
    for rel in (
        "postgres/scripts/seed/001_insert.sql",
        "postgres/scripts/manual/001_insert.sql",
        "postgres/scripts/manual/002_update.sql",
        "postgres/scripts/manual/003_delete.sql",
    ):
        path = os.path.join("/root/reference", rel)
        _psql(pg_url, open(path).read())

    def _rows(sql: str) -> list[tuple]:
        port = pg_url.split("localhost:")[1].split("/")[0]
        res = subprocess.run(
            ["psql", "-h", "localhost", "-p", port, "-U", "postgres",
             "--csv", "-t", "-c", sql],
            check=True, capture_output=True, text=True,
        )
        return [tuple(r) for r in csv.reader(io.StringIO(res.stdout)) if r]

    live_accounts = _rows(
        "SELECT user_id, email FROM commerce.account ORDER BY user_id"
    )
    live_products = _rows(
        "SELECT product_id, product_name FROM commerce.product ORDER BY product_id"
    )

    wh = _replay_pipeline(spark, tmp_path, lines_per_file=4)
    accounts, products = _final_state(spark, wh)
    assert [(str(u), e) for u, e in accounts] == live_accounts == []
    assert [(str(p), n) for p, n in products] == live_products
