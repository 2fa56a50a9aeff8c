"""Binary pgoutput protocol parse on crafted wire messages (no
Postgres needed — the live-slot twin is
tests/test_jdbc_postgres_e2e.py::test_pgoutput_binary_cdc_round_trip).

Each builder below emits the exact byte layout the PostgreSQL
logical-replication protocol (version 1) documents for its message
kind, so the parser is pinned against the wire format itself, not
against a Postgres run's incidental output.
"""

from __future__ import annotations

import struct

from flink_stream_spark.cdc.pg_logical import cdc_final_state_from_log
from flink_stream_spark.cdc.pgoutput import (
    parse_dml_message,
    parse_pgoutput,
    parse_relation_message,
)


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def relation(relid: int, schema: str, table: str, cols: list[str]) -> bytes:
    body = b"R" + struct.pack(">I", relid) + _cstr(schema) + _cstr(table)
    body += b"d"  # replica identity: default
    body += struct.pack(">H", len(cols))
    for i, c in enumerate(cols):
        body += struct.pack(">B", 1 if i == 0 else 0)  # first col is key
        body += _cstr(c) + struct.pack(">Ii", 25, -1)  # text oid, typmod
    return body


def tupledata(vals: list) -> bytes:
    out = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        elif v is ...:  # unchanged TOAST
            out += b"u"
        else:
            raw = str(v).encode()
            out += b"t" + struct.pack(">I", len(raw)) + raw
    return out


def insert(relid: int, vals: list) -> bytes:
    return b"I" + struct.pack(">I", relid) + b"N" + tupledata(vals)


def update(relid: int, vals: list, old: "list | None" = None, key: "list | None" = None) -> bytes:
    b = b"U" + struct.pack(">I", relid)
    if key is not None:
        b += b"K" + tupledata(key)
    if old is not None:
        b += b"O" + tupledata(old)
    return b + b"N" + tupledata(vals)


def delete(relid: int, key: list, full_old: bool = False) -> bytes:
    return (
        b"D"
        + struct.pack(">I", relid)
        + (b"O" if full_old else b"K")
        + tupledata(key)
    )


def begin() -> bytes:
    return b"B" + struct.pack(">QQI", 1000, 2000, 7)


def commit() -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, 1000, 1001, 2000)


def test_relation_message_parse():
    r = parse_relation_message(relation(16385, "public", "customers", ["id", "email"]))
    assert r == {
        "relid": 16385,
        "schema": "public",
        "table": "customers",
        "cols": ["id", "email"],
    }
    assert parse_relation_message(insert(16385, ["1", "a@x"])) is None
    assert parse_relation_message(b"") is None


def test_dml_message_parse_kinds():
    assert parse_dml_message(insert(5, ["1", "a@x"])) == {
        "op": "INSERT", "relid": 5, "vals": ["1", "a@x"]
    }
    # UPDATE with a K old-key section: only the new image is the value
    assert parse_dml_message(update(5, ["9", "m@x"], key=["2", None])) == {
        "op": "UPDATE", "relid": 5, "vals": ["9", "m@x"]
    }
    # UPDATE with a full O old image (REPLICA IDENTITY FULL)
    assert parse_dml_message(update(5, ["2", "b2"], old=["2", "b"])) == {
        "op": "UPDATE", "relid": 5, "vals": ["2", "b2"]
    }
    # DELETE carries the key (non-key cols are null on the wire)
    assert parse_dml_message(delete(5, ["1", None])) == {
        "op": "DELETE", "relid": 5, "vals": ["1", None]
    }
    # nulls and unchanged TOAST surface as None
    assert parse_dml_message(insert(5, ["1", None, ...]))["vals"] == ["1", None, None]
    # non-DML kinds are skipped
    for msg in (begin(), commit(), relation(5, "s", "t", ["a"])):
        assert parse_dml_message(msg) is None


def test_parse_pgoutput_end_to_end(spark):
    rel = 16385
    log = [
        (1, begin()),
        (2, relation(rel, "public", "cdc_items", ["id", "name"])),
        (3, insert(rel, ["1", "one"])),
        (4, insert(rel, ["2", "it's"])),
        (5, commit()),
        (6, update(rel, ["2", "TWO"], key=["2", None])),
        (7, delete(rel, ["1", None])),
        (8, insert(rel, ["3", None])),  # explicit NULL column omitted
    ]
    df = spark.createDataFrame(
        [(s, bytearray(m)) for s, m in log], "seq long, data binary"
    )
    got = {r["seq"]: r for r in parse_pgoutput(df).collect()}
    assert set(got) == {3, 4, 6, 7, 8}  # B/C/R dropped
    assert got[3]["tbl"] == "public.cdc_items" and got[3]["op"] == "INSERT"
    assert dict(got[4]["after"]) == {"id": "2", "name": "it's"}
    assert dict(got[6]["after"]) == {"id": "2", "name": "TWO"}
    assert got[7]["op"] == "DELETE" and dict(got[7]["after"]) == {"id": "1"}
    assert dict(got[8]["after"]) == {"id": "3"}  # NULL name omitted

    final = {
        (r["tbl"], r["id"]): dict(r["after"])
        for r in cdc_final_state_from_log(parse_pgoutput(df), "id").collect()
    }
    assert final == {
        ("public.cdc_items", "2"): {"id": "2", "name": "TWO"},
        ("public.cdc_items", "3"): {"id": "3"},
    }


def test_mid_stream_schema_drift_resolves_as_of(spark):
    """A re-sent Relation (ALTER TABLE ADD COLUMN) applies to rows
    AFTER it; earlier rows keep the earlier descriptor."""
    rel = 777
    log = [
        (1, relation(rel, "public", "t", ["id", "a"])),
        (2, insert(rel, ["1", "x"])),
        (3, relation(rel, "public", "t", ["id", "a", "b"])),
        (4, insert(rel, ["2", "y", "z"])),
    ]
    df = spark.createDataFrame(
        [(s, bytearray(m)) for s, m in log], "seq long, data binary"
    )
    got = {r["seq"]: dict(r["after"]) for r in parse_pgoutput(df).collect()}
    assert got[2] == {"id": "1", "a": "x"}
    assert got[4] == {"id": "2", "a": "y", "b": "z"}


def test_multi_table_routing(spark):
    log = [
        (1, relation(1, "public", "accounts", ["id", "email"])),
        (2, relation(2, "commerce", "product", ["pid", "pname"])),
        (3, insert(1, ["1", "a@x"])),
        (4, insert(2, ["10", "widget"])),
    ]
    df = spark.createDataFrame(
        [(s, bytearray(m)) for s, m in log], "seq long, data binary"
    )
    got = {r["seq"]: r["tbl"] for r in parse_pgoutput(df).collect()}
    assert got == {3: "public.accounts", 4: "commerce.product"}


def truncate_msg(relids: list[int], options: int = 0) -> bytes:
    return (
        b"T"
        + struct.pack(">I", len(relids))
        + struct.pack(">B", options)
        + struct.pack(f">{len(relids)}I", *relids)
    )


def test_truncate_message_parse():
    assert parse_dml_message(truncate_msg([5])) == {
        "op": "TRUNCATE", "relids": [5]
    }
    # one TRUNCATE statement can cover several tables (CASCADE)
    assert parse_dml_message(truncate_msg([5, 9], options=1)) == {
        "op": "TRUNCATE", "relids": [5, 9]
    }


def test_binary_format_column_fails_loudly():
    """A slot opened with the 'binary' option sends internal send/recv
    bytes ('b' columns) — lossy text-decoding them would mojibake the
    CDC image, so the parser must refuse."""
    import pytest

    raw = b"\x00\x01\x02"
    msg = (
        b"I"
        + struct.pack(">I", 5)
        + b"N"
        + struct.pack(">H", 1)
        + b"b"
        + struct.pack(">I", len(raw))
        + raw
    )
    with pytest.raises(ValueError, match="binary-format"):
        parse_dml_message(msg)


def test_truncate_replay_drops_prior_rows(spark):
    """TRUNCATE removes every row whose last change precedes it;
    rows re-inserted after it survive — Postgres semantics."""
    rel, other = 16385, 16386
    log = [
        (1, relation(rel, "public", "t", ["id", "v"])),
        (2, relation(other, "public", "u", ["id", "v"])),
        (3, insert(rel, ["1", "a"])),
        (4, insert(rel, ["2", "b"])),
        (5, insert(other, ["1", "kept"])),  # other table: untouched
        (6, truncate_msg([rel])),
        (7, insert(rel, ["3", "after"])),
    ]
    df = spark.createDataFrame(
        [(s, bytearray(m)) for s, m in log], "seq long, data binary"
    )
    parsed = parse_pgoutput(df)
    t_rows = [r for r in parsed.collect() if r["op"] == "TRUNCATE"]
    assert [(r["seq"], r["tbl"]) for r in t_rows] == [(6, "public.t")]
    final = {
        (r["tbl"], r["id"]): dict(r["after"])
        for r in cdc_final_state_from_log(parsed, "id").collect()
    }
    assert final == {
        ("public.t", "3"): {"id": "3", "v": "after"},
        ("public.u", "1"): {"id": "1", "v": "kept"},
    }
