"""Logical-decoding CDC parse + apply on crafted change logs (no
Postgres needed — the live end-to-end twin is
tests/test_jdbc_postgres_e2e.py::test_logical_decoding_cdc_round_trip)."""

from __future__ import annotations

from flink_stream_spark.cdc.pg_logical import (
    cdc_final_state_from_log,
    parse_test_decoding,
)

LOG = [
    (1, "BEGIN 725"),
    (2, "table public.customers: INSERT: id[integer]:1 email[text]:'a@x'"),
    (3, "table public.customers: INSERT: id[integer]:2 email[text]:'it''s'"),
    (4, "COMMIT 725"),
    (5, "table public.customers: UPDATE: id[integer]:2 email[text]:'b2@y'"),
    (6, "table public.customers: DELETE: id[integer]:1"),
    (7, "table public.orders: INSERT: id[integer]:1 total[numeric]:12.5"),
]


def test_parse_ops_quotes_and_markers(spark):
    df = spark.createDataFrame(LOG, "seq long, data string")
    got = {r["seq"]: r for r in parse_test_decoding(df).collect()}
    assert set(got) == {2, 3, 5, 6, 7}  # BEGIN/COMMIT dropped
    assert got[2]["op"] == "INSERT" and got[2]["after"]["email"] == "a@x"
    assert got[3]["after"]["email"] == "it's"  # '' unescaped
    assert got[6]["op"] == "DELETE" and got[6]["after"] == {"id": "1"}
    assert got[7]["tbl"] == "public.orders" and got[7]["after"]["total"] == "12.5"


def test_update_with_old_key_section_takes_new_tuple_only(spark):
    # a PK-changing UPDATE (or REPLICA IDENTITY FULL) emits the old key
    # AND the new tuple: same column twice across sections. Only the
    # new-tuple image must land in the map — no DUPLICATED_MAP_KEY.
    rows = [
        (
            1,
            "table public.customers: UPDATE: old-key: id[integer]:2 "
            "new-tuple: id[integer]:9 email[text]:'moved@x'",
        ),
    ]
    df = spark.createDataFrame(rows, "seq long, data string")
    got = parse_test_decoding(df).collect()[0]
    assert got["op"] == "UPDATE"
    assert dict(got["after"]) == {"id": "9", "email": "moved@x"}


def test_quoted_value_containing_pair_shape_does_not_misalign(spark):
    # a quoted value containing a "word[type]:" substring must not be
    # mistaken for a column fragment (keys/values are captured from the
    # same match, so they cannot desync).
    rows = [
        (
            1,
            "table public.notes: INSERT: id[integer]:1 "
            "body[text]:'see also ref[integer]:42 for context' "
            "tag[text]:'z'",
        ),
    ]
    df = spark.createDataFrame(rows, "seq long, data string")
    got = parse_test_decoding(df).collect()[0]
    after = dict(got["after"])
    assert after["id"] == "1"
    assert after["tag"] == "z"
    assert after["body"] == "see also ref[integer]:42 for context"


def test_final_state_last_per_key_delete_aware(spark):
    df = spark.createDataFrame(LOG, "seq long, data string")
    final = {
        (r["tbl"], r["id"]): dict(r["after"])
        for r in cdc_final_state_from_log(parse_test_decoding(df), "id").collect()
    }
    # id=1 deleted; id=2 carries the UPDATE image; orders untouched
    assert final == {
        ("public.customers", "2"): {"id": "2", "email": "b2@y"},
        ("public.orders", "1"): {"id": "1", "total": "12.5"},
    }


def test_out_of_order_input_still_replays_by_seq(spark):
    shuffled = [LOG[5], LOG[1], LOG[6], LOG[4], LOG[2], LOG[0], LOG[3]]
    df = spark.createDataFrame(shuffled, "seq long, data string")
    final = {
        (r["tbl"], r["id"])
        for r in cdc_final_state_from_log(parse_test_decoding(df), "id").collect()
    }
    assert final == {("public.customers", "2"), ("public.orders", "1")}
