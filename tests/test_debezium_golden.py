"""Debezium golden-capture replay (no Kafka needed).

tests/fixtures/debezium_pgoutput_capture.jsonl is a crafted byte-exact
Debezium 3.2.1 PostgreSQL-connector event log in the reference
deployment's wire shape — JsonConverter with ``schemas.enable=true``
(connect-standalone.properties:21-26), ``topic.prefix=cdc``,
``plugin.name=pgoutput`` (connect-postgres-source.json:10-13) — for the
reference's exact data story: the seed inserts
(postgres/scripts/seed/001_insert.sql: 3 accounts + 2 products arrive
as snapshot ``op='r'`` reads) followed by the manual I/U/D scripts
(postgres/scripts/manual/001-003: insert derek+emily, update emily →
emma, ``DELETE FROM commerce.account`` wiping all five rows, each
delete followed by a Kafka tombstone).

Replaying the capture through the full streaming pipeline
(parse_envelopes → route → last-per-key → MERGE) must land the exact
final state Postgres holds after those scripts: an EMPTY account table
and the two seeded products. This closes the Debezium-format gap
without Kafka: the envelope parser consumes schema-carrying Debezium
JSON, not just the synthesized test fixtures.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

from flink_stream_spark.tables.managed import Warehouse

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "debezium_pgoutput_capture.jsonl"
)

ACCOUNT = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("email", T.StringType()),
        # io.debezium.time.MicroTimestamp: int64 micros since epoch
        T.StructField("created_at", T.LongType()),
    ]
)
PRODUCT = T.StructType(
    [
        T.StructField("product_id", T.IntegerType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("created_at", T.LongType()),
    ]
)


def _replay_pipeline(spark, tmp_path, lines_per_file: int):
    """Split the capture into stream files of ``lines_per_file`` lines
    and run the routed CDC pipeline over them to completion."""
    from flink_stream_spark.streaming.cdc_pipeline import start_cdc_pipeline

    src = tmp_path / f"dbz_src_{lines_per_file}"
    src.mkdir()
    lines = open(FIXTURE).read().splitlines()
    for i in range(0, len(lines), lines_per_file):
        chunk = lines[i : i + lines_per_file]
        p = src / f"capture_{i:04d}.jsonl"
        p.write_text("\n".join(chunk) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    wh = Warehouse(str(tmp_path / f"wh_{lines_per_file}"))
    q = start_cdc_pipeline(
        spark,
        str(src),
        wh,
        row_schemas={"account": ACCOUNT, "product": PRODUCT},
        table_keys={"account": ["user_id"], "product": ["product_id"]},
        checkpoint_dir=str(tmp_path / f"ckpt_{lines_per_file}"),
    )
    q.processAllAvailable()
    q.stop()
    return wh


def _final_state(spark, wh):
    acc = wh.table("account_postgres")
    prd = wh.table("product_postgres")
    accounts = (
        sorted(
            (r["user_id"], r["email"]) for r in acc.read(spark).collect()
        )
        if acc.exists()
        else None
    )
    products = sorted(
        (r["product_id"], r["product_name"]) for r in prd.read(spark).collect()
    )
    return accounts, products


def test_debezium_capture_replays_to_reference_final_state(spark, tmp_path):
    wh = _replay_pipeline(spark, tmp_path, lines_per_file=100)  # one batch
    accounts, products = _final_state(spark, wh)
    # the reference's verification state after manual/003: account is
    # EMPTY (the table exists — rows flowed through it — but every key
    # was deleted); product keeps the two seeded rows
    assert accounts == []
    assert products == [
        (1, "Live Edge Dining Table"),
        (2, "Simple Teak Dining Chair"),
    ]


def test_debezium_capture_batch_boundaries_do_not_matter(spark, tmp_path):
    """Same capture split into 3-line micro-batches: snapshot reads,
    inserts, the update, deletes and tombstones land across many
    triggers — the final MERGEd state must be identical."""
    wh = _replay_pipeline(spark, tmp_path, lines_per_file=3)
    accounts, products = _final_state(spark, wh)
    assert accounts == []
    assert products == [
        (1, "Live Edge Dining Table"),
        (2, "Simple Teak Dining Chair"),
    ]


def test_capture_is_schema_carrying_debezium_json():
    """Guard the fixture's wire shape: every non-tombstone line carries
    the JsonConverter schema block (schemas.enable=true) with the
    Debezium envelope type name, and tombstones are present (the
    delete-marker records a Kafka log compaction consumer sees)."""
    import json

    lines = open(FIXTURE).read().splitlines()
    tombstones = [l for l in lines if l == "{}"]
    events = [json.loads(l) for l in lines if l != "{}"]
    assert len(tombstones) == 5  # one per deleted account row
    for e in events:
        assert set(e) == {"schema", "payload"}
        assert e["schema"]["name"].startswith("cdc.commerce.")
        assert e["schema"]["name"].endswith(".Envelope")
        fields = {f["field"] for f in e["schema"]["fields"]}
        assert {"before", "after", "source", "op", "ts_ms"} <= fields
        assert e["payload"]["source"]["connector"] == "postgresql"
    ops = [e["payload"]["op"] for e in events]
    assert ops.count("r") == 5 and ops.count("c") == 2
    assert ops.count("u") == 1 and ops.count("d") == 5
