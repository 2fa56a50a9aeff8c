#!/usr/bin/env python
"""End-to-end smoke flow — the engine's equivalent of the reference's
manual harness (reference test_cdc.py): seed two tables, push raw-JSON
events and CDC envelopes (insert/update/delete, optionally --bulk),
run the streaming pipelines, and print the final table states.

Usage:  python examples/smoke_cdc.py [--bulk] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from flink_stream_spark import get_spark
from flink_stream_spark.streaming.cdc_pipeline import start_cdc_pipeline
from flink_stream_spark.streaming.ingest import JsonField, start_raw_json_ingest
from flink_stream_spark.tables.managed import ManagedTable, Warehouse

ACCOUNT = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("email", T.StringType()),
    ]
)
PRODUCT = T.StructType(
    [
        T.StructField("product_id", T.IntegerType()),
        T.StructField("product_name", T.StringType()),
    ]
)


def envelope(table, op, after=None, before=None, lsn=0):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "source": {"table": table, "schema": "commerce", "lsn": lsn},
                "op": op,
                "ts_ms": lsn,
            }
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bulk", action="store_true", help="100 rows per table (reference --bulk)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    rng = random.Random(42)  # deterministic, like the fixtures
    n = 100 if args.bulk else 3
    work = args.workdir or tempfile.mkdtemp(prefix="flink_stream_spark_smoke_")
    spark = get_spark("smoke_cdc", cpus=8)

    # --- raw-JSON topic → upsert table (reference raw_json_* flow) ---
    topic = f"{work}/raw_json_account"
    os.makedirs(topic, exist_ok=True)
    with open(f"{topic}/batch1.jsonl", "w") as f:
        for i in range(n):
            f.write(json.dumps({"user_id": 1000 + i, "email": f"test_{rng.randint(0, 999999):06d}@example.com"}) + "\n")
        f.write("malformed line\n")  # exercised null-filter
    acct_json = ManagedTable(f"{work}/wh", "account_json", ["user_id"])
    q = start_raw_json_ingest(
        spark,
        topic,
        acct_json,
        [JsonField("user_id", "$.user_id", "int"), JsonField("email", "$.email", "string")],
        key="user_id",
        checkpoint_dir=f"{work}/ckpt_raw",
    )
    q.processAllAvailable()
    q.stop()
    print(f"account_json rows: {acct_json.read(spark).count()} (expected {n})")

    # --- CDC envelopes → routed upsert tables (reference cdc.* flow) ---
    cdc_topic = f"{work}/cdc_topic"
    os.makedirs(cdc_topic, exist_ok=True)
    wh = Warehouse(f"{work}/wh")
    with open(f"{cdc_topic}/ops.jsonl", "w") as f:
        lsn = 0
        for i in range(n):  # inserts (manual/001_insert.sql)
            lsn += 1
            f.write(envelope("account", "c", {"user_id": i, "email": f"u{i}@example.com"}, lsn=lsn) + "\n")
            lsn += 1
            f.write(envelope("product", "c", {"product_id": i, "product_name": f"Item_{i}"}, lsn=lsn) + "\n")
        lsn += 1  # update (manual/002_update.sql)
        f.write(envelope("account", "u", {"user_id": 0, "email": "updated@example.com"}, lsn=lsn) + "\n")
        lsn += 1  # delete (manual/003_delete.sql)
        f.write(envelope("account", "d", None, before={"user_id": 1, "email": "u1@example.com"}, lsn=lsn) + "\n")
    qc = start_cdc_pipeline(
        spark,
        cdc_topic,
        wh,
        {"account": ACCOUNT, "product": PRODUCT},
        {"account": ["user_id"], "product": ["product_id"]},
        checkpoint_dir=f"{work}/ckpt_cdc",
    )
    qc.processAllAvailable()
    qc.stop()

    acct = wh.table("account_postgres").read(spark)
    prod = wh.table("product_postgres").read(spark)
    print(f"account_postgres rows: {acct.count()} (expected {n - 1})")
    print(f"product_postgres rows: {prod.count()} (expected {n})")
    print("updated row:", acct.filter("user_id = 0").collect()[0]["email"])
    print("tables:", wh.list_tables())
    expired = wh.expire_all(retain_last=1)
    print("expired snapshots:", expired)
    if args.workdir is None:
        shutil.rmtree(work)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
