#!/usr/bin/env python
"""Tour of the managed-table (lakehouse) surface — the engine's
equivalent of the reference's Iceberg v2 table lifecycle
(flink/jobs/flink_json_to_iceberg.py:61-87 table DDL + upsert,
snapshot_mgmt.py maintenance), exercised end to end on a local dir:

  overwrite → append → bucket-scoped MERGE (+ delete) → time travel →
  change data feed → zone-map pruned range read → bucket-pruned point
  lookup → predicate DELETE (retention) → incremental view refresh →
  SQL views → $snapshots/$files metadata → compact → expire_snapshots.

Usage:  python examples/lakehouse_tour.py [--workdir DIR]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_stream_spark import get_spark
from flink_stream_spark.tables.managed import ManagedTable


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    work = args.workdir or tempfile.mkdtemp(prefix="lakehouse_tour_")
    spark = get_spark("lakehouse-tour", cpus=8)

    t = ManagedTable(work, "accounts", ["user_id"], num_buckets=8)

    # 1. initial load (overwrite) + append-only batches
    t.overwrite(
        spark.range(0, 1000).select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("user"), F.col("id"), F.lit("@example.com")).alias("email"),
            (F.col("id") * 10).alias("score"),
        )
    )
    t.append(
        spark.range(1000, 1200).select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("user"), F.col("id"), F.lit("@example.com")).alias("email"),
            (F.col("id") * 10).alias("score"),
        )
    )
    print("rows after overwrite+append:", t.read(spark).count())

    # 2. bucket-scoped MERGE: upsert 3 keys, delete 2 — rewrites only
    #    the buckets containing those 5 keys
    files_before = set(t.data_files())
    t.merge(
        upserts=spark.createDataFrame(
            [(7, "updated7@example.com", 700_000),
             (42, "updated42@example.com", 420_000),
             (5000, "new5000@example.com", 1)],
            "user_id long, email string, score long",
        ),
        deletes=spark.createDataFrame([(13,), (999,)], "user_id long"),
    )
    files_after = set(t.data_files())
    print(
        f"merge kept {len(files_before & files_after)}/{len(files_before)} "
        "data files untouched (bucket-scoped rewrite)"
    )

    # 3. time travel + change data feed
    print("v1 rows:", t.read(spark, version=1).count(),
          "| current rows:", t.read(spark).count())
    print("changes v2 -> v3:")
    t.changes(spark, 2, 3).orderBy("_change_type", "user_id").show(10, False)

    # 4. zone-map pruned range read + bucket-pruned point lookup
    pruned = t.read(spark, where=[("score", "between", (400_000, 500_000))])
    print("zone-map read listed", len(pruned.inputFiles()), "of",
          len(t.data_files()), "files; rows:", pruned.count())
    print("lookup(42):", t.lookup(spark, {"user_id": 42}).collect())

    # 5. retention delete: dir-granular, zone-map scoped
    t.delete_where(spark, [("score", ">=", 11_000)])
    print("after retention delete:", t.read(spark).count(), "rows")

    # 6. SQL view over the committed snapshot
    t.read(spark).createOrReplaceTempView("accounts_v")
    spark.sql(
        "SELECT count(*) AS n, max(score) AS max_score FROM accounts_v"
    ).show()

    # 7. Z-order clustering (OPTIMIZE ZORDER BY equivalent): rewrite
    #    clustered on (user_id, score) so per-file zone maps prune on
    #    EITHER column, then show the multi-dim pruned read
    t.zorder(spark, ["user_id", "score"], max_records_per_file=32)
    zr = t.read(spark, where=[("score", "between", (1_000, 2_000))])
    print("post-zorder score-range read listed", len(zr.inputFiles()),
          "of", len(t.data_files()), "files")

    # 8. metadata tables, maintenance
    t.snapshots(spark).show(truncate=False)
    print("live data files:", t.files(spark).count())
    t.compact(spark)
    expired = t.expire_snapshots(retain_last=1)
    print("compacted; expired", expired, "snapshots;",
          "final rows:", t.read(spark).count())

    # 9. same lifecycle over a REAL Iceberg catalog when the
    #    iceberg-spark runtime jars are present (tables/format.py is
    #    the seam both backends implement; see tests/test_iceberg_adapter.py)
    from flink_stream_spark.tables.iceberg import (
        IcebergWarehouse,
        iceberg_available,
    )

    if iceberg_available(spark):
        iw = IcebergWarehouse(spark, os.path.join(work, "ice_wh"))
        it = iw.table("accounts_ice", key_columns=["user_id"])
        it.merge(t.read(spark))
        print("iceberg twin rows:", it.read(spark).count(),
              "snapshots:", it.current_version())
        it.expire_snapshots(retain_last=1)
    else:
        print("iceberg-spark jars absent — skipping the Iceberg twin "
              "(launch with --packages org.apache.iceberg:"
              "iceberg-spark-runtime-<spark>_<scala>:<ver> to run it)")

    if args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
