#!/usr/bin/env python
"""MERGE-throughput probe: measure bucket-scoped upsert cost vs table
size at the sf1 scale (engineering check, not a driver gate).

Loads the sf1 `orders` fact (1.5M rows) into a ManagedTable keyed on
o_orderkey, then times three write classes a CDC sink actually issues:

  full overwrite        — the worst case every naive sink pays
  wide merge (1k keys)  — keys hash across most buckets
  point merge (1 key)   — the steady-state CDC update

both in copy-on-write mode (rewrites touched buckets) and
merge-on-read mode (writes only the batch + key tombstones —
the Iceberg v2 equality-delete path; cost must be O(|batch|),
independent of table size), plus the post-MoR read overhead and
the compact() that folds the tombstones back in.

and reports wall time plus files rewritten vs carried forward. The
contract under test: merge cost is O(touched buckets), so the point
merge must rewrite ~1/num_buckets of the files and run in a small
fraction of the overwrite time regardless of table size
(tables/managed.py merge docstring; scenario asserts in
tests/test_cdc_tables.py:352).

Usage: python tools/merge_probe.py [sf_dir] [num_buckets=64]
Results are recorded in PLANS.md ("MERGE throughput at sf1").
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_stream_spark import get_spark  # noqa: E402
from flink_stream_spark.tables.managed import ManagedTable  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1"
    num_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("merge-probe", cpus=32)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = orders.count()
    work = tempfile.mkdtemp(prefix="merge_probe_")
    try:
        t = ManagedTable(work, "orders", ["o_orderkey"], num_buckets=num_buckets)

        t0 = time.perf_counter()
        t.overwrite(orders)
        t_full = time.perf_counter() - t0
        files_total = len(t.data_files())
        print(f"rows={n} buckets={num_buckets} files={files_total}")
        print(f"overwrite: {t_full:.2f}s")

        for mode in ("cow", "mor"):
            for label, k in (("wide-merge-1000", 1000), ("point-merge-1", 1)):
                up = (
                    orders.orderBy("o_orderkey")
                    .limit(k)
                    .withColumn("o_orderpriority", F.lit("0-PROBE"))
                )
                before = set(t.data_files())
                t0 = time.perf_counter()
                t.merge(up, mode=mode)
                dt = time.perf_counter() - t0
                after = set(t.data_files())
                rewritten = len(after - before)
                carried = len(after & before)
                print(
                    f"{mode} {label}: {dt:.2f}s  files rewritten={rewritten} "
                    f"carried-forward={carried} "
                    f"({100.0 * carried / max(len(after), 1):.0f}% untouched)  "
                    f"{100.0 * dt / t_full:.0f}% of overwrite cost"
                )
        # MoR read overhead + compaction fold
        t0 = time.perf_counter()
        t.read(spark).count()
        t_read = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.compact(spark, min_files=2)
        t_compact = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.read(spark).count()
        t_read2 = time.perf_counter() - t0
        print(
            f"read-with-tombstones: {t_read:.2f}s  "
            f"compact-fold: {t_compact:.2f}s  read-after-fold: {t_read2:.2f}s"
        )
        got = (
            t.read(spark)
            .filter(F.col("o_orderpriority") == "0-PROBE")
            .count()
        )
        assert got == 1000, got  # wide merge rows (point merge overlaps)
        print("verified: 1000 probe rows present, key count unchanged:",
              t.read(spark).count() == n)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
