"""Z-order clustering + per-file zone maps (OPTIMIZE ZORDER BY
equivalent): multi-dimensional file pruning on the managed tables.

The contract under test: after ``zorder([x, y])`` with files split by
``max_records_per_file``, a selective predicate on EITHER clustered
column prunes files via the per-file zone maps recorded in the
manifest — a linear sort can only prune on its leading column. Results
stay exact (zone maps only skip provably-unmatched files; survivors
get the row-level residual filter).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_stream_spark.tables import ManagedTable


@pytest.fixture()
def ztable(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "zt", key_columns=["id"], num_buckets=1)
    df = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 100).alias("x"),
        ((F.col("id") * 7919) % 100).alias("y"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    )
    t.overwrite(df)
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "x", "y", "payload").collect())


def test_zorder_preserves_content(spark, ztable):
    before = _rows(ztable.read(spark))
    v = ztable.zorder(spark, ["x", "y"], max_records_per_file=512)
    assert v == 2
    assert _rows(ztable.read(spark)) == before
    # the rewrite split the bucket into enough files to prune between
    assert len(ztable.data_files()) >= 10


def test_zorder_prunes_on_both_dimensions(spark, ztable):
    ztable.zorder(spark, ["x", "y"], max_records_per_file=512)
    total = len(ztable.data_files())

    def n_files(where):
        return len(ztable.read(spark, where=where).inputFiles())

    nx = n_files([("x", "between", (10, 19))])
    ny = n_files([("y", "between", (10, 19))])
    # both dimensions prune: a 10%-of-range slab must not need every
    # file (linear key-sort layout reads all of them for either column)
    assert nx < total
    assert ny < total
    assert nx <= 0.75 * total
    assert ny <= 0.75 * total

    # results stay exact vs a full-scan filter
    got = sorted(
        r["id"] for r in ztable.read(spark, where=[("y", "between", (10, 19))]).collect()
    )
    want = sorted(
        r["id"]
        for r in ztable.read(spark).filter(F.col("y").between(10, 19)).collect()
    )
    assert got == want


def test_zorder_point_predicate_tighter_than_slab(spark, ztable):
    ztable.zorder(spark, ["x", "y"], max_records_per_file=512)
    total = len(ztable.data_files())
    point = len(ztable.read(spark, where=[("x", "=", 42), ("y", "=", 7)]).inputFiles())
    assert point <= 0.5 * total


def test_linear_layout_does_not_prune_nonleading(spark, tmp_path):
    """Contrast case: the default key-sorted layout (sorted by id)
    spreads every x and y value across every file — zone maps cannot
    skip anything for either column."""
    t = ManagedTable(str(tmp_path), "lin", key_columns=["id"], num_buckets=1)
    df = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 100).alias("x"),
        ((F.col("id") * 7919) % 100).alias("y"),
    )
    t.overwrite(df)
    # same file granularity, but clustered on (id, x) — y is NOT a
    # clustered column, so its per-file ranges stay corpus-wide
    t.zorder(spark, ["id", "x"], max_records_per_file=512)
    total = len(t.data_files())
    ny = len(t.read(spark, where=[("y", "between", (10, 19))]).inputFiles())
    assert ny >= 0.9 * total  # y is unclustered -> no pruning


def test_merge_after_zorder_keeps_correctness_and_file_stats(spark, tmp_path):
    t = ManagedTable(str(tmp_path), "mz", key_columns=["id"], num_buckets=4)
    df = spark.range(4_000).select(
        F.col("id"),
        (F.col("id") % 50).alias("x"),
        ((F.col("id") * 31) % 50).alias("y"),
    )
    t.overwrite(df)
    t.zorder(spark, ["x", "y"], max_records_per_file=256)
    up = spark.createDataFrame([(1, 999, 999), (4_001, 7, 7)], "id long, x long, y long")
    t.merge(up)
    out = {r["id"]: (r["x"], r["y"]) for r in t.read(spark).collect()}
    assert out[1] == (999, 999)
    assert out[4_001] == (7, 7)
    assert len(out) == 4_001
    # untouched buckets carried their per-file stats: a slab read still
    # prunes below the full file count
    total = len(t.data_files())
    ny = len(t.read(spark, where=[("y", "between", (0, 4))]).inputFiles())
    assert ny < total


def test_rewrite_refuses_concurrent_commit(spark, tmp_path):
    """Optimistic concurrency: a long-window rewrite (zorder/compact/
    delete) staged against snapshot v must REFUSE to commit if another
    writer committed since — replacing from the stale snapshot would
    silently drop the concurrent commit's rows."""
    t = ManagedTable(str(tmp_path), "cc", key_columns=["id"], num_buckets=2)
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
    )
    t.overwrite(df)
    base = t.current_version()
    staged, sb = t._stage_bucketed(t.read(spark))
    # a concurrent writer lands between the rewrite's read and commit
    t.append(
        spark.createDataFrame([(1000, 1, 1)], "id long, x long, y long")
    )
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t._commit(
            staged, sb, "zorder", t.read(spark).schema, "replace",
            {0, 1}, expected_version=base,
        )
    # the concurrent append survived; the stale rewrite did not land
    assert t.read(spark).filter(F.col("id") == 1000).count() == 1
    assert t.current_version() == base + 1


def test_maybe_compact_bounds_streaming_append_files(spark, tmp_path):
    """Small-files guard: 20 micro-batch-style appends with
    maybe_compact after each keep every bucket's file list bounded by
    the threshold, and content is never lost."""
    t = ManagedTable(str(tmp_path), "sf", key_columns=["id"], num_buckets=2)
    total = 0
    for epoch in range(20):
        t.append(
            spark.createDataFrame(
                [(epoch * 10 + i, epoch) for i in range(10)], "id long, epoch long"
            ),
            token=f"epoch:{epoch}",
        )
        total += 10
        t.maybe_compact(spark, max_files_per_bucket=5)
        manifest = t._load_manifest(t.current_version())
        worst = max(len(ps) for ps in manifest["buckets"].values())
        assert worst <= 5, f"epoch {epoch}: {worst} file dirs in a bucket"
    assert t.read(spark).count() == total
    # replay idempotency survives compaction: a replayed epoch no-ops
    v = t.current_version()
    t.append(
        spark.createDataFrame([(1, 0)], "id long, epoch long"), token="epoch:3"
    )
    assert t.current_version() == v
    assert t.read(spark).count() == total


def test_timestamp_zone_maps_prune_retention_delete(spark, tmp_path):
    """Timestamp columns carry zone maps (canonicalized to epoch
    micros): a retention read/delete on ts prunes the commits whose
    range cannot match — the primary time-retention pattern."""
    import datetime

    t = ManagedTable(str(tmp_path), "ts", key_columns=["id"], num_buckets=1)
    base = datetime.datetime(2026, 1, 1)
    # three appends, one per day — three dirs with disjoint ts ranges
    for day in range(3):
        rows = [
            (day * 100 + i, base + datetime.timedelta(days=day, minutes=i))
            for i in range(50)
        ]
        t.append(spark.createDataFrame(rows, "id long, ts timestamp"))
    total_files = len(t.data_files())
    day0 = t.read(
        spark,
        where=[("ts", "<", base + datetime.timedelta(days=1))],
    )
    assert len(day0.inputFiles()) < total_files  # days 1-2 pruned
    assert day0.count() == 50
    # retention delete rewrites ONLY the old day's dir: newer files
    # survive under their original paths
    files_before = set(t.data_files())
    t.delete_where(spark, [("ts", "<", base + datetime.timedelta(days=1))])
    files_after = set(t.data_files())
    assert t.read(spark).count() == 100
    # the two newer dirs carried forward untouched
    assert len(files_before & files_after) >= 2


def test_zorder_on_timestamp_column(spark, tmp_path):
    """Z-order with a TIMESTAMP dimension: the Morton key normalizes
    via epoch micros (matching the canonicalized zone-map stats), so a
    time-slab read prunes files — the textbook ZORDER BY (ts, key)."""
    import datetime

    t = ManagedTable(str(tmp_path), "zt2", key_columns=["id"], num_buckets=1)
    base = datetime.datetime(2026, 3, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=(i * 7919) % 10_000), i % 100)
        for i in range(8_000)
    ]
    t.overwrite(spark.createDataFrame(rows, "id long, ts timestamp, x long"))
    t.zorder(spark, ["ts", "x"], max_records_per_file=512)
    total = len(t.data_files())
    slab = t.read(
        spark,
        where=[
            (
                "ts",
                "between",
                (base, base + datetime.timedelta(minutes=1_000)),
            )
        ],
    )
    assert len(slab.inputFiles()) <= 0.75 * total
    nx = len(t.read(spark, where=[("x", "between", (10, 19))]).inputFiles())
    assert nx <= 0.75 * total
    # exactness: pruned read equals full-scan filter
    got = sorted(r["id"] for r in slab.collect())
    want = sorted(
        r["id"]
        for r in t.read(spark)
        .filter(F.col("ts").between(base, base + datetime.timedelta(minutes=1_000)))
        .collect()
    )
    assert got == want


def test_morton_key_nonnegative_with_four_columns(spark):
    """With k=4 a 16-bit-per-column interleave would put the 4th
    column's top bit at position 63 — the long sign bit — so max-value
    rows would sort FIRST. The 4-column key uses 15 bits/column and
    must stay non-negative (and rank max-values last)."""
    from flink_stream_spark.tables.managed import _morton_expr
    from pyspark.sql import types as T

    cols = ["a", "b", "c", "d"]
    ranges = {c: (0, 100) for c in cols}
    types = {c: T.IntegerType() for c in cols}
    df = spark.createDataFrame(
        [(0, 0, 0, 0), (100, 100, 100, 100), (50, 50, 50, 50)],
        "a int, b int, c int, d int",
    ).withColumn("z", _morton_expr(cols, ranges, types))
    got = {(r["a"]): r["z"] for r in df.collect()}
    assert all(z >= 0 for z in got.values())
    assert got[0] < got[50] < got[100]  # monotone along the diagonal
