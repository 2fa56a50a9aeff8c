"""Incremental materialized-view maintenance over managed tables.

The reference keeps derived state fresh by re-running Trino queries
over the full Iceberg table (README.md:175-179). For distributive
aggregates (COUNT / SUM) there is a much cheaper contract: a commit
only perturbs the buckets it rewrote, and the bucket lists of two
manifests identify those buckets WITHOUT reading any data. The
incremental refresh therefore:

1. diffs the two manifests -> changed bucket set (driver-side, metadata
   only — at 100 TB this is a dict comparison);
2. reads ONLY the changed buckets of BOTH versions;
3. delta = agg(new slice) - agg(old slice) per group;
4. applies the delta to the materialized aggregate with a keyed MERGE
   (itself bucket-scoped).

Total data read is O(changed buckets), not O(table) — a 1-key commit
refreshes the view by reading ~2/num_buckets of the table. Counts and
sums are exact under delta application; avg derives from (sum, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.tables.managed import ManagedTable


def changed_buckets(table: ManagedTable, from_version: int, to_version: int) -> set[int]:
    """Buckets whose data-file list differs between two committed
    versions — pure manifest metadata, no file I/O beyond two JSON
    reads."""
    a = table._load_manifest(from_version)["buckets"]
    b = table._load_manifest(to_version)["buckets"]
    out = set()
    for k in set(a) | set(b):
        if a.get(k) != b.get(k):
            out.add(int(k))
    return out


def incremental_count_sum_refresh(
    spark: SparkSession,
    base: ManagedTable,
    view: ManagedTable,
    group_col: str,
    sum_col: str,
    from_version: int,
    to_version: int | None = None,
) -> int:
    """Refresh ``view`` = SELECT group_col, COUNT(*) n, SUM(sum_col) s
    FROM base GROUP BY group_col — incrementally, from ``from_version``
    (the version the view currently reflects) to ``to_version``.
    Returns the new committed version of the view."""
    to_version = base.current_version() if to_version is None else to_version
    touched = changed_buckets(base, from_version, to_version)
    if not touched:
        return view.current_version()
    old_m = base._load_manifest(from_version)
    new_m = base._load_manifest(to_version)
    import json as _json

    from pyspark.sql import types as T

    base_schema = T.StructType.fromJson(_json.loads(new_m["schema"]))
    by_name = {f.name: f.dataType for f in base_schema.fields}
    # delta application is exact only for integral measures; a double
    # sum would silently truncate under the long cast
    if not isinstance(
        by_name.get(sum_col), (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"incremental refresh requires an integral sum column; "
            f"{sum_col} is {by_name.get(sum_col)} — store exact units "
            "(e.g. cents) or widen the view to carry decimals"
        )
    group_type = by_name[group_col].simpleString()

    def slice_agg(manifest, sign: int) -> DataFrame:
        df = base._read_manifest_buckets(spark, manifest, touched)
        return df.groupBy(group_col).agg(
            (F.count(F.lit(1)) * sign).alias("dn"),
            F.coalesce(F.sum(sum_col), F.lit(0)).cast("long").alias("ds0"),
        ).select(group_col, "dn", (F.col("ds0") * sign).alias("ds"))

    delta = (
        slice_agg(new_m, 1)
        .unionByName(slice_agg(old_m, -1))
        .groupBy(group_col)
        .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
        .filter((F.col("dn") != 0) | (F.col("ds") != 0))
    )
    current = (
        view.read(spark)
        if view.exists()
        else spark.createDataFrame([], f"{group_col} {group_type}, n long, s long")
    )
    refreshed = (
        current.join(delta, group_col, "full_outer")
        .select(
            group_col,
            (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
            .cast("long")
            .alias("n"),
            (F.coalesce(F.col("s"), F.lit(0)) + F.coalesce(F.col("ds"), F.lit(0)))
            .cast("long")
            .alias("s"),
        )
        .filter(F.col("n") > 0)
    )
    # the refreshed groups are exactly those present in delta or
    # already in the view; merge only the groups delta touched
    touched_groups = refreshed.join(delta.select(group_col), group_col, "left_semi")
    gone = (
        current.join(delta.select(group_col), group_col, "left_semi")
        .join(touched_groups.select(group_col), group_col, "left_anti")
        .select(group_col)
    )
    return view.merge(upserts=touched_groups, keys=[group_col], deletes=gone)
