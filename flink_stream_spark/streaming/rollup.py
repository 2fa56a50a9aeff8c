"""Incrementally-maintained rollup tables (continuous aggregates).

The streaming half of ``events_multires_rollup``
(operators/events_analytics.py): a Structured Streaming hourly
aggregate whose updated rows are MERGEd into a keyed ManagedTable
every trigger — the hypertable continuous-aggregate pattern on the
reference's upsert-sink machinery (Iceberg v2 keyed upsert tables,
reference: flink/jobs/flink_json_to_iceberg.py:61-71, commit cadence
A14/A23).

Scale posture: state is one row per (hour, event_type) — bounded by
the watermark horizon, not the stream length; each commit MERGEs only
the keys the batch touched. Daily/weekly resolutions re-aggregate the
hourly table (exact integer cent sums re-aggregate losslessly), so
coarser views never rescan raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.streaming.windows import stream_events
from flink_stream_spark.tables.managed import ManagedTable

ROLLUP_KEYS = ["h_ms", "event_type"]


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming (hour, event_type) partial aggregate: count + exact
    integer cent sum (re-aggregatable to any coarser resolution)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("cents"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("h_ms"),
            "event_type",
            "n",
            "cents",
        )
    )


def start_hourly_rollup(
    spark: SparkSession,
    sf_dir: str,
    table: ManagedTable,
    checkpoint_dir: str,
    trigger_seconds: int = 10,
    merge_mode: str = "cow",
    autocompact_files_per_bucket: int | None = None,
):
    """Maintain ``table`` as the continuously-updated hourly rollup of
    the replayed event stream. Update output mode + keyed MERGE: every
    trigger commits the latest cumulative value for each touched
    (hour, event_type) key — same-key-replaces, the reference's
    ``write.upsert.enabled`` contract.

    ``merge_mode='mor'`` is the reference's LITERAL production shape —
    Flink streaming upsert into an Iceberg v2 merge-on-read table:
    each trigger appends the changed keys plus tombstones (commit cost
    O(batch), never O(table)); pair it with
    ``autocompact_files_per_bucket`` so ``maybe_compact`` folds the
    accumulated tombstones once a bucket passes the threshold —
    exactly the maintenance cadence Iceberg deployments schedule."""
    hourly = hourly_rollup_stream(stream_events(spark, sf_dir))

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        if not batch.columns or batch.isEmpty():
            return
        table.merge(batch, keys=ROLLUP_KEYS, mode=merge_mode)
        if autocompact_files_per_bucket is not None:
            table.maybe_compact(
                batch.sparkSession,
                max_files_per_bucket=autocompact_files_per_bucket,
            )

    return (
        hourly.writeStream.outputMode("update")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def daily_from_hourly(hourly: DataFrame) -> DataFrame:
    """Derive the daily resolution from hourly partials — no raw scan."""
    return (
        hourly.groupBy(
            F.unix_millis(F.date_trunc("day", F.timestamp_millis("h_ms"))).alias(
                "day_ms"
            ),
            "event_type",
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            (F.sum("cents") / 100.0).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .orderBy("day_ms", "event_type")
    )


def cms_cells_stream(events: DataFrame) -> DataFrame:
    """Streaming count-min-sketch build over the event stream's
    user_id: the same D x W md5-hash cells as the batch
    ``agg_heavy_hitters_cms`` (operators/misc.py), maintained as a
    streaming aggregate. The state is BOUNDED BY CONSTRUCTION —
    exactly CMS_DEPTH x CMS_WIDTH rows regardless of stream length or
    key cardinality — so no watermark is needed and 'complete' output
    mode is safe: this is the sketch's whole point as a streaming
    heavy-hitter structure (Cormode & Muthukrishnan 2005). Cells are
    sums, so the streaming state merges incrementally exactly like the
    batch partial aggregation."""
    from flink_stream_spark.operators.misc import (
        CMS_DEPTH,
        _cms_bucket_spark,
    )

    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                _cms_bucket_spark(F.lit(i), F.col("user_id")).alias("b"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    return (
        events.select(F.explode(hashes).alias("h"))
        .groupBy(F.col("h.i").alias("i"), F.col("h.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
