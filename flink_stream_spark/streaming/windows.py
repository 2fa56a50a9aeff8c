"""Event-time windowing on Structured Streaming (SURVEY §2C Streaming).

The streaming execution path for the window/sessionize/dedup operators
whose batch twins live in operators/events.py. Each helper returns a
streaming DataFrame; tests drive them with a file-replayed event
stream and compare against the batch results (streaming-vs-batch
parity, SURVEY §7 'What's hard').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_stream_spark.catalog import table_path

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table as an unbounded stream (Kafka stand-in,
    earliest-offset semantics).

    Mirrors catalog.load_table's timestamp handling: parquet
    TIMESTAMP(NANOS) columns (which Spark cannot scan natively) are
    read as int64 nanos and converted with exact integer µs
    arithmetic; µs/ms-unit files are read as TimestampType directly.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts_field = pq.read_schema(table_path(sf_dir, "events")).field("ts")
    ts_is_ns = pa.types.is_timestamp(ts_field.type) and ts_field.type.unit == "ns"
    if ts_is_ns:
        # no try/except: if this conf is ever rejected (it is a legacy
        # knob slated for removal), fail HERE with the actionable error
        # instead of an opaque 'Illegal Parquet type' at scan time
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.format("parquet")
        .schema(_events_schema(T.LongType() if ts_is_ns else T.TimestampType()))
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if ts_is_ns:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h window counts with watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session_window aggregation (gap-merged event-time windows)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Keyed dedup with watermark-bounded state — the Spark analogue of
    the reference's state-TTL-bounded operators
    (table.exec.state.ttl=600s, flink_json_to_iceberg.py:24)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def cumulate_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """CUMULATE window (span 1h, step 15m) on a stream — Flink
    FLIP-145's third window TVF, which Structured Streaming lacks
    natively. The event is exploded to its remaining step boundaries
    BEFORE the windowed aggregate (constant span/step fan-out), then
    grouped on (span_start, window_end); the watermark bounds state
    exactly as for a tumbling window of the span size. Early firings
    per step arrive in update/complete mode like Flink's cumulate
    emits."""
    span_ms, step_ms = 3_600_000, 900_000
    t_ms = F.unix_millis("ts")
    span_start = (F.floor(t_ms / span_ms) * span_ms).cast("bigint")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    k_min = (F.floor((t_ms - span_start) / step_ms) + 1).cast("bigint")
    return (
        events.withWatermark("ts", watermark)
        .select(
            F.col("ts"),
            span_start.alias("window_start_ms"),
            F.explode(
                F.sequence(k_min, F.lit(span_ms // step_ms).cast("bigint"))
            ).alias("k"),
            cents.alias("cents"),
        )
        .withColumn(
            "window_end_ms",
            (F.col("window_start_ms") + F.col("k") * step_ms).cast("bigint"),
        )
        # group on the span's tumbling window so the watermark can
        # expire state; the cumulate keys ride along as group columns
        .groupBy(F.window("ts", "1 hour"), "window_start_ms", "window_end_ms")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("cents").cast("double") / 100).cast("double").alias("total_value"),
        )
        .drop("window")
    )
