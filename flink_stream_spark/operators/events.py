"""Event-time windowing and dedup over the `events` stream table.

These are the batch-replay twins of the Structured Streaming operators
in flink_stream_spark.streaming (SURVEY §2C "Streaming" rows): every
streaming op has a batch path over the same input so the DuckDB oracle
can check it. The streaming execution path (withWatermark + window /
session_window / dropDuplicatesWithinWatermark) is exercised in
tests/test_streaming.py with the same expected results.

Timestamp outputs are rendered as epoch-milliseconds BIGINTs: the
fixture `ts` is parquet TIMESTAMP(NANOS); Spark processes it at µs and
DuckDB at ns, and both truncate identically at ms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "events_window_tumbling",
    """
    SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS window_start_ms,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start_ms, event_type
    """,
    group="streaming",
    doc="Tumbling event-time window (1h), batch replay of the streaming "
    "groupBy(window(ts, '1 hour')) aggregation.",
)
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
        .orderBy("window_start_ms", "event_type")
    )


@register(
    "events_window_sliding",
    """
    WITH offs(o) AS (VALUES (CAST(0 AS BIGINT)), (CAST(1800000 AS BIGINT)))
    SELECT CAST(FLOOR(epoch_ms(ts) / 1800000) * 1800000 - o AS BIGINT) AS window_start_ms,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN offs
    GROUP BY 1
    ORDER BY window_start_ms
    """,
    group="streaming",
    doc="Sliding window (1h size / 30m slide): each event belongs to two "
    "windows; oracle materializes the slide offsets explicitly.",
)
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), "n", "total_value")
        .orderBy("window_start_ms")
    )


@register(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS session_start_ms,
           CAST(epoch_ms(MAX(ts)) AS BIGINT) AS session_end_ms
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    group="streaming",
    doc="Sessionization (30m gap) via gaps-and-islands — the batch twin "
    "of session_window(ts, '30 minutes'); SURVEY §7 M7.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ms = F.unix_millis(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev_ms.isNull() | (F.unix_millis("ts") - prev_ms > 1800000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_millis(F.min("ts")).alias("session_start_ms"),
            F.unix_millis(F.max("ts")).alias("session_end_ms"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            "n_events",
            "session_start_ms",
            "session_end_ms",
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "events_dedup_first_per_key",
    """
    SELECT user_id, event_type, event_id,
           CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
          FROM events) t
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    group="streaming",
    doc="Deterministic keyed dedup (first event per key in event-time "
    "order) — batch twin of dropDuplicatesWithinWatermark; the "
    "reference bounds the same state with table.exec.state.ttl "
    "(flink_json_to_iceberg.py:24).",
)
def events_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_millis("ts").alias("ts_ms"))
        .orderBy("user_id", "event_type")
    )


@register(
    "events_stateful_incremental_agg",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(epoch_ms(MAX(ts)) AS BIGINT) AS last_seen_ms
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    group="streaming",
    doc="Per-key running aggregate — batch equivalent of the streaming "
    "update-mode groupBy aggregation state.",
)
def events_stateful_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.countDistinct("event_type").alias("n_types"),
            F.unix_millis(F.max("ts")).alias("last_seen_ms"),
        )
        .orderBy("user_id")
    )
