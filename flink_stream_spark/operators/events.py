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


@register(
    "events_gap_fill_ffill",
    """
    WITH sel AS (
      SELECT user_id,
             CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS hr,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE user_id % 10 = 0),
    hourly AS (
      SELECT user_id, hr, SUM(cents) AS cents, COUNT(*) AS n
      FROM sel GROUP BY user_id, hr),
    bounds AS (
      SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM sel GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1)) AS hr FROM bounds),
    j AS (
      SELECT g.user_id, g.hr, h.cents, h.n
      FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr)
    SELECT user_id,
           CAST(hr * 3600000 AS BIGINT) AS hour_ms,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           CAST(CAST(last_value(cents IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY hr) AS DOUBLE) / 100
                AS DOUBLE) AS value_ffill,
           CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM j
    ORDER BY user_id, hour_ms
    """,
    group="streaming",
    doc="Time-series gap fill with forward fill (the time-series "
    "engine staple the reference's stream tables would need for "
    "dashboarding): per-user hourly grid from first to last "
    "observation via sequence+explode, left join of the hourly "
    "rollup, then last(value, ignorenulls) carries the previous "
    "reading across empty hours. Grid generation is per-key and "
    "shuffle-aligned with the rollup (both hash on user_id), so at "
    "scale each key materializes its own grid locally — no global "
    "calendar table, no skew beyond the span of a single key. Hourly "
    "sums are exact cents, so the forward-filled value is "
    "order-independent.",
)
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("user_id") % 10 == 0)
    hr = F.floor(F.unix_millis("ts") / 3600000).cast("bigint")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    sel = e.select("user_id", hr.alias("hr"), cents.alias("cents"))
    hourly = sel.groupBy("user_id", "hr").agg(
        F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n")
    )
    grid = (
        sel.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"),
        )
    )
    j = grid.join(hourly, ["user_id", "hr"], "left")
    w = W.partitionBy("user_id").orderBy("hr")
    return (
        j.select(
            "user_id",
            (F.col("hr") * 3600000).cast("bigint").alias("hour_ms"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            (F.last("cents", ignorenulls=True).over(w).cast("double") / 100)
            .cast("double")
            .alias("value_ffill"),
            F.when(F.col("cents").isNull(), 1).otherwise(0).alias("is_gap"),
        )
        .orderBy("user_id", "hour_ms")
    )


@register(
    "events_value_histogram",
    """
    SELECT event_type,
           CAST(FLOOR(value / 10) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                / 100 AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
    group="streaming",
    doc="Equi-width histogram / binning of the value stream per event "
    "type (bin width 10): a single map-side-combining aggregate whose "
    "key count is bounded by types x bins, so the shuffle is a few KB "
    "regardless of input scale. Bin totals sum as exact cents. Both "
    "engines floor the identical float64, so bin assignment at "
    "boundary values cannot diverge.",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        e.groupBy(
            "event_type", F.floor(F.col("value") / 10).cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents).cast("double") / 100).cast("double").alias("total_value"),
        )
        .orderBy("event_type", "bin")
    )


@register(
    "events_window_cumulate",
    """
    WITH base AS (
      SELECT CAST(epoch_ms(ts) AS BIGINT) AS t_ms, value FROM events),
    spans AS (
      SELECT t_ms, value,
             CAST(FLOOR(t_ms / 3600000) * 3600000 AS BIGINT) AS span_start
      FROM base),
    expanded AS (
      SELECT span_start,
             CAST(span_start + k * 900000 AS BIGINT) AS window_end_ms,
             value
      FROM spans,
           UNNEST(range(CAST(FLOOR((t_ms - span_start) / 900000) + 1 AS BIGINT),
                        CAST(5 AS BIGINT))) AS t(k))
    SELECT CAST(span_start AS BIGINT) AS window_start_ms,
           window_end_ms,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                / 100 AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY 1, 2
    ORDER BY window_start_ms, window_end_ms
    """,
    group="streaming",
    doc="CUMULATE window (span 1h, step 15m): Flink SQL's third windowing "
    "TVF besides TUMBLE/HOP (FLIP-145) — early cumulative firings within "
    "a span. Spark has no built-in cumulate; expressed as a JVM-side "
    "sequence+explode over the remaining step boundaries of the span "
    "(max span/step = 4 copies, bounded fan-out, no UDF) followed by a "
    "normal map-side-combining aggregate. At scale the expansion factor "
    "is the constant span/step, never data-dependent.",
)
def events_window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    span_ms, step_ms = 3_600_000, 900_000
    e = _events(spark, sf_dir)
    t_ms = F.unix_millis("ts")
    span_start = (F.floor(t_ms / span_ms) * span_ms).cast("bigint")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    k_min = (F.floor((t_ms - span_start) / step_ms) + 1).cast("bigint")
    return (
        e.select(
            span_start.alias("window_start_ms"),
            F.explode(F.sequence(k_min, F.lit(span_ms // step_ms).cast("bigint"))).alias("k"),
            cents.alias("cents"),
        )
        .groupBy(
            "window_start_ms",
            (F.col("window_start_ms") + F.col("k") * step_ms).cast("bigint").alias("window_end_ms"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("cents").cast("double") / 100).cast("double").alias("total_value"),
        )
        .orderBy("window_start_ms", "window_end_ms")
    )


@register(
    "events_sessionize_dynamic_gap",
    """
    WITH base AS (
      SELECT user_id, event_id,
             CAST(epoch_ms(ts) AS BIGINT) AS t_ms,
             CASE WHEN event_type = 'click' THEN 600000 ELSE 1800000 END AS gap_ms
      FROM events),
    marked AS (
      SELECT user_id, event_id, t_ms, gap_ms,
             CASE WHEN t_ms >= MAX(t_ms + gap_ms) OVER
                    (PARTITION BY user_id ORDER BY t_ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(t_ms + gap_ms) OVER
                    (PARTITION BY user_id ORDER BY t_ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM base),
    sess AS (
      SELECT user_id, event_id, t_ms, gap_ms,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY t_ms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(t_ms) AS BIGINT) AS session_start_ms,
           CAST(MAX(t_ms + gap_ms) AS BIGINT) AS session_end_ms
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    group="streaming",
    doc="Session windows with a DYNAMIC per-event gap (clicks time out "
    "after 10 min, other events after 30 — Flink's dynamic session "
    "gap extractor; Spark's session_window also accepts the gap "
    "expression, see the streaming twin parity test). Batch semantics: "
    "merge overlapping [t, t+gap) intervals per key — an event opens a "
    "new session iff it starts at/after the running max end of all "
    "prior intervals. One user_id-partitioned window chain, shuffle "
    "shared across the mark/cumsum/aggregate stages.",
)
def events_sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    t_ms = F.unix_millis("ts")
    gap_ms = F.when(F.col("event_type") == "click", 600_000).otherwise(1_800_000)
    base = e.select(
        "user_id",
        "event_id",
        t_ms.alias("t_ms"),
        gap_ms.alias("gap_ms"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("t_ms") + F.col("gap_ms")).over(w_prev)
    marked = base.withColumn(
        "new_session",
        F.when(prev_end.isNull() | (F.col("t_ms") >= prev_end), 1).otherwise(0),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(w_run))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("t_ms").cast("bigint").alias("session_start_ms"),
            F.max(F.col("t_ms") + F.col("gap_ms")).cast("bigint").alias("session_end_ms"),
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
    "events_window_tumbling_offset",
    """
    SELECT CAST(FLOOR((epoch_ms(ts) - 28800000) / 86400000) * 86400000
                + 28800000 AS BIGINT) AS window_start_ms,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                / 100 AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY window_start_ms
    """,
    group="streaming",
    doc="Tumbling 1-day window with an 8h alignment OFFSET (Flink "
    "TUMBLE(..., INTERVAL '8' HOUR) / Spark window(ts, '1 day', "
    "startTime='8 hours')): day boundaries at 08:00 UTC, the business-"
    "day rollup for a non-UTC timezone. Same single map-side-combined "
    "aggregate as the unaligned form.",
)
def events_window_tumbling_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        e.groupBy(F.window("ts", "1 day", "1 day", "8 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents).cast("double") / 100).cast("double").alias("total_value"),
        )
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), "n", "total_value")
        .orderBy("window_start_ms")
    )


@register(
    "events_windowed_join",
    """
    WITH v AS (
      SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_views
      FROM events WHERE event_type = 'view' GROUP BY 1),
    p AS (
      SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                  / 100 AS DOUBLE) AS revenue
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT COALESCE(v.w, p.w) AS window_start_ms,
           CAST(COALESCE(n_views, 0) AS BIGINT) AS n_views,
           CAST(COALESCE(n_purchases, 0) AS BIGINT) AS n_purchases,
           CAST(COALESCE(revenue, 0.0) AS DOUBLE) AS revenue
    FROM v FULL OUTER JOIN p ON v.w = p.w
    ORDER BY window_start_ms
    """,
    group="streaming",
    doc="WINDOW JOIN (Flink 1.14 TVF): two per-window aggregates — "
    "views and purchase revenue per tumbling hour — full-outer joined "
    "on the window bound. Each side collapses to |windows| rows before "
    "the join, so the join input is bounded by the time range "
    "regardless of event volume; in streaming both sides share one "
    "watermark and the join key is the window struct.",
)
def events_windowed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = F.unix_millis(F.window("ts", "1 hour").getField("start")).alias("w")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy(F.window("ts", "1 hour").alias("wd"))
        .agg(F.count(F.lit(1)).alias("n_views"))
        .select(F.unix_millis("wd.start").alias("w"), "n_views")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour").alias("wd"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum(cents).cast("double") / 100).cast("double").alias("revenue"),
        )
        .select(F.unix_millis("wd.start").alias("w"), "n_purchases", "revenue")
    )
    return (
        v.join(p, "w", "full_outer")
        .select(
            F.col("w").alias("window_start_ms"),
            F.coalesce("n_views", F.lit(0)).cast("bigint").alias("n_views"),
            F.coalesce("n_purchases", F.lit(0)).cast("bigint").alias("n_purchases"),
            F.coalesce("revenue", F.lit(0.0)).cast("double").alias("revenue"),
        )
        .orderBy("window_start_ms")
    )
