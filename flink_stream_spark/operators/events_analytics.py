"""Product-analytics operators over the `events` stream table.

The reference's query layer is delegated to Flink SQL / Trino
(reference: README.md:175-179); these are the event-stream analytics
a user of that layer runs daily — funnels, retention cohorts,
time-weighted rollups, exponential smoothing — re-expressed as
Catalyst-optimizable DataFrame plans.

Scale posture shared by every query here: all shuffles hash on
`user_id` (or the small `event_type` domain), aggregates combine
map-side, and chained groupBy/join stages reuse the same hash
partitioning so AQE collapses adjacent exchanges. Nothing collects
to the driver; per-key state (the EWMA fold list) is bounded by
single-key cardinality, the same bound a streaming stateful operator
would hold in its state store.
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
    "events_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS ts_v FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS ts_c
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.ts_v
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS ts_p
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ts_c
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS users_click_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS users_purchase_after_click
    """,
    group="events-analytics",
    doc="Ordered conversion funnel (view -> click -> purchase): each "
    "stage keeps users whose stage event strictly follows their first "
    "event of the previous stage. Three user_id-hashed min-aggregates "
    "chained by key-aligned joins — AQE reuses one partitioning across "
    "all stages; stage outputs are one row per user, so the final "
    "counts are tiny global aggregates.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_v"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("ts_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_c"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ts_c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_p"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("users_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("users_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("users_purchase_after_click")))
    )


@register(
    "events_retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT CAST(epoch_ms(cohort) AS BIGINT) AS cohort_week_ms,
           CAST((epoch_ms(wk) - epoch_ms(cohort)) // 604800000 AS BIGINT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_week_ms, week_offset
    """,
    group="events-analytics",
    doc="Retention cohort matrix: users grouped by the ISO week of "
    "their first event, counted in each subsequent active week. "
    "first-seen and distinct-activity both hash on user_id (one "
    "shuffle partitioning reused); the cohort matrix itself is "
    "weeks x weeks — tiny at any corpus size. Week offsets are exact "
    "epoch-millisecond integer arithmetic on Monday-truncated weeks "
    "(Spark and DuckDB both truncate to Monday).",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = e.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    cohort_ms = F.unix_millis("cohort")
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            cohort_ms.alias("cohort_week_ms"),
            F.floor((F.unix_millis("wk") - cohort_ms) / 604800000)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week_ms", "week_offset")
    )


@register(
    "events_time_weighted_avg",
    """
    WITH o AS (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(ROUND(CAST(SUM(cents * (nxt_us - t_us)) AS DOUBLE)
                      / SUM(nxt_us - t_us) / 100, 6) AS DOUBLE) AS twa_value
    FROM o WHERE nxt_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    group="events-analytics",
    doc="Time-weighted average of the value series per user: each "
    "reading is weighted by the microseconds until the next reading "
    "(last reading carries no weight). Weights and values stay exact "
    "integers (cents x microsecond durations, well inside int64) "
    "until the single final division, so partial-aggregation order "
    "cannot change the result. One window + one aggregate, both "
    "partitioned on user_id.",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros("ts")
    o = e.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    dur = F.col("nxt_us") - F.col("t_us")
    return (
        o.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(
                F.sum(F.col("cents") * dur).cast("double") / F.sum(dur) / 100, 6
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_ewma",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(list_reduce(list(value ORDER BY ts, event_id),
                                  (acc, x) -> 0.5 * x + 0.5 * acc), 6)
                AS DOUBLE) AS ewma_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    group="events-analytics",
    doc="Exponentially weighted moving average (alpha = 0.5) of each "
    "user's value series in event-time order, via an ordered "
    "collect + fold (aggregate lambda). Both engines execute the "
    "identical left fold over the identical IEEE-754 doubles, so the "
    "result is bitwise deterministic. The fold is the batch twin of a "
    "transformWithState streaming accumulator: state per key is one "
    "double, and the collected list is bounded by single-key "
    "cardinality (what a state store would hold anyway).",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.unix_micros("ts").alias("t"), "event_id", "value"))
    )
    vals = F.transform(ordered, lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(ewma, 6).alias("ewma_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_rolling_distinct",
    """
    SELECT user_id, event_id,
           CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
           CAST(len(list_distinct(list(event_type) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)))
                AS INTEGER) AS distinct_types_10
    FROM events
    ORDER BY user_id, ts_ms, event_id
    """,
    group="events-analytics",
    doc="Rolling distinct-count over a 10-row event-time frame per "
    "user (behavioral diversity signal): collect_list over the frame "
    "+ array_distinct. The frame bounds state to 10 elements per row "
    "regardless of corpus size; partitioning is the user_id hash "
    "every other events operator already uses.",
)
def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, W.currentRow)
    return (
        e.select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            F.size(F.array_distinct(F.collect_list("event_type").over(w)))
            .cast("int")
            .alias("distinct_types_10"),
        )
        .orderBy("user_id", "ts_ms", "event_id")
    )


@register(
    "events_topk_per_window",
    """
    WITH w AS (
      SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS window_start_ms,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start_ms
                                   ORDER BY n DESC, event_type) AS rnk
      FROM w)
    SELECT window_start_ms, event_type, n, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    ORDER BY window_start_ms, rnk
    """,
    group="events-analytics",
    doc="Trending items: top-3 event types per tumbling hour by count "
    "— the batch twin of a streaming windowed top-k. The count "
    "aggregate combines map-side into |windows|x|types| rows, and the "
    "per-window rank runs as WindowGroupLimit over that bounded "
    "table; the raw event stream is touched by exactly one scan.",
)
def events_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    counts = e.groupBy(
        F.unix_millis(F.date_trunc("hour", "ts")).alias("window_start_ms"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("window_start_ms").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .orderBy("window_start_ms", "rnk")
    )


@register(
    "events_top_paths",
    """
    WITH seqs AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id),
    grams AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(s) - 2, 0)),
               i -> s[i] || '>' || s[i+1] || '>' || s[i+2])) AS path
      FROM seqs)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 20
    """,
    group="events-analytics",
    doc="Behavioral path mining: the 20 most common 3-step event "
    "sequences across all users (view>click>purchase and friends) — "
    "the funnel-discovery query that precedes defining a funnel. Per-"
    "user sequences collect on the user_id hash (bounded by per-user "
    "cardinality, the same state a sessionizer holds); the trigram "
    "count aggregates map-side into the tiny |event_type|^3 domain.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.unix_micros("ts").alias("t"), "event_id", "event_type")
        )
    )
    types = F.transform(ordered, lambda s: s["event_type"])
    seqs = e.groupBy("user_id").agg(types.alias("s"))
    n = F.size("s")
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), (n - 3).cast("int")),
            lambda i: F.concat_ws(
                ">", F.get("s", i), F.get("s", i + 1), F.get("s", i + 2)
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    return (
        seqs.select(F.explode_outer(grams).alias("path"))
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@register(
    "events_multires_rollup",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             COUNT(*) AS n,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2)
    SELECT CAST(epoch_ms(date_trunc('day', h)) AS BIGINT) AS day_ms,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(cents) / 100.0 AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM hourly
    GROUP BY 1, 2
    ORDER BY day_ms, event_type
    """,
    group="events-analytics",
    doc="Multi-resolution rollup (hypertable continuous-aggregate "
    "pattern): the daily aggregate is derived from the HOURLY "
    "partials, not from raw events — counts and exact integer cent "
    "sums re-aggregate losslessly. At 100 TB the hourly table is the "
    "materialized rollup a pipeline maintains incrementally; daily/"
    "weekly/monthly views re-aggregate |hours|x|types| rows instead "
    "of rescanning the raw stream. n_hours audits rollup coverage.",
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("cents"),
    )
    return (
        hourly.groupBy(
            F.unix_millis(F.date_trunc("day", "h")).alias("day_ms"), "event_type"
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            (F.sum("cents") / 100.0).cast("double").alias("total_value"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .orderBy("day_ms", "event_type")
    )


@register(
    "events_anomaly_zscore",
    """
    WITH c AS (
      SELECT user_id, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    stats AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(cents AS HUGEINT)) AS s1,
             SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
      FROM c GROUP BY user_id)
    SELECT c.user_id, c.event_id,
           CAST(ROUND(CAST(CAST(s.n AS HUGEINT) * c.cents - s.s1 AS DOUBLE)
                      / sqrt(CAST(CAST(s.n AS HUGEINT) * s.s2 - s.s1 * s.s1 AS DOUBLE)), 6)
                AS DOUBLE) AS zscore
    FROM c JOIN stats s USING (user_id)
    WHERE s.n >= 5
      AND (CAST(s.n AS HUGEINT) * c.cents - s.s1)
          * (CAST(s.n AS HUGEINT) * c.cents - s.s1)
          > 4 * (CAST(s.n AS HUGEINT) * s.s2 - s.s1 * s.s1)
    ORDER BY c.user_id, c.event_id
    """,
    group="events-analytics",
    doc="Per-user anomaly flagging: events whose value deviates more "
    "than 2 population standard deviations from that user's mean. The "
    "|z| > 2 test is cleared of all division and square roots — "
    "(n*c - S1)^2 > 4*(n*S2 - S1^2) in exact integer arithmetic "
    "(widened to decimal/hugeint for the squares) — so the flag set "
    "is bit-deterministic under any aggregation order; the reported "
    "z-score converts the same exact integers to double once. One "
    "user_id-hashed aggregate joined back to the events (same key, "
    "partitioning reused).",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    c = e.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    # widen BEFORE any multiply: cents/sums are exact integers, and the
    # s1*s1 / sum(cents^2) products wrap int64 for a user with ~3e9
    # total cents (~$30M) — decimal(38,0) on this side, HUGEINT on the
    # oracle side, keep every product exact to ~1e19-magnitude devs
    # (far past any real per-user money volume; DuckDB then fails
    # loudly rather than either engine dropping rows)
    cd = F.col("cents").cast("decimal(38,0)")
    stats = c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cd).alias("s1"),
        F.sum(cd * cd).alias("s2"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    dev = nd * cd - F.col("s1")  # n * (c - mean), exact
    var_n2 = nd * F.col("s2") - F.col("s1") * F.col("s1")  # n^2 * var
    wide = F.col("dev")
    return (
        c.join(stats, "user_id")
        .withColumn("dev", dev)
        .withColumn("var_n2", var_n2)
        .filter(
            (F.col("n") >= 5)
            & (wide * wide > F.lit(4).cast("decimal(38,0)") * F.col("var_n2"))
        )
        .select(
            "user_id",
            "event_id",
            F.round(
                F.col("dev").cast("double") / F.sqrt(F.col("var_n2").cast("double")), 6
            ).alias("zscore"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "events_markov_transitions",
    """
    WITH pairs AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    counted AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
           CAST((1000000 * n) // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS prob_ppm
    FROM counted
    ORDER BY from_type, to_type
    """,
    group="events-analytics",
    doc="First-order Markov transition matrix over per-user event-type "
    "sequences: LEAD pairing inside the user_id partition, then a "
    "map-side-combining count whose key space is |types|^2 (bounded, "
    "tiny shuffle at any scale). Row-normalized probabilities emitted "
    "as integer ppm so both engines divide exactly.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counted = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    row_total = F.sum("n").over(W.partitionBy("from_type"))
    return (
        counted.withColumn("row_total", row_total)
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("(1000000 * n) div row_total").cast("bigint").alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "events_throttle_per_key_window",
    """
    WITH ranked AS (
      SELECT user_id, event_id, event_type,
             CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS hour_ms,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT)
               ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT user_id, hour_ms, event_id, event_type
    FROM ranked WHERE rn <= 3
    ORDER BY user_id, hour_ms, event_id
    """,
    group="events-analytics",
    doc="Per-key rate limiting: keep the first 3 events per (user, "
    "hour) — the quota/throttle stage a crawl-ingest pipeline applies "
    "before enrichment. One window inside the (user, hour) partition; "
    "row_number short-circuits per group, state is O(1) per key-window "
    "(streaming twin: the dedup-N pattern under watermark).",
)
def events_throttle_per_key_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    hour_ms = (F.floor(F.unix_millis("ts") / 3_600_000) * 3_600_000).cast("bigint")
    w = W.partitionBy("user_id", hour_ms).orderBy("ts", "event_id")
    return (
        e.withColumn("hour_ms", hour_ms)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "hour_ms", "event_id", "event_type")
        .orderBy("user_id", "hour_ms", "event_id")
    )


@register(
    "events_match_recognize",
    """
    WITH base AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_ms(ts) AS BIGINT) AS t_ms,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    seq AS (
      SELECT *,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER (w ROWS UNBOUNDED PRECEDING) AS click_run,
             MAX(CASE WHEN event_type = 'view' THEN rn END)
               OVER (w ROWS UNBOUNDED PRECEDING) AS lv_rn
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
    p AS (SELECT * FROM seq WHERE event_type = 'purchase' AND lv_rn IS NOT NULL)
    SELECT p.user_id,
           v.event_id AS view_event_id,
           p.event_id AS purchase_event_id,
           CAST(p.click_run - v.click_run AS BIGINT) AS n_clicks,
           CAST(p.t_ms - v.t_ms AS BIGINT) AS duration_ms
    FROM p JOIN seq v ON v.user_id = p.user_id AND v.rn = p.lv_rn
    WHERE p.click_run - v.click_run >= 1
      AND p.t_ms - v.t_ms <= 86400000
    ORDER BY p.user_id, purchase_event_id
    """,
    group="events-analytics",
    doc="MATCH_RECOGNIZE-style CEP (Flink SQL's pattern matching, which "
    "Spark lacks natively): pattern view ~> click+ ~> purchase with "
    "relaxed contiguity (Flink followedBy) within 24 hours, compiled "
    "to window functions — running row numbers, a latest-view marker, "
    "and a click prefix sum turn the pattern test into O(1) arithmetic "
    "per purchase. Every window and the "
    "match join share the user_id partitioning (one shuffle); no "
    "per-row state machine, no UDF. Match policy: each purchase pairs "
    "with the latest qualifying view (at most one match per purchase, "
    "deterministic).",
)
def events_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # rn IS the (ts, event_id) total order, so the prefix windows can
    # order by it after ts is projected away
    wp = (
        W.partitionBy("user_id").orderBy("rn").rowsBetween(W.unboundedPreceding, 0)
    )
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("t_ms"),
        F.row_number().over(w).alias("rn"),
    ).select(
        "*",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(wp)
        .alias("click_run"),
        F.max(F.when(F.col("event_type") == "view", F.col("rn")))
        .over(wp)
        .alias("lv_rn"),
    )
    p = seq.filter(
        (F.col("event_type") == "purchase") & F.col("lv_rn").isNotNull()
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("t_ms").alias("p_ms"),
        F.col("rn").alias("p_rn"),
        F.col("click_run").alias("p_cr"),
        "lv_rn",
    )
    v = seq.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event_id"),
        F.col("t_ms").alias("v_ms"),
        F.col("rn").alias("v_rn"),
        F.col("click_run").alias("v_cr"),
    )
    return (
        p.join(v, (F.col("p_user") == F.col("v_user")) & (F.col("lv_rn") == F.col("v_rn")))
        .filter(
            (F.col("p_cr") - F.col("v_cr") >= 1)
            & (F.col("p_ms") - F.col("v_ms") <= 86_400_000)
        )
        .select(
            F.col("p_user").alias("user_id"),
            "view_event_id",
            "purchase_event_id",
            (F.col("p_cr") - F.col("v_cr")).cast("bigint").alias("n_clicks"),
            (F.col("p_ms") - F.col("v_ms")).cast("bigint").alias("duration_ms"),
        )
        .orderBy("user_id", "purchase_event_id")
    )


@register(
    "events_histogram_width_bucket",
    """
    WITH b AS (
      SELECT CASE WHEN value < 0 THEN 0
                  WHEN value >= 100 THEN 11
                  ELSE 1 + CAST(floor(value / 10) AS BIGINT) END AS bucket,
             value
      FROM events)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_total
    FROM b
    GROUP BY bucket
    ORDER BY bucket ASC NULLS FIRST
    """,
    group="events-analytics",
    doc="Fixed-bin value histogram via the width_bucket BUILTIN "
    "(bounds 0-100, 10 bins) with explicit under/overflow buckets 0 "
    "and 11 — the bounded-domain complement of events_value_histogram "
    "(which floor-bins an open domain per type); this form is what a "
    "monitoring layer uses when the metric has a contract range and "
    "out-of-range mass must be visible. The bucket id is a "
    "codegen'd arithmetic expression, so the whole histogram is one "
    "map-side-combined aggregate over ≤12 keys: shuffle volume is "
    "O(buckets), independent of row count — the 100 TB posture. Sums "
    "ride as exact cents (floor(v*100+0.5), the engine-wide money "
    "convention) so the hash is float-order-insensitive.",
)
def events_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        e.select(
            F.width_bucket(
                F.col("value"), F.lit(0.0), F.lit(100.0), F.lit(10)
            ).alias("bucket"),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("cents_total"),
        )
        .orderBy(F.col("bucket").asc_nulls_first())
    )


@register(
    "events_user_stickiness",
    """
    WITH daily AS (
      SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
             CAST(epoch_ms(date_trunc('month', ts)) AS BIGINT) AS month_ms,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY day_ms, month_ms),
    monthly AS (
      SELECT CAST(epoch_ms(date_trunc('month', ts)) AS BIGINT) AS month_ms,
             COUNT(DISTINCT user_id) AS mau
      FROM events GROUP BY month_ms)
    SELECT d.day_ms,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(m.mau AS BIGINT) AS mau,
           CAST((1000000 * d.dau) // m.mau AS BIGINT) AS stickiness_ppm
    FROM daily d JOIN monthly m ON d.month_ms = m.month_ms
    ORDER BY d.day_ms
    """,
    group="events-analytics",
    doc="DAU/MAU stickiness: daily distinct users over their month's "
    "distinct users, as exact integer ppm (1e6*dau div mau — no float "
    "division, bit-identical across engines). Two distinct-count "
    "aggregates on (day|month, user) then a broadcast-size join on the "
    "month (|months| rows). At 100 TB the distinct counts are the "
    "expensive part; both combine map-side as partial sets and the "
    "month table stays tiny, so shuffle volume is O(|users|/partition "
    "key), never raw events twice.",
)
def events_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    keyed = e.select(
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
        F.unix_millis(F.date_trunc("month", "ts")).alias("month_ms"),
        "user_id",
    )
    daily = keyed.groupBy("day_ms", "month_ms").agg(
        F.countDistinct("user_id").alias("dau")
    )
    monthly = keyed.groupBy("month_ms").agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        daily.join(F.broadcast(monthly), "month_ms")
        .select(
            "day_ms",
            F.col("dau").cast("bigint").alias("dau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.expr("(1000000 * dau) div mau").cast("bigint").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day_ms")
    )
