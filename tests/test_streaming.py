"""Streaming-vs-batch parity + watermark semantics.

Every streaming operator must produce the same result as its batch
twin over a full replay (SURVEY §7), and late data beyond the
watermark must be dropped (tested by construction: ordered replay
with controlled lateness).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_stream_spark.operators.events import (
    events_sessionize,
    events_window_tumbling,
)
from flink_stream_spark.streaming.windows import (
    session_counts,
    stream_events,
    streaming_dedup,
    tumbling_counts,
)


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_tumbling_window_parity(spark, sf_small):
    s = stream_events(spark, sf_small)
    _run_to_memory(tumbling_counts(s), "t_tumble", "complete")
    got = {
        (r["window_start_ms"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    want = {
        (r["window_start_ms"], r["event_type"]): (r["n"], r["total_value"])
        for r in events_window_tumbling(spark, sf_small).collect()
    }
    assert got == want


def test_session_window_parity(spark, sf_small):
    s = stream_events(spark, sf_small)
    _run_to_memory(session_counts(s), "t_sess", "complete")
    got = sorted(
        (r["user_id"], r["session_start_ms"], r["n_events"])
        for r in spark.sql("SELECT * FROM t_sess").collect()
    )
    want = sorted(
        (r["user_id"], r["session_start_ms"], r["n_events"])
        for r in events_sessionize(spark, sf_small).collect()
    )
    assert got == want


def test_sliding_window_parity(spark, sf_small):
    from flink_stream_spark.operators.events import events_window_sliding

    s = stream_events(spark, sf_small)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), "n", "total_value")
    )
    _run_to_memory(agg, "t_slide", "complete")
    got = {
        r["window_start_ms"]: (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_slide").collect()
    }
    want = {
        r["window_start_ms"]: (r["n"], r["total_value"])
        for r in events_window_sliding(spark, sf_small).collect()
    }
    assert got == want


def test_streaming_dedup_counts(spark, sf_small):
    s = stream_events(spark, sf_small)
    _run_to_memory(streaming_dedup(s), "t_dedup", "append")
    n = spark.sql("SELECT COUNT(*) AS n FROM t_dedup").collect()[0]["n"]
    distinct_keys = (
        spark.read.parquet(f"{sf_small}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert n == distinct_keys


def test_stream_stream_interval_join_parity(spark, sf_small):
    """Watermarked stream-stream join (purchase ⋈ clicks, 10 min
    lookback) produces the same pairs as the batch interval join."""
    from flink_stream_spark.operators.misc import events_interval_join

    s = stream_events(spark, sf_small)
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
    ).select("purchase_id", "click_id")
    _run_to_memory(joined, "t_ssjoin", "append")
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM t_ssjoin").collect()
    )
    want = sorted(
        (r["purchase_id"], r["click_id"])
        for r in events_interval_join(spark, sf_small).collect()
    )
    assert got == want


def test_stateful_user_profiles(spark, sf_small):
    """applyInPandasWithState running profile: final per-user state
    equals the batch aggregate over the full replay."""
    from flink_stream_spark.streaming.stateful import user_profiles

    s = stream_events(spark, sf_small)
    q = (
        user_profiles(s)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # update mode may emit several rows per key (one per batch); the
    # last emitted row per key is the final state
    final = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_event_id"])
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY n_events DESC) rn FROM t_state) WHERE rn = 1"
        ).collect()
    }
    batch = spark.read.parquet(f"{sf_small}/events.parquet")
    want = {
        r["user_id"]: (r["n"], r["tv"], r["last"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
            F.max("event_id").alias("last"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for k in want:
        assert final[k][0] == want[k][0], k
        assert abs(final[k][1] - want[k][1]) < 0.05, k
        assert final[k][2] == want[k][2], k


def test_watermark_drops_late_data(spark, tmp_path):
    """Two ordered JSONL batches: batch 2 contains an event far older
    than watermark(10m) after batch 1 advanced event time — the late
    row must not create/extend any window in append output."""
    src = tmp_path / "stream"
    src.mkdir()

    def write_batch(fname, rows):
        with open(src / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write_batch(
        "b1.jsonl",
        [
            {"event_id": 1, "ts": "2024-01-01 10:05:00", "v": 1.0},
            {"event_id": 2, "ts": "2024-01-01 12:00:00", "v": 1.0},  # advances WM to 11:50
        ],
    )
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
        .select(
            F.get_json_object("value", "$.event_id").try_cast("long").alias("event_id"),
            F.get_json_object("value", "$.ts").try_cast("timestamp").alias("ts"),
            F.get_json_object("value", "$.v").try_cast("double").alias("v"),
        )
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = agg.writeStream.format("memory").queryName("t_late").outputMode("append").start()
    try:
        q.processAllAvailable()
        # batch 2: one in-time event + one very late event (08:10 < WM)
        write_batch(
            "b2.jsonl",
            [
                {"event_id": 3, "ts": "2024-01-01 08:10:00", "v": 1.0},  # LATE → dropped
                {"event_id": 4, "ts": "2024-01-01 14:00:00", "v": 1.0},  # advances WM further
            ],
        )
        q.processAllAvailable()
        # push watermark far ahead so all surviving windows close
        write_batch("b3.jsonl", [{"event_id": 5, "ts": "2024-01-01 23:00:00", "v": 1.0}])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["ws"].hour: r["n"] for r in spark.sql("SELECT * FROM t_late").collect()}
    assert rows.get(10) == 1  # 10:00 window has only event 1
    assert 8 not in rows  # late 08:10 event was dropped, no 08:00 window
    assert rows.get(12) == 1 and rows.get(14) == 1


def test_stateful_v2_user_type_profiles(spark, sf_small):
    """transformWithStateInPandas (ValueState + MapState): final
    per-(user, type) counts equal the batch aggregate over the replay.

    Skipped where google.protobuf is unavailable: Spark's
    TransformWithStateInPySpark driver worker serializes state schemas
    over protobuf, so the query cannot start without it (the
    applyInPandasWithState path in stateful.py has no such dependency
    and stays the tested fallback).
    """
    import pytest

    pytest.importorskip("google.protobuf")
    from flink_stream_spark.streaming.stateful_v2 import user_type_profiles

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        s = stream_events(spark, sf_small)
        q = (
            user_type_profiles(s)
            .writeStream.format("memory")
            .queryName("t_state_v2")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    final = {
        (r["user_id"], r["event_type"]): r["type_n"]
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type "
            "ORDER BY type_n DESC) rn FROM t_state_v2) WHERE rn = 1"
        ).collect()
    }
    batch = spark.read.parquet(f"{sf_small}/events.parquet")
    want = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in batch.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == want


def test_hourly_rollup_continuous_aggregate(spark, sf_small, tmp_path):
    """The incrementally-MERGEd hourly rollup table must equal the
    batch hourly aggregate after a full replay, and the daily view
    derived from it must equal events_multires_rollup."""
    from flink_stream_spark.operators.events_analytics import events_multires_rollup
    from flink_stream_spark.streaming.rollup import (
        daily_from_hourly,
        start_hourly_rollup,
    )
    from flink_stream_spark.tables.managed import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    table = wh.table("hourly_rollup", key_columns=["h_ms", "event_type"])
    q = start_hourly_rollup(
        spark, sf_small, table, str(tmp_path / "ckpt"), trigger_seconds=1
    )
    q.processAllAvailable()
    q.stop()

    hourly = table.read(spark)
    from flink_stream_spark.catalog import load_table

    e = load_table(spark, sf_small, "events")
    want_hourly = {
        (r["h_ms"], r["event_type"]): (r["n"], r["cents"])
        for r in e.groupBy(
            F.unix_millis(F.date_trunc("hour", "ts")).alias("h_ms"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("cents"),
        )
        .collect()
    }
    got_hourly = {
        (r["h_ms"], r["event_type"]): (r["n"], r["cents"]) for r in hourly.collect()
    }
    assert got_hourly == want_hourly

    got_daily = [
        (r["day_ms"], r["event_type"], r["n"], r["total_value"], r["n_hours"])
        for r in daily_from_hourly(hourly).collect()
    ]
    want_daily = [
        (r["day_ms"], r["event_type"], r["n"], r["total_value"], r["n_hours"])
        for r in events_multires_rollup(spark, sf_small).collect()
    ]
    assert got_daily == want_daily


def test_stream_static_join_parity(spark, sf_small):
    """Stream-static enrichment join (SURVEY §2C): the unbounded side
    joins a broadcast static dimension; aggregate parity vs batch."""
    static = spark.range(0, 100000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("cohort")
    )
    s = stream_events(spark, sf_small)
    agg = (
        s.join(F.broadcast(static), "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run_to_memory(agg, "t_ss_join", "complete")
    got = {
        r["cohort"]: r["n"] for r in spark.sql("SELECT * FROM t_ss_join").collect()
    }
    from flink_stream_spark.catalog import load_table

    want = {
        r["cohort"]: r["n"]
        for r in load_table(spark, sf_small, "events")
        .join(static, "user_id")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_cumulate_window_parity(spark, sf_small):
    from flink_stream_spark.streaming.windows import cumulate_counts
    from flink_stream_spark.operators.events import events_window_cumulate

    s = stream_events(spark, sf_small)
    _run_to_memory(cumulate_counts(s), "t_cumulate", "complete")
    got = {
        (r["window_start_ms"], r["window_end_ms"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_cumulate").collect()
    }
    want = {
        (r["window_start_ms"], r["window_end_ms"]): (r["n"], r["total_value"])
        for r in events_window_cumulate(spark, sf_small).collect()
    }
    assert got == want


def test_stream_stream_left_outer_join_parity(spark, sf_small, tmp_path):
    """Watermarked stream-stream LEFT OUTER interval join: unmatched
    purchases emit a null click once the watermark passes their join
    window. A flush record (ts = max + 1h) pushes the final watermark
    so tail-pending state drains (Spark's no-data micro-batch); the
    drained result must equal the batch left join."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T
    from flink_stream_spark.catalog import load_table, table_path

    # rewrite events at µs precision + a watermark-flush pair
    tbl = pq.read_table(table_path(sf_small, "events"))
    ts = tbl.column("ts").cast(pa.timestamp("us"))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    sdir = tmp_path / "stream"
    sdir.mkdir()
    pq.write_table(tbl, str(sdir / "ev_000.parquet"))
    max_ts = pa.compute.max(ts).as_py()
    import datetime

    flush_ts = max_ts + datetime.timedelta(hours=1)
    flush = pa.table(
        {
            "event_id": pa.array([-1, -2], pa.int64()),
            "ts": pa.array([flush_ts, flush_ts], pa.timestamp("us")),
            "user_id": pa.array([-1, -1], pa.int64()),
            "event_type": pa.array(["purchase", "click"]),
            "value": pa.array([0.0, 0.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(flush, str(sdir / "ev_001.parquet"))

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    s = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(sdir))
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
    )
    joined = purchases.join(clicks, cond, "left_outer").select(
        "purchase_id", "click_id"
    )
    _run_to_memory(joined, "t_ssjoin_lo", "append")
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in spark.sql(
            "SELECT * FROM t_ssjoin_lo WHERE purchase_id >= 0"
        ).collect()
    )

    e = load_table(spark, sf_small, "events")
    bp = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    bc = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = sorted(
        (r["purchase_id"], r["click_id"])
        for r in bp.join(bc, cond, "left_outer")
        .select("purchase_id", "click_id")
        .collect()
    )
    assert got == want

    # FULL OUTER over the same streams: unmatched rows on BOTH sides
    # must drain once the final watermark passes (clicks with no
    # purchase in their window emit a null purchase_id). Same flush
    # mechanism; flush rows (negative ids) are excluded from compare.
    full = purchases.join(clicks, cond, "full_outer").select(
        "purchase_id", "click_id"
    )
    _run_to_memory(full, "t_ssjoin_fo", "append")
    key = lambda t: (t[0] is None, t[0] or 0, t[1] is None, t[1] or 0)  # noqa: E731
    got_fo = sorted(
        [
            (r["purchase_id"], r["click_id"])
            for r in spark.sql(
                """SELECT * FROM t_ssjoin_fo
                   WHERE (purchase_id IS NULL OR purchase_id >= 0)
                     AND (click_id IS NULL OR click_id >= 0)"""
            ).collect()
        ],
        key=key,
    )
    want_fo = sorted(
        [
            (r["purchase_id"], r["click_id"])
            for r in bp.join(bc, cond, "full_outer")
            .select("purchase_id", "click_id")
            .collect()
        ],
        key=key,
    )
    assert got_fo == want_fo


def test_streaming_throttle_parity(spark, sf_small):
    """applyInPandasWithState quota operator: replaying the whole table
    admits exactly the batch query's first-3-per-(user,hour) set."""
    from flink_stream_spark.streaming.stateful import throttle_stream
    from flink_stream_spark.operators.events_analytics import (
        events_throttle_per_key_window,
    )

    s = stream_events(spark, sf_small)
    _run_to_memory(throttle_stream(s), "t_throttle", "append")
    got = sorted(
        (r["user_id"], r["hour_ms"], r["event_id"], r["event_type"])
        for r in spark.sql("SELECT * FROM t_throttle").collect()
    )
    want = sorted(
        (r["user_id"], r["hour_ms"], r["event_id"], r["event_type"])
        for r in events_throttle_per_key_window(spark, sf_small).collect()
    )
    assert got == want


def test_broadcast_state_rule_reconfiguration(spark, tmp_path):
    """Flink broadcast-state pattern: a rules-table commit between
    micro-batches changes routing of subsequent batches with no query
    restart (checkpoint resume), and earlier output is untouched."""
    import json as _json

    from flink_stream_spark.streaming.dynamic_rules import start_rule_routed_ingest
    from flink_stream_spark.tables.managed import ManagedTable

    src = tmp_path / "topic"
    src.mkdir()
    rules = ManagedTable(str(tmp_path / "wh"), "rules", ["event_type"])
    out = ManagedTable(str(tmp_path / "wh"), "routed", ["event_id"])
    ckpt = str(tmp_path / "ckpt")
    rules.merge(
        spark.createDataFrame(
            [("click", True, "engagement"), ("purchase", False, "revenue")],
            "event_type string, enabled boolean, label string",
        )
    )

    def stream():
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        return raw.select(
            F.get_json_object("value", "$.event_id").cast("long").alias("event_id"),
            F.get_json_object("value", "$.event_type").alias("event_type"),
        )

    def write_batch(fname, rows):
        with open(src / fname, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_batch(
        "b1.jsonl",
        [{"event_id": 1, "event_type": "click"},
         {"event_id": 2, "event_type": "purchase"}],
    )
    q = start_rule_routed_ingest(spark, stream(), rules, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got1 = {(r["event_id"], r["label"]) for r in out.read(spark).collect()}
    assert got1 == {(1, "engagement")}  # purchase rule disabled

    # reconfigure: enable purchase, disable click — no restart needed,
    # but we also restart from checkpoint to prove resume + new rules
    rules.merge(
        spark.createDataFrame(
            [("click", False, "engagement"), ("purchase", True, "revenue")],
            "event_type string, enabled boolean, label string",
        )
    )
    write_batch(
        "b2.jsonl",
        [{"event_id": 3, "event_type": "click"},
         {"event_id": 4, "event_type": "purchase"}],
    )
    q = start_rule_routed_ingest(spark, stream(), rules, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got2 = {(r["event_id"], r["label"]) for r in out.read(spark).collect()}
    assert got2 == {(1, "engagement"), (4, "revenue")}


def test_dynamic_gap_session_window_parity(spark, sf_small):
    """session_window with a PER-EVENT gap expression (Flink's dynamic
    session gap): streaming result equals the batch interval-merge
    twin on (user, start, end, count)."""
    from flink_stream_spark.operators.events import events_sessionize_dynamic_gap

    s = stream_events(spark, sf_small)
    gap = F.when(F.col("event_type") == "click", "10 minutes").otherwise(
        "30 minutes"
    )
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
        )
    )
    _run_to_memory(agg, "t_dynsess", "complete")
    got = sorted(
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.sql("SELECT * FROM t_dynsess").collect()
    )
    want = sorted(
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in events_sessionize_dynamic_gap(spark, sf_small).collect()
    )
    assert got == want


def test_ingest_observed_quality_metrics(spark, tmp_path):
    """observe() metrics ride the ingest scan: per-micro-batch row and
    malformed-drop counts appear in StreamingQueryProgress without an
    extra pass over the data."""
    import json as _json

    from flink_stream_spark.streaming.ingest import JsonField, start_raw_json_ingest
    from flink_stream_spark.tables.managed import ManagedTable

    src = tmp_path / "topic"
    src.mkdir()
    with open(src / "b1.jsonl", "w") as f:
        for i in range(8):
            f.write(_json.dumps({"user_id": i, "email": f"u{i}@x"}) + "\n")
        f.write('{"email": "nokey@x"}\n')  # malformed: key missing
        f.write("garbage line\n")          # malformed: not json

    t = ManagedTable(str(tmp_path / "wh"), "acct", ["user_id"])
    q = start_raw_json_ingest(
        spark,
        str(src),
        t,
        [JsonField("user_id", "$.user_id", "int"),
         JsonField("email", "$.email", "string")],
        key="user_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    metrics = {}
    for p in q.recentProgress:
        for name, row in (p.get("observedMetrics") or {}).items():
            if name.startswith("ingest_quality"):
                metrics = row
    q.stop()
    assert metrics["rows_in"] == 10 and metrics["rows_dropped"] == 2
    assert t.read(spark).count() == 8


def test_windowed_join_streaming_parity(spark, sf_small, tmp_path):
    """WINDOW JOIN on streams (Spark 3.4+ chained stateful operators:
    two watermarked windowed aggregates joined on the window): with a
    tail flush, the append-mode result equals the batch windowed join
    restricted to windows where both sides have rows."""
    import datetime
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T
    from flink_stream_spark.catalog import table_path
    from flink_stream_spark.operators.events import events_windowed_join

    tbl = pq.read_table(table_path(sf_small, "events"))
    ts = tbl.column("ts").cast(pa.timestamp("us"))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    sdir = tmp_path / "stream"
    sdir.mkdir()
    pq.write_table(tbl, str(sdir / "ev_000.parquet"))
    flush_ts = pa.compute.max(ts).as_py() + datetime.timedelta(hours=6)
    flush = pa.table(
        {
            "event_id": pa.array([-1, -2], pa.int64()),
            "ts": pa.array([flush_ts, flush_ts], pa.timestamp("us")),
            "user_id": pa.array([-1, -1], pa.int64()),
            "event_type": pa.array(["view", "purchase"]),
            "value": pa.array([0.0, 0.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(flush, str(sdir / "ev_001.parquet"))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    s = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(sdir))
    )
    v = (
        s.filter((F.col("event_type") == "view") & (F.col("event_id") >= 0))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("wd"))
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    p = (
        s.filter((F.col("event_type") == "purchase") & (F.col("event_id") >= 0))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("wd"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    j = v.join(p, "wd").select(
        F.unix_millis(F.col("wd.start")).alias("window_start_ms"),
        "n_views",
        "n_purchases",
    )
    _run_to_memory(j, "t_wjoin_par", "append")
    got = sorted(
        (r["window_start_ms"], r["n_views"], r["n_purchases"])
        for r in spark.sql("SELECT * FROM t_wjoin_par").collect()
    )
    want = sorted(
        (r["window_start_ms"], r["n_views"], r["n_purchases"])
        for r in events_windowed_join(spark, sf_small)
        .filter((F.col("n_views") > 0) & (F.col("n_purchases") > 0))
        .collect()
    )
    assert got == want


def test_cms_stream_matches_batch_cells(spark, sf_small):
    """The streaming CMS must converge to the identical D x W counter
    table the batch build produces over the same data — cell-wise
    mergeability is what makes the sketch a valid streaming state."""
    from flink_stream_spark.catalog import load_table
    from flink_stream_spark.operators.misc import (
        CMS_DEPTH,
        CMS_WIDTH,
        _cms_bucket_spark,
    )
    from flink_stream_spark.streaming.rollup import cms_cells_stream

    _run_to_memory(
        cms_cells_stream(stream_events(spark, sf_small)), "t_cms", "complete"
    )
    got = {
        (r["i"], r["b"]): r["c"] for r in spark.sql("SELECT * FROM t_cms").collect()
    }
    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                _cms_bucket_spark(F.lit(i), F.col("user_id")).alias("b"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    want = {
        (r["i"], r["b"]): r["c"]
        for r in load_table(spark, sf_small, "events")
        .select(F.explode(hashes).alias("h"))
        .groupBy(F.col("h.i").alias("i"), F.col("h.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want
    assert len(got) <= CMS_DEPTH * CMS_WIDTH  # bounded state, always
