"""Oracle-checkable batch twins of the CDC/ingest pipeline.

These queries derive a deterministic change-stream from the `events`
fixture table and push it through the SAME library code the streaming
pipeline uses (raw_json_transform, last_per_key), so the driver's
DuckDB gate checks the semantics-carrying pieces of the reference
rebuild: JSON roundtrip extraction (A4/A32), null-filtering (A6),
last-per-key reduction and upsert/delete resolution (A9/A22/A27/A28).
The full ManagedTable MERGE/versioning path is exercised in
tests/test_cdc_tables.py (filesystem state, not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.cdc.envelope import last_per_key
from flink_stream_spark.operators.registry import register
from flink_stream_spark.streaming.ingest import JsonField, raw_json_transform


@register(
    "cdc_apply_final_state",
    """
    WITH ops AS (
      SELECT user_id, event_id, value,
             CASE event_type WHEN 'signup' THEN 'c'
                             WHEN 'error' THEN 'd'
                             ELSE 'u' END AS op
      FROM events),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM ops)
    SELECT user_id, event_id AS last_event_id,
           CAST(value AS DOUBLE) AS last_value
    FROM ranked WHERE rn = 1 AND op <> 'd'
    ORDER BY user_id
    """,
    group="cdc",
    doc="CDC I/U/D apply: events mapped to ops (signup=c, error=d, "
    "else=u) keyed by user_id; final state = last op per key, deletes "
    "remove the key — the reference's manual-script flow "
    "(postgres/scripts/manual/001-003*.sql) as one deterministic replay.",
)
def cdc_apply_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ops = e.select(
        "user_id",
        "event_id",
        "value",
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
    )
    final = last_per_key(ops, ["user_id"], ["event_id"])
    return (
        final.filter(F.col("op") != "d")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("value").cast("double").alias("last_value"),
        )
        .orderBy("user_id")
    )


@register(
    "ingest_raw_json_upsert",
    """
    WITH ranked AS (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_type AS last_type, CAST(value AS DOUBLE) AS last_value
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
    group="cdc",
    doc="The reference's whole ingest program as one batch plan "
    "(flink_json_to_iceberg.py:110-120): rows → JSON strings (A32 "
    "producer) → JSON_VALUE extraction + CAST (A4/A5) → NULL filter "
    "(A6) → keyed upsert last-wins (A9). Runs through the identical "
    "raw_json_transform/last_per_key code the streaming job uses.",
)
def ingest_raw_json_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    raw = e.select(
        F.to_json(F.struct("user_id", "event_type", "value", "event_id")).alias("raw_data")
    )
    typed = raw_json_transform(
        raw,
        fields=[
            JsonField("user_id", "$.user_id", "bigint"),
            JsonField("event_type", "$.event_type", "string"),
            JsonField("value", "$.value", "double"),
            JsonField("event_id", "$.event_id", "bigint"),
        ],
        key="user_id",
        stamp_ts=False,  # ingest-time column excluded from hashes (FIXTURES A3)
    )
    final = last_per_key(typed, ["user_id"], ["event_id"])
    return final.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").cast("double").alias("last_value"),
    ).orderBy("user_id")


@register(
    "cdc_scd2_history",
    """
    WITH ops AS (
      SELECT user_id, event_id, value,
             CAST(epoch_ms(ts) AS BIGINT) AS t_ms,
             CASE event_type WHEN 'signup' THEN 'c'
                             WHEN 'error' THEN 'd'
                             ELSE 'u' END AS op
      FROM events),
    hist AS (
      SELECT user_id, event_id, value, op, t_ms AS valid_from_ms,
             LEAD(t_ms) OVER (PARTITION BY user_id
                              ORDER BY t_ms, event_id) AS valid_to_ms
      FROM ops)
    SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
           valid_from_ms, CAST(valid_to_ms AS BIGINT) AS valid_to_ms,
           (valid_to_ms IS NULL) AS is_current
    FROM hist WHERE op <> 'd'
    ORDER BY user_id, valid_from_ms, event_id
    """,
    group="cdc",
    doc="SCD2 / temporal-table materialization of the CDC stream: every "
    "non-delete op opens a key version valid until the next op's "
    "event time (deletes close the prior version without appearing). "
    "This is the batch form of Flink's versioned table — the state a "
    "FOR SYSTEM_TIME AS OF join reads. One LEAD window inside the "
    "key partition; shuffle only on user_id.",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    ops = e.select(
        "user_id",
        "event_id",
        "value",
        F.unix_millis("ts").alias("t_ms"),
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
    )
    w = W.partitionBy("user_id").orderBy("t_ms", "event_id")
    return (
        ops.withColumn("valid_to_ms", F.lead("t_ms").over(w).cast("bigint"))
        .filter(F.col("op") != "d")
        .select(
            "user_id",
            "event_id",
            F.col("value").cast("double").alias("value"),
            F.col("t_ms").alias("valid_from_ms"),
            "valid_to_ms",
            F.col("valid_to_ms").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_ms", "event_id")
    )


@register(
    "cdc_temporal_join",
    """
    WITH ops AS (
      SELECT user_id, event_id, value,
             CAST(epoch_ms(ts) AS BIGINT) AS t_ms,
             event_type,
             CASE event_type WHEN 'signup' THEN 'c'
                             WHEN 'error' THEN 'd'
                             ELSE 'u' END AS op
      FROM events),
    hist AS (
      SELECT user_id, event_id, value, op, t_ms AS valid_from_ms,
             LEAD(t_ms) OVER (PARTITION BY user_id
                              ORDER BY t_ms, event_id) AS valid_to_ms
      FROM ops),
    versions AS (SELECT * FROM hist WHERE op <> 'd'),
    probes AS (
      SELECT user_id, event_id AS probe_event_id, t_ms AS probe_ms
      FROM ops WHERE event_type = 'purchase')
    SELECT p.user_id, p.probe_event_id,
           v.event_id AS version_event_id,
           CAST(v.value AS DOUBLE) AS version_value
    FROM probes p
      JOIN versions v
        ON v.user_id = p.user_id
       AND v.valid_from_ms <= p.probe_ms
       AND (v.valid_to_ms IS NULL OR p.probe_ms < v.valid_to_ms)
    ORDER BY p.user_id, p.probe_event_id
    """,
    group="cdc",
    doc="Temporal join (Flink FOR SYSTEM_TIME AS OF): each purchase "
    "event joins the key version whose validity interval covers its "
    "event time — SCD2 interval containment, both sides pre-hashed on "
    "user_id so the range predicate evaluates inside the co-partitioned "
    "join (no cross product; at most one version matches per probe). "
    "A purchase AT the version's own timestamp sees that version "
    "(inclusive start, exclusive end), matching Flink's semantics.",
)
def cdc_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    ops = e.select(
        "user_id",
        "event_id",
        "value",
        F.unix_millis("ts").alias("t_ms"),
        "event_type",
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
    )
    w = W.partitionBy("user_id").orderBy("t_ms", "event_id")
    versions = (
        ops.withColumn("valid_to_ms", F.lead("t_ms").over(w).cast("bigint"))
        .filter(F.col("op") != "d")
        .select(
            "user_id",
            F.col("event_id").alias("version_event_id"),
            F.col("value").alias("vvalue"),
            F.col("t_ms").alias("valid_from_ms"),
            "valid_to_ms",
        )
    )
    probes = ops.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("probe_event_id"),
        F.col("t_ms").alias("probe_ms"),
    )
    return (
        probes.join(
            versions,
            (probes.user_id == versions.user_id)
            & (versions.valid_from_ms <= probes.probe_ms)
            & (versions.valid_to_ms.isNull() | (probes.probe_ms < versions.valid_to_ms)),
        )
        .select(
            probes.user_id,
            "probe_event_id",
            "version_event_id",
            F.col("vvalue").cast("double").alias("version_value"),
        )
        .orderBy("user_id", "probe_event_id")
    )
