"""Remaining SURVEY §2 coverage: reference verification-query mirrors,
stream-static enrichment, approximate sketches."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.registry import register


@register(
    "scan_full_orderby",
    """
    SELECT c_custkey AS user_id, c_name AS email
    FROM customer ORDER BY user_id
    """,
    group="scan",
    doc="Full scan + ORDER BY key — the reference's Postgres-side "
    "verification query (test_cdc.py:131-132).",
)
def scan_full_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("email")
    ).orderBy("user_id")


@register(
    "scan_recent_topn",
    """
    SELECT event_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type
    FROM events ORDER BY ts DESC, event_id LIMIT 10
    """,
    group="scan",
    doc="ORDER BY ts DESC LIMIT 10 — the reference's Trino "
    "verification query (README.md:177-178); TakeOrderedAndProject, "
    "no global sort.",
)
def scan_recent_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", F.unix_millis("ts").alias("ts_ms"), "event_type")
        .orderBy(F.col("ts_ms").desc(), "event_id")
        .limit(10)
    )


@register(
    "events_enrich_static_join",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
           CAST(e.value AS DOUBLE) AS value
    FROM events e JOIN customer c ON e.user_id + 1 = c.c_custkey
    ORDER BY e.event_id
    """,
    group="streaming",
    doc="Stream-static enrichment join (batch twin): the unbounded side "
    "joins a broadcast dim — at scale the stream never shuffles.",
)
def events_enrich_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id + 1 == c.c_custkey)
        .select(
            "event_id",
            "user_id",
            F.col("c_mktsegment").alias("segment"),
            F.col("value").cast("double").alias("value"),
        )
        .orderBy("event_id")
    )


@register(
    "agg_percentile_approx",
    None,  # sketch-based: rows-only (error contract, not hash equality)
    group="aggregation",
    doc="approx percentile sketch (KLL/GK family) — the scale path for "
    "quantiles; exact quantile needs a global sort at 100 TB.",
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
                "price_pcts"
            )
        )
        .orderBy("l_returnflag")
    )
