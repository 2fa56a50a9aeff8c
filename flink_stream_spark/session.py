"""SparkSession factory tuned for this engine.

Defaults target the test harness (local[N], single JVM) but every
setting is chosen to survive a real cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), UTC session timezone
(deterministic timestamp semantics vs the DuckDB oracle), Arrow for
the Pandas-UDF slow path, and shuffle partitions sized by env rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "flink_stream_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    cpus defaults to $SPARK_GRAFT_CPUS (driver contract) else 32.
    On a real cluster the master/shuffle settings are supplied by
    spark-submit and these local-mode defaults are simply overridden.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # deterministic parquet-ns handling: keep NTZ inference off so all
        # timestamp columns come back as session-TZ (UTC) TimestampType,
        # matching DuckDB's naive-UTC reading of the same files.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # INT96 (the legacy default) carries NO parquet min/max stats,
        # which silently disables every timestamp zone map / row-group
        # skip; MICROS is the modern type DuckDB reads identically
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.warehouse.dir", "/tmp/flink_stream_spark/warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
