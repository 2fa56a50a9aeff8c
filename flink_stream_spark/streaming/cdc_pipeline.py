"""Streaming CDC apply: Debezium envelope stream → routed keyed MERGE.

The Spark rebuild of the reference's Connect sink pipeline
(kafka/config/connect-iceberg-sink.json): consume ``cdc.*`` envelope
records, flatten (DebeziumTransform SMT equivalent), route each
record to its target table by source table name (``_cdc.target``
pattern, :10-12), auto-create/evolve tables (:13-14), and apply
I/U/D with per-table upsert keys (:28-29), committing per trigger
(:15-16 commit interval/timeout ≙ trigger + checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_stream_spark.cdc.envelope import apply_cdc_batch, parse_envelopes, route_tables
from flink_stream_spark.tables.managed import Warehouse


def start_cdc_pipeline(
    spark: SparkSession,
    source_dir: str,
    warehouse: Warehouse,
    row_schemas: dict[str, T.StructType],
    table_keys: dict[str, list[str]],
    checkpoint_dir: str,
    trigger_seconds: int = 10,
    table_suffix: str = "_postgres",
):
    """One streaming query fans envelopes out to N managed tables.

    ``row_schemas``/``table_keys`` mirror the sink's per-table config
    (``iceberg.tables.*.id-columns``). Target naming follows the
    reference's route pattern ``cdc.{table}_postgres``.
    """
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(source_dir)
        .withColumnRenamed("value", "raw")
    )

    # the union row schema parses every table's envelope; per-table
    # columns are projected at apply time
    def _apply(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        try:
            for src_table, schema in row_schemas.items():
                changes = parse_envelopes(batch, schema, value_col="raw").filter(
                    F.col("_table") == src_table
                )
                if changes.isEmpty():
                    continue
                keys = table_keys[src_table]
                target = warehouse.table(f"{src_table}{table_suffix}", keys)
                apply_cdc_batch(target, changes, keys)
        finally:
            batch.unpersist()

    return (
        raw.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def replay_cdc_batch(
    spark: SparkSession,
    envelopes: DataFrame,
    warehouse: Warehouse,
    row_schemas: dict[str, T.StructType],
    table_keys: dict[str, list[str]],
    table_suffix: str = "_postgres",
) -> dict[str, int]:
    """Batch-mode replay of an envelope log (the oracle-checkable path:
    FIXTURES A4 applies the same log as sequential DML in DuckDB)."""
    versions: dict[str, int] = {}
    for src_table, schema in row_schemas.items():
        changes = parse_envelopes(envelopes, schema, value_col="raw").filter(
            F.col("_table") == src_table
        )
        if changes.isEmpty():
            continue
        keys = table_keys[src_table]
        target = warehouse.table(f"{src_table}{table_suffix}", keys)
        versions[src_table] = apply_cdc_batch(target, changes, keys)
    return versions
