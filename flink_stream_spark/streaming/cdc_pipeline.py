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

import logging
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_stream_spark.cdc.envelope import apply_cdc_batch, parse_envelopes
from flink_stream_spark.tables.managed import Warehouse


# names a drift column may never take: the envelope metadata columns
# parse_envelopes appends — a colliding drift column would make the
# very next F.col() reference ambiguous and crash the query
_RESERVED_DRIFT = {"_op", "_table", "_lsn", "_ts_ms", "__t"}

_LOG = logging.getLogger(__name__)


def _drift_fields(
    subset: DataFrame,
    declared: "T.StructType",
    value_col: str = "raw",
    existing: "T.StructType | None" = None,
    max_new_fields: int = 32,
) -> list[str]:
    """Schema drift: payload.after keys present in this batch but
    absent from the declared row schema (the sink's
    ``evolve-schema-enabled`` behavior, connect-iceberg-sink.json:13).
    One JVM-side distinct aggregate over json_object_keys — no
    sampling, no RDD; the driver receives only the distinct new key
    NAMES (bounded by schema width).

    Excluded, because each would otherwise crash or pollute the query:
    non-identifier keys (cannot be columns), CDC metadata names and
    CASE-variants of declared columns OR of the target table's current
    manifest columns (``existing`` — a column evolved in an EARLIER
    batch; Spark resolution is case-insensitive, so a drift column
    ``Email`` next to an existing ``email`` is an
    AMBIGUOUS_REFERENCE), mutual case-variants inside ONE batch (only
    the sorted-first spelling is admitted — admitting both would
    commit a manifest with case-duplicate columns and poison every
    subsequent read), and keys appearing only in op-less envelopes
    (parse_envelopes drops those rows, so their keys must not evolve
    the table).

    ``max_new_fields`` bounds drift per batch: one buggy or hostile
    producer carrying thousands of distinct payload keys must not
    evolve thousands of irreversible columns into the managed table.
    Overflow keys are logged and dropped this batch (dead-letter-style
    visibility, no evolution)."""
    taken = {f.name.lower() for f in declared.fields} | {
        n.lower() for n in _RESERVED_DRIFT
    }
    if existing is not None:
        taken |= {f.name.lower() for f in existing.fields}
    rows = (
        subset.filter(
            F.get_json_object(F.col(value_col), "$.payload.op").isNotNull()
        )
        .select(
            F.explode_outer(
                F.json_object_keys(
                    F.get_json_object(F.col(value_col), "$.payload.after")
                )
            ).alias("k")
        )
        .filter(F.col("k").isNotNull())
        .distinct()
        .collect()
    )
    admitted: list[str] = []
    seen_ci: set[str] = set()
    for k in sorted(r["k"] for r in rows):
        lk = k.lower()
        if lk in taken or lk in seen_ci:
            continue
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", k):
            continue
        seen_ci.add(lk)
        admitted.append(k)
    if len(admitted) > max_new_fields:
        _LOG.warning(
            "drift overflow: %d new payload keys in one batch, admitting "
            "first %d (sorted); dropped: %s",
            len(admitted),
            max_new_fields,
            admitted[max_new_fields:],
        )
        admitted = admitted[:max_new_fields]
    return admitted


def _route(batch: DataFrame, value_col: str = "raw") -> DataFrame:
    """One cheap pass tags each envelope with its source table; the
    full typed parse then runs per table on ONLY that table's rows
    (the union-schema alternative would still be one from_json per
    row, but every per-table parse here touches a disjoint subset
    instead of re-parsing the whole batch N times)."""
    return batch.withColumn(
        "__t", F.get_json_object(F.col(value_col), "$.payload.source.table")
    )


def start_cdc_pipeline(
    spark: SparkSession,
    source_dir: str,
    warehouse: Warehouse,
    row_schemas: dict[str, T.StructType],
    table_keys: dict[str, list[str]],
    checkpoint_dir: str,
    trigger_seconds: int = 10,
    table_suffix: str = "_postgres",
    evolve_new_fields: bool = True,
):
    """One streaming query fans envelopes out to N managed tables.

    ``row_schemas``/``table_keys`` mirror the sink's per-table config
    (``iceberg.tables.*.id-columns``). Target naming follows the
    reference's route pattern ``cdc.{table}_postgres``.
    ``evolve_new_fields``: mid-stream payload fields absent from the
    declared schema become string-typed evolved columns (the sink's
    ``evolve-schema-enabled``); pass False for strict declared-schema
    parsing.
    """
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(source_dir)
        .withColumnRenamed("value", "raw")
    )

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        batch = _route(batch).persist()
        try:
            for src_table, schema in row_schemas.items():
                subset = batch.filter(F.col("__t") == src_table)
                if subset.isEmpty():
                    continue  # no drift scan / parse for untouched tables
                # mid-stream schema drift: new payload fields surface
                # as STRING columns and the managed table evolves on
                # merge (old rows read NULL) — the sink's
                # evolve-schema-enabled contract. The target's CURRENT
                # manifest schema joins the exclusion set so a
                # case-variant of a column evolved in an earlier batch
                # can never re-enter as a duplicate column.
                keys = table_keys[src_table]
                target = warehouse.table(f"{src_table}{table_suffix}", keys)
                drift = (
                    _drift_fields(subset, schema, existing=target.current_schema())
                    if evolve_new_fields
                    else []
                )
                changes = parse_envelopes(
                    subset, schema, value_col="raw", extra_string_fields=drift
                )
                if changes.isEmpty():
                    continue
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
    evolve_new_fields: bool = True,
) -> dict[str, int]:
    """Batch-mode replay of an envelope log (the oracle-checkable path:
    FIXTURES A4 applies the same log as sequential DML in DuckDB).
    Applies the SAME drift evolution as the streaming pipeline, so a
    replay of a drifting log yields the identical table schema and
    content as streaming it."""
    versions: dict[str, int] = {}
    routed = _route(envelopes)
    for src_table, schema in row_schemas.items():
        subset = routed.filter(F.col("__t") == src_table)
        keys = table_keys[src_table]
        target = warehouse.table(f"{src_table}{table_suffix}", keys)
        drift = (
            _drift_fields(subset, schema, existing=target.current_schema())
            if evolve_new_fields
            else []
        )
        changes = parse_envelopes(
            subset, schema, value_col="raw", extra_string_fields=drift
        )
        if changes.isEmpty():
            continue
        versions[src_table] = apply_cdc_batch(target, changes, keys)
    return versions
