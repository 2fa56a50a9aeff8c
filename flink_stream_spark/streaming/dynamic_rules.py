"""Broadcast-state pattern: a control table reconfigures a running
stream without restart.

Flink's BroadcastProcessFunction pairs a data stream with a broadcast
"rules" stream whose elements update every task's state. The
Spark-first equivalent: the rules live in a keyed ManagedTable (itself
fed by any CDC/upsert pipeline), and the data stream's ``foreachBatch``
re-reads the CURRENT committed rules snapshot at each micro-batch and
broadcast-joins it — a rule commit becomes effective at the next
trigger, no query restart. Because the rules read is a committed
snapshot, every partition of a batch sees the SAME rule set (no
torn-rule reads, the property Flink's broadcast state guarantees).

At 100 TB the rules table is KBs–MBs (it broadcasts); the data stream
never shuffles against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from flink_stream_spark.tables.managed import ManagedTable


def start_rule_routed_ingest(
    spark: SparkSession,
    events: DataFrame,
    rules_table: ManagedTable,
    out_table: ManagedTable,
    checkpoint_dir: str,
    rule_key: str = "event_type",
) -> StreamingQuery:
    """Keep only events whose ``rule_key`` value has an enabled rule in
    the CURRENT rules snapshot; append survivors (with the rule's label
    attached) to ``out_table``. Commits carry epoch idempotency tokens,
    so at-least-once replays no-op."""

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        if not rules_table.exists():
            return  # no committed rules yet: route nothing, don't fail
        rules = rules_table.read(spark).filter(F.col("enabled"))
        kept = batch.join(
            F.broadcast(rules.select(rule_key, "label")), rule_key, "inner"
        )
        out_table.append(kept, token=f"epoch:{epoch_id}")

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
