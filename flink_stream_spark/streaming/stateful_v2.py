"""Arbitrary stateful processing via transformWithStateInPandas.

Spark 4's StatefulProcessor API is the successor surface to
applyInPandasWithState (stateful.py): instead of one flat state tuple
per key it exposes typed state primitives — ValueState, ListState,
MapState — plus timers, which map onto the reference's keyed Flink
operator state bounded by TTL (table.exec.state.ttl=600s,
flink/jobs/flink_json_to_iceberg.py:24).

The example operator keeps, per user:
  - a ValueState (event count, value sum) — the running profile, and
  - a MapState event_type -> count — the per-type breakdown Flink
    would hold in a MapState the same way,
and emits the updated (user_id, event_type, type_n, n_events,
total_value) rows for every type seen in the batch (update-mode keyed
aggregate). State is per-key-partitioned by Spark; at scale the only
shuffle is the groupBy hash partitioning, and state lives in the
per-partition state store exactly like the Flink keyed backend.

Runtime requirements: the RocksDB state store provider
(spark.sql.streaming.stateStore.providerClass) and the google.protobuf
Python package (Spark's TransformWithStateInPySpark driver worker uses
it for state-schema serialization). Where protobuf is absent the query
fails at start; stateful.py's applyInPandasWithState operator is the
dependency-free fallback with the same keyed-state semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id bigint, event_type string, type_n bigint, "
    "n_events bigint, total_value double"
)


class UserTypeProfileProcessor(StatefulProcessor):
    """Running per-user profile + per-event-type counts."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState("profile", "n bigint, total double")
        self._per_type = handle.getMapState(
            "per_type", "event_type string", "cnt bigint"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._profile.get() or (0, 0.0)) if self._profile.exists() else (0, 0.0)
        touched: dict[str, int] = {}
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._per_type.getValue((etype,))[0]
                    if self._per_type.containsKey((etype,))
                    else 0
                )
                new = int(prev) + int(cnt)
                self._per_type.updateValue((etype,), (new,))
                touched[etype] = new
        self._profile.update((n, total))
        if touched:
            types = sorted(touched)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(types),
                    "event_type": types,
                    "type_n": [touched[t] for t in types],
                    "n_events": [n] * len(types),
                    "total_value": [round(total, 2)] * len(types),
                }
            )

    def close(self) -> None:
        pass


def user_type_profiles(events: DataFrame) -> DataFrame:
    """Streaming per-(user, event_type) running counts with typed state."""
    return events.groupBy("user_id").transformWithStateInPandas(
        UserTypeProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
