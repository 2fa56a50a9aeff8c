"""Custom stateful streaming operator via applyInPandasWithState.

The reference bounds its operator state with a TTL
(table.exec.state.ttl=600s, flink/jobs/flink_json_to_iceberg.py:24);
Spark's arbitrary-state API is the engine's surface for operators the
built-ins can't express. The example operator keeps a running
per-user profile (event count, value sum, last event id) across
micro-batches and emits the updated profile each batch — the
update-mode keyed aggregate the reference's Iceberg upsert tables
materialize downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_event_id bigint"
STATE_SCHEMA = "n bigint, total double, last_id bigint"


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_id = state.get
    else:
        n, total, last_id = 0, 0.0, -1
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_id = max(last_id, int(pdf["event_id"].max()))
    state.update((n, total, last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_event_id": [last_id],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile with explicit operator state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
