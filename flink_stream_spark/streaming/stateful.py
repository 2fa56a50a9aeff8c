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


THROTTLE_OUTPUT = "user_id bigint, hour_ms bigint, event_id bigint, event_type string"
THROTTLE_STATE = "admitted bigint"


def _make_throttle(limit: int):
    def _throttle(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        admitted = state.get[0] if state.exists else 0
        pdf = pd.concat(list(batches), ignore_index=True)
        # deterministic admission order inside the micro-batch; across
        # batches admission is arrival order (streaming semantics)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        take = max(0, limit - admitted)
        out = pdf.head(take)
        state.update((admitted + len(out),))
        yield pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "hour_ms": [key[1]] * len(out),
                "event_id": out["event_id"].astype("int64"),
                "event_type": out["event_type"],
            }
        )

    return _throttle


def throttle_stream(events: DataFrame, limit: int = 3) -> DataFrame:
    """Streaming per-(user, hour) admission quota: pass through the
    first ``limit`` events per key-window, drop the rest — the rate-
    limit stage of a crawl-ingest pipeline, as an arbitrary-state
    operator (state = one counter per live key-window; a production
    deployment adds EventTimeTimeout eviction once the window's
    watermark passes, the same bound the reference sets with
    table.exec.state.ttl). Batch twin / oracle:
    operators/events_analytics.py::events_throttle_per_key_window."""
    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "hour_ms",
        (F.floor(F.unix_millis("ts") / 3_600_000) * 3_600_000).cast("bigint"),
    )
    return keyed.groupBy("user_id", "hour_ms").applyInPandasWithState(
        _make_throttle(limit),
        outputStructType=THROTTLE_OUTPUT,
        stateStructType=THROTTLE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
