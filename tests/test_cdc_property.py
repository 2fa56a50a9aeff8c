"""Property-based check of the CDC MERGE core.

hypothesis generates arbitrary envelope sequences (c/u/d over a small
key space, split into arbitrary micro-batches); applying them through
ManagedTable + apply_cdc_batch must equal the trivially-correct
sequential model (a Python dict). This is the semantics-carrying
component of the engine (SURVEY §7 'What's hard'), so it gets the
strongest test."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from flink_stream_spark.cdc.envelope import apply_cdc_batch, parse_envelopes
from flink_stream_spark.tables.managed import ManagedTable

ROW = T.StructType(
    [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
)

ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=0, max_value=4),  # small key space → collisions
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=12,
)
batch_splits = st.integers(min_value=1, max_value=3)


def model_apply(ops):
    state = {}
    for op, k, v in ops:
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = f"v{v}"
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy, n_batches=batch_splits)
def test_cdc_apply_equals_sequential_model(spark, tmp_path_factory, ops, n_batches):
    work = tmp_path_factory.mktemp("prop")
    table = ManagedTable(str(work), "t", ["k"])
    lines = [
        json.dumps(
            {
                "payload": {
                    "before": {"k": k, "v": f"v{v}"} if op == "d" else None,
                    "after": None if op == "d" else {"k": k, "v": f"v{v}"},
                    "source": {"table": "t", "schema": "s", "lsn": i},
                    "op": op,
                    "ts_ms": i,
                }
            }
        )
        for i, (op, k, v) in enumerate(ops)
    ]
    # split into n contiguous micro-batches (empty chunks skipped)
    size = max(1, len(lines) // n_batches)
    for start in range(0, len(lines), size):
        chunk = lines[start : start + size]
        raw = spark.createDataFrame([(l,) for l in chunk], "raw string")
        apply_cdc_batch(table, parse_envelopes(raw, ROW, value_col="raw"), ["k"])
    got = {r["k"]: r["v"] for r in table.read(spark).collect()} if table.exists() else {}
    assert got == model_apply(ops)
