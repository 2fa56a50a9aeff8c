"""Property-based check of the CDC MERGE core.

hypothesis generates arbitrary envelope sequences (c/u/d over a small
key space, split into arbitrary micro-batches); applying them through
ManagedTable + apply_cdc_batch must equal the trivially-correct
sequential model (a Python dict). This is the semantics-carrying
component of the engine (SURVEY §7 'What's hard'), so it gets the
strongest test."""

from __future__ import annotations

import json

import pytest
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
@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_cdc_apply_equals_sequential_model(
    spark, tmp_path_factory, merge_mode, ops, n_batches
):
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
        apply_cdc_batch(
            table,
            parse_envelopes(raw, ROW, value_col="raw"),
            ["k"],
            merge_mode=merge_mode,
        )
    got = {r["k"]: r["v"] for r in table.read(spark).collect()} if table.exists() else {}
    assert got == model_apply(ops)


# ---------------------------------------------------------------------------
# Storage-layer property: the manifest/bucket machinery under random
# interleavings of merge / append / compact / expire must preserve the
# model state — a GC or carry-forward bug here silently destroys data.
# ---------------------------------------------------------------------------

storage_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("merge"),
            st.lists(
                st.tuples(st.integers(0, 6), st.integers(0, 99)),
                min_size=1, max_size=4, unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(st.just("delete"), st.lists(st.integers(0, 6), min_size=1, max_size=3, unique=True)),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("expire"), st.none()),
        st.tuples(st.just("zorder"), st.none()),
        st.tuples(st.just("autocompact"), st.none()),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=storage_ops)
@pytest.mark.parametrize("merge_mode", ["cow", "mor", "mix"])
def test_bucketed_storage_under_random_maintenance(
    spark, tmp_path_factory, merge_mode, ops
):
    work = tmp_path_factory.mktemp("storeprop")
    table = ManagedTable(str(work), "t", ["k"], num_buckets=4)
    model: dict[int, str] = {}
    # "mix" interleaves copy-on-write and merge-on-read commits on ONE
    # table — COW folding another commit's tombstones, MoR tombstoning
    # COW-written rows — the cross-mode interactions no single-mode
    # run exercises
    n_writes = 0
    for op, arg in ops:
        if merge_mode == "mix":
            mode = ("cow", "mor")[n_writes % 2]
        else:
            mode = merge_mode
        if op == "merge":
            rows = [(k, f"v{v}") for k, v in arg]
            table.merge(
                spark.createDataFrame(rows, "k int, v string"), mode=mode
            )
            n_writes += 1
            model.update({k: f"v{v}" for k, v in arg})
        elif op == "delete":
            if not table.exists():
                continue
            table.merge(
                upserts=spark.createDataFrame([], "k int, v string"),
                deletes=spark.createDataFrame([(k,) for k in arg], "k int"),
                mode=mode,
            )
            n_writes += 1
            for k in arg:
                model.pop(k, None)
        elif op == "compact":
            table.compact(spark)
        elif op == "expire":
            table.expire_snapshots(retain_last=1)
        elif op == "zorder":
            # v is a string column: exercises the non-numeric-stats
            # fallback (contributes no Morton bits, never breaks)
            if table.exists():
                table.zorder(spark, ["k", "v"], max_records_per_file=3)
        elif op == "autocompact":
            table.maybe_compact(spark, max_files_per_bucket=2)
        got = (
            {r["k"]: r["v"] for r in table.read(spark).collect()}
            if table.exists()
            else {}
        )
        assert got == model, (op, arg)
        if table.exists():
            # zone-map pruned reads and the bucket-pruned point lookup
            # must agree with the model after EVERY maintenance op
            pruned = {
                r["k"]: r["v"]
                for r in table.read(spark, where=[("k", "=", 3)]).collect()
            }
            assert pruned == ({3: model[3]} if 3 in model else {}), (op, arg)
            hit = {r["k"]: r["v"] for r in table.lookup(spark, {"k": 3}).collect()}
            assert hit == ({3: model[3]} if 3 in model else {}), (op, arg)
            rng = {
                r["k"]
                for r in table.read(spark, where=[("k", "between", (2, 5))]).collect()
            }
            assert rng == {k for k in model if 2 <= k <= 5}, (op, arg)
