"""asof_join vs pandas.merge_asof: semantics parity on real event data.

pandas is the reference implementation of as-of semantics; the Spark
operator must agree on backward, forward, and tolerance-bounded
matches per key (modulo equal-timestamp ties, which pandas resolves by
input order and the operator resolves deterministically — the fixture
has unique (user_id, ts, event_id) orderings after the epoch-ms cast).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.asof import asof_join


def _frames(spark, sf_small):
    e = load_table(spark, sf_small, "events")
    left = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_millis("ts").alias("t"), "event_id")
    )
    right = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_millis("ts").alias("t"), F.col("event_id").alias("click_id"))
    )
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    lp = left.toPandas().sort_values("t", kind="mergesort").reset_index(drop=True)
    rp = (
        right.toPandas()
        # align tie-resolution with the operator: among equal (user,t)
        # right rows the operator keeps the struct-max (largest id)
        .sort_values(["t", "click_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    m = pd.merge_asof(
        lp, rp, on="t", by="user_id", direction=direction, **kw
    )
    return {
        int(r.event_id): (None if pd.isna(r.click_id) else int(r.click_id))
        for r in m.itertuples()
    }


def test_asof_backward_matches_pandas(spark, sf_small):
    left, right = _frames(spark, sf_small)
    got = {
        r["event_id"]: r["click_id"]
        for r in asof_join(left, right, on="t", by=["user_id"]).collect()
    }
    assert got == _pandas_asof(left, right, "backward")
    assert len(got) == left.count()  # every left row survives


def test_asof_forward_matches_pandas(spark, sf_small):
    left, right = _frames(spark, sf_small)
    got = {
        r["event_id"]: r["click_id"]
        for r in asof_join(left, right, on="t", by=["user_id"], direction="forward").collect()
    }
    assert got == _pandas_asof(left, right, "forward")


def test_asof_tolerance(spark, sf_small):
    left, right = _frames(spark, sf_small)
    tol = 3_600_000  # 1 h in ms
    got = {
        r["event_id"]: r["click_id"]
        for r in asof_join(
            left, right, on="t", by=["user_id"], tolerance=tol
        ).collect()
    }
    assert got == _pandas_asof(left, right, "backward", tolerance=tol)
    # tolerance only ever removes matches
    full = _pandas_asof(left, right, "backward")
    for k, v in got.items():
        assert v is None or v == full[k]


def test_asof_no_partitionless_window_when_keyed(spark, sf_small):
    from flink_stream_spark.plans.scale import explain_str

    left, right = _frames(spark, sf_small)
    plan = explain_str(asof_join(left, right, on="t", by=["user_id"]))
    assert "user_id" in plan.split("Window")[1].splitlines()[0] or "user_id" in plan


def test_asof_keyless_requires_explicit_opt_in(spark, sf_small):
    import pytest

    left, right = _frames(spark, sf_small)
    with pytest.raises(ValueError, match="allow_global_sort"):
        asof_join(left, right, on="t")
    # explicit opt-in accepts the documented single-task bounded-input
    # contract and still computes correct left-row cardinality
    out = asof_join(
        left.limit(20), right.limit(20), on="t", allow_global_sort=True
    )
    assert out.count() == 20
