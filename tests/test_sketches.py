"""Accuracy contracts for the sketch-based operators.

The two rows-only registry queries (HLL++ count-distinct and the
percentile sketch) cannot hash-match an exact oracle by design; their
correctness contract is bounded relative error against the exact
computation — asserted here so 'approximate' never silently means
'wrong'.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.relational  # noqa: F401
import flink_stream_spark.operators.misc  # noqa: F401


def test_approx_count_distinct_within_rsd(spark, sf_oracle):
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in REGISTRY["agg_approx_count_distinct"].build(spark, sf_oracle).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_oracle, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        # rsd=0.02 configured; allow 3 standard deviations
        assert abs(approx[k] - n) <= max(3, 0.06 * n), (k, approx[k], n)


def test_percentile_approx_within_tolerance(spark, sf_oracle):
    approx = {
        r["l_returnflag"]: r["price_pcts"]
        for r in REGISTRY["agg_percentile_approx"].build(spark, sf_oracle).collect()
    }
    exact = {
        r["l_returnflag"]: r["pcts"]
        for r in load_table(spark, sf_oracle, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))"
            ).alias("pcts")
        )
        .collect()
    }
    for k, want in exact.items():
        got = approx[k]
        for g, w in zip(got, want):
            # accuracy=10000 → rank error ≤ n/10000; allow 1% value slack
            assert abs(g - w) <= 0.01 * abs(w) + 1e-6, (k, got, want)
