"""Accuracy contracts for the sketch-based operators.

The sketch queries (HLL++ count-distinct, mergeable HLL union, and the
percentile sketch) embed their accuracy contract as a hashable
``within_tol`` boolean next to exact reference columns (so the DuckDB
oracle gate checks them like any other query). These tests assert the
contract holds — and that the embedded "exact" columns really are
exact against an independent computation — so 'approximate' never
silently means 'wrong'.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.relational  # noqa: F401
import flink_stream_spark.operators.misc  # noqa: F401


def _exact_distinct(spark, sf_oracle):
    return {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_oracle, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }


def test_approx_count_distinct_within_rsd(spark, sf_oracle):
    rows = REGISTRY["agg_approx_count_distinct"].build(spark, sf_oracle).collect()
    exact = _exact_distinct(spark, sf_oracle)
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["within_tol"], r
        assert r["exact_orders"] == exact[r["l_returnflag"]]


def test_hll_sketch_merge_within_tolerance(spark, sf_oracle):
    rows = REGISTRY["agg_hll_sketch_merge"].build(spark, sf_oracle).collect()
    exact = _exact_distinct(spark, sf_oracle)
    for r in rows:
        assert r["within_tol"], r
        assert r["exact_orders"] == exact[r["l_returnflag"]]


def test_percentile_approx_within_tolerance(spark, sf_oracle):
    rows = REGISTRY["agg_percentile_approx"].build(spark, sf_oracle).collect()
    exact = {
        r["l_returnflag"]: r["pcts"]
        for r in load_table(spark, sf_oracle, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))").alias("pcts"))
        .collect()
    }
    for r in rows:
        assert r["within_tol"], r
        want = exact[r["l_returnflag"]]
        assert abs(r["p50"] - want[0]) <= 1e-6 and abs(r["p95"] - want[1]) <= 1e-6


def test_cms_never_underestimates_and_exact_is_exact(spark, sf_oracle):
    rows = REGISTRY["agg_heavy_hitters_cms"].build(spark, sf_oracle).collect()
    assert len(rows) == 10
    truth = {
        r["o_custkey"]: r["n"]
        for r in load_table(spark, sf_oracle, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        # CMS point queries can only overestimate
        assert r["cms_est"] >= r["exact_cnt"], r
        assert truth[r["custkey"]] == r["exact_cnt"], r


def test_cms_is_partitioning_independent(spark, sf_oracle):
    # cell-wise mergeability: the sketch (and so the estimates) must be
    # identical however the input was partitioned before the agg
    base = REGISTRY["agg_heavy_hitters_cms"].build(spark, sf_oracle).collect()
    n_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = REGISTRY["agg_heavy_hitters_cms"].build(spark, sf_oracle).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", n_shuffle)
    assert [tuple(r) for r in base] == [tuple(r) for r in alt]
