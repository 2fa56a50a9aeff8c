"""Physical-plan assertions: the 100 TB posture is checked, not assumed.

Every optimization the operators rely on must be visible in
explain() output — filter/column pushdown into the parquet scan,
broadcast joins for dims, TakeOrderedAndProject for top-k, partial
aggregation, and no cartesian products anywhere.
"""

from __future__ import annotations

import pytest

from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.relational  # noqa: F401
import flink_stream_spark.operators.dedup  # noqa: F401
import flink_stream_spark.operators.similarity  # noqa: F401
import flink_stream_spark.operators.events  # noqa: F401
import flink_stream_spark.operators.misc  # noqa: F401


def plan_of(spark, sf, name: str) -> str:
    df = REGISTRY[name].build(spark, sf)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_and_column_pushdown_q1(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_broadcast_join_dims_q5(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation_present(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "agg_basic")
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2


def test_no_cartesian_in_lsh(spark, sf_oracle):
    for name in ("dedup_minhash_lsh_pairs", "dedup_ngram_jaccard"):
        plan = plan_of(spark, sf_oracle, name)
        assert "CartesianProduct" not in plan, name


def test_broadcast_query_set_in_simsearch(spark, sf_oracle):
    plan = plan_of(spark, sf_oracle, "simsearch_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_whole_stage_codegen_in_flagship(spark, sf_oracle):
    df = REGISTRY["q1_pricing_summary"].build(spark, sf_oracle)
    df.collect()  # materialize the final adaptive plan
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "isFinalPlan=true" in plan
    assert "*(" in plan  # WholeStageCodegen stage markers
