"""connected_components semantics on synthetic graphs.

The registry oracle test checks dedup_cluster_assign end-to-end vs the
recursive-CTE oracle; these check the propagation loop itself on
shapes the fixture may not contain (chains longer than one hop, rings,
multiple components, convergence inside the iteration cap).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_spark.operators.dedup import connected_components


def _labels(spark, pairs):
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = connected_components(edges).collect()
    return {r["doc_id"]: r["label"] for r in rows}


def test_chain_propagates_past_one_hop(spark):
    # 1-2-3-4-5 chain: min label must travel the full diameter
    got = _labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_ring_and_separate_component(spark):
    got = _labels(spark, [(10, 11), (11, 12), (12, 10), (7, 8)])
    assert got == {10: 10, 11: 10, 12: 10, 7: 7, 8: 7}


def test_components_are_order_independent(spark):
    # same graph, edges listed high-to-low: labels identical
    a = _labels(spark, [(1, 5), (5, 9), (2, 4)])
    b = _labels(spark, [(9, 5), (4, 2), (5, 1)])
    assert a == b == {1: 1, 5: 1, 9: 1, 2: 2, 4: 2}
