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


def test_hot_shingle_blocking_stays_linear(spark):
    """A stop-shingle planted in EVERY document (df = N >> cap) must
    generate ZERO candidate pairs from blocking — candidate count stays
    O(N·df_cap), never O(N²) — while a true near-dup pair sharing RARE
    shingles still surfaces, and its Jaccard is EXACT over the full
    shingle sets (hot shingles included in the verify recount)."""
    from flink_stream_spark.operators.dedup import (
        _exact_pair_overlap,
        shared_shingle_candidates,
        shingled_docs,
    )

    n = 300
    cap = 8
    # every doc opens with the same hot 3-gram; the rest is unique
    docs = [
        (i, f"common common common u{i}a u{i}b u{i}c u{i}d") for i in range(n)
    ]
    # planted near-dup pair: rare shared tail, plus the hot prefix
    docs += [
        (n, "common common common alpha beta gamma delta"),
        (n + 1, "common common common alpha beta gamma delta epsilon"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    sh = (
        shingled_docs(d)
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    cand = shared_shingle_candidates(sh, df_cap=cap)
    n_cand = cand.count()
    assert n_cand <= (n + 2) * cap      # linear bound, not (n+2)²/2 ≈ 45k
    assert n_cand == 1                  # exactly the planted pair
    pair = cand.collect()[0]
    assert (pair["doc_a"], pair["doc_b"]) == (n, n + 1)
    # exact verify recounts the FULL overlap, hot shingles included:
    # A (7 tokens) has 5 distinct shingles, B (8 tokens) has 6;
    # A ⊂ B so shared = |A| = 5 — including the hot "common common
    # common" shingle the blocking stage excluded
    ov = _exact_pair_overlap(cand, sh).collect()[0]
    assert ov["shared"] == 5


def test_connected_components_chain_converges_logarithmically(spark):
    """A 400-node path graph has diameter 399: plain neighbor-min would
    need ~399 rounds, far past the max_iter budget — pointer doubling
    must converge it within 25 rounds to the single min label."""
    from flink_stream_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "doc_a long, doc_b long"
    )
    labels = connected_components(edges, max_iter=25)
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert set(got.values()) == {0}
    assert len(got) == 401
