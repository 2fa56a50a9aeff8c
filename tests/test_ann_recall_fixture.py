"""The ANN recall fixture must DISCRIMINATE probe policies (round-6
verdict #3): on the clustered boundary-neighbor corpus, pinned
nprobe=2 recall is strictly below 1 and decays with corpus size, while
the adaptive n^(1/4) rule recovers it — the data the policy now rests
on (full three-scale curve recorded in PLANS.md via
tools/ann_recall_probe.py). The registered simsearch_recall_at_k
stays oracle-green on the standard fixture (test_registry_oracle)."""

from __future__ import annotations

import pytest

from flink_stream_spark.operators.similarity import (
    ivf_nlist,
    ivf_nprobe,
    ivf_recall_frame,
)
from flink_stream_spark.testing.ann_fixture import write_embeddings_fixture


def _mean_recall(spark, d, nprobe):
    rows = ivf_recall_frame(spark, d, nprobe=nprobe).collect()
    assert len(rows) == 5
    return sum(r["recall"] for r in rows) / len(rows)


@pytest.fixture(scope="module")
def fixture_16k(tmp_path_factory):
    d = tmp_path_factory.mktemp("ann") / "sf"
    return write_embeddings_fixture(str(d), 16384)


def test_fixture_discriminates_probe_policies(spark, fixture_16k):
    """recall(pinned-2) < recall(adaptive) <= recall(all-lists) = 1,
    with real spread (the old fixture pinned every cell at 1.000)."""
    nlist = ivf_nlist(16384)
    pinned = _mean_recall(spark, fixture_16k, 2)
    adaptive = _mean_recall(spark, fixture_16k, None)
    exhaustive = _mean_recall(spark, fixture_16k, nlist)
    assert pinned < adaptive <= exhaustive == 1.0, (pinned, adaptive)
    assert pinned <= 0.8  # genuine spread, not a rounding artifact
    assert ivf_nprobe(nlist) > 2  # the policies actually differ here


def test_fixture_exact_topk_is_planted(spark, fixture_16k):
    """Sanity: the exact top-5 really is the planted neighborhood —
    every query's exact matches have cosine >= 0.9 (background tops
    out ~0.75), so recall measures planted-neighbor retrieval, not
    background noise."""
    from flink_stream_spark.operators.similarity import (
        simsearch_bruteforce_topk,
    )

    rows = [
        r
        for r in simsearch_bruteforce_topk(spark, fixture_16k).collect()
        if r["rank"] <= 5
    ]
    assert len(rows) == 25
    assert min(r["cosine"] for r in rows) >= 0.9
