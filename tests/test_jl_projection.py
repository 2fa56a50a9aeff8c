"""JL distance-preservation — the guarantee the operator exists for
(the oracle proves Spark==DuckDB; partitioning independence is in
tests/test_partitioning_independence.py's SENSITIVE list)."""

from __future__ import annotations

import numpy as np

from flink_stream_spark.operators.similarity import JL_K, embedding_jl_project

SF = "/root/testdata/sf0.001"


def test_plan_broadcasts_matrix_no_per_row_hash(spark):
    """Pin the 16.9s->1.0s fix: the sign matrix joins broadcast and
    NO md5 is evaluated in the projection plan (the first cut
    re-derived the sign per exploded row per output dim)."""
    df = embedding_jl_project(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "md5" not in plan.lower()


def test_distance_preservation(spark):
    """Rademacher JL at k=16 from d=64: E[|Px|^2] = k * |x|^2 and
    pairwise squared distances concentrate around k * d^2. Assert the
    median distortion is tight and the tails are bounded — loose
    enough to be deterministic for this fixed hash matrix, tight
    enough that a broken sign derivation (all +1, say) fails."""
    from flink_stream_spark.catalog import load_table

    e = load_table(spark, SF, "embeddings").limit(60)
    rows = e.collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    proj = {
        r["vec_id"]: np.array(r["proj"], dtype=np.float64) / 1e6
        for r in embedding_jl_project(spark, SF).collect()
    }
    P = np.array([proj[r["vec_id"]] for r in rows])
    ratios = []
    for a in range(0, len(rows), 3):
        for b in range(a + 1, len(rows), 7):
            d2 = float(((X[a] - X[b]) ** 2).sum())
            p2 = float(((P[a] - P[b]) ** 2).sum())
            if d2 > 1e-9:
                ratios.append(p2 / (JL_K * d2))
    ratios = np.array(ratios)
    assert 0.7 < float(np.median(ratios)) < 1.3, float(np.median(ratios))
    assert float(ratios.min()) > 0.15 and float(ratios.max()) < 4.0
    # a degenerate all-(+1) matrix collapses every component to the
    # same sum; its ratio spread blows far outside these bands
