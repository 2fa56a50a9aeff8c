"""Semantic invariants for the round-2 curation/aggregate operators.

The registry oracle test already proves cross-engine hash equality;
these check the properties the numbers must obey regardless of engine.
"""

from __future__ import annotations

import __spark_entry__  # noqa: F401  (imports every operator module)
from flink_stream_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def test_repetition_signal_bounds(spark):
    rows = REGISTRY["text_repetition_signals"].build(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.distinct_token_ratio <= 1
        assert 0 <= r.dup_bigram_frac <= 1
        assert 0 < r.top_bigram_frac <= 1
        # a duplicated bigram contributes >= 2 instances, so whenever
        # any duplication exists the dup fraction covers the top bigram
        if r.dup_bigram_frac > 0:
            assert r.dup_bigram_frac * r.n_tokens >= 1


def test_gap_fill_grid_contiguous_and_filled(spark):
    rows = REGISTRY["events_gap_fill_ffill"].build(spark, SF).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        hours = [r.hour_ms for r in user_rows]
        assert hours == sorted(hours)
        # hourly grid has no holes between first and last observation
        assert hours[-1] - hours[0] == 3600000 * (len(hours) - 1)
        # first grid row is an observed hour; ffill leaves no nulls
        assert user_rows[0].is_gap == 0
        for r in user_rows:
            assert r.value_ffill is not None
            assert (r.n_events == 0) == (r.is_gap == 1)


def test_quantize_roundtrip_error_bounded(spark):
    rows = REGISTRY["embedding_quantize_int8"].build(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.dim == 64
        # affine int8: worst-case reconstruction error is scale/2
        half_step = (r.vmax - r.vmin) / 255 / 2
        assert r.mean_abs_err <= half_step + 1e-12
        assert 0 <= r.q_sum <= 255 * r.dim


def test_mode_tiebreak_and_argminmax(spark):
    modal = {
        r.o_orderstatus: r.cnt
        for r in REGISTRY["agg_mode_tiebreak"].build(spark, SF).collect()
    }
    counts = (
        REGISTRY["agg_argminmax_countif"].build(spark, SF).collect()
    )
    assert set(modal) == {r.o_orderstatus for r in counts}
    for r in counts:
        assert r.n_big >= 0
        assert r.any_jumbo in (0, 1) and r.all_over_1k in (0, 1)
