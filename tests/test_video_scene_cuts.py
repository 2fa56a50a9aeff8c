"""Scene-cut detection: the planted-structure properties the oracle
row can't state directly — identical segments produce NO cut, distinct
segments produce cuts exactly at the scene boundaries."""

from __future__ import annotations

import os

import numpy as np

from flink_stream_spark.operators import REGISTRY
import flink_stream_spark.operators.multimodal  # noqa: F401
from flink_stream_spark.operators.multimodal import (
    VID_CUT_THRESH,
    VID_SCENE_LEN,
)


def _run(spark, docs, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(k, v) for k, v in sorted(docs.items())], "doc_id bigint, text string"
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))
    df = REGISTRY["multimodal_video_scene_cuts"].build(spark, sf_dir)
    out = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], []).append((r["frame_idx"], r["delta"]))
    return out


def test_boundaries_and_repeats(spark, tmp_path):
    rng = np.random.RandomState(4)

    def seg(seed):
        return bytes(rng.randint(97, 123, 128).astype(np.uint8)).decode()

    a, b, c = seg(1), seg(2), seg(3)
    docs = {
        # three distinct segments: cuts exactly at frames 3 and 6
        0: a + b + c,
        # periodic text (every segment identical): no cuts at all
        1: a + a + a,
        # only the last segment differs: single cut at frame 6
        2: a + a + b,
        # empty text: all-zero frames, no cuts
        3: "",
    }
    got = _run(spark, docs, tmp_path)
    assert [f for f, _ in got.get(0, [])] == [VID_SCENE_LEN, 2 * VID_SCENE_LEN]
    assert 1 not in got
    assert [f for f, _ in got.get(2, [])] == [2 * VID_SCENE_LEN]
    assert 3 not in got
    assert all(
        d >= VID_CUT_THRESH for cuts in got.values() for _, d in cuts
    )
