"""Y4M (YUV4MPEG2) codec + video motion-signature units."""

from __future__ import annotations

import numpy as np

from flink_stream_spark.operators.multimodal import (
    VID_BLOCKS,
    VID_FRAMES,
    VID_H,
    VID_L1_MAX,
    VID_W,
    video_motion_stats,
)
from flink_stream_spark.operators.y4m import (
    decode_y4m,
    encode_y4m,
    motion_profile,
)


def test_roundtrip_all_colorspaces():
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (5, 8, 16)).astype(np.uint8)
    for cs in ["mono", "420", "420jpeg", "420mpeg2", "420paldv", "422", "444"]:
        d = decode_y4m(encode_y4m(frames, fps=(25, 1), colorspace=cs))
        assert d is not None, cs
        assert (d["width"], d["height"], d["colorspace"]) == (16, 8, cs)
        assert (d["fps_num"], d["fps_den"]) == (25, 1)
        assert np.array_equal(d["frames"], frames), cs


def test_roundtrip_zero_frames_and_odd_dims():
    empty = decode_y4m(encode_y4m(np.zeros((0, 4, 6), np.uint8)))
    assert empty is not None and empty["frames"].shape == (0, 4, 6)
    # odd dimensions: 420 chroma planes use floor halving
    odd = np.arange(5 * 7 * 9, dtype=np.uint8).reshape(5, 7, 9) % 256
    d = decode_y4m(encode_y4m(odd, colorspace="420"))
    assert np.array_equal(d["frames"], odd)


def test_decoder_rejects_malformed():
    assert decode_y4m(b"") is None
    assert decode_y4m(b"not a video at all, just text\n") is None
    assert decode_y4m(b"YUV4MPEG2 W16 H8\n") is not None  # no frames: ok
    assert decode_y4m(b"YUV4MPEG2 W0 H8 F30:1\nFRAME\n") is None  # zero dim
    assert decode_y4m(b"YUV4MPEG2 H8 F30:1\nFRAME\n") is None  # missing W
    assert decode_y4m(b"YUV4MPEG2 W16 H8 Cweird\nFRAME\n") is None
    good = encode_y4m(np.full((2, 4, 4), 7, np.uint8), colorspace="mono")
    assert decode_y4m(good) is not None
    assert decode_y4m(good[:-3]) is None  # truncated frame: reject
    assert decode_y4m(good.replace(b"FRAME", b"FRAMX", 1)) is None
    # garbage between frames is a framing error, not skippable
    assert decode_y4m(good + b"junk") is None


def test_motion_profile_exact_integers():
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (4, 8, 16)).astype(np.uint8)
    prof = motion_profile(frames, n_blocks=4)
    px = frames.astype(np.int64)
    means = [int(px[f].sum()) // (8 * 16) for f in range(4)]
    assert prof["frame_means"] == means
    assert prof["motion"] == sum(
        abs(means[f] - means[f - 1]) for f in range(1, 4)
    )
    for f in range(4):
        for b in range(4):
            assert prof["block_means"][f][b] == int(
                px[f, :, b * 4 : (b + 1) * 4].sum()
            ) // (8 * 4)


def test_video_near_dup_property():
    """A small tail edit moves the block-mean signature by less than
    the verify threshold; unrelated video does not."""
    rng = np.random.RandomState(11)
    total = VID_FRAMES * VID_H * VID_W
    base = rng.randint(0, 256, total).astype(np.uint8)
    edited = base.copy()
    edited[-8:] = rng.randint(0, 256, 8)  # small tail edit
    other = rng.randint(0, 256, total).astype(np.uint8)

    def sig(px):
        prof = motion_profile(
            px.reshape(VID_FRAMES, VID_H, VID_W), n_blocks=VID_BLOCKS
        )
        return np.array([v for row in prof["block_means"] for v in row])

    assert int(np.abs(sig(base) - sig(edited)).sum()) <= VID_L1_MAX
    assert int(np.abs(sig(base) - sig(other)).sum()) > VID_L1_MAX


def test_video_motion_stats_stage(spark):
    """The Spark decode stage: real Y4M payloads produce exact stats;
    non-video payloads take the zero fallback row."""
    rng = np.random.RandomState(13)
    frames = rng.randint(0, 256, (VID_FRAMES, VID_H, VID_W)).astype(np.uint8)
    clip = encode_y4m(frames, colorspace="420")
    media = spark.createDataFrame(
        [(1, bytearray(clip)), (2, bytearray(b"plain text payload"))],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r for r in video_motion_stats(media).collect()}
    prof = motion_profile(frames, n_blocks=VID_BLOCKS)
    assert rows[1]["n_frames"] == VID_FRAMES
    assert rows[1]["frame_means"] == prof["frame_means"]
    assert rows[1]["block_means"] == [
        v for row in prof["block_means"] for v in row
    ]
    assert rows[1]["motion"] == prof["motion"]
    assert rows[2]["n_frames"] == 0 and rows[2]["motion"] == 0
