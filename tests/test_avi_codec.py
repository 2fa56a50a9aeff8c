"""AVI/MJPEG container codec: round-trip exactness on block-aligned
content, RIFF framing strictness (truncation, nesting, wrong types,
index cross-check), JUNK tolerance, and the cross-container video
property the decode_video ladder exists for."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_stream_spark.operators.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from flink_stream_spark.operators.y4m import encode_y4m


def _frames(n=5, seed=0):
    rng = np.random.RandomState(seed)
    grid = rng.randint(0, 256, size=(n, 1, 2)).astype(np.uint8)
    return np.repeat(np.repeat(grid, 8, 1), 8, 2)  # (n, 8, 16)


def test_roundtrip_pixel_exact():
    frames = _frames(7, seed=3)
    enc = encode_avi_mjpeg(frames, fps=(25, 1))
    d = decode_avi_mjpeg(enc)
    assert d is not None
    assert (d["width"], d["height"]) == (16, 8)
    assert (d["fps_num"], d["fps_den"]) == (25, 1)
    assert (d["frames"] == frames).all()


def test_empty_and_single_frame():
    e = encode_avi_mjpeg(np.zeros((0, 8, 16), np.uint8))
    d = decode_avi_mjpeg(e)
    assert d is not None and d["frames"].shape == (0, 8, 16)
    one = _frames(1)
    d1 = decode_avi_mjpeg(encode_avi_mjpeg(one))
    assert d1 is not None and (d1["frames"] == one).all()


def test_malformed_rejected():
    enc = encode_avi_mjpeg(_frames(3))
    assert decode_avi_mjpeg(b"") is None
    assert decode_avi_mjpeg(b"RIFFxxxxAVI ") is None  # no headers
    assert decode_avi_mjpeg(enc[:40]) is None  # truncated hdrl
    assert decode_avi_mjpeg(enc[:-10]) is None  # truncated idx1
    # RIFF/WAVE is audio, not video
    assert decode_avi_mjpeg(b"RIFF" + enc[4:8] + b"WAVE" + enc[12:]) is None
    # a non-MJPG stream handler must reject
    bad = bytearray(enc)
    bad[enc.find(b"MJPG")] = ord("X")
    assert decode_avi_mjpeg(bytes(bad)) is None
    # break a frame's JPEG SOI marker -> that frame fails decode
    movi = enc.find(b"00dc")
    bad = bytearray(enc)
    bad[movi + 8] = 0x00  # first JPEG's 0xFF of SOI
    assert decode_avi_mjpeg(bytes(bad)) is None
    # idx1 size disagreement with the actual chunk
    i1 = enc.find(b"idx1")
    bad = bytearray(enc)
    struct.pack_into("<I", bad, i1 + 8 + 12, 1)  # first entry's size
    assert decode_avi_mjpeg(bytes(bad)) is None
    # UTF-8 text never decodes
    assert decode_avi_mjpeg(b"RIFF through the prose, AVI never") is None


def test_junk_chunk_tolerated():
    # real writers pad with JUNK between hdrl and movi; spec-legal
    enc = encode_avi_mjpeg(_frames(2))
    movi = enc.find(b"movi") - 8  # start of the LIST('movi') chunk
    junk = b"JUNK" + struct.pack("<I", 6) + b"pad..."
    patched = enc[:movi] + junk + enc[movi:]
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    d = decode_avi_mjpeg(patched)
    assert d is not None and d["frames"].shape == (2, 8, 16)


def test_frame_count_mismatch_rejected():
    enc = encode_avi_mjpeg(_frames(3))
    # lie in avih dwTotalFrames
    avih = enc.find(b"avih")
    bad = bytearray(enc)
    struct.pack_into("<I", bad, avih + 8 + 16, 99)
    assert decode_avi_mjpeg(bytes(bad)) is None


def test_cross_container_video_identical():
    from flink_stream_spark.operators.multimodal import decode_video

    frames = _frames(6, seed=9)
    via_y4m = decode_video(encode_y4m(frames, colorspace="mono"))
    via_avi = decode_video(encode_avi_mjpeg(frames))
    assert via_y4m is not None and via_avi is not None
    assert (via_y4m["frames"] == via_avi["frames"]).all()


@pytest.mark.parametrize("n", [2, 9])
def test_odd_sized_jpeg_chunks_word_aligned(n):
    # JPEG payload lengths vary; chunk padding must keep every chunk
    # header aligned and the index consistent
    rng = np.random.RandomState(n)
    grid = rng.randint(0, 256, size=(n, 2, 3)).astype(np.uint8)
    frames = np.repeat(np.repeat(grid, 8, 1), 8, 2)  # (n, 16, 24)
    d = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    assert d is not None and (d["frames"] == frames).all()
