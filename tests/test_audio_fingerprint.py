"""Property tests for the spectral constellation fingerprints
(multimodal_audio_fingerprint_pairs): local-edit robustness, offset
invariance at frame alignment, padding hygiene, decode-ladder safety.
The oracled registry row proves Spark==DuckDB; these prove the
MATCHING CLAIMS the docstring makes."""

from __future__ import annotations

import numpy as np

from flink_stream_spark.operators.multimodal import (
    FP_CONTAIN_DEN,
    FP_CONTAIN_NUM,
    FP_MIN_SHARED,
    FP_NFFT,
    FPN,
    audio_fingerprints,
)
from flink_stream_spark.operators.wav import encode_wav


def _samples_from_bytes(b: bytes) -> np.ndarray:
    arr = np.frombuffer(b[:FPN], dtype=np.uint8)
    s = np.zeros(FPN, dtype=np.int64)
    s[: len(arr)] = arr.astype(np.int64) * 256 - 32768
    return s


def _fps(spark, payloads: dict[int, bytes]) -> dict[int, set[int]]:
    media = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(payloads.items())],
        "doc_id bigint, payload binary",
    )
    out: dict[int, set[int]] = {k: set() for k in payloads}
    for r in audio_fingerprints(media).collect():
        out[r["doc_id"]].add(r["fp"])
    return out


def _is_pair(fa: set[int], fb: set[int]) -> bool:
    ns = len(fa & fb)
    return ns >= FP_MIN_SHARED and FP_CONTAIN_DEN * ns >= FP_CONTAIN_NUM * min(
        len(fa), len(fb)
    )


def _text(n: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    return bytes(rng.randint(97, 123, n).astype(np.uint8))


def test_local_edit_keeps_the_match(spark):
    """Editing one frame's worth of bytes in the middle corrupts only
    the fingerprints whose 4-frame window touches it; the pair rule
    still fires."""
    base = bytearray(_text(FPN, seed=7))
    edited = bytearray(base)
    edited[240:256] = _text(16, seed=8)  # exactly frame 15
    fps = _fps(
        spark,
        {
            1: encode_wav(_samples_from_bytes(bytes(base)), 16000, 16),
            2: encode_wav(_samples_from_bytes(bytes(edited)), 16000, 16),
        },
    )
    # the edit touches fingerprints t in [12, 15] only: <= 4 of 29 lost
    lost = len(fps[1] - fps[2])
    assert 1 <= lost <= 8  # some corruption happened, most survived
    assert _is_pair(fps[1], fps[2])


def test_frame_aligned_offset_containment(spark):
    """A 256-byte passage embedded at a frame-aligned offset in a
    longer clip shares the passage's interior fingerprints — the
    containment rule matches short-inside-long."""
    passage = _text(256, seed=21)
    short = passage  # 16 frames on its own
    long_pre = _text(128, seed=22)  # 8 frames of other content
    long_clip = long_pre + passage + _text(128, seed=23)
    fps = _fps(
        spark,
        {
            1: encode_wav(_samples_from_bytes(short), 16000, 16),
            2: encode_wav(_samples_from_bytes(long_clip), 16000, 16),
        },
    )
    shared = fps[1] & fps[2]
    # the passage's 13 interior fingerprints all survive embedding
    assert len(shared) >= 10
    assert _is_pair(fps[1], fps[2])


def test_unaligned_offset_does_not_match(spark):
    """The same passage at a NON-frame-aligned offset shifts every
    frame's content — fingerprints are frame-phase sensitive by
    design (document the limitation honestly)."""
    passage = _text(256, seed=31)
    long_clip = _text(7, seed=32) + passage + _text(249, seed=33)
    fps = _fps(
        spark,
        {
            1: encode_wav(_samples_from_bytes(passage), 16000, 16),
            2: encode_wav(_samples_from_bytes(long_clip), 16000, 16),
        },
    )
    assert not _is_pair(fps[1], fps[2])


def test_padding_and_undecodable_emit_nothing(spark):
    """Zero padding never fingerprints (a short clip's fp count is
    bounded by its content frames); non-WAV payloads emit zero rows."""
    short = _text(64, seed=41)  # 4 content frames -> exactly 1 window
    fps = _fps(
        spark,
        {
            1: encode_wav(_samples_from_bytes(short), 16000, 16),
            2: b"this is not a wav container at all",
        },
    )
    assert len(fps[1]) == 1
    assert fps[2] == set()


def test_independent_clips_do_not_pair(spark):
    fps = _fps(
        spark,
        {
            1: encode_wav(_samples_from_bytes(_text(FPN, 51)), 16000, 16),
            2: encode_wav(_samples_from_bytes(_text(FPN, 52)), 16000, 16),
        },
    )
    assert not _is_pair(fps[1], fps[2])
