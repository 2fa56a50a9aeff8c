"""AIFF codec: round-trip exactness at every width, the 80-bit
extended-float rate field, malformed-input rejection, and the
cross-codec property the container-agnostic decode ladder exists for —
the same samples via WAV and AIFF decode identically, so a container
re-encode dedups against its original."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from flink_stream_spark.operators.aiff import (
    decode_aiff,
    decode_extended80,
    encode_aiff,
    encode_extended80,
)
from flink_stream_spark.operators.wav import encode_wav


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_exact(bits, channels):
    rng = np.random.RandomState(bits + channels)
    lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    arr = rng.randint(lo, hi + 1, size=(101, channels)).astype(np.int64)
    d = decode_aiff(encode_aiff(arr, rate=44100, bits=bits))
    assert d is not None
    assert (d["rate"], d["channels"], d["bits"]) == (44100, channels, bits)
    assert (d["samples"] == arr).all()


@pytest.mark.parametrize(
    "rate", [1, 8000, 11025, 16000, 22050, 44100, 48000, 96000, 192000]
)
def test_extended80_roundtrip(rate):
    assert decode_extended80(encode_extended80(rate)) == rate


def test_extended80_rejects():
    # negative
    b = bytearray(encode_extended80(44100))
    b[0] |= 0x80
    assert decode_extended80(bytes(b)) is None
    # non-integer: 44100.5 has a fraction bit below the shift
    e = 44100 .bit_length() - 1
    mant = (44100 << (63 - e)) | (1 << (63 - e - 1))
    assert decode_extended80(struct.pack(">HQ", 16383 + e, mant)) is None
    # zero mantissa
    assert decode_extended80(struct.pack(">HQ", 16383, 0)) is None
    assert decode_extended80(b"\x00" * 9) is None


def test_malformed_rejected():
    arr = np.arange(32, dtype=np.int64) - 16
    good = encode_aiff(arr, bits=16)
    assert decode_aiff(b"FORMxxxxAIFF") is None  # no chunks
    assert decode_aiff(b"RIFF" + good[4:]) is None  # wrong magic
    assert decode_aiff(good[:20]) is None  # truncated
    # SSND but no COMM anywhere in the file
    assert decode_aiff(b"FORM" + struct.pack(">I", 12) + b"AIFF"
                       + b"SSND" + struct.pack(">I", 8) + b"\x00" * 8) is None
    # COMM frame count exceeding the data
    bad = bytearray(good)
    i = bad.find(b"COMM") + 8 + 2
    struct.pack_into(">I", bad, i, 10_000)
    assert decode_aiff(bytes(bad)) is None
    # UTF-8 text can never decode
    assert decode_aiff(b"FORMat this nicely, AIFF-style prose") is None


def test_ssnd_before_comm_is_legal():
    # IFF mandates no chunk order: a writer that emits SSND first is
    # spec-legal and must decode identically (advisor note, round 8)
    arr = np.arange(64, dtype=np.int64) * 7 - 200
    enc = encode_aiff(arr, rate=22050, bits=16)
    i = enc.find(b"COMM")
    (clen,) = struct.unpack_from(">I", enc, i + 4)
    comm_chunk = enc[i : i + 8 + clen]
    rest = enc[i + 8 + clen :]  # SSND chunk (+ any pad)
    reordered = enc[:8] + b"AIFF" + rest + comm_chunk
    reordered = (
        reordered[:4]
        + struct.pack(">I", len(reordered) - 8)
        + reordered[8:]
    )
    d = decode_aiff(reordered)
    assert d is not None
    assert d["rate"] == 22050 and d["bits"] == 16
    assert (d["samples"].ravel() == arr).all()


def test_signed_8bit_differs_from_wav_convention():
    # AIFF 8-bit is signed on the wire; decode must NOT recenter
    arr = np.array([-128, -1, 0, 1, 127], dtype=np.int64)
    d = decode_aiff(encode_aiff(arr, bits=8))
    assert (d["samples"].ravel() == arr).all()


def test_ssnd_offset_skipped():
    arr = np.arange(16, dtype=np.int64) * 3 - 20
    enc = encode_aiff(arr, bits=16)
    # rebuild with a 4-byte SSND offset
    i = enc.find(b"SSND")
    (clen,) = struct.unpack_from(">I", enc, i + 4)
    body = enc[i + 8 : i + 8 + clen]
    raw = body[8:]
    new_ssnd = struct.pack(">II", 4, 0) + b"\xde\xad\xbe\xef" + raw
    rebuilt = (
        enc[:i]
        + b"SSND"
        + struct.pack(">I", len(new_ssnd))
        + new_ssnd
    )
    # fix the FORM size
    rebuilt = (
        rebuilt[:4] + struct.pack(">I", len(rebuilt) - 8) + rebuilt[8:]
    )
    d = decode_aiff(rebuilt)
    assert d is not None and (d["samples"].ravel() == arr).all()


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_cross_codec_wav_aiff_identical_samples(bits):
    rng = np.random.RandomState(bits)
    arr = rng.randint(-32768, 32768, size=300).astype(np.int64)
    from flink_stream_spark.operators.multimodal import decode_audio

    dw = decode_audio(encode_wav(arr, rate=16000, bits=16))
    da = decode_audio(encode_aiff(arr, rate=16000, bits=bits))
    assert (dw["samples"] == da["samples"]).all()


def test_container_reencode_dedups(spark):
    """The dedup-level claim: the same clip shipped as WAV and as AIFF
    produces the SAME energy envelope, so the envelope dedup and the
    streaming index flag the re-encode as a duplicate."""
    from flink_stream_spark.operators.multimodal import wav_envelope_stats

    rng = np.random.RandomState(7)
    arr = rng.randint(-32768, 32768, size=2048).astype(np.int64)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "payload": [
                    bytearray(encode_wav(arr, rate=16000, bits=16)),
                    bytearray(encode_aiff(arr, rate=16000, bits=24)),
                ],
            }
        )
    )
    rows = {
        r["doc_id"]: (r["n_frames"], r["peak_abs"], r["sum_abs"], list(r["env"]))
        for r in wav_envelope_stats(media).collect()
    }
    assert rows[1] == rows[2]
