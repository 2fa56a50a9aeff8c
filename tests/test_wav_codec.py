"""WAV (RIFF/PCM) codec + audio envelope near-dup units."""

from __future__ import annotations

import numpy as np

from flink_stream_spark.operators.multimodal import (
    AUDIO_L1_MAX,
    ENV_WINDOWS,
    wav_envelope_stats,
)
from flink_stream_spark.operators.wav import (
    decode_wav,
    encode_wav,
    energy_envelope,
)


def test_roundtrip_bit_depths_and_channels():
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32767, (1000, 2))
    d = decode_wav(encode_wav(s, rate=44100, bits=16))
    assert (d["rate"], d["channels"], d["bits"]) == (44100, 2, 16)
    assert np.array_equal(d["samples"], s)
    s8 = rng.randint(-128, 128, (501,))  # odd byte length -> RIFF pad
    d8 = decode_wav(encode_wav(s8, rate=8000, bits=8))
    assert d8["bits"] == 8 and np.array_equal(d8["samples"][:, 0], s8)
    s32 = rng.randint(-(2**31), 2**31 - 1, (10, 1), dtype=np.int64)
    assert np.array_equal(decode_wav(encode_wav(s32, bits=32))["samples"], s32)
    # 24-bit: full signed range incl. both extremes, sign extension exact
    s24 = np.concatenate(
        [
            np.array([-(2**23), 2**23 - 1, -1, 0, 1], dtype=np.int64),
            rng.randint(-(2**23), 2**23 - 1, (200,)).astype(np.int64),
        ]
    )
    d24 = decode_wav(encode_wav(s24, rate=48000, bits=24))
    assert d24["bits"] == 24
    assert np.array_equal(d24["samples"][:, 0], s24)
    s24st = rng.randint(-(2**23), 2**23 - 1, (64, 2)).astype(np.int64)
    assert np.array_equal(decode_wav(encode_wav(s24st, bits=24))["samples"], s24st)


def test_decoder_rejects_non_wav_and_malformed():
    assert decode_wav(b"") is None
    assert decode_wav(b"definitely not audio content here") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    good = bytearray(encode_wav(np.zeros(10, dtype=np.int64), bits=16))
    bad = bytearray(good)
    bad[20] = 3  # format tag != PCM
    assert decode_wav(bytes(bad)) is None
    assert decode_wav(bytes(good[:30])) is None  # truncated data chunk
    bad2 = bytearray(good)
    bad2[32] = 99  # block_align inconsistent with channels*bytes
    assert decode_wav(bytes(bad2)) is None


def test_energy_envelope_exact_integer_partitions():
    rng = np.random.RandomState(7)
    s = rng.randint(-32768, 32767, (333, 2))
    env = energy_envelope(s, ENV_WINDOWS)
    mono = s.sum(axis=1) // 2
    n = len(mono)
    for w in range(ENV_WINDOWS):
        lo, hi = (w * n) // ENV_WINDOWS, ((w + 1) * n) // ENV_WINDOWS
        assert env[w] == int(np.abs(mono[lo:hi]).sum()) // (hi - lo)


def test_envelope_near_dup_property():
    """A small perturbation of the samples moves the envelope by less
    than the verify threshold; unrelated audio does not."""
    rng = np.random.RandomState(11)
    base = (rng.randint(-8000, 8000, 2048)).astype(np.int64)
    perturbed = base + rng.randint(-64, 64, 2048)
    other = rng.randint(-32768, 32767, 2048).astype(np.int64)
    e0 = energy_envelope(base[:, None], ENV_WINDOWS)
    e1 = energy_envelope(perturbed[:, None], ENV_WINDOWS)
    e2 = energy_envelope(other[:, None], ENV_WINDOWS)
    assert int(np.abs(e0 - e1).sum()) <= AUDIO_L1_MAX
    assert int(np.abs(e0 - e2).sum()) > AUDIO_L1_MAX


def test_wav_envelope_stats_stage(spark):
    """The Spark decode stage: real WAV payloads produce exact stats;
    non-WAV payloads take the zero fallback row."""
    rng = np.random.RandomState(13)
    s = rng.randint(-32768, 32767, (256, 1))
    wav = encode_wav(s, bits=16)
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"plain text payload"))],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r for r in wav_envelope_stats(media).collect()}
    mono = s[:, 0]
    assert rows[1]["n_frames"] == 256
    assert rows[1]["peak_abs"] == int(np.abs(mono).max())
    assert rows[1]["sum_abs"] == int(np.abs(mono).sum())
    assert rows[1]["env"] == [int(v) for v in energy_envelope(s, ENV_WINDOWS)]
    assert rows[2]["n_frames"] == 0 and rows[2]["env"] == [0] * ENV_WINDOWS
