"""Stdlib-only WAV (RIFF/PCM) audio codec.

The multimodal surface treats audio as opaque binary + typed
metadata; this module makes the decode REAL for the one audio
container that needs no codec library at all: RIFF WAVE with
integer PCM samples (format tag 1). Decode walks the RIFF chunk
list (strict: magic, chunk bounds, a complete ``fmt `` before
``data``), validates the format fields against each other
(block_align == channels * bytes/sample, byte_rate consistency),
and yields the raw sample frames; anything else — compressed
formats, float PCM, truncated chunks — returns ``None`` and the
caller falls back to its deterministic stand-in, the same ladder
discipline as the PNG/image path (``multimodal.decode_meta``).

The matching encoder exists so tests and the oracled round-trip
query can craft valid WAVs deterministically. Both directions are
integer-exact, so an oracle can reproduce every derived statistic
straight from the source bytes.

Scale posture: decode runs inside Arrow-batched ``mapInPandas``
stages — narrow, embarrassingly parallel, no shuffle. Sample
extraction is ``numpy.frombuffer`` (vectorized), not a Python loop.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_DTYPE = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_BITS_OK = (8, 16, 24, 32)


def _unpack_int24(data: bytes) -> "np.ndarray":
    """Little-endian signed 24-bit frames -> int64, vectorized:
    widen each 3-byte frame to 4 bytes, reinterpret as int32 with the
    payload in the high 3 bytes, then arithmetic-shift the sign down."""
    u = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
    wide = np.zeros((u.shape[0], 4), dtype=np.uint8)
    wide[:, 1:] = u
    return (wide.view("<i4").ravel() >> 8).astype(np.int64)


def decode_wav(payload: bytes) -> "dict | None":
    """Decode a RIFF/WAVE integer-PCM payload.

    Returns {"rate", "channels", "bits", "samples"} — ``samples`` is
    an (n_frames, channels) int32 numpy array (8-bit unsigned is
    shifted to signed center like every PCM reader) — or ``None`` for
    anything this decoder does not support.
    """
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            return None
        if cid == b"fmt ":
            if clen < 16:
                return None
            tag, ch, rate, brate, balign, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1 or ch == 0 or rate == 0 or bits not in _BITS_OK:
                return None  # integer PCM only
            if balign != ch * (bits // 8) or brate != rate * balign:
                return None
            fmt = (ch, rate, bits, balign)
        elif cid == b"data":
            if fmt is None:
                return None  # data before fmt: malformed
            data = body
            break
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    ch, rate, bits, balign = fmt
    n_frames = len(data) // balign
    if bits == 24:
        flat = _unpack_int24(data[: n_frames * balign])
    else:
        flat = np.frombuffer(
            data[: n_frames * balign], dtype=_FMT_DTYPE[bits]
        ).astype(np.int64)
    samples = flat.reshape(n_frames, ch)
    if bits == 8:
        samples = samples - 128  # 8-bit WAV is unsigned, center it
    return {"rate": rate, "channels": ch, "bits": bits, "samples": samples}


def encode_wav(samples, rate: int = 16000, bits: int = 16) -> bytes:
    """Encode an (n_frames,) or (n_frames, channels) integer array as
    a canonical RIFF/WAVE PCM payload. Deterministic — fixed chunk
    order, no ancillary chunks."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    ch = arr.shape[1]
    if bits == 8:
        raw = (arr + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        # low 3 little-endian bytes of each int32 frame
        i4 = arr.astype("<i4").reshape(-1, 1).view(np.uint8)
        raw = np.ascontiguousarray(i4[:, :3]).tobytes()
    elif bits in (16, 32):
        raw = arr.astype(_FMT_DTYPE[bits]).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    balign = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * balign, balign, bits)
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"  # RIFF word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mono_abs(samples: "np.ndarray") -> "np.ndarray":
    """|mono mix| of (n_frames, channels) samples: integer floor-mean
    across channels, then abs — the shared input of peak/sum stats AND
    the energy envelope (computed once per payload, not per consumer)."""
    return np.abs(samples.sum(axis=1) // samples.shape[1])


def envelope_from_abs(a: "np.ndarray", n_windows: int) -> "np.ndarray":
    """Integer mean envelope over ``n_windows`` equal integer
    partitions of an |amplitude| stream (exact floor-divisions, so an
    oracle reproduces every value)."""
    n = len(a)
    out = np.zeros(n_windows, dtype=np.int64)
    if n == 0:
        return out
    bounds = [(w * n) // n_windows for w in range(n_windows + 1)]
    for w in range(n_windows):
        lo, hi = bounds[w], bounds[w + 1]
        if hi > lo:
            out[w] = int(a[lo:hi].sum()) // (hi - lo)
    return out


def energy_envelope(samples: "np.ndarray", n_windows: int) -> "np.ndarray":
    """Integer mean-absolute-amplitude envelope over ``n_windows``
    equal integer partitions of the (mono-mixed) sample stream — the
    deterministic acoustic fingerprint the audio near-dup stage hashes
    (the audio analogue of the dHash block-mean grid). Mono mix is an
    integer floor-mean across channels; window mean is an exact
    integer floor-division, so an oracle reproduces every value."""
    return envelope_from_abs(mono_abs(samples), n_windows)
