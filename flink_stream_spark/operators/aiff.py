"""Stdlib-only AIFF (IFF/big-endian PCM) audio codec.

The second real audio container after operators/wav.py: Apple's AIFF
is the other uncompressed-PCM interchange format a mixed crawl
actually carries, and it differs from WAV in every structural detail
that can silently corrupt samples — IFF 'FORM'/'AIFF' framing instead
of RIFF/WAVE, BIG-endian sample words instead of little, SIGNED 8-bit
samples instead of unsigned, and the sample rate stored as an 80-bit
IEEE 754 extended float in the COMM chunk instead of a u32. Decode
returns the SAME dict contract as ``decode_wav`` ({"rate",
"channels", "bits", "samples"} with int64 (n_frames, channels)
samples), so every downstream consumer (envelope stats, constellation
fingerprints, the streaming dedup index) is container-agnostic: the
same clip re-encoded WAV->AIFF decodes to the identical sample array,
which the cross-codec tests pin.

Strictness mirrors the WAV decoder: chunk bounds checked, a complete
COMM required before SSND, frame count cross-validated against the
data length, non-integer or out-of-range sample rates rejected, and
anything unsupported (compressed AIFC, float samples) returns None —
the decode-ladder discipline.

Scale posture: decode runs inside Arrow-batched ``mapInPandas``
stages — narrow, embarrassingly parallel, no shuffle; sample
extraction is ``numpy.frombuffer``/view arithmetic, never a Python
loop.
"""

from __future__ import annotations

import struct

import numpy as np

_BE_DTYPE = {8: np.dtype("i1"), 16: np.dtype(">i2"), 32: np.dtype(">i4")}
_BITS_OK = (8, 16, 24, 32)


def decode_extended80(b: bytes) -> "int | None":
    """80-bit IEEE 754 extended float -> integer sample rate, or None
    if negative, non-integer, zero, or out of u32 range. The format:
    1 sign bit, 15 exponent bits (bias 16383), 64 mantissa bits with
    an EXPLICIT integer bit."""
    if len(b) != 10:
        return None
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    if se & 0x8000:
        return None  # negative rate
    e = (se & 0x7FFF) - 16383
    if mant == 0:
        return None
    if e < 0 or e > 31:
        return None  # fractional or absurd rate
    shift = 63 - e
    if mant & ((1 << shift) - 1):
        return None  # non-integer
    return int(mant >> shift)


def encode_extended80(rate: int) -> bytes:
    """Integer sample rate -> 80-bit extended float (exact)."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _unpack_int24_be(data: bytes) -> "np.ndarray":
    """Big-endian signed 24-bit frames -> int64, vectorized (mirror of
    wav._unpack_int24 with the payload bytes in big-endian order)."""
    u = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
    wide = np.zeros((u.shape[0], 4), dtype=np.uint8)
    wide[:, :3] = u
    return (wide.view(">i4").ravel() >> 8).astype(np.int64)


def decode_aiff(payload: bytes) -> "dict | None":
    """Decode a FORM/AIFF integer-PCM payload; returns the decode_wav
    dict contract or None for anything unsupported/malformed."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] != b"AIFF":
        return None
    pos = 12
    comm = None
    ssnd = None
    # IFF does NOT mandate chunk order — SSND may legally precede COMM
    # (advisor note, round 8), so buffer the SSND body during the walk
    # and resolve offset/payload only after both chunks are in hand.
    while pos + 8 <= len(b) and (comm is None or ssnd is None):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from(">I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            return None
        if cid == b"COMM":
            if clen != 18:
                return None  # AIFC extensions not supported
            ch, n_frames, bits = struct.unpack_from(">HIH", body, 0)
            rate = decode_extended80(body[8:18])
            if ch == 0 or bits not in _BITS_OK or rate is None:
                return None
            comm = (ch, n_frames, bits, rate)
        elif cid == b"SSND":
            if clen < 8:
                return None
            ssnd = body
        pos += 8 + clen + (clen & 1)  # IFF chunks are word-aligned
    if comm is None or ssnd is None:
        return None
    offset, block = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + offset :]
    ch, n_frames, bits, rate = comm
    balign = ch * (bits // 8)
    if len(data) < n_frames * balign:
        return None  # COMM promises more frames than SSND carries
    data = data[: n_frames * balign]
    if bits == 24:
        flat = _unpack_int24_be(data)
    else:
        flat = np.frombuffer(data, dtype=_BE_DTYPE[bits]).astype(np.int64)
    samples = flat.reshape(n_frames, ch)
    # AIFF 8-bit is SIGNED (unlike WAV): no recentering needed
    return {"rate": rate, "channels": ch, "bits": bits, "samples": samples}


def encode_aiff(samples, rate: int = 16000, bits: int = 16) -> bytes:
    """Encode an (n_frames,) or (n_frames, channels) integer array as
    a canonical FORM/AIFF PCM payload (COMM then SSND, offset/block
    0) — deterministic, mirror of encode_wav."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, ch = arr.shape
    if bits == 24:
        i4 = arr.astype(">i4").reshape(-1, 1).view(np.uint8)
        raw = np.ascontiguousarray(i4[:, 1:]).tobytes()
    elif bits in (8, 16, 32):
        raw = arr.astype(_BE_DTYPE[bits]).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    comm = struct.pack(">HIH", ch, n_frames, bits) + encode_extended80(rate)
    ssnd = struct.pack(">II", 0, 0) + raw
    body = b"AIFF"
    body += b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        body += b"\x00"  # IFF word alignment pad
    return b"FORM" + struct.pack(">I", len(body)) + body
