"""FLAC codec: round-trip exactness at byte-aligned AND bit-packed
widths, malformed-input rejection (magic/CRC/MD5/truncation), the
decoder-only surface via crafted streams (LPC, Rice2, escape
partitions, partition order > 0, wasted bits, left/right/mid-side
stereo), and the cross-codec property the decode ladder exists for
(round-8 verdict, Next #6)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_stream_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    _zigzag,
    decode_flac,
    encode_flac,
)
from flink_stream_spark.operators.aiff import encode_aiff
from flink_stream_spark.operators.wav import encode_wav


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_exact(bits, channels):
    rng = np.random.RandomState(bits + channels)
    lo = max(-(1 << (bits - 1)), -30000)
    hi = min((1 << (bits - 1)) - 1, 29999)
    arr = rng.randint(lo, hi + 1, size=(301, channels)).astype(np.int64)
    d = decode_flac(encode_flac(arr, rate=44100, bits=bits))
    assert d is not None
    assert d["rate"] == 44100 and d["bits"] == bits
    assert d["channels"] == channels
    assert (d["samples"] == arr).all()


def test_smooth_signal_compresses():
    t = np.arange(8000)
    smooth = (1200 * np.sin(t / 60)).astype(np.int64)
    enc = encode_flac(smooth, bits=16)
    assert len(enc) < 0.3 * 2 * len(smooth)  # actually compressed
    assert (decode_flac(enc)["samples"].ravel() == smooth).all()


def test_constant_and_multiframe():
    c = np.full(1000, -77, dtype=np.int64)
    assert (decode_flac(encode_flac(c, bits=16))["samples"].ravel() == c).all()
    rng = np.random.RandomState(3)
    big = rng.randint(-2000, 2000, size=9001).astype(np.int64)  # 3 frames
    assert (decode_flac(encode_flac(big, bits=16))["samples"].ravel() == big).all()


def test_malformed_rejected():
    arr = np.arange(64, dtype=np.int64) * 5 - 100
    good = encode_flac(arr, bits=16)
    assert decode_flac(b"") is None
    assert decode_flac(b"fLaX" + good[4:]) is None  # magic
    assert decode_flac(good[:30]) is None  # truncated metadata
    assert decode_flac(good[:-3]) is None  # truncated final frame
    # corrupt one frame body byte -> CRC-16 must catch it
    bad = bytearray(good)
    bad[-4] ^= 0x01
    assert decode_flac(bytes(bad)) is None
    # corrupt a frame header byte -> CRC-8 must catch it
    bad = bytearray(good)
    bad[4 + 4 + 34 + 2] ^= 0x40  # inside the first frame header
    assert decode_flac(bytes(bad)) is None
    # corrupt the STREAMINFO MD5 -> whole-stream check must catch it
    bad = bytearray(good)
    bad[4 + 4 + 18] ^= 0xFF
    assert decode_flac(bytes(bad)) is None
    # UTF-8 text never decodes
    assert decode_flac(b"fLaC is a lossless audio format, reportedly") is None


def test_encode_rejects_out_of_range():
    with pytest.raises(ValueError):
        encode_flac(np.array([200], dtype=np.int64), bits=8)


# --- crafted streams: the decoder-only surface ----------------------------


def _stream(frames: bytes, rate=16000, ch=1, bits=16, total=0, md5=b"\x00" * 16):
    si = _BitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    si.align()
    streaminfo = si.bytes() + md5
    return (
        b"fLaC"
        + bytes([0x80])
        + struct.pack(">I", len(streaminfo))[1:]
        + streaminfo
        + frames
    )


def _frame(subframe_bits_fn, bs, ch_assign, frame_no=0):
    """Build one frame: header (16-bit explicit blocksize, rate and
    sample size from STREAMINFO), subframes via callback, CRC-16."""
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)
    hdr.write(0b0000, 4)
    hdr.write(ch_assign, 4)
    hdr.write(0b000, 3)
    hdr.write(0, 1)
    hdr.align()
    head = bytearray(hdr.bytes())
    head += _utf8_coded(frame_no)
    head += struct.pack(">H", bs - 1)
    head.append(_crc8(bytes(head)))
    body = _BitWriter()
    subframe_bits_fn(body)
    body.align()
    fr = bytes(head) + body.bytes()
    return fr + struct.pack(">H", _crc16(fr))


def _write_rice(w, res, k, method=0, po=0, n_total=None, order=0):
    w.write(method, 2)
    w.write(po, 4)
    pbits = 4 if method == 0 else 5
    n = n_total if n_total is not None else len(res) + order
    idx = 0
    for p in range(1 << po):
        cnt = (n >> po) - (order if p == 0 else 0)
        w.write(k, pbits)
        for _ in range(cnt):
            u = int(_zigzag(np.array([res[idx]]))[0])
            w.write_unary(u >> k)
            w.write(u, k)
            idx += 1


def test_crafted_lpc_subframe():
    # s[i] = res[i] + (2*s[i-1] - s[i-2]*0) >> 1  with coef [3], shift 1
    warm = [100]
    res = [5, -3, 7, 0, -2, 9, -8, 1]
    bs = len(warm) + len(res)

    def sub(w):
        w.write(0, 1)
        w.write(0b100000, 6)  # LPC order 1
        w.write(0, 1)
        w.write(warm[0], 16)
        w.write(3 - 1, 4)  # precision 3
        w.write(1, 5)  # shift 1
        w.write(3, 3)  # coef = 3 (3-bit signed)
        _write_rice(w, res, k=2, order=1, n_total=bs)

    d = decode_flac(_stream(_frame(sub, bs, 0), total=bs))
    assert d is not None
    exp = list(warm)
    for r in res:
        exp.append(r + ((3 * exp[-1]) >> 1))
    assert d["samples"].ravel().tolist() == exp


def test_crafted_partition_order_and_rice2():
    rng = np.random.RandomState(7)
    res = rng.randint(-40, 40, size=16).astype(np.int64)
    bs = 16

    def sub(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # fixed order 0
        w.write(0, 1)
        _write_rice(w, res, k=4, method=1, po=2, n_total=bs)  # rice2, 4 parts

    d = decode_flac(_stream(_frame(sub, bs, 0), total=bs))
    assert d is not None and (d["samples"].ravel() == res).all()


def test_crafted_escape_partition():
    res = [-300, 500, -511, 12]
    bs = 4

    def sub(w):
        w.write(0, 1)
        w.write(0b001000, 6)
        w.write(0, 1)
        w.write(0, 2)  # method rice
        w.write(0, 4)  # po 0
        w.write(15, 4)  # ESCAPE
        w.write(10, 5)  # 10 raw bits per sample
        for r in res:
            w.write(r, 10)

    d = decode_flac(_stream(_frame(sub, bs, 0), total=bs))
    assert d is not None and d["samples"].ravel().tolist() == res


def test_crafted_wasted_bits():
    vals = [8, -16, 24, 40]  # all multiples of 8 -> 3 wasted bits

    def sub(w):
        w.write(0, 1)
        w.write(0b000001, 6)  # verbatim
        w.write(1, 1)  # wasted flag
        w.write(1, 3)  # unary 2 -> wasted = 3
        for v in vals:
            w.write(v >> 3, 13)  # 16 - 3 effective bits

    d = decode_flac(_stream(_frame(sub, len(vals), 0), total=len(vals)))
    assert d is not None and d["samples"].ravel().tolist() == vals


@pytest.mark.parametrize("assign", [8, 9, 10])
def test_crafted_stereo_decorrelation(assign):
    left = np.array([100, -50, 75, 0, 33, -1], dtype=np.int64)
    right = np.array([90, -60, 80, 5, 30, -2], dtype=np.int64)
    side = left - right
    if assign == 8:
        chans, widths = [left, side], [16, 17]
    elif assign == 9:
        chans, widths = [side, right], [17, 16]
    else:
        mid = (left + right) >> 1
        chans, widths = [mid, side], [16, 17]
    bs = len(left)

    def sub(w):
        for c, wd in zip(chans, widths):
            w.write(0, 1)
            w.write(0b000001, 6)  # verbatim
            w.write(0, 1)
            for v in c:
                w.write(int(v), wd)

    d = decode_flac(_stream(_frame(sub, bs, assign), ch=2, total=bs))
    assert d is not None and d["channels"] == 2
    assert (d["samples"][:, 0] == left).all()
    assert (d["samples"][:, 1] == right).all()


# --- cross-codec: the decode-ladder property ------------------------------


def test_cross_codec_wav_aiff_flac_identical():
    from flink_stream_spark.operators.multimodal import decode_audio

    rng = np.random.RandomState(11)
    arr = rng.randint(-30000, 30000, size=256).astype(np.int64)
    via_wav = decode_audio(encode_wav(arr, rate=16000, bits=16))
    via_aiff = decode_audio(encode_aiff(arr, rate=16000, bits=16))
    via_flac = decode_audio(encode_flac(arr, rate=16000, bits=16))
    for d in (via_wav, via_aiff, via_flac):
        assert d is not None and d["rate"] == 16000
    assert (via_wav["samples"] == via_flac["samples"]).all()
    assert (via_aiff["samples"] == via_flac["samples"]).all()
