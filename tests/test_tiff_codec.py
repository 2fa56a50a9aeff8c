"""TIFF codec units: every encoder variant round-trips pixel-exactly,
the RGB decode path reduces by the shared integer luma, PackBits obeys
its spec corner cases, malformed/junk payloads return None, and the
cross-codec property holds (same pixels via PNG and TIFF produce the
identical dHash grid)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_stream_spark.operators.tiff import (
    decode_tiff_gray,
    encode_tiff_gray,
    packbits_decode,
    packbits_encode,
)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("white_is_zero", [False, True])
@pytest.mark.parametrize("rps", [1, 4, 99])
def test_roundtrip_all_variants(big_endian, packbits, white_is_zero, rps):
    rng = np.random.RandomState(11)
    for shape in [(18, 16), (7, 5), (1, 1), (3, 200)]:
        pix = rng.randint(0, 256, shape).astype(np.uint8)
        enc = encode_tiff_gray(
            pix, big_endian=big_endian, packbits=packbits,
            rows_per_strip=rps, white_is_zero=white_is_zero,
        )
        dec = decode_tiff_gray(enc)
        assert dec is not None and (dec == pix).all()


def test_packbits_spec_corners():
    # no-op byte 0x80 is skipped
    assert packbits_decode(b"\x80\x00A", 1) == b"A"
    # max literal (128 bytes) and max run (128 repeats)
    lit = bytes(range(128))
    assert packbits_decode(b"\x7f" + lit, 128) == lit
    assert packbits_decode(b"\x81" + b"Z", 128) == b"Z" * 128
    # truncated inputs fail cleanly
    assert packbits_decode(b"\x05AB", 6) is None
    assert packbits_decode(b"\xfe", 3) is None
    # encoder: runs >= 3 become repeat packets
    enc = packbits_encode(b"AAAABCD")
    assert packbits_decode(enc, 7) == b"AAAABCD"


def _rgb_tiff_le(rgb: np.ndarray) -> bytes:
    """Hand-built little-endian RGB TIFF (the encoder is gray-only, so
    the RGB decode path gets a crafted stream)."""
    h, w, _ = rgb.shape
    data = rgb.astype(np.uint8).tobytes()
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 2), (277, 3, 1, 3),
        (278, 3, 1, h), (279, 4, 1, len(data)),
    ]
    # strip offset computed after IFD (8 header + 2 + 12*9 + 4)
    n = len(tags) + 1  # + strip offsets tag
    data_off = 8 + 2 + 12 * n + 4
    tags.insert(6, (273, 4, 1, data_off))
    tags.sort()
    out = bytearray(b"II" + struct.pack("<HI", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, val in tags:
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)
    out += data
    return bytes(out)


def test_rgb_reduces_by_shared_luma():
    rng = np.random.RandomState(12)
    rgb = rng.randint(0, 256, (6, 9, 3)).astype(np.uint8)
    dec = decode_tiff_gray(_rgb_tiff_le(rgb))
    assert dec is not None
    r64 = rgb.astype(np.int64)
    expect = (299 * r64[:, :, 0] + 587 * r64[:, :, 1] + 114 * r64[:, :, 2]) // 1000
    assert (dec == expect).all()


def test_malformed_returns_none():
    rng = np.random.RandomState(13)
    pix = rng.randint(0, 256, (10, 10)).astype(np.uint8)
    enc = bytearray(encode_tiff_gray(pix))
    assert decode_tiff_gray(bytes(enc[:6])) is None  # truncated header
    assert decode_tiff_gray(bytes(enc[:-5])) is None  # truncated strip
    bad = bytearray(enc)
    bad[4:8] = struct.pack("<I", 10**6)  # IFD offset out of bounds
    assert decode_tiff_gray(bytes(bad)) is None
    # LZW compression (5) is outside the profile -> None, not garbage
    lzw = bytearray(enc)
    # compression tag value: find tag 259 in the IFD
    (n_tags,) = struct.unpack_from("<H", lzw, 8)
    for t in range(n_tags):
        base = 10 + 12 * t
        (tag,) = struct.unpack_from("<H", lzw, base)
        if tag == 259:
            struct.pack_into("<H", lzw, base + 8, 5)
    assert decode_tiff_gray(bytes(lzw)) is None
    assert decode_tiff_gray(b"not a tiff at all, just some text") is None


def test_cross_codec_same_pixels_same_grid():
    """The same pixels shipped as PNG and as TIFF must produce the
    identical dHash grid — container independence of the perceptual
    hash, the property the image dedup operator relies on."""
    from flink_stream_spark.operators.png import (
        decode_png_gray,
        encode_png,
        gray_grid,
    )

    rng = np.random.RandomState(14)
    pix = rng.randint(0, 256, (18, 16)).astype(np.uint8)
    g_png = gray_grid(decode_png_gray(encode_png(pix)), 8, 9)
    g_tif = gray_grid(
        decode_tiff_gray(encode_tiff_gray(pix, big_endian=True, packbits=True)),
        8,
        9,
    )
    assert (g_png == g_tif).all()


def test_parse_image_header_tiff():
    from flink_stream_spark.operators.multimodal import parse_image_header

    pix = np.zeros((18, 16), dtype=np.uint8)
    for be in (False, True):
        assert parse_image_header(encode_tiff_gray(pix, big_endian=be)) == (16, 18)
    assert parse_image_header(b"II*\x00\x00\x00\x00") is None
