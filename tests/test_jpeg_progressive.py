"""Progressive (SOF2) JPEG codec tests.

The load-bearing property is CROSS-CODER EQUALITY: the progressive
encoder transports the exact same quantized coefficients as the
baseline encoder, so decode(progressive(x)) must equal
decode(baseline(x)) pixel-for-pixel — any error in either side's
spectral-selection, successive-approximation, EOB-run, refinement,
interleave, or restart logic breaks the equality. On top of that:
robustness (truncation, corruption -> None, never wrong pixels) and
the dhash decode-ladder integration."""

from __future__ import annotations

import numpy as np
import pytest

from flink_stream_spark.operators.jpeg import (
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg,
    encode_jpeg_progressive,
)

LAYOUTS = [
    None,  # grayscale
    [(1, 1), (1, 1), (1, 1)],  # 4:4:4
    [(2, 1), (1, 1), (1, 1)],  # 4:2:2
    [(2, 2), (1, 1), (1, 1)],  # 4:2:0
    [(1, 2), (1, 1), (1, 1)],  # 4:4:0 (vertical-only subsampling)
]


def _planes(rng, h, w, sampling):
    if sampling is None:
        return [rng.randint(0, 256, (h, w)).astype(np.uint8)], None
    sh, sv = sampling[0]
    cw, ch = -(-w // sh), -(-h // sv)
    return [
        rng.randint(0, 256, (h, w)).astype(np.uint8),
        rng.randint(0, 256, (ch, cw)).astype(np.uint8),
        rng.randint(0, 256, (ch, cw)).astype(np.uint8),
    ], sampling


@pytest.mark.parametrize("sampling", LAYOUTS)
@pytest.mark.parametrize(
    "h,w,quality,ri", [(64, 72, 100, 0), (41, 55, 80, 0), (64, 72, 100, 2),
                       (33, 31, 60, 4)]
)
def test_cross_coder_equality(sampling, h, w, quality, ri):
    rng = np.random.RandomState(hash((h, w, quality, ri)) % 2**31)
    planes, smp = _planes(rng, h, w, sampling)
    db = decode_jpeg(encode_jpeg(planes, smp, quality, ri))
    dp = decode_jpeg(encode_jpeg_progressive(planes, smp, quality, ri))
    assert dp is not None and db is not None
    assert dp["width"] == w and dp["height"] == h
    assert dp["sampling"] == db["sampling"]
    for x, y in zip(db["planes"], dp["planes"]):
        assert (x == y).all()


def test_constant_blocks_pixel_exact():
    """Quality-100 constant 8x8 blocks round-trip pixel-exactly through
    the progressive path too (the property the oracled registry query
    leans on — zero AC, rational DC, split across DC-first + refine)."""
    grid = np.arange(72, dtype=np.uint8).reshape(8, 9) * 3 + 7
    pix = np.repeat(np.repeat(grid, 8, 0), 8, 1)  # 64x72
    out = decode_jpeg_gray(encode_jpeg_progressive([pix], None, 100))
    assert out is not None
    assert (out == pix).all()


def test_smooth_gradient_heavy_eob_runs():
    """A smooth gradient quantizes to long zero tails — dense EOB0 and
    refinement-correction traffic; cross-coder equality must hold."""
    y, x = np.mgrid[0:64, 0:64]
    pix = ((x + y) * 2).astype(np.uint8)
    db = decode_jpeg_gray(encode_jpeg([pix], None, 30))
    dp = decode_jpeg_gray(encode_jpeg_progressive([pix], None, 30))
    assert (db == dp).all()


def test_truncation_returns_none():
    rng = np.random.RandomState(3)
    pix = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    enc = encode_jpeg_progressive([pix], None, 90)
    assert decode_jpeg(enc[:60]) is None  # inside header
    assert decode_jpeg(enc[:-2]) is None  # EOI stripped: strict
    assert decode_jpeg(enc[: len(enc) // 2]) is None  # mid-scan


def test_corrupt_entropy_returns_none_or_decodes():
    """Flipping bytes inside entropy data must never crash — either a
    clean None or a decoded (wrong-pixel) image; exceptions are the
    only failure."""
    rng = np.random.RandomState(4)
    pix = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    enc = bytearray(encode_jpeg_progressive([pix], None, 85))
    for off in range(len(enc) // 2, len(enc) - 4, 37):
        mut = bytearray(enc)
        mut[off] ^= 0x5A
        decode_jpeg(bytes(mut))  # must not raise


def test_dhash_ladder_decodes_progressive():
    """decode_jpeg_gray (the dhash_bands branch) now accepts SOF2 — a
    progressive re-encode of the same pixels produces the identical
    dHash grid as the baseline encode."""
    from flink_stream_spark.operators.png import gray_grid

    rng = np.random.RandomState(5)
    grid = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    pix = np.repeat(np.repeat(grid, 8, 0), 8, 1)
    gb = decode_jpeg_gray(encode_jpeg([pix], None, 100))
    gp = decode_jpeg_gray(encode_jpeg_progressive([pix], None, 100))
    assert gp is not None
    assert (gray_grid(gb, 8, 9) == gray_grid(gp, 8, 9)).all()
