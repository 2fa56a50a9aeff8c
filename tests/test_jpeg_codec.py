"""Baseline-JPEG codec units (operators/jpeg.py) + the dedup-query
evidence the round-6 verdict asked for: a re-encoded / one-pixel-edited
JPEG pair must be FOUND by multimodal_image_dedup_dhash (byte-domain
hashing catches neither — a re-encode rewrites nearly every container
byte). The corpus-wide oracle twin is the registered
``multimodal_jpeg_roundtrip_dhash`` query (tests/test_registry_oracle.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_stream_spark.operators.jpeg import (
    _B_FLOAT,
    _BI,
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_gray,
    decode_jpeg_rgb,
    encode_jpeg,
    encode_jpeg_gray,
    idct2d_blocks,
)

RNG = np.random.default_rng(42)


def _img(h, w):
    return RNG.integers(0, 256, (h, w), dtype=np.uint8)


# --- IDCT pinning ----------------------------------------------------------


def test_idct_dc_only_is_exact():
    """A DC-only block (constant image block) must reproduce its value
    exactly for every representable level — the property the oracled
    round-trip query leans on."""
    vals = np.arange(256, dtype=np.int64)
    coeffs = np.zeros((256, 8, 8), dtype=np.int64)
    coeffs[:, 0, 0] = 8 * (vals - 128)  # orthonormal DC of a constant
    out = idct2d_blocks(coeffs)
    assert np.array_equal(out, np.broadcast_to(vals[:, None, None], (256, 8, 8)))


def test_idct_matches_float_reference_within_one():
    """The pinned integer IDCT tracks the exact float IDCT within 1
    level on random coefficient blocks (13-bit basis precision)."""
    coeffs = RNG.integers(-512, 512, (64, 8, 8)).astype(np.int64)
    got = idct2d_blocks(coeffs).astype(np.int64)
    ref = np.einsum("ux,nuv,vy->nxy", _B_FLOAT, coeffs.astype(float), _B_FLOAT)
    ref = np.clip(np.round(ref) + 128, 0, 255)
    assert np.abs(got - ref).max() <= 1


def test_idct_basis_is_pinned():
    """The scaled basis is integer and module-frozen: bit-reproducible
    decode requires the table never drift."""
    assert _BI.dtype == np.int64
    assert _BI[0, 0] == 2896  # round(sqrt(1/8) * 2^13)
    assert np.array_equal(_BI, np.round(_B_FLOAT * 8192.0).astype(np.int64))


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))


# --- round-trips -----------------------------------------------------------


def test_constant_blocks_roundtrip_exact_all_layouts():
    """Constant 8x8 blocks survive q100 encode→decode pixel-exactly in
    every component layout (zero AC + rational DC)."""
    grid = _img(8, 9)
    y = np.repeat(np.repeat(grid, 8, 0), 8, 1)  # 64x72
    layouts = [
        (None, None),
        ([(1, 1), (1, 1), (1, 1)], (64, 72)),
        ([(2, 1), (1, 1), (1, 1)], (64, 36)),
        ([(2, 2), (1, 1), (1, 1)], (32, 36)),
    ]
    for sampling, cdim in layouts:
        if sampling is None:
            enc = encode_jpeg_gray(y, quality=100)
        else:
            cb, cr = _img(*cdim), _img(*cdim)
            enc = encode_jpeg([y, cb, cr], sampling, quality=100)
        dec = decode_jpeg_gray(enc)
        assert dec is not None and np.array_equal(dec, y), sampling


def test_constant_chroma_roundtrip_exact_420():
    """Chroma planes are entropy-decoded through the same path; 8x8-
    constant chroma blocks round-trip exactly too (MCU interleave
    correctness for the subsampled components)."""
    y = np.repeat(np.repeat(_img(4, 6), 16, 0), 16, 1)  # 64x96
    cb = np.repeat(np.repeat(_img(4, 6), 8, 0), 8, 1)  # 32x48
    cr = np.repeat(np.repeat(_img(4, 6), 8, 0), 8, 1)
    enc = encode_jpeg([y, cb, cr], [(2, 2), (1, 1), (1, 1)], quality=100)
    d = decode_jpeg(enc)
    assert np.array_equal(d["planes"][1], cb)
    assert np.array_equal(d["planes"][2], cr)


def test_general_image_q100_error_bound():
    """Quality 100 (all-ones quant): the only loss is forward-DCT
    rounding + integer-IDCT rounding — max 1 level on arbitrary
    images. This pins the FULL AC huffman path (random images hit
    every run-length shape and the byte-stuffing path)."""
    img = _img(48, 64)
    dec = decode_jpeg_gray(encode_jpeg_gray(img, quality=100))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1


def test_lossy_quality_bounded_and_monotone():
    img = np.clip(
        128 + 40 * np.sin(np.arange(40 * 48).reshape(40, 48) / 7.0), 0, 255
    ).astype(np.uint8)
    errs = {}
    for q in (50, 75, 90):
        dec = decode_jpeg_gray(encode_jpeg_gray(img, quality=q))
        errs[q] = float(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[90] <= errs[75] <= errs[50]
    assert errs[50] < 16  # sane lossy bound on a smooth image


def test_odd_dimensions_pad_and_crop():
    """Non-multiple-of-MCU sizes: encoder replicate-pads, decoder crops
    to the SOF-declared size — for every sampling layout."""
    img = _img(35, 51)
    for sampling in (None, [(2, 2), (1, 1), (1, 1)], [(2, 1), (1, 1), (1, 1)]):
        if sampling is None:
            enc = encode_jpeg_gray(img, quality=100)
        else:
            sh, sv = sampling[0]
            ch, cw = -(-35 // sv), -(-51 // sh)
            enc = encode_jpeg(
                [img, _img(ch, cw), _img(ch, cw)], sampling, quality=100
            )
        dec = decode_jpeg_gray(enc)
        assert dec.shape == (35, 51)
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1


def test_restart_markers_roundtrip():
    """DRI/RSTn: markers land every N MCUs, DC predictors reset on both
    sides, decode is unchanged."""
    img = _img(64, 64)
    enc_plain = encode_jpeg_gray(img, quality=100)
    enc_rst = encode_jpeg_gray(img, quality=100, restart_interval=2)
    assert b"\xff\xd0" in enc_rst or b"\xff\xd1" in enc_rst
    assert np.array_equal(decode_jpeg_gray(enc_rst), decode_jpeg_gray(enc_plain))


def test_decode_is_deterministic():
    enc = encode_jpeg_gray(_img(24, 24), quality=85)
    a, b = decode_jpeg_gray(enc), decode_jpeg_gray(enc)
    assert np.array_equal(a, b)


def test_rgb_constant_chroma():
    """YCbCr->RGB conversion: neutral chroma (128) must give R=G=B=Y."""
    y = np.repeat(np.repeat(_img(2, 2), 8, 0), 8, 1)
    flat = np.full((16, 16), 128, dtype=np.uint8)
    enc = encode_jpeg([y, flat, flat], [(1, 1)] * 3, quality=100)
    rgb = decode_jpeg_rgb(enc)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])
    assert np.array_equal(rgb[:, :, 1], rgb[:, :, 2])
    assert np.array_equal(rgb[:, :, 0], y)


# --- rejection paths -------------------------------------------------------


def test_rejects_non_jpeg_and_corrupt():
    assert decode_jpeg_gray(b"") is None
    assert decode_jpeg_gray(b"plain text, definitely not an image") is None
    assert decode_jpeg_gray(b"\x89PNG\r\n\x1a\n junk") is None
    enc = bytearray(encode_jpeg_gray(_img(16, 16)))
    assert decode_jpeg_gray(bytes(enc[:40])) is None  # truncated header
    assert decode_jpeg_gray(bytes(enc[:-20])) is None  # truncated entropy


def test_rejects_baseline_stream_mislabeled_progressive():
    """A baseline stream whose SOF0 is flipped to SOF2 must return None
    (its SOS header Ss=0/Se=63 is an illegal progressive DC scan),
    never a wrong decode. Real progressive streams decode — see
    tests/test_jpeg_progressive.py."""
    enc = bytearray(encode_jpeg_gray(_img(16, 16)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    assert decode_jpeg_gray(bytes(enc)) is None


def test_sixteen_bit_dqt_accepted():
    """DQT precision 1 (16-bit entries) parses; round-trip on a table
    rewritten to 16-bit stays decodable and equal."""
    enc = bytearray(encode_jpeg_gray(_img(16, 16), quality=100))
    i = enc.find(b"\xff\xdb")
    # old segment: len=67 (1 id + 64 bytes); rebuild as 16-bit (len=131)
    qt8 = bytes(enc[i + 5 : i + 5 + 64])
    seg16 = (
        b"\xff\xdb"
        + int(131).to_bytes(2, "big")
        + bytes([0x10])  # pq=1, tq=0
        + b"".join(int(v).to_bytes(2, "big") for v in qt8)
    )
    rebuilt = bytes(enc[:i]) + seg16 + bytes(enc[i + 69 :])
    a, b = decode_jpeg_gray(bytes(enc)), decode_jpeg_gray(rebuilt)
    assert a is not None and b is not None and np.array_equal(a, b)


# --- the dedup-query evidence (verdict round-6 #1 done-criterion) ----------


@pytest.fixture(scope="module")
def jpeg_corpus():
    """Base image + re-encode (q85) + one-pixel edit + an unrelated
    image, all as real JPEG payloads."""
    base = np.clip(
        128
        + 90 * np.sin(np.arange(64 * 72).reshape(64, 72) / 11.0)
        + 30 * np.cos(np.arange(72) / 3.0),
        0,
        255,
    ).astype(np.uint8)
    edited = base.copy()
    edited[10, 10] = 255 - edited[10, 10]
    other = RNG.integers(0, 256, (64, 72), dtype=np.uint8)
    return {
        1: encode_jpeg_gray(base, quality=100),
        2: encode_jpeg_gray(base, quality=85),  # re-encode
        3: encode_jpeg_gray(edited, quality=100),  # one-pixel edit
        4: encode_jpeg_gray(other, quality=100),  # unrelated
    }


def test_reencode_and_pixel_edit_found_by_dedup(spark, jpeg_corpus):
    """The actual near-dup behavior the codec buys: a re-encode and a
    one-pixel edit hash to (near-)identical pixel-domain dHash and are
    nominated + verified by the SAME pipeline the registered dedup
    query runs; the unrelated image is not paired with the base."""
    from flink_stream_spark.operators.multimodal import dhash_near_dup_pairs

    media = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in jpeg_corpus.items()],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(media).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4  # re-encode caught
    assert (1, 3) in pairs and pairs[(1, 3)] <= 1  # pixel edit caught
    assert (1, 4) not in pairs and (2, 4) not in pairs

    # and byte-domain hashing would NOT have caught the re-encode:
    # the two containers differ in nearly every byte
    a, b = jpeg_corpus[1], jpeg_corpus[2]
    m = min(len(a), len(b))
    same = sum(x == y for x, y in zip(a[:m], b[:m]))
    assert same / m < 0.5
