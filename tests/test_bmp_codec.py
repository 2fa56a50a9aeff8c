"""BMP codec (uncompressed DIB) + cross-codec dHash consistency units."""

from __future__ import annotations

import struct

import numpy as np

from flink_stream_spark.operators.bmp import decode_bmp_gray, encode_bmp


def test_roundtrip_all_layouts():
    rng = np.random.RandomState(0)
    cases = [
        rng.randint(0, 256, (16, 18)),        # w*3 = 54 bytes: no pad at 24bpp
        rng.randint(0, 256, (7, 5)),          # odd width: pad at both bpps
        np.full((8, 9), 200),                 # constant
        (np.add.outer(np.arange(32), np.arange(41)) * 3) % 256,  # gradient
        rng.randint(0, 256, (1, 1)),          # minimal
    ]
    for img in cases:
        img = np.asarray(img, dtype=np.uint8)
        for bpp in (8, 24):
            for top_down in (False, True):
                got = decode_bmp_gray(encode_bmp(img, bpp=bpp, top_down=top_down))
                assert got is not None
                assert np.array_equal(got, img), (img.shape, bpp, top_down)


def test_decode_32bpp_bgrx():
    """32-bit BGRX (decode-only layout): luma must ignore the pad byte."""
    rng = np.random.RandomState(1)
    h, w = 6, 7
    r = rng.randint(0, 256, (h, w))
    g = rng.randint(0, 256, (h, w))
    bl = rng.randint(0, 256, (h, w))
    px = np.zeros((h, w, 4), dtype=np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = bl, g, r
    px[:, :, 3] = rng.randint(0, 256, (h, w))  # junk pad byte
    data_off = 14 + 40
    body = px[::-1].tobytes()  # bottom-up, stride = w*4 (already 4-aligned)
    header = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(body), 0, 0, 0, 0)
    got = decode_bmp_gray(header + dib + body)
    assert got is not None
    want = ((299 * r + 587 * g + 114 * bl) // 1000).astype(np.uint8)
    assert np.array_equal(got, want)


def test_nonidentity_palette_luma():
    """8-bit decode must go through the palette, not treat indices as gray."""
    img = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    raw = encode_bmp(img, bpp=8)
    # rewrite palette entries 0..3 to distinct colors (BGRA quads at 14+40)
    pal = bytearray(raw)
    colors = [(10, 20, 30), (200, 100, 50), (0, 0, 255), (255, 255, 0)]
    for i, (b, g, r) in enumerate(colors):
        pal[54 + 4 * i : 54 + 4 * i + 4] = bytes((b, g, r, 0))
    got = decode_bmp_gray(bytes(pal))
    assert got is not None
    want = np.array(
        [
            [(299 * c[2] + 587 * c[1] + 114 * c[0]) // 1000 for c in colors[:2]],
            [(299 * c[2] + 587 * c[1] + 114 * c[0]) // 1000 for c in colors[2:]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(got, want)


def test_decoder_rejects_malformed_and_unsupported():
    good = encode_bmp(np.full((4, 4), 9, dtype=np.uint8), bpp=24)
    assert decode_bmp_gray(b"") is None
    assert decode_bmp_gray(b"BM") is None
    # plausible text payload: 'BM' + prose can never satisfy the DIB
    # structural checks (u32 header size forces NUL bytes)
    assert decode_bmp_gray(b"BM25 is a ranking function used by search " * 3) is None
    assert decode_bmp_gray(good[:-8]) is None  # truncated pixel data

    def patched(off, fmt, *vals):
        b = bytearray(good)
        struct.pack_into(fmt, b, off, *vals)
        return bytes(b)

    assert decode_bmp_gray(patched(14, "<I", 64)) is None   # unknown DIB size
    assert decode_bmp_gray(patched(26, "<H", 2)) is None    # planes != 1
    assert decode_bmp_gray(patched(28, "<H", 4)) is None    # 4bpp unsupported
    assert decode_bmp_gray(patched(30, "<I", 1)) is None    # RLE8 compression
    assert decode_bmp_gray(patched(18, "<i", 0)) is None    # zero width
    # 8bpp index beyond the declared palette
    pal8 = bytearray(encode_bmp(np.full((2, 2), 7, dtype=np.uint8), bpp=8))
    struct.pack_into("<I", pal8, 46, 4)  # colors_used = 4 < index 7
    assert decode_bmp_gray(bytes(pal8)) is None


def test_cross_codec_dhash_identical(spark):
    """The SAME pixels through PNG, GIF, and all four BMP layouts must
    produce the IDENTICAL 64-bit dHash — every branch converges on
    pixels with the same integer luma."""
    from flink_stream_spark.operators.gif import encode_gif_gray
    from flink_stream_spark.operators.multimodal import dhash_bands
    from flink_stream_spark.operators.png import encode_png

    rng = np.random.RandomState(5)
    pix = rng.randint(0, 256, (16, 18)).astype(np.int64)
    u8 = pix.astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_png(u8, filter_type=3))),
            (2, bytearray(encode_gif_gray(pix))),
            (3, bytearray(encode_bmp(u8, bpp=8, top_down=False))),
            (4, bytearray(encode_bmp(u8, bpp=8, top_down=True))),
            (5, bytearray(encode_bmp(u8, bpp=24, top_down=False))),
            (6, bytearray(encode_bmp(u8, bpp=24, top_down=True))),
        ],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r["bands"] for r in dhash_bands(media).collect()}
    assert len({tuple(v) for v in rows.values()}) == 1
