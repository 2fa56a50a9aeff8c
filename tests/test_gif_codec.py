"""GIF codec (real LZW) + cross-codec dHash consistency units."""

from __future__ import annotations

import numpy as np

from flink_stream_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_gray,
    encode_gif_gray,
)


def test_roundtrip_image_shapes_and_contents():
    rng = np.random.RandomState(0)
    cases = [
        rng.randint(0, 256, (16, 18)),           # random: worst-case LZW
        np.tile(np.arange(6).repeat(3), (20, 1))[:, :18] * 40,  # runs
        np.full((8, 9), 200),                    # constant
        (np.add.outer(np.arange(32), np.arange(40)) * 3) % 256,  # gradient
        rng.randint(0, 256, (120, 150)),         # big: crosses the 4096
        #                                          dict cap -> mid-stream
        #                                          CLEAR + reset
    ]
    for img in cases:
        img = np.asarray(img, dtype=np.int64)
        for interlace in (False, True):
            got = decode_gif_gray(encode_gif_gray(img, interlace=interlace))
            assert got is not None
            assert np.array_equal(got, img), (img.shape, interlace)


def test_lzw_fuzz_all_code_sizes():
    rng = np.random.RandomState(1)
    for _ in range(30):
        m = rng.randint(2, 9)
        n = rng.randint(1, 6000)
        seq = [int(v) for v in rng.randint(0, 1 << m, n)]
        assert _lzw_decode(_lzw_encode(seq, m), m, n) == seq


def test_decoder_rejects_malformed():
    good = encode_gif_gray(np.full((4, 4), 9))
    assert decode_gif_gray(b"") is None
    assert decode_gif_gray(b"GIF89a") is None
    assert decode_gif_gray(b"GIF89a once upon a time there was") is None
    assert decode_gif_gray(good[:-4]) is None  # truncated sub-blocks
    tampered = bytearray(good)
    tampered[-10] ^= 0xFF  # corrupt the LZW stream
    assert decode_gif_gray(bytes(tampered)) is None
    # image declaring more pixels than the stream provides
    assert (
        decode_gif_gray(good.replace(bytes([4, 0, 4, 0]), bytes([9, 0, 9, 0])))
        is None
    )


def test_cross_codec_dhash_identical(spark):
    """The SAME pixels through PNG and GIF containers must produce the
    IDENTICAL 64-bit dHash — the decode branches converge on pixels."""
    from flink_stream_spark.operators.multimodal import dhash_bands
    from flink_stream_spark.operators.png import encode_png

    rng = np.random.RandomState(5)
    pix = rng.randint(0, 256, (16, 18)).astype(np.int64)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_png(pix.astype(np.uint8), filter_type=3))),
            (2, bytearray(encode_gif_gray(pix))),
            (3, bytearray(encode_gif_gray(pix, interlace=True))),
        ],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r["bands"] for r in dhash_bands(media).collect()}
    assert rows[1] == rows[2] == rows[3]
