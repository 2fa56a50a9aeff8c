"""Unit checks for multimodal UDF stages beyond what the fixture
corpus exercises (it contains no empty payloads)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_spark.operators.multimodal import FEATURE_BINS, extract_features


def test_feature_extract_empty_payload_zero_vector(spark):
    media = spark.createDataFrame(
        [(1, b""), (2, b"abc")], "doc_id bigint, payload binary"
    )
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["n_bytes"] == 0
    assert rows[1]["feature"] == [0] * FEATURE_BINS
    assert rows[2]["n_bytes"] == 3
    assert sum(rows[2]["feature"]) <= 1_000_000
    assert len(rows[2]["feature"]) == FEATURE_BINS


def test_pii_counts_consistent_with_redaction(spark, sf_small):
    """A detected email/phone must actually be redacted: any row with
    n_emails+n_phones > 0 has a redacted hash differing from md5 of
    its seeded text (self-consistency of detection vs rewrite)."""
    import flink_stream_spark.operators.corpus_ops as co

    df = co.text_pii_redact(spark, sf_small)
    flagged = df.filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0))
    assert flagged.count() > 0  # seeding guarantees non-vacuous
    # doc_id % 10 == 0 rows carry one email and one phone; %10==5 one email
    counts = {r["doc_id"]: (r["n_emails"], r["n_phones"]) for r in df.collect()}
    for doc_id, (ne, np_) in counts.items():
        if doc_id % 10 == 0:
            assert (ne, np_) == (1, 1), doc_id
        elif doc_id % 10 == 5:
            assert (ne, np_) == (1, 0), doc_id
        else:
            assert (ne, np_) == (0, 0), doc_id


def test_decode_meta_fallback_identical_both_modes():
    """Text payloads are never decodable images, so decode_meta equals
    the deterministic fake whether or not Pillow is installed — the
    invariant that keeps the oracled queries green in both modes."""
    from flink_stream_spark.operators.multimodal import decode_meta, fake_decode_meta

    for payload in (b"", b"x", b"hello world " * 100):
        assert decode_meta(payload) == fake_decode_meta(payload)


def test_decode_meta_real_image_when_pillow_present():
    """With Pillow installed, decode_meta returns TRUE dimensions for a
    real encoded image (skips cleanly in codec-free containers)."""
    import pytest
    PIL_Image = pytest.importorskip("PIL.Image")
    import io
    from flink_stream_spark.operators.multimodal import decode_meta, resize_image

    buf = io.BytesIO()
    PIL_Image.new("RGB", (37, 21)).save(buf, format="PNG")
    png = buf.getvalue()
    assert decode_meta(png) == (37, 21)
    resized = resize_image(png, 8, 5)
    assert decode_meta(resized) == (8, 5)


def make_png(width: int, height: int) -> bytes:
    """Craft a COMPLETE valid PNG (magic + CRC'd IHDR + zlib IDAT of
    real RGB scanlines + IEND) with stdlib only — genuine image bytes
    any conformant decoder accepts, no Pillow needed."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x40\x80\xc0" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_stdlib_header_parse_real_dimensions():
    """The dependency-free decode branch returns TRUE dimensions from
    genuine image bytes of every supported container — this is the
    real-codec proof that runs in CI with no Pillow installed."""
    import struct

    from flink_stream_spark.operators.multimodal import (
        decode_meta,
        fake_decode_meta,
        parse_image_header,
    )

    png = make_png(37, 21)
    assert parse_image_header(png) == (37, 21)
    assert decode_meta(png) == (37, 21)
    assert decode_meta(png) != fake_decode_meta(png)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00" + b"\x3b"
    assert decode_meta(gif) == (320, 200)

    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + 12, 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, 64, -48, 1, 24, 0, 12, 0, 0, 0, 0)
    )
    assert decode_meta(bmp) == (64, 48)  # top-down rows: |height|

    jpeg = (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + struct.pack(">H", 15) + b"JFIF\x00" + b"\x00" * 8  # APP0
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 99, 123) + b"\x01" + b"\x00" * 3  # SOF0: h=99 w=123
    )
    assert decode_meta(jpeg) == (123, 99)


def test_stdlib_header_parse_rejects_corrupt_and_text():
    """Strict validation: a PNG with a flipped IHDR byte (CRC mismatch)
    and arbitrary text bytes must fall through to the deterministic
    fake — the invariant that keeps the oracled queries' hashes stable."""
    from flink_stream_spark.operators.multimodal import (
        decode_meta,
        fake_decode_meta,
        parse_image_header,
    )

    png = bytearray(make_png(37, 21))
    png[17] ^= 0x01  # corrupt a width byte inside the CRC'd region
    assert parse_image_header(bytes(png)) is None
    assert decode_meta(bytes(png)) == fake_decode_meta(bytes(png))
    for text in (b"", b"GIF", b"BMoney talks", b"plain prose " * 50):
        assert parse_image_header(text) is None
        assert decode_meta(text) == fake_decode_meta(text)
    # ASCII text starting with the GIF magic: nonzero "dimensions" but
    # no block sentinel after the 13-byte header -> rejected
    assert parse_image_header(b"GIF87an old scanned image format") is None
    assert parse_image_header(b"GIF89a was released in 1989.") is None


def test_gif_with_global_color_table_parses():
    import struct

    from flink_stream_spark.operators.multimodal import parse_image_header

    # flags 0x82: GCT present, 2^(2+1)=8 entries -> 24 bytes, then the
    # image-descriptor sentinel 0x2C
    gif = (
        b"GIF89a"
        + struct.pack("<HH", 31, 17)
        + bytes([0x82, 0x00, 0x00])
        + b"\x00" * 24
        + b"\x2c"
    )
    assert parse_image_header(gif) == (31, 17)
    # same bytes minus the sentinel -> rejected
    assert parse_image_header(gif[:-1]) is None


def test_extract_media_metadata_mixed_real_and_text(spark):
    """e2e through the mapInPandas stage: a genuine PNG payload in the
    same Arrow batch as text payloads gets REAL dimensions while the
    text rows keep the deterministic fake."""
    from flink_stream_spark.operators.multimodal import (
        extract_media_metadata,
        fake_decode_meta,
    )

    png = make_png(160, 90)
    media = spark.createDataFrame(
        [(1, png), (2, b"just words here")], "doc_id bigint, payload binary"
    )
    rows = {r["doc_id"]: r for r in extract_media_metadata(media).collect()}
    assert (rows[1]["fake_width"], rows[1]["fake_height"]) == (160, 90)
    fw, fh = fake_decode_meta(b"just words here")
    assert (rows[2]["fake_width"], rows[2]["fake_height"]) == (fw, fh)


def test_resize_image_raises_cleanly_without_codecs():
    import importlib.util

    import pytest

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("Pillow installed; covered by the real-image test")
    from flink_stream_spark.operators.multimodal import resize_image

    with pytest.raises(NotImplementedError):
        resize_image(b"abc", 2, 2)


def test_dhash_planted_near_identical_pair(spark):
    """A near-identical payload pair (one byte flipped) must be found
    by the banded dHash dedup: hamming <= 7 pairs are GUARANTEED
    nominated (pigeonhole over the 8 byte-bands), and distant payloads
    must not pair up."""
    import numpy as np

    from flink_stream_spark.operators.multimodal import (
        DHASH_HAMMING_MAX,
        dhash_bands,
    )

    rng = np.random.RandomState(7)
    base = bytes(rng.randint(0, 256, 600, dtype=np.uint8).tobytes())
    near = bytearray(base)
    near[300] ^= 0xFF  # one flipped byte: a handful of dHash bits move
    rows = [(1, base), (2, bytes(near))] + [
        (i, bytes(rng.randint(0, 256, 600, dtype=np.uint8).tobytes()))
        for i in range(3, 20)
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    bands = {r["doc_id"]: r["bands"] for r in dhash_bands(media).collect()}
    ham = sum(
        bin(a ^ b).count("1") for a, b in zip(bands[1], bands[2])
    )
    assert ham <= 7  # the planted pair is near under the hash itself

    # run the full blocking + verify pipeline on the planted corpus
    from pyspark.sql import functions as F

    b = dhash_bands(media)
    e = b.select("doc_id", F.posexplode("bands").alias("bi", "bv"))
    cand = (
        e.alias("x")
        .join(
            e.alias("y"),
            (F.col("x.bi") == F.col("y.bi"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("c")
        )
        .distinct()
        .collect()
    )
    assert (1, 2) in {(r["a"], r["c"]) for r in cand}
    # sanity: blocking nominates far fewer than all pairs (19*18/2=171)
    assert len(cand) < 100
    assert ham <= DHASH_HAMMING_MAX


def test_dhash_adaptive_band_tiers(spark):
    """The corpus-size → band-tier rule and the band-merge algebra:
    a 16-bit band value is exactly b[2r] + 256*b[2r+1] over the same
    byte-bands, so signatures (and the Hamming verify) are
    tier-independent."""
    from flink_stream_spark.operators.multimodal import (
        DHASH_TIER1_MAX,
        DHASH_TIER2_MAX,
        dhash_bands,
        dhash_num_bands,
    )

    assert dhash_num_bands(500) == 8
    assert dhash_num_bands(DHASH_TIER1_MAX) == 8
    assert dhash_num_bands(DHASH_TIER1_MAX + 1) == 4
    assert dhash_num_bands(DHASH_TIER2_MAX) == 4
    assert dhash_num_bands(DHASH_TIER2_MAX + 1) == 2

    media = spark.createDataFrame(
        [(1, b"some payload bytes for hashing xyz")],
        "doc_id bigint, payload binary",
    )
    b = dhash_bands(media).collect()[0]["bands"]
    merged16 = [b[2 * r] + 256 * b[2 * r + 1] for r in range(4)]
    merged32 = [
        sum(b[4 * r + t] * (256**t) for t in range(4)) for r in range(2)
    ]
    # the merge is information-preserving: byte-bands recover exactly
    for r in range(4):
        assert merged16[r] % 256 == b[2 * r]
        assert merged16[r] // 256 == b[2 * r + 1]
    for r in range(2):
        v = merged32[r]
        assert [v % 256, (v >> 8) % 256, (v >> 16) % 256, (v >> 24) % 256] == b[
            4 * r : 4 * r + 4
        ]
