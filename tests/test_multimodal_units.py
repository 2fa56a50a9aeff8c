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


def test_resize_image_raises_cleanly_without_codecs():
    import importlib.util

    import pytest

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("Pillow installed; covered by the real-image test")
    from flink_stream_spark.operators.multimodal import resize_image

    with pytest.raises(NotImplementedError):
        resize_image(b"abc", 2, 2)
