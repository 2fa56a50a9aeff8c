"""Bloom-prefilter properties: zero false negatives (the correctness
load-bearing invariant — a false negative would silently keep a
duplicate), bounded false-positive rate at the sized m, and
result-equality with the plain exact join even when the filter is
deliberately undersized so false positives definitely occur."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_stream_spark.operators.dedup import (
    BLOOM_K,
    bloom_num_bits,
    bloom_prefilter,
    bloom_words,
)


def _hashes(spark, vals):
    return spark.createDataFrame(
        [(v,) for v in vals], "s string"
    ).select(F.md5("s").alias("h"))


def test_no_false_negatives(spark):
    members = [f"doc-{i}" for i in range(500)]
    idx = _hashes(spark, members)
    m = bloom_num_bits(idx.count())
    words = bloom_words(idx, m)
    kept = bloom_prefilter(_hashes(spark, members), words, m)
    assert kept.count() == 500  # every member must survive the prefilter


def test_fpp_bound_at_sized_m(spark):
    members = [f"doc-{i}" for i in range(2000)]
    probes = [f"other-{i}" for i in range(4000)]  # disjoint from members
    idx = _hashes(spark, members)
    m = bloom_num_bits(idx.count())  # >= 8 bits/hash -> fpp ~2.4% at k=4
    words = bloom_words(idx, m)
    fp = bloom_prefilter(_hashes(spark, probes), words, m).count()
    assert fp / 4000 < 0.06, fp  # 2.5x headroom over the analytic 2.4%


def test_result_exact_even_when_undersized(spark):
    """Force heavy false positives (m clamped to 256 bits for 300
    members) and verify the full operator chain — prefilter then
    exact verify — still produces exactly the true member set."""
    members = [f"m-{i}" for i in range(300)]
    probes = members[:50] + [f"p-{i}" for i in range(250)]
    idx = _hashes(spark, members).distinct()
    m = 256
    words = bloom_words(idx, m)
    maybe = bloom_prefilter(_hashes(spark, probes), words, m)
    assert maybe.count() > 50  # undersized bloom really does overshoot
    confirmed = maybe.join(idx, "h", "left_semi")
    truth = _hashes(spark, probes).join(idx, "h", "left_semi")
    got = {r["h"] for r in confirmed.collect()}
    want = {r["h"] for r in truth.collect()}
    assert got == want and len(want) == 50


def test_bloom_sizing():
    assert bloom_num_bits(0) == 1 << 13
    assert bloom_num_bits(1024) == 1 << 13
    assert bloom_num_bits(1025) == 1 << 14
    assert bloom_num_bits(1 << 20) == 1 << 23  # 8 bits per hash, pow2
    assert BLOOM_K == 4
