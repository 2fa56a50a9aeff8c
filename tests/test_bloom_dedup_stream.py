"""Streaming bloom-prefiltered exact dedup: parity with the batch
greedy (keep-first in stream order), batch-boundary independence,
replay idempotence (token + algebraic BIT_OR), and the load-bearing
prefilter property — non-member docs never reach the exact join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.dedup import bloom_prefilter
from flink_stream_spark.streaming.bloom_dedup_stream import (
    _folded_bloom,
    process_batch,
    start_incremental_bloom_dedup,
)
from flink_stream_spark.tables.managed import Warehouse

M_BITS = 1 << 16


def _write_stream_files(rows, src, n_files):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src.mkdir(parents=True)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part = rows[i * per : (i + 1) * per]
        if not part:
            continue
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in part], pa.int64()),
                "text": pa.array([r[1] for r in part], pa.string()),
            }
        )
        fpath = str(src / f"batch_{i:03d}.parquet")
        pq.write_table(tbl, fpath)
        os.utime(fpath, (1_700_000_000 + i, 1_700_000_000 + i))


def _greedy_reference(rows):
    """Keep-first by doc_id over exact text equality."""
    first: dict[str, int] = {}
    dup_of = {}
    for doc_id, text in sorted(rows):
        if text in first:
            dup_of[doc_id] = first[text]
        else:
            first[text] = doc_id
    return set(first.values()), dup_of


def _corpus(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    base = [(r["doc_id"], r["text"]) for r in docs.orderBy("doc_id").collect()]
    # plant exact duplicates across (future) batch boundaries: every
    # 7th doc reappears near the end of the stream with a new id
    shift = max(d for d, _ in base) + 1000
    dups = [(shift + i, t) for i, (_, t) in enumerate(base[::7])]
    return base + dups


def _run_stream(spark, rows, tmp_path, n_files):
    src = tmp_path / "stream_src"
    _write_stream_files(rows, src, n_files)
    wh = Warehouse(str(tmp_path / "wh"))
    hash_t = wh.table("bloom_hashes")
    bloom_t = wh.table("bloom_words")
    flags_t = wh.table("bloom_flags")
    q = start_incremental_bloom_dedup(
        spark, str(src), hash_t, bloom_t, flags_t,
        str(tmp_path / "ckpt"), m_bits=M_BITS,
    )
    q.processAllAvailable()
    q.stop()
    return hash_t, bloom_t, flags_t


def test_stream_matches_batch_greedy(spark, sf_small, tmp_path):
    rows = _corpus(spark, sf_small)
    hash_t, bloom_t, flags_t = _run_stream(spark, rows, tmp_path, 4)
    got = {
        r["doc_id"]: r["dup_of"]
        for r in flags_t.read(spark).filter(F.col("is_dup")).collect()
    }
    kept, want = _greedy_reference(rows)
    assert got == want
    # the hash index holds exactly the kept docs (bounded growth)
    assert {
        r["doc_id"] for r in hash_t.read(spark).select("doc_id").collect()
    } == kept
    # the folded bloom admits every kept hash (zero false negatives
    # against its own index)
    words = _folded_bloom(bloom_t, spark)
    idx_hashes = hash_t.read(spark).select("h")
    assert (
        bloom_prefilter(idx_hashes, words, M_BITS).count()
        == idx_hashes.count()
    )


def test_batch_boundary_independence(spark, sf_small, tmp_path):
    rows = _corpus(spark, sf_small)
    _, _, f_many = _run_stream(spark, rows, tmp_path / "a", 6)
    _, _, f_one = _run_stream(spark, rows, tmp_path / "b", 1)
    many = {(r["doc_id"], r["dup_of"]) for r in f_many.read(spark).collect()}
    one = {(r["doc_id"], r["dup_of"]) for r in f_one.read(spark).collect()}
    assert many == one


def test_replay_idempotent(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    hash_t = wh.table("bloom_hashes")
    bloom_t = wh.table("bloom_words")
    flags_t = wh.table("bloom_flags")
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id bigint, text string"
    )
    process_batch(b1, hash_t, bloom_t, flags_t, M_BITS, epoch_id=0)
    snap = sorted(tuple(r) for r in flags_t.read(spark).collect())
    words0 = sorted(tuple(r) for r in _folded_bloom(bloom_t, spark).collect())
    # replay the SAME epoch: token no-ops every commit; even if the
    # words re-appended, BIT_OR would change no bit
    process_batch(b1, hash_t, bloom_t, flags_t, M_BITS, epoch_id=0)
    assert sorted(tuple(r) for r in flags_t.read(spark).collect()) == snap
    assert (
        sorted(tuple(r) for r in _folded_bloom(bloom_t, spark).collect())
        == words0
    )
    # next epoch: a doc equal to an indexed one is a duplicate of it
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma")], "doc_id bigint, text string"
    )
    process_batch(b2, hash_t, bloom_t, flags_t, M_BITS, epoch_id=1)
    got = {
        r["doc_id"]: r["dup_of"]
        for r in flags_t.read(spark).filter("is_dup").collect()
    }
    assert got == {3: 1, 10: 2}


def test_prefilter_skips_nonmembers(spark, tmp_path):
    """The reason this module exists: a batch of all-new docs must
    mostly bypass the exact join. With 500 indexed and 400 disjoint
    probes at m=2^16 (>= 8 bits/hash), the maybe set is the fpp tail,
    not the batch."""
    wh = Warehouse(str(tmp_path / "wh"))
    hash_t = wh.table("bloom_hashes")
    bloom_t = wh.table("bloom_words")
    flags_t = wh.table("bloom_flags")
    b1 = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(500)], "doc_id bigint, text string"
    )
    process_batch(b1, hash_t, bloom_t, flags_t, M_BITS, epoch_id=0)
    probes = spark.createDataFrame(
        [(1000 + i, f"new-{i}") for i in range(400)],
        "doc_id bigint, text string",
    )
    words = _folded_bloom(bloom_t, spark)
    maybe = bloom_prefilter(
        probes.select("doc_id", F.md5("text").alias("h")), words, M_BITS
    ).count()
    assert maybe < 0.06 * 400, maybe
