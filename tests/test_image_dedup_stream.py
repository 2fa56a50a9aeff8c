"""Incremental streaming image near-dedup parity (round-5 verdict,
Next #6): a media stream replayed through the dHash band-index
pipeline must flag exactly the images a greedy keep-first pass over
the batch-verified near-dup pair graph flags — independent of where
micro-batch boundaries fall — and the index must hold exactly the
kept images' hashes (bounded growth: duplicates never enter)."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from flink_stream_spark.operators.multimodal import dhash_near_dup_pairs
from flink_stream_spark.operators.gif import encode_gif_gray
from flink_stream_spark.operators.png import encode_png
from flink_stream_spark.streaming.image_dedup_stream import (
    start_incremental_image_dedup,
)
from flink_stream_spark.tables.managed import Warehouse


def _greedy_reference(all_ids, verified_pairs):
    """Keep-first in doc_id order (same reference as the text twin)."""
    smaller = {}
    for a, b in verified_pairs:  # a < b by construction
        smaller.setdefault(b, []).append(a)
    kept, dup_of = set(), {}
    for doc in sorted(all_ids):
        cands = sorted(x for x in smaller.get(doc, []) if x in kept)
        if cands:
            dup_of[doc] = cands[0]
        else:
            kept.add(doc)
    return kept, dup_of


def _corpus() -> list[tuple[int, bytes]]:
    """24 images: 8 distinct bases; each base followed later in the
    stream by a re-encode (identical pixels — PNG filter/level change
    for odd k, a CROSS-CONTAINER GIF re-encode for even k, interlaced
    every other time: the stream must dedup the same image across
    codecs) and a patch-edit near-dup, interleaved so duplicates land
    in DIFFERENT micro-batches than their originals."""
    rng = np.random.RandomState(23)
    bases = []
    for k in range(8):
        img = (
            np.add.outer(np.arange(24) * (3 + k), np.arange(30) * (2 + k)) % 256
            + rng.randint(0, 5, (24, 30))
        ).astype(np.uint8)
        bases.append(img)
    docs = []
    for k, img in enumerate(bases):
        docs.append((k, encode_png(img, filter_type=k % 5, level=9)))
    for k, img in enumerate(bases):
        if k % 2 == 0:
            payload = encode_gif_gray(
                img.astype(np.int64), interlace=bool((k // 2) % 2)
            )
        else:
            payload = encode_png(img, filter_type=(k + 2) % 5, level=1)
        docs.append((100 + k, payload))
    for k, img in enumerate(bases):
        edited = img.copy()
        edited[6:9, 8:12] = 255 - edited[6:9, 8:12]
        docs.append((200 + k, encode_png(edited, filter_type=(k + 4) % 5)))
    return docs


def _write_stream_files(docs, src) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = sorted(docs)
    third = (len(docs) + 2) // 3
    for i in range(3):
        part = docs[i * third : (i + 1) * third]
        if not part:
            continue
        tbl = pa.table(
            {
                "doc_id": pa.array([d for d, _ in part], pa.int64()),
                "payload": pa.array([p for _, p in part], pa.binary()),
            }
        )
        fpath = str(src / f"batch_{i:03d}.parquet")
        pq.write_table(tbl, fpath)
        os.utime(fpath, (1_700_000_000 + i, 1_700_000_000 + i))


def test_incremental_image_dedup_matches_greedy_batch(spark, tmp_path):
    docs = _corpus()
    src = tmp_path / "media_src"
    src.mkdir()
    _write_stream_files(docs, src)

    wh = Warehouse(str(tmp_path / "wh"))
    index = wh.table("img_index")
    flags = wh.table("img_flags")
    q = start_incremental_image_dedup(
        spark, str(src), index, flags, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    # reference: batch pairs over the FULL corpus -> greedy keep-first
    media = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in docs], "doc_id bigint, payload binary"
    )
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dhash_near_dup_pairs(media, n_docs=len(docs)).collect()
    ]
    kept_ref, dup_of_ref = _greedy_reference([d for d, _ in docs], pairs)

    flag_rows = flags.read(spark).collect()
    got_dups = {r["doc_id"]: r["dup_of"] for r in flag_rows if r["is_dup"]}
    got_kept = {r["doc_id"] for r in flag_rows if not r["is_dup"]}
    assert got_dups == dup_of_ref
    assert got_kept == kept_ref
    # every re-encode (100+k) was caught as a dup of its base —
    # including the cross-container GIF copies of PNG originals
    assert all(100 + k in got_dups for k in range(8))

    # bounded index growth: exactly one 16-byte hash row per KEPT image
    idx_rows = index.read(spark).select("doc_id").collect()
    assert {r["doc_id"] for r in idx_rows} == kept_ref
    assert len(idx_rows) == len(kept_ref)


def test_image_stream_boundary_independence(spark, tmp_path):
    """The same corpus replayed as ONE batch produces the identical
    flag set as the 3-batch replay (batch-boundary independence)."""
    docs = _corpus()
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "media_one"
    src.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in sorted(docs)], pa.int64()),
            "payload": pa.array([p for _, p in sorted(docs)], pa.binary()),
        }
    )
    pq.write_table(tbl, str(src / "all.parquet"))

    wh = Warehouse(str(tmp_path / "wh1"))
    index = wh.table("img_index")
    flags = wh.table("img_flags")
    q = start_incremental_image_dedup(
        spark, str(src), index, flags, str(tmp_path / "ckpt1")
    )
    q.processAllAvailable()
    q.stop()

    src3 = tmp_path / "media_three"
    src3.mkdir()
    _write_stream_files(docs, src3)
    wh3 = Warehouse(str(tmp_path / "wh3"))
    index3 = wh3.table("img_index")
    flags3 = wh3.table("img_flags")
    q3 = start_incremental_image_dedup(
        spark, str(src3), index3, flags3, str(tmp_path / "ckpt3")
    )
    q3.processAllAvailable()
    q3.stop()

    one = {
        (r["doc_id"], r["dup_of"], r["is_dup"]) for r in flags.read(spark).collect()
    }
    three = {
        (r["doc_id"], r["dup_of"], r["is_dup"]) for r in flags3.read(spark).collect()
    }
    assert one == three
