"""Continuous crawl ingest twin: parity with the stream-order greedy
reference over a real .warc.gz+CDX fixture, batch-boundary
independence, replay idempotence, and the drop-boilerplate-only
contract (round 9)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.warc import _N_FILES, write_warc_gz
from flink_stream_spark.streaming.crawl_ingest_stream import (
    process_batch,
    start_crawl_ingest,
)
from flink_stream_spark.tables.managed import Warehouse


def _wrap(doc_id: int, text: str) -> str:
    """Python mirror of operators/html_extract._wrapped_html_col —
    the deterministic page wrapper both engines inject."""
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    related = "".join(
        f'<li><a href="/rel/{i}">related item {i}</a></li>'
        for i in range(2, 6)
        if doc_id % 4 >= i - 2
    )
    return (
        "<html><head><title>doc</title><style>p{margin:0}</style>"
        '<script>var page="never text";</script></head><body>'
        '<nav><a href="/">home</a> <a href="/all">index</a></nav><ul>'
        + related
        + '</ul><div class="date">2020-01-01</div><article><p>'
        + esc
        + "</p></article><footer>"
        '<a href="/tos">terms</a> · <a href="/priv">privacy</a>'
        "</footer></body></html>"
    )


def _corpus(spark, sf_small):
    """(doc_id, main_text) base rows + planted exact dups (same
    group via +8*1000, next group via +8*1000+1 for groups 0..6 so
    stream arrival order always sees the original first) + two
    boilerplate-only pages."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    base, seen = [], set()
    for r in docs.orderBy("doc_id").limit(60).collect():
        d, t = int(r["doc_id"]), str(r["text"])
        # unique texts only: a NATURAL cross-group duplicate whose
        # copies arrive out of doc_id order would make stream-order
        # and global-min-id keep-first legitimately disagree; the
        # planted dups below control arrival order instead
        if len(t.strip()) >= 25 and t not in seen:
            seen.add(t)
            base.append((d, t))
    shift = max(d for d, _ in base) + 8000 - (max(d for d, _ in base) % 8)
    dups = []
    for i, (d, t) in enumerate(base[::5]):
        if i % 2 == 0:
            dups.append((shift + (d % 8) + 8 * i, t))  # same group
        elif d % 8 < 7:
            dups.append((shift + (d % 8) + 1 + 8 * i, t))  # next group
    boiler = [(shift + 7000, "tiny."), (shift + 7001, "x")]
    return base, dups, boiler


def _write_crawl(spark, rows, out_dir):
    html_rows = [(d, _wrap(d, t), "en") for d, t in rows]
    df = spark.createDataFrame(html_rows, "doc_id bigint, text string, lang string")
    write_warc_gz(df, out_dir, warc_type="response", content_type="text/html")
    # deterministic arrival order: CDX file k arrives k-th
    for k in range(_N_FILES):
        p = os.path.join(out_dir, f"part-{k:04d}.cdx.csv")
        if os.path.exists(p):
            os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))


def _reference(rows):
    """Keep-first in stream-arrival order = sorted by (group,
    doc_id) — write_warc_gz sorts by doc_id within each group file
    and the test utimes CDX files in group order."""
    first: dict[str, int] = {}
    dup_of: dict[int, int] = {}
    for d, t in sorted(rows, key=lambda r: (r[0] % _N_FILES, r[0])):
        if t in first:
            dup_of[d] = first[t]
        else:
            first[t] = d
    return set(first.values()), dup_of


def _tables(tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    return wh.table("crawl_docs"), wh.table("crawl_hashes"), wh.table("crawl_flags")


def test_stream_parity_and_boilerplate_drop(spark, sf_small, tmp_path):
    base, dups, boiler = _corpus(spark, sf_small)
    crawl_dir = str(tmp_path / "crawl")
    _write_crawl(spark, base + dups + boiler, crawl_dir)
    docs_t, hash_t, flags_t = _tables(tmp_path)

    q = start_crawl_ingest(
        spark, crawl_dir, docs_t, hash_t, flags_t, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    kept_want, dup_want = _reference(base + dups)
    flags = flags_t.read(spark)
    got_dups = {
        int(r["doc_id"]): int(r["dup_of"])
        for r in flags.filter(F.col("is_dup")).collect()
    }
    assert got_dups == dup_want
    got_kept = {
        int(r["doc_id"])
        for r in docs_t.read(spark).select("doc_id").collect()
    }
    assert got_kept == kept_want
    # boilerplate-only pages vanish entirely: no flag, no doc
    all_ids = {int(r["doc_id"]) for r in flags.collect()} | got_kept
    assert not all_ids & {d for d, _ in boiler}
    # extraction is exact: kept text round-trips through WARC+HTML
    texts = {d: t for d, t in base + dups}
    for r in docs_t.read(spark).collect():
        assert str(r["main_text"]) == texts[int(r["doc_id"])]
        assert r["target_uri"] == f"http://crawl.example/doc/{int(r['doc_id'])}"
    # the hash index is bounded by the kept set
    assert hash_t.read(spark).count() == len(kept_want)


def test_batch_boundary_independence(spark, sf_small, tmp_path):
    base, dups, boiler = _corpus(spark, sf_small)
    crawl_dir = str(tmp_path / "crawl")
    _write_crawl(spark, base + dups + boiler, crawl_dir)

    # all slices in ONE batch
    one_docs, one_hash, one_flags = _tables(tmp_path / "one")
    idx = spark.read.schema(
        "file string, offset bigint, length bigint"
    ).csv(os.path.join(crawl_dir, "*.cdx.csv"))
    process_batch(idx, crawl_dir, one_docs, one_hash, one_flags, epoch_id=0)

    # one CDX file per batch
    many_docs, many_hash, many_flags = _tables(tmp_path / "many")
    for k in range(_N_FILES):
        p = os.path.join(crawl_dir, f"part-{k:04d}.cdx.csv")
        if not os.path.exists(p):
            continue
        b = spark.read.schema(
            "file string, offset bigint, length bigint"
        ).csv(p)
        process_batch(b, crawl_dir, many_docs, many_hash, many_flags, epoch_id=k)

    kept_one = {
        int(r["doc_id"]) for r in one_docs.read(spark).select("doc_id").collect()
    }
    kept_many = {
        int(r["doc_id"]) for r in many_docs.read(spark).select("doc_id").collect()
    }
    # the dup plant guarantees first-arrival == min-id, so the global
    # batch and the incremental stream agree exactly
    assert kept_one == kept_many


def test_replay_idempotence(spark, sf_small, tmp_path):
    base, dups, _ = _corpus(spark, sf_small)
    crawl_dir = str(tmp_path / "crawl")
    _write_crawl(spark, base + dups, crawl_dir)
    docs_t, hash_t, flags_t = _tables(tmp_path)
    idx = spark.read.schema(
        "file string, offset bigint, length bigint"
    ).csv(os.path.join(crawl_dir, "*.cdx.csv"))

    process_batch(idx, crawl_dir, docs_t, hash_t, flags_t, epoch_id=0)
    n_docs = docs_t.read(spark).count()
    n_flags = flags_t.read(spark).count()
    # at-least-once redelivery of the SAME epoch: token'd appends
    # make the replay a no-op
    process_batch(idx, crawl_dir, docs_t, hash_t, flags_t, epoch_id=0)
    assert docs_t.read(spark).count() == n_docs
    assert flags_t.read(spark).count() == n_flags
    # a genuinely new batch with already-seen content adds flags
    # (all dups), no docs
    process_batch(idx, crawl_dir, docs_t, hash_t, flags_t, epoch_id=1)
    assert docs_t.read(spark).count() == n_docs
    later = flags_t.read(spark).count()
    assert later > n_flags
