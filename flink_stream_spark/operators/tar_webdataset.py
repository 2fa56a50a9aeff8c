"""WebDataset-style tar shard ingest: POSIX ustar codec + sharded
multi-entry sample grouping (the de-facto packaging for large-scale
multimodal training data).

The dominant on-disk layout for image/audio/text training corpora is
the WebDataset convention (public: the webdataset project's format
docs): samples are packed into PLAIN TAR SHARDS, one shard per a few
thousand samples, each sample a group of adjacent entries sharing a
basename stem (`000123.txt`, `000123.json`, `000123.bin`, ...). Tar
itself is NOT splittable — the header chain must be walked — so the
unit of parallelism is the SHARD, not the byte range: a 100 TB
corpus is tens of thousands of ~1 GB shards, and a cluster maps
shards to tasks 1:1. That shard-level story is exactly what this
module implements, from the public POSIX.1-1988 ustar spec:

- `encode_tar` / `parse_tar`: 512-byte block framing, ustar magic,
  octal size/mtime fields, per-header checksum (the spec's
  space-filled checksum computation), zero-block terminator.
  Strict: a wrong checksum, short data block, missing terminator,
  or non-ustar magic is None — never a partial listing.
- `write_webdataset_shards` / `webdataset_scan`: documents packed as
  two-entry samples (`<key>.txt` payload + `<key>.cls` label) into
  _N_SHARDS tar shards from distributed tasks; the scan walks each
  shard's header chain task-locally, groups adjacent entries by
  stem, and emits one row per SAMPLE with both parts parsed back
  out of the tar bytes.

Reference: thanminh24/Flink-Stream ingests already-extracted JSON
(flink/jobs/flink_json_to_iceberg.py); shard ingest is the upstream
operator for the multimodal corpora in SURVEY §2 Part B.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_stream_spark.catalog import load_table
from flink_stream_spark.operators.registry import register

_BLOCK = 512
_MAGIC = b"ustar\x0000"  # POSIX magic "ustar\0" + version "00"


def _octal(n: int, width: int) -> bytes:
    """NUL-terminated zero-padded octal, the ustar numeric field."""
    s = oct(n)[2:].encode("ascii")
    if len(s) > width - 1:
        raise ValueError(f"{n} does not fit in {width}-byte octal field")
    return s.rjust(width - 1, b"0") + b"\x00"


def _header(name: str, size: int, mtime: int = 0) -> bytes:
    raw_name = name.encode("utf-8")
    if len(raw_name) > 100:
        raise ValueError(f"name too long for ustar: {name!r}")
    h = bytearray(_BLOCK)
    h[0:100] = raw_name.ljust(100, b"\x00")
    h[100:108] = _octal(0o644, 8)      # mode
    h[108:116] = _octal(0, 8)          # uid
    h[116:124] = _octal(0, 8)          # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(mtime, 12)
    h[148:156] = b" " * 8              # checksum: spaces while summing
    h[156] = 0x30                      # typeflag '0' regular file
    h[257:265] = _MAGIC
    chk = sum(h)
    h[148:156] = oct(chk)[2:].encode("ascii").rjust(6, b"0") + b"\x00 "
    return bytes(h)


def encode_tar(entries: "list[tuple[str, bytes]]") -> bytes:
    """[(name, data)] -> a POSIX ustar stream: header + data rounded
    up to 512-byte blocks per entry, two zero blocks at the end."""
    out = bytearray()
    for name, data in entries:
        out += _header(name, len(data))
        out += data
        pad = -len(data) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def parse_tar(data: bytes) -> "list[tuple[str, bytes]] | None":
    """Walk the header chain. Returns [(name, payload)] in archive
    order, or None on any malformation: bad magic, checksum
    mismatch, non-octal size, truncated data, or a stream that ends
    without the two-zero-block terminator."""
    out = []
    pos, n = 0, len(data)
    while True:
        if pos + _BLOCK > n:
            return None  # ran out before the terminator
        block = data[pos : pos + _BLOCK]
        if block == b"\x00" * _BLOCK:
            # terminator: require the second zero block too
            if data[pos + _BLOCK : pos + 2 * _BLOCK] != b"\x00" * _BLOCK:
                return None
            return out
        if block[257:265] != _MAGIC:
            return None
        stored = block[148:156]
        summed = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        try:
            if int(stored.rstrip(b"\x00 ").decode("ascii"), 8) != summed:
                return None
            size = int(block[124:136].rstrip(b"\x00 ").decode("ascii"), 8)
            name = block[0:100].rstrip(b"\x00").decode("utf-8")
        except (ValueError, UnicodeDecodeError):
            return None
        if block[156] != 0x30:
            return None  # only regular files in this convention
        body_start = pos + _BLOCK
        body_end = body_start + size
        padded_end = body_end + (-size % _BLOCK)
        if padded_end > n:
            return None
        out.append((name, data[body_start:body_end]))
        pos = padded_end


# --------------------------------------------------------------------------
# sharded write + shard-parallel scan
# --------------------------------------------------------------------------

_WORK = "/tmp/flink_stream_spark/wds"
_N_SHARDS = 8  # fixture-scale; a real corpus has tens of thousands


def _work_dir(spark: SparkSession, sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "root"
    return os.path.join(_WORK, spark.sparkContext.applicationId, tag)


def write_webdataset_shards(docs: DataFrame, out_dir: str) -> None:
    """(doc_id, text, lang) rows into _N_SHARDS plain tar shards from
    distributed tasks; each sample is the adjacent entry pair
    <doc_id>.txt (UTF-8 text) + <doc_id>.cls (the language label) —
    the WebDataset stem-grouping convention."""
    os.makedirs(out_dir, exist_ok=True)
    d = docs.select(
        "doc_id", "text", "lang", (F.col("doc_id") % _N_SHARDS).alias("grp")
    )

    def _write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        k = int(pdf["grp"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        entries = []
        for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            stem = f"{int(doc_id):010d}"
            entries.append((f"{stem}.txt", str(text).encode("utf-8")))
            entries.append((f"{stem}.cls", str(lang).encode("utf-8")))
        path = os.path.join(out_dir, f"shard-{k:04d}.tar")
        with open(path, "wb") as fh:
            fh.write(encode_tar(entries))
        return pd.DataFrame(
            {"file": [f"shard-{k:04d}.tar"], "n_samples": [len(pdf)]}
        )

    manifest = d.groupBy("grp").applyInPandas(
        _write_shard, "file string, n_samples bigint"
    )
    n_files = manifest.count()
    if n_files > _N_SHARDS:
        raise RuntimeError(f"shard write produced {n_files} groups")


def webdataset_scan(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Directory of tar shards -> one row per SAMPLE (doc_id, lang,
    n_bytes, text_md5), shards mapped to tasks 1:1 — the tar header
    chain is inherently sequential, so the shard is the parallelism
    unit (the WebDataset contract; shard counts in the tens of
    thousands at corpus scale make this a full-cluster map). Entries
    group by adjacent basename stem; a stem missing either part is a
    malformed sample and fails loudly."""
    files = sorted(f for f in os.listdir(shard_dir) if f.endswith(".tar"))
    fdf = spark.createDataFrame(
        [(os.path.join(shard_dir, f),) for f in files], "path string"
    ).repartition(max(1, len(files)))

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"doc_id": [], "lang": [], "n_bytes": [], "text_md5": []}
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    entries = parse_tar(fh.read())
                if entries is None:
                    raise ValueError(f"malformed tar shard {path}")
                by_stem: "dict[str, dict[str, bytes]]" = {}
                order: "list[str]" = []
                for name, payload in entries:
                    stem, _, ext = name.rpartition(".")
                    if stem not in by_stem:
                        by_stem[stem] = {}
                        order.append(stem)
                    by_stem[stem][ext] = payload
                for stem in order:
                    parts = by_stem[stem]
                    if set(parts) != {"txt", "cls"}:
                        raise ValueError(
                            f"sample {stem} in {path} has parts "
                            f"{sorted(parts)}"
                        )
                    rows["doc_id"].append(int(stem))
                    rows["lang"].append(parts["cls"].decode("utf-8"))
                    rows["n_bytes"].append(len(parts["txt"]))
                    rows["text_md5"].append(
                        hashlib.md5(parts["txt"]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return fdf.mapInPandas(
        _scan,
        "doc_id bigint, lang string, n_bytes bigint, text_md5 string",
    )


@register(
    "scan_tar_webdataset",
    """
    SELECT doc_id,
           lang,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS text_md5
    FROM documents
    ORDER BY doc_id
    """,
    group="scan",
    doc="WebDataset tar-shard round-trip under the oracle: documents "
    "packed as two-entry samples (<id>.txt + <id>.cls) into real "
    "POSIX ustar shards from distributed tasks (octal fields, "
    "space-filled checksums, zero-block terminator), then scanned "
    "back shard-per-task — tar's header chain is sequential, so the "
    "SHARD is the parallelism unit, exactly the WebDataset contract "
    "at corpus scale (tens of thousands of ~1 GB shards = a "
    "full-cluster map). doc_id and lang are parsed back out of the "
    "tar bytes (entry name stem + .cls payload), so the hash proves "
    "writer, checksums, block framing, and stem grouping end-to-end.",
)
def scan_tar_webdataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    out_dir = os.path.join(_work_dir(spark, sf_dir), "shards")
    write_webdataset_shards(
        load_table(spark, sf_dir, "documents"), out_dir
    )
    # result-sized exchange before the sort (see operators/sortout.py)
    return webdataset_scan(spark, out_dir).repartition("doc_id").orderBy("doc_id")
