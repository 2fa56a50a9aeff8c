"""WARC/WET ingest: record-grammar strictness, RFC 1952 member-split
exactness, and the truncation/concatenation corners a real crawl
reader hits (round-8 verdict, Next #1)."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_stream_spark.operators.warc import (
    decompress_member,
    encode_warc_record,
    gzip_member,
    parse_warc_records,
    split_gzip_members,
)


def _rec(i: int, payload: bytes) -> bytes:
    return encode_warc_record(
        [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", f"<urn:fss:doc:{i}>"),
            ("WARC-Date", "2020-01-01T00:00:00Z"),
            ("WARC-Target-URI", f"http://crawl.example/doc/{i}"),
        ],
        payload,
    )


# --- record grammar -------------------------------------------------------


def test_record_roundtrip_binary_payload():
    payload = bytes(range(256)) * 3 + b"\r\n\r\nWARC/1.0\r\n"  # hostile body
    recs = parse_warc_records(_rec(7, payload))
    assert recs is not None and len(recs) == 1
    assert recs[0]["payload"] == payload
    assert recs[0]["headers"]["warc-record-id"] == "<urn:fss:doc:7>"
    assert recs[0]["headers"]["warc-type"] == "conversion"


def test_concatenated_records_parse_in_order():
    blob = b"".join(_rec(i, f"payload {i}".encode()) for i in range(5))
    recs = parse_warc_records(blob)
    assert recs is not None and len(recs) == 5
    assert [r["payload"] for r in recs] == [
        f"payload {i}".encode() for i in range(5)
    ]


@pytest.mark.parametrize("cut", [1, 10, 40, -5, -1])
def test_truncated_record_rejected(cut):
    blob = _rec(3, b"x" * 64)
    assert parse_warc_records(blob[:cut]) is None


def test_malformed_records_rejected():
    good = _rec(1, b"abc")
    # wrong version line
    assert parse_warc_records(b"HTTP/1.1 200 OK\r\n" + good) is None
    # header line without a colon
    assert (
        parse_warc_records(good.replace(b"WARC-Type: conversion", b"nocolon"))
        is None
    )
    # missing Content-Length
    assert (
        parse_warc_records(
            good.replace(b"Content-Length: 3", b"Content-Size: 3")
        )
        is None
    )
    # non-numeric Content-Length
    assert (
        parse_warc_records(
            good.replace(b"Content-Length: 3", b"Content-Length: x")
        )
        is None
    )
    # payload longer than declared (terminator misplaced)
    assert (
        parse_warc_records(
            good.replace(b"Content-Length: 3", b"Content-Length: 2")
        )
        is None
    )
    # empty input
    assert parse_warc_records(b"") is None


@given(st.lists(st.binary(max_size=200), min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_record_roundtrip_property(payloads):
    blob = b"".join(_rec(i, p) for i, p in enumerate(payloads))
    recs = parse_warc_records(blob)
    assert recs is not None and len(recs) == len(payloads)
    for i, (r, p) in enumerate(zip(recs, payloads)):
        assert r["payload"] == p
        assert r["headers"]["warc-record-id"] == f"<urn:fss:doc:{i}>"


# --- gzip member framing --------------------------------------------------


def test_member_split_exact_offsets():
    chunks = [b"alpha" * 10, b"", b"beta\x00\x1f\x8b" * 7, b"g"]
    members = [gzip_member(c) for c in chunks]
    stream = b"".join(members)
    offs = split_gzip_members(stream)
    assert offs is not None and len(offs) == len(members)
    pos = 0
    for (off, ln), m, c in zip(offs, members, chunks):
        assert off == pos and ln == len(m)
        assert decompress_member(stream[off : off + ln]) == c
        pos += ln


def test_member_split_interoperates_with_stdlib_gzip():
    # our members are plain RFC 1952: the stdlib reads them, and we
    # read members the stdlib wrote
    ours = gzip_member(b"hello crawl")
    assert gzip.decompress(ours) == b"hello crawl"
    theirs = gzip.compress(b"stdlib member", 5)
    offs = split_gzip_members(theirs + ours)
    assert offs is not None and len(offs) == 2
    assert decompress_member(theirs) == b"stdlib member"


def test_truncated_member_rejected():
    m = gzip_member(b"payload data here")
    assert split_gzip_members(m[:-1]) is None  # trailer cut
    assert split_gzip_members(m[:5]) is None  # header cut
    assert decompress_member(m[:-1]) is None
    # truncated FINAL member poisons the whole split (the file is
    # damaged; the index must not silently cover a prefix)
    assert split_gzip_members(gzip_member(b"ok") + m[:-3]) is None


def test_corrupt_member_rejected():
    m = bytearray(gzip_member(b"payload data here payload data here"))
    m[14] ^= 0xFF  # flip a deflate body byte
    assert split_gzip_members(bytes(m)) is None


def test_member_slice_with_trailing_bytes_rejected():
    # a wrong index slice (covers the next member's header too) must
    # not silently decode
    m = gzip_member(b"first")
    assert decompress_member(m + b"\x1f\x8b\x08") is None


@given(st.lists(st.binary(max_size=300), min_size=1, max_size=10))
@settings(max_examples=50, deadline=None)
def test_member_split_property(chunks):
    stream = b"".join(gzip_member(c) for c in chunks)
    offs = split_gzip_members(stream)
    assert offs is not None and len(offs) == len(chunks)
    assert sum(ln for _, ln in offs) == len(stream)
    for (off, ln), c in zip(offs, chunks):
        assert decompress_member(stream[off : off + ln]) == c
