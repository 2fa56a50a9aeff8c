"""ZIP archive codec: APPNOTE record round-trip over both methods,
EOCD tail-search corners (comments, signature bytes inside bodies),
and integrity-check strictness (round 9)."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_stream_spark.operators.zip_archive import (
    _SIG_EOCD,
    build_zip_entries,
    extract_entry,
    parse_central_directory,
    parse_eocd,
)


def _open(blob: bytes):
    eocd = parse_eocd(blob[-(22 + (1 << 16)) :], len(blob))
    assert eocd is not None
    cd_off, cd_size, n = eocd
    recs = parse_central_directory(blob[cd_off : cd_off + cd_size], n)
    assert recs is not None
    return recs


# --- round-trip -----------------------------------------------------------


def test_both_methods_roundtrip():
    entries = [
        ("a.txt", b"stored payload \x00\xff\x1f\x8b", 0),
        ("b.txt", "unicode — 日本語".encode("utf-8"), 8),
        ("empty.bin", b"", 8),
    ]
    blob = build_zip_entries(entries)
    recs = _open(blob)
    assert [(r[0], r[1]) for r in recs] == [("a.txt", 0), ("b.txt", 8), ("empty.bin", 8)]
    for (name, method, crc, comp, uncomp, off), (_, data, _m) in zip(recs, entries):
        assert extract_entry(blob[off:], method, crc, comp, uncomp) == data


def test_unicode_entry_names():
    blob = build_zip_entries([("doc-ünïcode.txt", b"x", 0)])
    assert _open(blob)[0][0] == "doc-ünïcode.txt"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=4000), min_size=1, max_size=8))
def test_roundtrip_any_payloads(payloads):
    entries = [
        (f"e{i:04d}", p, 8 if i % 2 else 0) for i, p in enumerate(payloads)
    ]
    blob = build_zip_entries(entries)
    recs = _open(blob)
    assert len(recs) == len(entries)
    for (name, method, crc, comp, uncomp, off), (_, data, _m) in zip(recs, entries):
        assert extract_entry(blob[off:], method, crc, comp, uncomp) == data


# --- EOCD tail search -----------------------------------------------------


def test_eocd_found_past_trailing_garbage_is_rejected():
    # bytes after EOCD not covered by its comment length -> invalid
    blob = build_zip_entries([("a", b"x", 0)]) + b"JUNK"
    assert parse_eocd(blob[-100:], len(blob)) is None


def test_eocd_signature_inside_stored_body_not_confused():
    # a stored body containing the EOCD signature must not shadow the
    # real record (search runs from the END with bookkeeping checks)
    decoy = struct.pack("<IHHHHIIH", _SIG_EOCD, 0, 0, 9, 9, 1, 1, 0)
    blob = build_zip_entries([("a", decoy * 3, 0), ("b", b"y", 8)])
    recs = _open(blob)
    assert [r[0] for r in recs] == ["a", "b"]


def test_truncated_eocd_rejected():
    blob = build_zip_entries([("a", b"x", 0)])
    assert parse_eocd(blob[-12:], len(blob)) is None


# --- integrity strictness -------------------------------------------------


def test_crc_mismatch_rejected_stored_and_deflate():
    blob = build_zip_entries([("a", b"stored!", 0), ("b", b"deflated!", 8)])
    for name, method, crc, comp, uncomp, off in _open(blob):
        bad = bytearray(blob[off:])
        bad[30 + len(name)] ^= 0x01  # first body byte
        assert extract_entry(bytes(bad), method, crc, comp, uncomp) is None


def test_wrong_declared_sizes_rejected():
    blob = build_zip_entries([("a", b"payload", 0)])
    name, method, crc, comp, uncomp, off = _open(blob)[0]
    assert extract_entry(blob[off:], method, crc, comp - 1, uncomp) is None
    assert extract_entry(blob[off:], method, crc, comp, uncomp + 1) is None


def test_method_mismatch_between_central_and_local_rejected():
    blob = build_zip_entries([("a", b"payload", 0)])
    name, method, crc, comp, uncomp, off = _open(blob)[0]
    assert extract_entry(blob[off:], 8, crc, comp, uncomp) is None


def test_central_directory_walk_must_consume_exactly():
    blob = build_zip_entries([("a", b"x", 0), ("b", b"y", 8)])
    eocd = parse_eocd(blob[-100:], len(blob))
    cd_off, cd_size, n = eocd
    cd = blob[cd_off : cd_off + cd_size]
    assert parse_central_directory(cd + b"\x00", n) is None
    assert parse_central_directory(cd[:-1], n) is None
    assert parse_central_directory(cd, n - 1) is None
