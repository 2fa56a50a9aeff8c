"""WebDataset tar shards: ustar codec exactness, stdlib-tarfile
interop in BOTH directions, and the strictness corners of the header
chain walk (round 9)."""

from __future__ import annotations

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_stream_spark.operators.tar_webdataset import (
    _BLOCK,
    encode_tar,
    parse_tar,
)


def _stdlib_tar(entries):
    buf = io.BytesIO()
    tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    for name, data in entries:
        ti = tarfile.TarInfo(name)
        ti.size = len(data)
        ti.mtime = 0
        tf.addfile(ti, io.BytesIO(data))
    tf.close()
    return buf.getvalue()


# --- round-trip + interop -------------------------------------------------


def test_roundtrip_basic():
    entries = [("a.txt", b"hello"), ("a.cls", b"en"), ("b.txt", b"")]
    assert parse_tar(encode_tar(entries)) == entries


def test_stdlib_reads_our_output():
    entries = [("0000000042.txt", "ünïcode 日本語".encode()), ("0000000042.cls", b"ja")]
    tf = tarfile.open(fileobj=io.BytesIO(encode_tar(entries)))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == entries


def test_we_read_stdlib_output():
    entries = [("x.txt", b"payload " * 100), ("x.cls", b"de")]
    assert parse_tar(_stdlib_tar(entries)) == entries


def test_block_padding_boundaries():
    for size in (0, 1, 511, 512, 513, 1024):
        entries = [("e.txt", b"q" * size)]
        blob = encode_tar(entries)
        assert len(blob) % _BLOCK == 0
        assert parse_tar(blob) == entries


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=3000), min_size=1, max_size=6))
def test_roundtrip_any_payloads(payloads):
    entries = [(f"{i:010d}.bin", p) for i, p in enumerate(payloads)]
    blob = encode_tar(entries)
    assert parse_tar(blob) == entries
    # cross-check against stdlib on the same entries
    assert parse_tar(_stdlib_tar(entries)) == entries


# --- strictness -----------------------------------------------------------


def test_missing_terminator_rejected():
    blob = encode_tar([("a.txt", b"x")])
    assert parse_tar(blob[: -2 * _BLOCK]) is None
    assert parse_tar(blob[: -_BLOCK]) is None  # only one zero block


def test_checksum_mismatch_rejected():
    blob = bytearray(encode_tar([("a.txt", b"x")]))
    blob[5] ^= 0xFF  # corrupt the name; checksum now wrong
    assert parse_tar(bytes(blob)) is None


def test_bad_magic_rejected():
    blob = bytearray(encode_tar([("a.txt", b"x")]))
    blob[257] ^= 0xFF
    assert parse_tar(bytes(blob)) is None


def test_truncated_body_rejected():
    blob = encode_tar([("a.txt", b"y" * 1000)])
    assert parse_tar(blob[: _BLOCK + 600]) is None


def test_directory_typeflag_rejected():
    blob = bytearray(encode_tar([("a.txt", b"x")]))
    blob[156] = 0x35  # '5' directory
    # fix the checksum so only the typeflag is at issue
    h = blob[:512]
    chk = sum(h[:148]) + 8 * 0x20 + sum(h[156:512])
    blob[148:156] = oct(chk)[2:].encode().rjust(6, b"0") + b"\x00 "
    assert parse_tar(bytes(blob)) is None


def test_name_too_long_raises_on_encode():
    with pytest.raises(ValueError):
        encode_tar([("n" * 101, b"x")])
