"""Avro OCF codec: zigzag/varint exactness, split-ownership
exactness at every boundary placement, codec strictness (round 9).
The split property under test is the one that matters at 100 TB: a
partition of the byte range MUST yield every record exactly once,
regardless of where the cuts land."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_stream_spark.operators.avro_ocf import (
    _FIELDS,
    encode_ocf,
    read_long,
    read_ocf_header,
    scan_ranges,
    write_long,
)

_ROWS = [
    (i, f"l{i % 5}", f"doc {i} — ünïcode 日本語 " * (i % 7))
    for i in range(120)
]


# --- varint primitives ----------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_roundtrip(n):
    v, pos = read_long(write_long(n), 0)
    assert v == n and pos == len(write_long(n))


def test_known_zigzag_vectors():
    # the spec's table: 0->0x00, -1->0x01, 1->0x02, -2->0x03, 2->0x04
    assert write_long(0) == b"\x00"
    assert write_long(-1) == b"\x01"
    assert write_long(1) == b"\x02"
    assert write_long(-2) == b"\x03"
    assert write_long(64) == b"\x80\x01"


def test_truncated_varint_raises():
    with pytest.raises(ValueError):
        read_long(b"\x80\x80", 0)


# --- container round-trip -------------------------------------------------


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_full_read_both_codecs(codec):
    blob = encode_ocf(_FIELDS, _ROWS, "t", codec=codec, records_per_block=13)
    assert scan_ranges(blob, 0, len(blob)) == _ROWS


def test_header_parse():
    blob = encode_ocf(_FIELDS, _ROWS[:5], "t")
    fields, codec, sync, body_start = read_ocf_header(blob)
    assert fields == _FIELDS and codec == "deflate" and len(sync) == 16
    assert blob[body_start - 16 : body_start] == sync


# --- split ownership exactness --------------------------------------------


@pytest.mark.parametrize("n_splits", [1, 2, 3, 5, 9, 17])
def test_any_split_partition_yields_each_record_once(n_splits):
    blob = encode_ocf(_FIELDS, _ROWS, "t", records_per_block=10)
    step = max(1, len(blob) // n_splits)
    bounds = list(range(0, len(blob), step)) + [len(blob)]
    got = []
    for a, b in zip(bounds, bounds[1:]):
        got.extend(scan_ranges(blob, a, b))
    assert sorted(got) == sorted(_ROWS)


def test_boundary_exactly_on_every_sync_offset():
    blob = encode_ocf(_FIELDS, _ROWS[:60], "t2", codec="null", records_per_block=10)
    sync = read_ocf_header(blob)[2]
    j = blob.find(sync)
    n_syncs = 0
    while j >= 0:
        got = scan_ranges(blob, 0, j) + scan_ranges(blob, j, len(blob))
        assert sorted(got) == sorted(_ROWS[:60]), f"cut at sync {j}"
        # one byte either side of the sync boundary too
        for cut in (j - 1, j + 1):
            if 0 < cut < len(blob):
                got = scan_ranges(blob, 0, cut) + scan_ranges(blob, cut, len(blob))
                assert sorted(got) == sorted(_ROWS[:60]), f"cut at {cut}"
        n_syncs += 1
        j = blob.find(sync, j + 1)
    assert n_syncs >= 7  # many blocks, or the test is vacuous


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_random_cut_points(data):
    blob = encode_ocf(_FIELDS, _ROWS[:50], "t3", records_per_block=7)
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(blob) - 1),
                min_size=0, max_size=6, unique=True,
            )
        )
    )
    bounds = [0] + cuts + [len(blob)]
    got = []
    for a, b in zip(bounds, bounds[1:]):
        got.extend(scan_ranges(blob, a, b))
    assert sorted(got) == sorted(_ROWS[:50])


# --- strictness -----------------------------------------------------------


def test_bad_magic_rejected():
    assert read_ocf_header(b"NotAvroAtAll") is None


def test_truncated_file_raises():
    blob = encode_ocf(_FIELDS, _ROWS[:20], "t4", records_per_block=7)
    with pytest.raises(ValueError):
        scan_ranges(blob[:-3], 0, len(blob))


def test_corrupt_deflate_block_raises():
    blob = bytearray(encode_ocf(_FIELDS, _ROWS[:20], "t5", records_per_block=20))
    hdr = read_ocf_header(bytes(blob))
    body_start = hdr[3]
    # corrupt a payload byte inside the first (only) block
    blob[body_start + 4] ^= 0xFF
    with pytest.raises(ValueError):
        scan_ranges(bytes(blob), 0, len(blob))


def test_unsupported_codec_refused():
    with pytest.raises(ValueError):
        encode_ocf(_FIELDS, _ROWS[:2], "t6", codec="snappy")
