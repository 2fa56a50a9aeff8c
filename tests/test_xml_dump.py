"""Multistream-bz2 XML dump: stream-split exactness, XML escaping
round-trip (incl. the \\r normalization trap), and strictness
corners (round 9)."""

from __future__ import annotations

import bz2

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_stream_spark.operators.xml_dump import (
    decompress_stream,
    encode_pages_stream,
    parse_pages,
    split_bz2_streams,
)


def _multistream(pages, per=10):
    return b"".join(
        encode_pages_stream(pages[i : i + per])
        for i in range(0, len(pages), per)
    )


def _read_all(blob):
    offs = split_bz2_streams(blob)
    assert offs is not None
    out = []
    for o, ln in offs:
        xml = decompress_stream(blob[o : o + ln])
        assert xml is not None
        ps = parse_pages(xml)
        assert ps is not None
        out.extend(ps)
    return out


# --- round-trip -----------------------------------------------------------


def test_roundtrip_with_hostile_text():
    pages = [
        (1, "Doc 1", "plain"),
        (2, "A & B <c>", "text with &amp; entities & <tags> raw"),
        (3, "Doc 3", "unicode — 日本語 🎉"),
        (4, "Doc 4", "cr\rlf\r\nmix\n\ttab"),
        (5, "Doc 5", ""),
        (6, "Doc ]]> 6", "cdata-ish ]]> in text"),
    ]
    assert _read_all(_multistream(pages, per=2)) == pages


def test_stream_offsets_are_exact():
    pages = [(i, f"Doc {i}", f"body {i} " * 50) for i in range(30)]
    blob = _multistream(pages, per=10)
    offs = split_bz2_streams(blob)
    assert len(offs) == 3
    assert offs[0][0] == 0
    assert sum(ln for _, ln in offs) == len(blob)
    # each slice is independently decompressible, in order
    for (o, ln), s in zip(offs, range(0, 30, 10)):
        assert parse_pages(decompress_stream(blob[o : o + ln])) == pages[s : s + 10]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                exclude_categories=("Cs", "Cc"), include_characters="\n\r\t"
            ),
            max_size=300,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_roundtrip_any_text(texts):
    pages = [(i, f"T {i}", t) for i, t in enumerate(texts)]
    assert _read_all(_multistream(pages, per=4)) == pages


# --- strictness -----------------------------------------------------------


def test_truncated_final_stream_rejected():
    blob = _multistream([(1, "a", "b" * 1000)], per=1)
    assert split_bz2_streams(blob[:-4]) is None


def test_corrupt_stream_rejected():
    blob = bytearray(_multistream([(1, "a", "b" * 1000)], per=1))
    blob[len(blob) // 2] ^= 0xFF
    assert split_bz2_streams(bytes(blob)) is None


def test_trailing_garbage_after_indexed_slice_rejected():
    blob = _multistream([(1, "a", "x")], per=1)
    assert decompress_stream(blob + b"JUNK") is None


def test_missing_children_rejected():
    frag = bz2.compress(b"<page><title>t</title><id>1</id></page>")
    assert parse_pages(bz2.decompress(frag)) is None


def test_non_integer_id_rejected():
    assert (
        parse_pages(b"<page><title>t</title><id>x</id><text>b</text></page>")
        is None
    )


def test_foreign_element_rejected():
    assert parse_pages(b"<revision><id>1</id></revision>") is None


def test_malformed_xml_rejected():
    assert parse_pages(b"<page><title>unclosed") is None
