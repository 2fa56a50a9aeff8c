"""PDF codec: writer/extractor round-trip exactness over both string
grammars, the xref/indirect-Length walk, and the strict-rejection
corners a crawl's damaged PDFs hit (round 9)."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_stream_spark.operators.pdf import (
    _LINES_PER_PAGE,
    encode_pdf,
    extract_pdf_text,
)


def _roundtrip(text: str):
    out = extract_pdf_text(encode_pdf(text))
    assert out is not None
    return out


# --- round-trip exactness -------------------------------------------------


def test_empty_text_is_one_page():
    text, n_pages, n_objects = _roundtrip("")
    assert (text, n_pages, n_objects) == ("", 1, 6)


def test_single_line_ascii():
    text, n_pages, _ = _roundtrip("hello world")
    assert text == "hello world" and n_pages == 1


def test_literal_string_escapes():
    src = "parens (nested (deep)) and \\backslash\\ mix )( end"
    assert _roundtrip(src)[0] == src


def test_unicode_goes_hex():
    src = "héllo — ünïcödé 日本語 🎉\nsecond ASCII line"
    blob = encode_pdf(src)
    assert extract_pdf_text(blob)[0] == src
    # first line must NOT appear as a literal string (non-ASCII)
    assert "héllo".encode("utf-8") not in blob


def test_control_chars_go_hex():
    src = "tab\there\x01ctl\x7fdel"
    assert _roundtrip(src)[0] == src


def test_page_split_at_exact_boundary():
    lines = [f"line {i}" for i in range(_LINES_PER_PAGE * 3)]
    text, n_pages, n_objects = _roundtrip("\n".join(lines))
    assert text == "\n".join(lines)
    assert n_pages == 3 and n_objects == 3 + 3 * 3


def test_one_line_over_boundary_adds_page():
    src = "\n".join("x" for _ in range(_LINES_PER_PAGE + 1))
    assert _roundtrip(src)[1] == 2


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2000))
def test_roundtrip_any_unicode(src):
    text, n_pages, n_objects = _roundtrip(src)
    assert text == src
    exp_pages = max(1, -(-len(src.split("\n")) // _LINES_PER_PAGE))
    assert n_pages == exp_pages
    assert n_objects == 3 + 3 * exp_pages


# --- structure genuineness ------------------------------------------------


def test_content_streams_are_flate_and_length_is_indirect():
    blob = encode_pdf("a\nb\nc")
    assert b"/Filter /FlateDecode" in blob
    assert b" 0 R /Filter" in blob  # /Length <n> 0 R — indirect
    assert b"startxref" in blob and blob.rstrip().endswith(b"%%EOF")


def test_xref_offsets_are_byte_exact():
    blob = encode_pdf("hello")
    # every xref 'n' entry must point at "<num> 0 obj"
    xref_at = blob.rfind(b"xref")
    lines = blob[xref_at:].split(b"\n")
    entries = [ln for ln in lines if ln.endswith(b" n \r".rstrip(b"\r"))]
    for i, ent in enumerate(entries, start=1):
        off = int(ent[:10])
        assert blob[off:].startswith(f"{i} 0 obj".encode())


# --- strict rejection -----------------------------------------------------


def test_not_a_pdf_rejected():
    assert extract_pdf_text(b"PK\x03\x04 not a pdf") is None
    assert extract_pdf_text(b"") is None


def test_truncation_rejected_everywhere():
    blob = encode_pdf("hello\nworld\n" * 30)
    for cut in (10, len(blob) // 3, len(blob) // 2, len(blob) - 5):
        assert extract_pdf_text(blob[:cut]) is None


def test_count_kids_mismatch_rejected():
    blob = encode_pdf("hello")
    assert extract_pdf_text(blob.replace(b"/Count 1", b"/Count 2")) is None


def test_corrupt_deflate_rejected():
    blob = bytearray(encode_pdf("hello world, compressed"))
    i = bytes(blob).find(b"stream\n") + 7
    blob[i + 2] ^= 0xFF
    assert extract_pdf_text(bytes(blob)) is None


def test_wrong_length_rejected():
    blob = encode_pdf("hello")
    # the length object is a bare integer object after the pages;
    # perturb it (same digit count keeps xref offsets valid)
    body = zlib.compress(b"BT /F1 11 Tf 14 TL 72 760 Td\n(hello) Tj T*\nET", 6)
    old = str(len(body)).encode()
    new = str(len(body) + 1).encode().rjust(len(old), b"0")
    if len(new) == len(old):
        mutated = blob.replace(
            b"obj\n" + old + b"\nendobj", b"obj\n" + new + b"\nendobj"
        )
        assert extract_pdf_text(mutated) is None


def test_dangling_xref_offset_rejected():
    blob = encode_pdf("x")
    xref_at = blob.rfind(b"startxref")
    head, tail = blob[:xref_at], blob[xref_at:]
    bad = head + tail.replace(
        tail.split(b"\n")[1], str(len(blob) + 100).encode()
    )
    assert extract_pdf_text(bad) is None


def test_unsupported_filter_refused_not_garbled():
    blob = encode_pdf("hello")
    bad = blob.replace(b"/Filter /FlateDecode", b"/Filter /FlateDecodX")
    # same byte length keeps the xref valid; unknown filter -> None
    assert len(bad) == len(blob)
    assert extract_pdf_text(bad) is None
