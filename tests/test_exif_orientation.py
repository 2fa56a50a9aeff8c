"""EXIF orientation: helper algebra, parser robustness, and the
dedup-level claim — a flag-rotated re-upload hashes identically to the
original (the registry round-trip proves corpus-wide exactness against
the oracle; these pin the unit semantics and the failure modes)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from flink_stream_spark.operators.jpeg import (
    EXIF_INVERSE,
    apply_exif_orientation,
    decode_jpeg_gray,
    encode_jpeg,
    exif_app1_segment,
    insert_exif_orientation,
    parse_exif_orientation,
)


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_inverse_composition_identity(o):
    a = np.arange(6 * 10).reshape(6, 10)
    stored = apply_exif_orientation(a, EXIF_INVERSE[o])
    assert (apply_exif_orientation(stored, o) == a).all()


def test_transposing_orientations_swap_dims():
    a = np.zeros((6, 10), dtype=np.uint8)
    for o in (5, 6, 7, 8):
        assert apply_exif_orientation(a, o).shape == (10, 6)
    for o in (1, 2, 3, 4):
        assert apply_exif_orientation(a, o).shape == (6, 10)


def test_orientation_semantics_pinned():
    # 2x2 probe: pin each transform against the EXIF 2.3 definitions
    a = np.array([[1, 2], [3, 4]])
    assert (apply_exif_orientation(a, 2) == [[2, 1], [4, 3]]).all()  # mirror H
    assert (apply_exif_orientation(a, 3) == [[4, 3], [2, 1]]).all()  # rot 180
    assert (apply_exif_orientation(a, 4) == [[3, 4], [1, 2]]).all()  # mirror V
    assert (apply_exif_orientation(a, 5) == [[1, 3], [2, 4]]).all()  # transpose
    assert (apply_exif_orientation(a, 6) == [[3, 1], [4, 2]]).all()  # 90 CW
    assert (apply_exif_orientation(a, 7) == [[4, 2], [3, 1]]).all()  # anti-T
    assert (apply_exif_orientation(a, 8) == [[2, 4], [1, 3]]).all()  # 90 CCW


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_parse_insert_roundtrip(o):
    jpg = encode_jpeg([np.full((8, 8), 7, dtype=np.uint8)], quality=100)
    assert parse_exif_orientation(insert_exif_orientation(jpg, o)) == o


def test_parse_big_endian_and_malformed():
    jpg = encode_jpeg([np.full((8, 8), 7, dtype=np.uint8)], quality=100)
    # big-endian (MM) TIFF body
    tiff = b"MM\x00*" + struct.pack(">I", 8)
    tiff += struct.pack(">H", 1)
    tiff += struct.pack(">HHIHH", 274, 3, 1, 6, 0)
    tiff += struct.pack(">I", 0)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert parse_exif_orientation(jpg[:2] + app1 + jpg[2:]) == 6
    # no APP1 at all
    assert parse_exif_orientation(jpg) == 1
    # orientation out of range -> as-stored
    assert parse_exif_orientation(insert_exif_orientation(jpg, 9)) == 1
    # count != 1 (value field is an offset) -> as-stored
    tiff_bad = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
    tiff_bad += struct.pack("<HHII", 274, 3, 2, 4096) + struct.pack("<I", 0)
    body = b"Exif\x00\x00" + tiff_bad
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert parse_exif_orientation(jpg[:2] + app1 + jpg[2:]) == 1
    # truncated TIFF -> as-stored
    body = b"Exif\x00\x00" + b"II*\x00"
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert parse_exif_orientation(jpg[:2] + app1 + jpg[2:]) == 1
    # non-JPEG bytes
    assert parse_exif_orientation(b"just some text") == 1


def test_exif_segment_does_not_disturb_decode():
    rng = np.random.RandomState(9)
    pix = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    jpg = encode_jpeg([pix], quality=100)
    ref = decode_jpeg_gray(jpg)
    for o in range(1, 9):
        got = decode_jpeg_gray(insert_exif_orientation(jpg, o))
        assert got is not None and (got == ref).all()


@pytest.mark.parametrize("o", list(range(2, 9)))
def test_flag_rotated_reupload_hashes_identically(spark, o):
    """The dedup-level property: the same displayed image, stored
    upright vs stored inverse-transformed + flagged, produces the SAME
    dHash bands — so image near-dup dedup finds flag-rotated
    re-uploads."""
    from flink_stream_spark.operators.multimodal import dhash_bands

    rng = np.random.RandomState(o)
    # block-constant displayed image so quality-100 JPEG is pixel-exact
    grid = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    displayed = np.repeat(np.repeat(grid, 8, 0), 8, 1)
    upright = insert_exif_orientation(
        encode_jpeg([displayed], quality=100), 1
    )
    stored = np.ascontiguousarray(
        apply_exif_orientation(displayed, EXIF_INVERSE[o])
    )
    flagged = insert_exif_orientation(encode_jpeg([stored], quality=100), o)
    media = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "payload": [bytearray(upright), bytearray(flagged)]}
        )
    )
    rows = {r["doc_id"]: list(r["bands"]) for r in dhash_bands(media).collect()}
    assert rows[1] == rows[2]


def test_app1_segment_is_spec_shaped():
    seg = exif_app1_segment(3)
    assert seg[:2] == b"\xff\xe1"
    (ln,) = struct.unpack(">H", seg[2:4])
    assert ln == len(seg) - 2
    assert seg[4:10] == b"Exif\x00\x00"
