"""Baseline TIFF codec — stdlib + numpy only, no Pillow.

The fifth REAL image container codec (after png/gif/jpeg/bmp): TIFF is
the interchange format of scanned-document corpora (the classic OCR /
digitization pipelines emit it), so a training-data crawl over
archival sources meets it constantly. This module implements the
baseline TIFF 6.0 profile sufficient for those payloads: both byte
orders (II little-endian / MM big-endian), the classic 8-byte header
(magic 42), IFD tag walk with bounds checks, strip-organized image
data (any RowsPerStrip), Compression 1 (none) and 32773 (PackBits —
the run-length scheme of TIFF's own spec Appendix), PhotometricInterp
0 (WhiteIsZero — inverted), 1 (BlackIsZero) and 2 (RGB, reduced by
the SAME integer ITU-R 601 luma as the PNG/GIF/JPEG/BMP decoders:
(299*R + 587*G + 114*B) // 1000), 8 bits per sample. A matching
encoder emits both byte orders and both compressions so round-trips
exercise every decode path. Anything else (tiles, LZW/JPEG-in-TIFF,
16-bit, planar config 2) returns None — the shared decode-ladder
fallback contract.

Reference parity note: the reference pipeline (thanminh24/
Flink-Stream) ships no image processing; this serves the
training-data-pipeline surface (image near-dup dedup over scanned
corpora) the brief adds.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def packbits_decode(data: bytes, expected: int) -> "bytes | None":
    """TIFF PackBits: n in [0,127] -> copy n+1 literal bytes; n in
    [-127,-1] -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i, ln = 0, len(data)
    while i < ln and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > ln:
                return None
            out += data[i : i + n + 1]
            i += n + 1
        elif n == 128:
            continue
        else:
            if i >= ln:
                return None
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) < expected:
        return None  # the strip genuinely lacks data
    # Real-world PackBits writers may pad the final strip's packets to
    # an even count, so the LAST literal/run can legally overshoot
    # `expected` (by at most 127 bytes — one packet) and leave at most
    # one alignment pad byte unconsumed. Anything beyond that — more
    # packets after the strip is full — is a corrupt stream, not
    # padding, and is rejected (advisor note, round 8: bound the
    # tolerance instead of silently truncating arbitrary overrun).
    if ln - i > 1:
        return None
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of >= 3 equal bytes become repeat packets,
    everything else literal packets (max 128 per packet)."""
    out = bytearray()
    i, ln = 0, len(data)
    while i < ln:
        # find run length at i
        j = i + 1
        while j < ln and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i = j
            continue
        # literal segment: until the next >=3 run or 128 bytes
        k = i
        while k < ln and k - i < 128:
            if k + 2 < ln and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + data[i:k]
        i = k
    return bytes(out)


def _read_ifd_values(b, e, typ, count, val_field):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        raw = val_field[:total]
    else:
        (off,) = struct.unpack(e + "I", val_field)
        if off + total > len(b):
            return None
        raw = b[off : off + total]
    if typ == 3:
        return list(struct.unpack(e + "H" * count, raw))
    if typ == 4:
        return list(struct.unpack(e + "I" * count, raw))
    if typ == 1:
        return list(raw)
    return None  # ASCII/RATIONAL irrelevant to the baseline profile


def decode_tiff_gray(payload: bytes) -> "np.ndarray | None":
    """(H, W) uint8 grayscale of a baseline TIFF, or None for anything
    outside the profile (tiles, LZW, 16-bit, planar-separate, bad
    structure) — callers fall back, never crash."""
    b = bytes(payload)
    if len(b) < 8:
        return None
    if b[:2] == b"II":
        e = "<"
    elif b[:2] == b"MM":
        e = ">"
    else:
        return None
    magic, ifd_off = struct.unpack_from(e + "HI", b, 2)
    if magic != 42 or ifd_off + 2 > len(b) or ifd_off < 8:
        return None
    try:
        (n_tags,) = struct.unpack_from(e + "H", b, ifd_off)
        if n_tags == 0 or ifd_off + 2 + 12 * n_tags > len(b):
            return None
        tags: dict = {}
        for t in range(n_tags):
            base = ifd_off + 2 + 12 * t
            tag, typ, count = struct.unpack_from(e + "HHI", b, base)
            tags[tag] = (typ, count, b[base + 8 : base + 12])
        def tagv(tag, default=None):
            if tag not in tags:
                return default
            typ, count, vf = tags[tag]
            return _read_ifd_values(b, e, typ, count, vf)

        w = tagv(_TAG_WIDTH)
        h = tagv(_TAG_HEIGHT)
        if not w or not h or w[0] <= 0 or h[0] <= 0:
            return None
        w, h = w[0], h[0]
        spp = (tagv(_TAG_SPP, [1]) or [1])[0]
        bps = tagv(_TAG_BPS, [8]) or [8]
        if spp not in (1, 3) or any(x != 8 for x in bps[:spp]):
            return None
        comp = (tagv(_TAG_COMPRESSION, [1]) or [1])[0]
        if comp not in (1, 32773):
            return None
        photo = (tagv(_TAG_PHOTOMETRIC, [1]) or [1])[0]
        if photo not in (0, 1, 2) or (photo == 2) != (spp == 3):
            return None
        planar = (tagv(_TAG_PLANAR, [1]) or [1])[0]
        if planar != 1:
            return None
        offsets = tagv(_TAG_STRIP_OFFSETS)
        counts = tagv(_TAG_STRIP_COUNTS)
        rps = (tagv(_TAG_ROWS_PER_STRIP, [h]) or [h])[0]
        if not offsets or not counts or len(offsets) != len(counts):
            return None
        if rps <= 0 or -(-h // rps) != len(offsets):
            return None
        row_bytes = w * spp
        raw = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(b):
                return None
            strip_rows = min(rps, h - si * rps)
            expected = strip_rows * row_bytes
            chunk = b[off : off + cnt]
            if comp == 32773:
                dec = packbits_decode(chunk, expected)
                if dec is None:
                    return None
                raw += dec
            else:
                if cnt != expected:
                    return None
                raw += chunk
        arr = np.frombuffer(bytes(raw), dtype=np.uint8)
        if len(arr) != h * row_bytes:
            return None
        if spp == 3:
            rgb = arr.reshape(h, w, 3).astype(np.int64)
            gray = (
                299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]
            ) // 1000
            return gray.astype(np.uint8)
        gray = arr.reshape(h, w)
        if photo == 0:  # WhiteIsZero: invert
            gray = 255 - gray
        return gray.astype(np.uint8)
    except (struct.error, ValueError, IndexError, ZeroDivisionError):
        return None


def encode_tiff_gray(
    pix: "np.ndarray",
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int = 4,
    white_is_zero: bool = False,
) -> bytes:
    """Encode an (H, W) uint8 grayscale as baseline TIFF: header, one
    IFD, strip-organized data with the requested RowsPerStrip, byte
    order, compression (none / PackBits), and photometric (BlackIsZero
    or WhiteIsZero — the encoder inverts the stored samples so decode
    returns the input either way)."""
    pix = np.asarray(pix, dtype=np.uint8)
    h, w = pix.shape
    e = ">" if big_endian else "<"
    stored = (255 - pix) if white_is_zero else pix
    n_strips = -(-h // rows_per_strip)
    strips = []
    for s in range(n_strips):
        rows = stored[s * rows_per_strip : (s + 1) * rows_per_strip]
        data = rows.tobytes()
        strips.append(packbits_encode(data) if packbits else data)

    tags = [
        (_TAG_WIDTH, 3, 1, [w]),
        (_TAG_HEIGHT, 3, 1, [h]),
        (_TAG_BPS, 3, 1, [8]),
        (_TAG_COMPRESSION, 3, 1, [32773 if packbits else 1]),
        (_TAG_PHOTOMETRIC, 3, 1, [0 if white_is_zero else 1]),
        (_TAG_STRIP_OFFSETS, 4, n_strips, None),  # filled below
        (_TAG_SPP, 3, 1, [1]),
        (_TAG_ROWS_PER_STRIP, 3, 1, [rows_per_strip]),
        (_TAG_STRIP_COUNTS, 4, n_strips, [len(s) for s in strips]),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    # out-of-line value area follows the IFD; strip data after that
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def value_field(typ, count, vals):
        size = _TYPE_SIZE[typ] * count
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            raw = struct.pack(e + fmt * count, *vals)
            return raw + b"\x00" * (4 - size)
        nonlocal_off = extra_off + len(extra)
        extra.extend(struct.pack(e + fmt * count, *vals))
        return struct.pack(e + "I", nonlocal_off)

    # two passes: first compute the extra-area length with placeholder
    # strip offsets, then fill real offsets (strip data goes last)
    for _pass in range(2):
        extra.clear()
        ifd = bytearray(struct.pack(e + "H", len(tags)))
        # strip data begins after header + IFD + extra area; extra area
        # length is stable across passes (same tag shapes)
        data_off = extra_off + _extra_len(e, tags, n_strips)
        strip_offsets = []
        pos = data_off
        for s in strips:
            strip_offsets.append(pos)
            pos += len(s)
        for tag, typ, count, vals in tags:
            if tag == _TAG_STRIP_OFFSETS:
                vals = strip_offsets
            ifd += struct.pack(e + "HHI", tag, typ, count)
            ifd += value_field(typ, count, vals)
        ifd += struct.pack(e + "I", 0)  # no next IFD
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
    out += ifd
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def _extra_len(e, tags, n_strips) -> int:
    total = 0
    for tag, typ, count, _ in tags:
        size = _TYPE_SIZE[typ] * count
        if size > 4:
            total += size
    return total
