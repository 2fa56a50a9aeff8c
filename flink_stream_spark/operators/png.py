"""Stdlib-only PNG pixel codec (RFC 2083 / ISO 15948).

The multimodal dedup stages need real PIXELS, not container bytes:
PNG/JPEG payloads are DEFLATE/DCT-coded, so a one-pixel edit rewrites
essentially every downstream byte and byte-domain perceptual hashing
collapses to exact-dup detection. This sandbox cannot install codec
libraries (no pip), but PNG's pixel path is pure zlib — which IS in
the stdlib — plus five scanline filters. So the decode here is REAL:
``zlib.decompress`` of the IDAT stream, the standard unfilters
(None/Sub/Up/Average/Paeth), palette expansion, and integer-luma
grayscale conversion. Anything the decoder does not support (bit
depths other than 8, Adam7 interlace, truncated/corrupt streams)
returns ``None`` and the caller falls back to its deterministic
byte-domain stand-in, exactly like the header-parse ladder in
``multimodal.decode_meta``.

The matching encoder exists so tests (and the oracled round-trip
query) can craft valid PNGs for every filter type and color type
without any external library — a re-encode with a different filter
or compression level changes nearly every container byte while
decoding to identical pixels, which is precisely the adversarial
case byte-domain hashing fails and pixel-domain hashing must pass.

Scale posture: decode runs inside Arrow-batched ``mapInPandas``
stages — narrow, embarrassingly parallel, no shuffle. The unfilter
loop is per-scanline Python; on a production cluster with image
codecs installed the ladder prefers Pillow (see ``multimodal._pillow``)
and this module is the dependency-free correctness floor beneath it.

Reference parity: the reference pipeline treats media as opaque blobs
end-to-end; pixel-domain near-dup is part of the training-data
pipeline surface this repo adds on top (SURVEY §2C MM rows).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(ftype: int, row: bytearray, prev: bytes, bpp: int) -> bytearray:
    """Reverse one scanline filter in place (PNG spec §6). ``row`` is
    the filtered bytes (filter byte already stripped), ``prev`` the
    reconstructed previous scanline (zeros for the first)."""
    n = len(row)
    if ftype == 0:
        return row
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            row[i] = (row[i] + row[i - bpp]) & 0xFF
    elif ftype == 2:  # Up
        for i in range(n):
            row[i] = (row[i] + prev[i]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            a = row[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = row[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"invalid PNG filter type {ftype}")
    return row


def decode_png_gray(payload: bytes) -> "np.ndarray | None":
    """Decode a PNG payload to an (H, W) uint8 GRAYSCALE array, or
    ``None`` if the payload is not a PNG this decoder supports.

    Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), interlace 0. Every chunk CRC is verified
    (corrupt streams return None rather than garbage pixels). Color is
    reduced by integer ITU-R 601 luma — (299*R + 587*G + 114*B) // 1000
    — so the result is bit-deterministic across platforms; alpha is
    ignored (near-dup hashing compares content, not transparency).
    """
    b = bytes(payload)
    if b[:8] != _PNG_MAGIC:
        return None
    pos = 8
    width = height = None
    color_type = None
    palette: bytes | None = None
    idat = bytearray()
    try:
        while pos + 8 <= len(b):
            (clen,) = struct.unpack(">I", b[pos : pos + 4])
            ctype = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + clen]
            if len(data) != clen or pos + 12 + clen > len(b):
                return None
            (crc,) = struct.unpack(">I", b[pos + 8 + clen : pos + 12 + clen])
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                return None
            if ctype == b"IHDR":
                width, height, depth, color_type, comp, filt, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
                if (
                    depth != 8
                    or color_type not in _CHANNELS
                    or comp != 0
                    or filt != 0
                    or interlace != 0
                    or width == 0
                    or height == 0
                ):
                    return None
            elif ctype == b"PLTE":
                palette = data
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + clen
        if width is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
    except Exception:
        return None
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != height * (1 + stride):
        return None
    out = np.empty((height, stride), dtype=np.uint8)
    prev: bytes = bytes(stride)
    for y in range(height):
        off = y * (1 + stride)
        ftype = raw[off]
        row = bytearray(raw[off + 1 : off + 1 + stride])
        try:
            row = _unfilter(ftype, row, prev, ch)
        except ValueError:
            return None
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = bytes(row)
    if color_type == 0:
        return out
    if color_type == 4:  # gray+alpha -> gray channel
        return np.ascontiguousarray(out[:, 0::2])
    if color_type == 3:  # palette -> RGB lookup, then luma
        if palette is None or len(palette) % 3:
            return None
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        if int(out.max(initial=0)) >= len(pal):
            return None
        rgb = pal[out].astype(np.int64)  # (H, W, 3)
        r, g, bl = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    else:  # 2 = RGB, 6 = RGBA
        px = out.reshape(height, width, ch).astype(np.int64)
        r, g, bl = px[..., 0], px[..., 1], px[..., 2]
    return ((299 * r + 587 * g + 114 * bl) // 1000).astype(np.uint8)


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply one scanline filter (the encode direction of _unfilter)."""
    n = len(row)
    out = bytearray(n)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b_ = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b_
        elif ftype == 3:
            pred = (a + b_) >> 1
        elif ftype == 4:
            pred = _paeth(a, b_, c)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    pixels,
    color_type: int = 0,
    filter_type: int = 0,
    level: int = 6,
    palette: "bytes | None" = None,
) -> bytes:
    """Encode a uint8 array as a valid PNG (bit depth 8).

    ``pixels``: (H, W) for color types 0/3, (H, W, channels) for
    2/4/6. ``filter_type`` selects the scanline filter applied to
    EVERY row (0..4) — different filters (or zlib levels) produce
    byte-wise very different containers that decode to identical
    pixels, the property the round-trip tests exploit. Deterministic:
    no timestamps, no ancillary chunks, fixed zlib level.
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    ch = _CHANNELS[color_type]
    if ch == 1:
        if arr.ndim != 2:
            raise ValueError("color types 0/3 take an (H, W) array")
        h, w = arr.shape
        flat = arr
    else:
        if arr.ndim != 3 or arr.shape[2] != ch:
            raise ValueError(f"color type {color_type} takes (H, W, {ch})")
        h, w = arr.shape[:2]
        flat = arr.reshape(h, w * ch)
    raw = bytearray()
    prev: bytes = bytes(w * ch)
    for y in range(h):
        row = flat[y].tobytes()
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("color type 3 requires a palette")
        body += _chunk(b"PLTE", palette)
    body += _chunk(b"IDAT", zlib.compress(bytes(raw), level))
    body += _chunk(b"IEND", b"")
    return _PNG_MAGIC + body


def gray_grid(gray: "np.ndarray", rows: int, cols: int) -> "np.ndarray":
    """Resample an (H, W) grayscale array to a (rows, cols) grid of
    integer block means — the perceptual-hash downsample. Blocks are
    the standard integer partitions [r*H//rows, (r+1)*H//rows); the
    mean is an exact integer floor-division, so the grid (and every
    hash bit derived from it) is bit-deterministic and an oracle can
    reproduce it in SQL. Images smaller than the grid fall back to
    clamped nearest-sample (no interpolation, still deterministic)."""
    h, w = gray.shape
    if h >= rows and w >= cols:
        out = np.empty((rows, cols), dtype=np.int64)
        ys = [(r * h) // rows for r in range(rows + 1)]
        xs = [(c * w) // cols for c in range(cols + 1)]
        g = gray.astype(np.int64)
        for r in range(rows):
            for c in range(cols):
                blk = g[ys[r] : ys[r + 1], xs[c] : xs[c + 1]]
                out[r, c] = int(blk.sum()) // blk.size
        return out
    yi = np.minimum((np.arange(rows) * h) // rows, h - 1)
    xi = np.minimum((np.arange(cols) * w) // cols, w - 1)
    return gray[np.ix_(yi, xi)].astype(np.int64)
