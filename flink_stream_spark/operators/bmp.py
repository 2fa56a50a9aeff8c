"""Pure-stdlib+numpy BMP (Windows DIB) codec.

Decoder for uncompressed (BI_RGB) BMP files — BITMAPINFOHEADER and
its 52/56/108/124-byte extensions, 8-bit palette / 24-bit BGR /
32-bit BGRX pixels, bottom-up AND top-down row order, 4-byte row
padding — with integer-luma grayscale conversion, plus an encoder
(8-bit grayscale-palette or 24-bit, either row order) so round-trips
can be pinned sample-exact by the DuckDB oracle in the PNG/GIF/JPEG
style. Anything outside that envelope (RLE/bitfields compression,
1/4/16 bpp, planes != 1) returns ``None`` rather than garbage pixels,
mirroring ``decode_png_gray``.

BMP carries no checksum, so detection is structural: beyond the 'BM'
magic the decoder requires a known DIB header size (40/52/56/108/124
— the little-endian u32 at offset 14 forces three NUL bytes, which
cannot occur in UTF-8 text, so text payloads in ``dhash_bands`` can
never be misparsed as BMP), planes == 1, and in-bounds pixel data.

Reference parity note: the reference pipeline (thanminh24/Flink-Stream)
has no media path at all — this module serves the repo's
training-data-curation surface (image near-dup dedup over DECODED
pixels for every stdlib-decodable container: PNG, GIF, JPEG, BMP).
"""

from __future__ import annotations

import struct

import numpy as np

_DIB_SIZES = (40, 52, 56, 108, 124)
_SUPPORTED_BPP = (8, 24, 32)


def decode_bmp_gray(payload: bytes) -> "np.ndarray | None":
    """Decode a BMP payload to an (H, W) uint8 GRAYSCALE array, or
    ``None`` if the payload is not a BMP this decoder supports.

    Supported: BI_RGB (compression 0), bpp 8 (palette) / 24 (BGR) /
    32 (BGRX), positive height (bottom-up) and negative height
    (top-down). Color is reduced by the SAME integer ITU-R 601 luma
    as the PNG/GIF/JPEG decoders — (299*R + 587*G + 114*B) // 1000 —
    so identical pixels shipped in different containers hash to the
    identical dHash (the cross-codec invariant the dedup tests pin).
    """
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        return None
    try:
        data_off = struct.unpack_from("<I", b, 10)[0]
        dib_size = struct.unpack_from("<I", b, 14)[0]
        if dib_size not in _DIB_SIZES or 14 + dib_size > len(b):
            return None
        width, height = struct.unpack_from("<ii", b, 18)
        planes, bpp = struct.unpack_from("<HH", b, 26)
        compression = struct.unpack_from("<I", b, 30)[0]
        colors_used = struct.unpack_from("<I", b, 46)[0]
        if (
            planes != 1
            or compression != 0
            or bpp not in _SUPPORTED_BPP
            or width <= 0
            or height == 0
        ):
            return None
        top_down = height < 0
        h = -height if top_down else height
        nbytes = bpp // 8
        stride = ((width * nbytes) + 3) & ~3
        if data_off + stride * h > len(b):
            return None
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
        rows = raw.reshape(h, stride)[:, : width * nbytes]
        if not top_down:
            rows = rows[::-1]
        if bpp == 8:
            n_colors = colors_used or 256
            pal_off = 14 + dib_size
            if pal_off + 4 * n_colors > data_off or n_colors > 256:
                return None
            pal = np.frombuffer(
                b, dtype=np.uint8, count=4 * n_colors, offset=pal_off
            ).reshape(n_colors, 4)
            idx = rows.astype(np.int64)
            if int(idx.max(initial=0)) >= n_colors:
                return None
            bl = pal[idx, 0].astype(np.int64)
            g = pal[idx, 1].astype(np.int64)
            r = pal[idx, 2].astype(np.int64)
        else:
            px = rows.reshape(h, width, nbytes).astype(np.int64)
            bl, g, r = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        return ((299 * r + 587 * g + 114 * bl) // 1000).astype(np.uint8)
    except (struct.error, ValueError):
        return None


def encode_bmp(
    gray: "np.ndarray", bpp: int = 24, top_down: bool = False
) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a real BMP.

    ``bpp`` 24 stores each pixel as BGR with B == G == R; ``bpp`` 8
    stores raw indices with the identity grayscale palette. Both are
    lossless for grayscale input, so decode(encode(x)) == x exactly —
    the property the oracled round-trip query pins on every document.
    ``top_down`` emits a negative-height DIB (rows in natural order),
    exercising the decoder's other row-order branch.
    """
    if bpp not in (8, 24):
        raise ValueError(f"encode_bmp supports bpp 8/24, got {bpp}")
    g = np.ascontiguousarray(gray, dtype=np.uint8)
    h, w = g.shape
    nbytes = bpp // 8
    stride = ((w * nbytes) + 3) & ~3
    palette = b""
    if bpp == 8:
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    data_off = 14 + 40 + len(palette)
    file_size = data_off + stride * h
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        0,  # BI_RGB
        stride * h,
        2835,
        2835,
        256 if bpp == 8 else 0,
        0,
    )
    rows = g if top_down else g[::-1]
    body = np.zeros((h, stride), dtype=np.uint8)
    if bpp == 8:
        body[:, :w] = rows
    else:
        body[:, : w * 3] = np.repeat(rows, 3, axis=1)
    return header + dib + palette + body.tobytes()
