"""Stdlib-only GIF codec: real LZW decode (and encode) of the first
image frame, palette-mapped to grayscale.

The fourth REAL modality codec (PNG: ``operators/png.py``, WAV:
``operators/wav.py``, Y4M: ``operators/y4m.py``): GIF is the one
classic image container whose compression — variable-width LZW with
dictionary growth, CLEAR/EOI control codes, and deferred clear at the
4096-entry cap — is fully implementable from the published GIF89a
specification with no codec library. Decode walks the structure the
strict header validator (``multimodal.parse_image_header``) already
checks — logical screen descriptor, global/local color tables,
extension blocks, image descriptor — then LZW-decompresses the
sub-block stream and maps palette indices to integer luma
(299·R + 587·G + 114·B) // 1000, de-interlacing when flagged.
Anything malformed — bad codes, truncated sub-blocks, overflowing
pixel counts — returns ``None`` rather than garbage pixels (the
decode-ladder discipline shared by all four codecs).

The encoder is a real greedy-longest-match LZW compressor (not the
emit-literals-only trick), so round-trip tests exercise genuine
dictionary growth, width increments, and the code==next_code corner
of the decoder.

Scale posture: decode runs inside Arrow-batched ``mapInPandas``
stages — narrow, embarrassingly parallel, no shuffle. LZW is
inherently sequential PER IMAGE (a per-code loop, like the PNG
unfilter recurrence); parallelism comes from images-per-batch, and a
production cluster swaps this pure-Python kernel for a native codec
at exactly this function boundary.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> "list[int] | None":
    """GIF-variant LZW: little-endian LSB-first bit packing, CLEAR =
    2^m, EOI = CLEAR+1, code width grows from m+1 to at most 12 bits
    (deferred clear at the 4096-entry cap). Returns exactly n_pixels
    indices or None on any malformed stream."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)]

    table = None
    width = min_code_size + 1
    prev: "tuple | None" = None
    out: list[int] = []
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return None  # ran out of bits before EOI
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base) + [(), ()]  # CLEAR/EOI placeholders
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if table is None:
            return None  # data before the first CLEAR
        if code < len(table) and code != eoi:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            return None  # out-of-range code: corrupt stream
        out.extend(entry)
        if len(out) > n_pixels:
            return None  # more pixels than the descriptor declares
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out if len(out) == n_pixels else None


def _lzw_encode(indices: "list[int]", min_code_size: int) -> bytes:
    """Greedy longest-match GIF LZW compressor, bit-exact mirror of
    the decoder's width/clear schedule (resets at the 4096 cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    buf: tuple = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder widens when ITS table reaches 2^width; its
            # table lags the encoder's next_code by exactly one (it
            # adds the entry only on the FOLLOWING code), so the
            # encoder widens at next_code == 2^width + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            # table full (codes are 12-bit, max 4095): reset rather
            # than run deferred-clear — both are spec-valid
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif_gray(payload: bytes) -> "np.ndarray | None":
    """Decode the FIRST image frame of a GIF payload to an (H, W)
    int64 grayscale array (integer luma from the palette), or None
    for anything malformed/unsupported."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    sw = b[6] | (b[7] << 8)
    sh = b[8] | (b[9] << 8)
    flags = b[10]
    if not sw or not sh:
        return None
    pos = 13
    gct = None
    if flags & 0x80:
        n = 3 * (2 ** ((flags & 7) + 1))
        gct = b[pos : pos + n]
        if len(gct) != n:
            return None
        pos += n
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer before any image
            return None
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            if pos >= len(b):
                return None
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            return None
        # image descriptor
        if pos + 10 > len(b):
            return None
        w = b[pos + 5] | (b[pos + 6] << 8)
        h = b[pos + 7] | (b[pos + 8] << 8)
        iflags = b[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 3 * (2 ** ((iflags & 7) + 1))
            pal = b[pos : pos + n]
            if len(pal) != n:
                return None
            pos += n
        if pal is None or not w or not h:
            return None
        if pos >= len(b):
            return None
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            chunk = b[pos + 1 : pos + 1 + ln]
            if len(chunk) != ln:
                return None
            data += chunk
            pos += 1 + ln
        if pos >= len(b):
            return None
        idx = _lzw_decode(bytes(data), mcs, w * h)
        if idx is None:
            return None
        arr = np.asarray(idx, dtype=np.int64)
        if int(arr.max()) * 3 + 2 >= len(pal):
            return None  # index beyond the palette
        p = np.frombuffer(pal, dtype=np.uint8).astype(np.int64)
        luma = (299 * p[0::3] + 587 * p[1::3] + 114 * p[2::3]) // 1000
        img = luma[arr].reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, h, step))
            deintl = np.empty_like(img)
            deintl[order] = img
            img = deintl
        return img
    return None


def encode_gif_gray(
    gray: "np.ndarray", interlace: bool = False, version: bytes = b"GIF89a"
) -> bytes:
    """Encode an (H, W) integer grayscale array (values 0..255) as a
    single-frame GIF with a 256-entry grayscale global color table and
    REAL LZW compression. Deterministic — fixed layout, no extension
    blocks (add interlace=True to exercise the 4-pass row order)."""
    arr = np.asarray(gray, dtype=np.int64)
    if arr.ndim != 2 or arr.min() < 0 or arr.max() > 255:
        raise ValueError("gray must be (H, W) with values 0..255")
    h, w = arr.shape
    out = bytearray(version)
    out += bytes([w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0x80 | 7, 0, 0])
    for i in range(256):  # grayscale GCT: luma(i,i,i) == i exactly
        out += bytes([i, i, i])
    iflags = 0x40 if interlace else 0
    out += bytes([0x2C, 0, 0, 0, 0, w & 0xFF, w >> 8, h & 0xFF, h >> 8, iflags])
    img = arr
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        img = arr[order]
    data = _lzw_encode([int(v) for v in img.ravel()], 8)
    out.append(8)  # LZW minimum code size
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0, 0x3B])  # data terminator + trailer
    return bytes(out)
