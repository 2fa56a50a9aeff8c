"""AVI/MJPEG container codec — the COMPRESSED video rung of the
decode ladder (stdlib struct + the repo's own JPEG codec; public
spec: Microsoft AVI RIFF file reference, OpenDML).

The round-8 verdict's "What's missing #5": the video surface read
only uncompressed Y4M, but a real crawl's video arrives in coded
containers. Motion-JPEG is the honest first rung — every frame is a
complete baseline JPEG, so the container work (RIFF list framing,
stream headers, chunk index) and the codec work (operators/jpeg.py,
already proven pixel-exact at quality 100 on block-aligned content)
compose without any new entropy-coding surface, exactly the way AIFF
reused the WAV sample model.

Layout written (and verified on read):

  RIFF('AVI '
    LIST('hdrl'
      avih(56)                 main header: usec/frame, total frames,
                               dims, 1 stream
      LIST('strl' strh(56) strf(40)))
                               'vids'/'MJPG' stream header + a
                               BITMAPINFOHEADER with biCompression
                               'MJPG'
    LIST('movi' '00dc' <jpeg> ...)
                               one complete JPEG per frame, chunks
                               word-aligned
    idx1(16 per frame))        AVIIF_KEYFRAME entries (every MJPEG
                               frame is a keyframe), offsets relative
                               to the 'movi' fourcc per the de-facto
                               convention

The decoder walks the RIFF tree strictly (sizes must nest; truncated
chunks reject the file), skips JUNK/unknown chunks the way real
writers require, accepts files with or without idx1 (optional in the
spec) but cross-checks it when present, requires the stream to be
'vids'/'MJPG', decodes every 00dc payload through decode_jpeg_gray,
and rejects frame-count or dimension mismatches against the headers.
Return contract matches decode_y4m ({"frames": (n,h,w) uint8, fps}),
so every video consumer — motion stats, scene cuts, banded near-dup,
the streaming video index — is container-BLIND through the
decode_video ladder.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(
    frames: "np.ndarray", fps: "tuple[int, int]" = (30, 1)
) -> bytes:
    """Encode (n_frames, h, w) uint8 luma as an AVI with one MJPG
    video stream; every frame a quality-100 grayscale baseline JPEG
    (pixel-exact on 8x8-block-aligned content — the repo's standard
    oracle-pinning trick)."""
    from flink_stream_spark.operators.jpeg import encode_jpeg_gray

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    n, h, w = arr.shape
    jpegs = [encode_jpeg_gray(arr[f], quality=100) for f in range(n)]

    usec = (1_000_000 * fps[1]) // fps[0]
    maxbytes = max((len(j) for j in jpegs), default=0)
    avih = struct.pack(
        "<10I",
        usec,  # dwMicroSecPerFrame
        maxbytes * fps[0] // max(fps[1], 1),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        maxbytes,  # dwSuggestedBufferSize
        w,
        h,
    ) + b"\x00" * 16  # dwReserved[4]
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            fps[1],  # dwScale
            fps[0],  # dwRate  (rate/scale = fps)
            0,  # dwStart
            n,  # dwLength (frames)
            maxbytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable-size frames)
            0,  # rcFrame left/top
        )
        + struct.pack("<HH", w, h)  # rcFrame right/bottom
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount (decoded depth; MJPG convention)
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage (nominal)
        0,
        0,
        0,
        0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_items = []
    idx_entries = []
    off = 4  # offsets relative to the 'movi' fourcc (de-facto rule)
    for j in jpegs:
        movi_items.append(_chunk(b"00dc", j))
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, off, len(j))
        )
        off += 8 + len(j) + (len(j) & 1)
    movi = _list(b"movi", b"".join(movi_items))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for the chunk sequence in
    b[pos:end]; raises ValueError on malformed nesting."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated chunk header")
        fourcc = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if body + ln > end:
            raise ValueError("chunk overruns parent")
        yield fourcc, body, ln
        pos = body + ln + (ln & 1)


def decode_avi_mjpeg(payload: bytes) -> "dict | None":
    """Decode an AVI with a single MJPG video stream; returns
    {"width", "height", "fps_num", "fps_den", "frames"} (the
    decode_y4m contract) or None for anything malformed: bad RIFF
    framing, missing/contradictory headers, a non-MJPG stream, a
    frame that fails JPEG decode or disagrees with the header
    dimensions, a frame count mismatching avih/strh, or an idx1 that
    contradicts the movi layout."""
    from flink_stream_spark.operators.jpeg import decode_jpeg_gray

    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    (riff_len,) = struct.unpack_from("<I", b, 4)
    if 8 + riff_len > len(b):
        return None
    end = 8 + riff_len
    w = h = nframes = None
    rate = scale = None
    have_mjpg = False
    jpegs: "list[tuple[int, bytes]]" = []  # (offset_rel_movi, payload)
    idx1 = None
    try:
        for fourcc, body, ln in _walk_chunks(b, 12, end):
            if fourcc == b"LIST":
                ltype = b[body : body + 4]
                if ltype == b"hdrl":
                    for f2, b2, l2 in _walk_chunks(b, body + 4, body + ln):
                        if f2 == b"avih":
                            if l2 < 40:
                                return None
                            vals = struct.unpack_from("<10I", b, b2)
                            nframes = vals[4]
                            if vals[6] != 1:
                                return None  # exactly one stream
                            w, h = vals[8], vals[9]
                        elif f2 == b"LIST" and b[b2 : b2 + 4] == b"strl":
                            for f3, b3, l3 in _walk_chunks(
                                b, b2 + 4, b2 + l2
                            ):
                                if f3 == b"strh":
                                    if l3 < 48:
                                        return None
                                    if b[b3 : b3 + 4] != b"vids":
                                        return None
                                    if b[b3 + 4 : b3 + 8] != b"MJPG":
                                        return None
                                    (scale, rate) = struct.unpack_from(
                                        "<II", b, b3 + 20
                                    )
                                elif f3 == b"strf":
                                    if l3 < 40:
                                        return None
                                    comp = b[b3 + 16 : b3 + 20]
                                    have_mjpg = comp == b"MJPG"
                elif ltype == b"movi":
                    movi_fourcc = body  # offsets are relative to here
                    for f2, b2, l2 in _walk_chunks(b, body + 4, body + ln):
                        if f2 == b"00dc":
                            jpegs.append(
                                (b2 - 8 - movi_fourcc, b[b2 : b2 + l2])
                            )
                        # other stream chunks (00wb audio etc.) would
                        # be skipped here; unknown chunks tolerated
            elif fourcc == b"idx1":
                idx1 = b[body : body + ln]
            # JUNK / unknown top-level chunks: skipped
    except ValueError:
        return None
    if w is None or h is None or nframes is None:
        return None
    if not have_mjpg or rate is None or scale in (None, 0):
        return None
    if len(jpegs) != nframes:
        return None
    if idx1 is not None:
        if len(idx1) != 16 * nframes:
            return None
        for i, (off, j) in enumerate(jpegs):
            ck, _flags, ioff, isz = struct.unpack_from("<4sIII", idx1, 16 * i)
            if ck != b"00dc" or ioff != off or isz != len(j):
                return None
    frames = []
    for _off, j in jpegs:
        pix = decode_jpeg_gray(j)
        if pix is None or pix.shape != (h, w):
            return None
        frames.append(pix)
    return {
        "width": w,
        "height": h,
        "fps_num": rate,
        "fps_den": scale,
        "frames": np.stack(frames)
        if frames
        else np.zeros((0, h, w), np.uint8),
    }
