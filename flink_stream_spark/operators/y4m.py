"""Stdlib-only Y4M (YUV4MPEG2) video codec.

The third REAL modality codec (images: ``operators/png.py``, audio:
``operators/wav.py``): YUV4MPEG2 is the uncompressed interchange
format the mjpegtools/ffmpeg toolchains use as their reference video
representation — a plain-text stream header followed by raw planar
frames, so a correct decoder needs no codec library, only strict
framing. Decode walks the header (magic, W/H/F parameters validated,
colorspace resolved to its plane geometry), then each ``FRAME``
marker + payload with exact size bounds; anything else — unknown
colorspace, truncated frame, missing parameters — returns ``None``
and the caller falls back to its deterministic stand-in (the same
decode-ladder discipline as the PNG and WAV paths).

Supported colorspaces and their bytes-per-frame:
  C420 / C420jpeg / C420mpeg2 / C420paldv: W*H + 2*((W//2)*(H//2))
  C422: W*H + 2*((W//2)*H)
  C444: 3*W*H
  Cmono: W*H
Only the luma plane is returned per frame — every downstream
statistic in this repo is luma-derived (the standard fingerprinting
choice); chroma is validated for size and skipped.

Scale posture: decode runs inside Arrow-batched ``mapInPandas``
stages — narrow, embarrassingly parallel, no shuffle; plane math is
``numpy.frombuffer`` (vectorized), never a per-pixel Python loop.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

# colorspace -> chroma bytes per frame as a function of (w, h)
_CHROMA_BYTES = {
    "420": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "420jpeg": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "420mpeg2": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "420paldv": lambda w, h: 2 * ((w // 2) * (h // 2)),
    "422": lambda w, h: 2 * ((w // 2) * h),
    "444": lambda w, h: 2 * w * h,
    "mono": lambda w, h: 0,
}


def decode_y4m(payload: bytes) -> "dict | None":
    """Decode a YUV4MPEG2 payload.

    Returns {"width", "height", "fps_num", "fps_den", "colorspace",
    "frames"} — ``frames`` is an (n_frames, height, width) uint8 numpy
    array of luma planes — or ``None`` for anything this decoder does
    not support (strict: malformed headers and truncated frames never
    yield partial pixels).
    """
    b = bytes(payload)
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(_MAGIC + b" "):
        return None
    try:
        params = b[len(_MAGIC) + 1 : nl].decode("ascii").split(" ")
    except UnicodeDecodeError:
        return None
    w = h = None
    fps_num, fps_den = 30, 1
    cs = "420"  # the spec's default when C is absent
    for p in params:
        if not p:
            continue
        tag, val = p[0], p[1:]
        try:
            if tag == "W":
                w = int(val)
            elif tag == "H":
                h = int(val)
            elif tag == "F":
                num, den = val.split(":")
                fps_num, fps_den = int(num), int(den)
            elif tag == "C":
                cs = val
            # I (interlace), A (aspect), X (extensions) validated as
            # present-but-ignored — they don't change plane geometry
        except ValueError:
            return None
    if not w or not h or w <= 0 or h <= 0 or fps_num <= 0 or fps_den <= 0:
        return None
    if cs not in _CHROMA_BYTES:
        return None
    luma_sz = w * h
    frame_sz = luma_sz + _CHROMA_BYTES[cs](w, h)
    pos = nl + 1
    lumas = []
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            return None
        # per-frame parameters (rare) are allowed after the marker
        body = b[fnl + 1 : fnl + 1 + frame_sz]
        if len(body) != frame_sz:
            return None  # truncated frame: reject, never partial
        lumas.append(np.frombuffer(body[:luma_sz], dtype=np.uint8).reshape(h, w))
        pos = fnl + 1 + frame_sz
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": cs,
        "frames": np.stack(lumas) if lumas else np.zeros((0, h, w), np.uint8),
    }


def encode_y4m(
    frames: "np.ndarray",
    fps: "tuple[int, int]" = (30, 1),
    colorspace: str = "mono",
) -> bytes:
    """Encode (n_frames, h, w) uint8 luma planes as a canonical
    YUV4MPEG2 payload. Deterministic — fixed parameter order, chroma
    planes (for non-mono colorspaces) filled with the neutral 128."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    n, h, w = arr.shape
    if colorspace not in _CHROMA_BYTES:
        raise ValueError(f"unsupported colorspace {colorspace}")
    chroma = bytes([128]) * _CHROMA_BYTES[colorspace](w, h)
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    out = [head.encode("ascii")]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(arr[f].tobytes())
        out.append(chroma)
    return b"".join(out)


def motion_profile(frames: "np.ndarray", n_blocks: int = 4) -> "dict":
    """Integer video fingerprint from decoded luma frames.

    Per frame: mean luma (exact integer floor mean) and ``n_blocks``
    vertical-strip block means (the spatial layout signature). Motion
    = Σ |mean[f] − mean[f−1]| over consecutive frames — the classic
    temporal-activity measure. All arithmetic is exact integers so an
    oracle reproduces every value from the source bytes.
    """
    n, h, w = frames.shape
    means = []
    blocks = []
    px = frames.astype(np.int64)
    for f in range(n):
        tot = int(px[f].sum())
        means.append(tot // (h * w))
        row = []
        for bidx in range(n_blocks):
            lo = (bidx * w) // n_blocks
            hi = ((bidx + 1) * w) // n_blocks
            row.append(int(px[f, :, lo:hi].sum()) // (h * (hi - lo)))
        blocks.append(row)
    motion = sum(abs(means[f] - means[f - 1]) for f in range(1, n))
    return {"frame_means": means, "block_means": blocks, "motion": motion}
