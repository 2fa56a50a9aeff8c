"""FLAC codec — the first COMPRESSED audio container in the decode
ladder (stdlib + numpy, public spec: xiph.org FLAC format / RFC 9639).

Lossless compression is what makes FLAC oracle-able the same way the
WAV/AIFF round-trips are: decode(encode(samples)) must reproduce
every sample bit-exactly, so the established sample-exact round-trip
oracle applies unchanged. The implementation covers the real coding
surface:

- stream: `fLaC` magic, STREAMINFO metadata block (34 bytes: block/
  frame size bounds, 20-bit sample rate, channels, bits-per-sample,
  36-bit total samples, MD5 of the raw little-endian sample stream —
  verified on decode, a whole-stream integrity oracle the container
  itself carries);
- frames: 14-bit sync, blocking strategy, coded block-size/rate/
  channel-assignment/sample-size fields, UTF-8-style coded frame
  number, CRC-8 header check, CRC-16 frame check (both verified);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the polynomial
  predictors), LPC any order (precision/shift/coefficients), wasted
  bits, all at arbitrary BIT-packed sample widths (4-32; widths like
  12 and 20 are not byte-aligned — the bit reader is the codec);
- residuals: Rice / Rice2 partitions (4- and 5-bit parameters, any
  partition order, escape-to-raw partitions), zigzag signed mapping;
- stereo decorrelation: left/side, right/side, mid/side (side
  channel carries bps+1 bits — the corner every naive reader breaks
  on).

The encoder emits fixed-blocksize streams with per-subframe
CONSTANT/VERBATIM/FIXED selection (best order by absolute residual
sum — the published heuristic), Rice partition order 0, independent
channels; the decoder accepts the full surface above, so crafted
streams in tests exercise LPC, escapes, mid/side, and high partition
orders the encoder never writes.

Decode contract matches operators/wav.py: a dict with rate/channels/
bits/samples (int64 frames x channels), or None for malformed input.

Reference: thanminh24/Flink-Stream has no audio surface; this is
SURVEY §2 Part B (multimodal training-data pipeline), the compressed
rung the round-8 verdict ranked next (What's missing #5).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# fixed-predictor coefficients, order 0..4 (FLAC spec §9.2.1)
_FIXED_COEFS = [
    [],
    [1],
    [2, -1],
    [3, -3, 1],
    [4, -6, 4, -1],
]

_SAMPLE_SIZE_BITS = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x^1+1 (0x07), init 0 (FLAC frame header)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_tables() -> "tuple[list, list, list]":
    """Two-byte-step CRC-16/0x8005 tables (built once, vectorized).

    By GF(2) linearity a two-byte update factors into
    ``crc' = Z[crc] ^ C[word]`` where Z advances the 16-bit state by
    two zero bytes and C is the CRC of the two data bytes from state
    0 — two list lookups and one XOR per 16-bit word instead of 16
    shift/xor Python steps per byte (the bit-at-a-time loop was the
    single largest cost of FLAC encode AND decode in the round-10
    profile: ~0.3 s of each ~0.9 s profiled run)."""
    v = np.arange(256, dtype=np.uint32) << 8
    for _ in range(8):
        v = np.where(v & 0x8000, (v << 1) ^ 0x8005, v << 1) & 0xFFFF
    t1 = v.astype(np.uint32)  # single-byte step from state 0
    # C[w] = step(step(0, hi), lo) = ((t1[hi] << 8) ^ t1[(t1[hi] >> 8) ^ lo]
    hi = np.arange(65536, dtype=np.uint32) >> 8
    lo = np.arange(65536, dtype=np.uint32) & 0xFF
    s1 = t1[hi]
    c = ((s1 << 8) & 0xFFFF) ^ t1[(s1 >> 8) ^ lo]
    # Z[s] = two zero-byte steps of state s
    s = np.arange(65536, dtype=np.uint32)
    z1 = ((s << 8) & 0xFFFF) ^ t1[s >> 8]
    z = ((z1 << 8) & 0xFFFF) ^ t1[z1 >> 8]
    return z.tolist(), c.tolist(), t1.tolist()


_CRC16_Z, _CRC16_C, _CRC16_T1 = _crc16_tables()


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 (FLAC frame)."""
    crc = 0
    z, c = _CRC16_Z, _CRC16_C
    n = len(data)
    even = n & ~1
    if even:
        words = np.frombuffer(data, dtype=">u2", count=even >> 1).tolist()
        for w in words:
            crc = z[crc] ^ c[w]
    if n & 1:
        b = data[-1]
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_T1[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        # bulk drain: pop every complete byte in ONE to_bytes call
        # (identical stream to the per-byte loop; the same round-9
        # JPEG _BitWriter optimization). Also the append path for the
        # vectorized residual writer, which hands whole Rice segments
        # to a single call.
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        if self.nbits >= 8:
            nb = self.nbits & 7
            self.buf += (self.acc >> nb).to_bytes(self.nbits >> 3, "big")
            self.acc &= (1 << nb) - 1
            self.nbits = nb

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> "int | None":
        end = self.pos + bits
        if end > len(self.data) * 8:
            return None
        val = 0
        pos = self.pos
        while bits:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < bits else bits
            val = (val << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            pos += take
            bits -= take
        self.pos = pos
        return val

    def read_signed(self, bits: int) -> "int | None":
        v = self.read(bits)
        if v is None:
            return None
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> "int | None":
        n = 0
        total = len(self.data) * 8
        while True:
            if self.pos >= total:
                return None
            byte = self.data[self.pos >> 3]
            avail = 8 - (self.pos & 7)
            chunk = byte & ((1 << avail) - 1)
            if chunk == 0:
                n += avail
                self.pos += avail
                continue
            lead = avail - chunk.bit_length()
            n += lead
            self.pos += lead + 1
            return n

    def byte_pos_aligned(self) -> int:
        assert self.pos % 8 == 0
        return self.pos // 8


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def _zigzag(r: "np.ndarray") -> "np.ndarray":
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.int64)


def _best_fixed_order(ch: "np.ndarray") -> int:
    """The published heuristic: smallest summed |residual| among
    orders 0-4 (orders above len are skipped)."""
    best_o, best_cost = 0, None
    sig = ch
    for o in range(min(4, len(ch) - 1) + 1):
        cost = int(np.abs(sig).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_cost = o, cost
        sig = np.diff(sig)  # order-(o+1) residual of the original
    return best_o


def _fixed_residual(ch: "np.ndarray", order: int) -> "np.ndarray":
    r = ch
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_param(res: "np.ndarray") -> int:
    """Smallest k with mean(zigzag) < 2^k — the standard estimator."""
    if len(res) == 0:
        return 0
    mean = int(_zigzag(res).mean()) if len(res) else 0
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_packed(w: _BitWriter, vals: "np.ndarray", bps: int) -> None:
    """Fixed-width bit-pack a whole sample vector in numpy and append
    it as ONE write — bit-identical to the per-sample write loop
    (round-10; VERBATIM subframes are 4096 writes each otherwise)."""
    if len(vals) == 0:
        return
    u = (vals & ((1 << bps) - 1)).astype(">u4")
    bits = np.unpackbits(u.view(np.uint8).reshape(-1, 4), axis=1)[
        :, 32 - bps:
    ]
    packed = np.packbits(bits.ravel())
    total = bps * len(vals)
    value = int.from_bytes(packed.tobytes(), "big") >> (
        8 * len(packed) - total
    )
    w.write(value, total)


def _write_residual(w: _BitWriter, res: "np.ndarray") -> None:
    """Rice method 0, partition order 0, one parameter.

    Vectorized (round-10, guide §4.2): each sample encodes as q zero
    bits, a 1, then the k low bits of its zigzag value — so the whole
    segment's 1-bits and remainder bits land at positions computable
    from one cumsum of the per-sample lengths. Build the bit array in
    numpy, packbits once, and hand the writer a single (value, nbits)
    append. Bit-for-bit the per-sample loop's stream."""
    k = _rice_param(res)
    w.write(k, 10)  # method 00 + partition order 0000 + 4-bit k
    if len(res) == 0:
        return
    u = _zigzag(res)
    q = u >> k
    lens = q + (1 + k)
    ends = np.cumsum(lens)
    total = int(ends[-1])
    term = ends - (k + 1)  # bit index of each sample's terminating 1
    bits = np.zeros(total, dtype=np.uint8)
    bits[term] = 1
    if k:
        for j in range(k):
            bits[term + 1 + j] = (u >> (k - 1 - j)) & 1
    packed = np.packbits(bits)
    value = int.from_bytes(packed.tobytes(), "big") >> (
        8 * len(packed) - total
    )
    w.write(value, total)


def _rice_cost_bits(res: "np.ndarray") -> int:
    """Exact bit cost of the partition-order-0 Rice encoding."""
    k = _rice_param(res)
    u = _zigzag(res)
    return 2 + 4 + 4 + int((u >> k).sum()) + len(res) * (1 + k)


def _write_subframe(w: _BitWriter, ch: "np.ndarray", bps: int) -> None:
    w.write(0, 1)  # zero pad
    if len(ch) and (ch == ch[0]).all():
        w.write(0b000000, 6)
        w.write(0, 1)  # no wasted bits
        w.write(int(ch[0]), bps)
        return
    order = _best_fixed_order(ch)
    res = _fixed_residual(ch, order)
    # VERBATIM fallback: on noise-like input the Rice quotients blow
    # up (the 4-bit parameter caps at 14 while a residual's zigzag
    # can exceed 2^20, costing thousands of unary bits per sample);
    # raw storage caps the subframe at bps bits/sample — the real
    # FLAC encoder's selection surface (self-review, round 9)
    if order * bps + _rice_cost_bits(res) > len(ch) * bps:
        w.write(0b000001, 6)
        w.write(0, 1)  # no wasted bits
        _write_packed(w, ch, bps)
        return
    w.write(0b001000 | order, 6)
    w.write(0, 1)  # no wasted bits
    for s in ch[:order]:
        w.write(int(s), bps)
    _write_residual(w, res)


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    # grow until the payload fits: 6*(nbytes-1) continuation bits plus
    # (7-nbytes) bits in the lead byte
    nbytes = 2
    while n >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: _BitReader) -> "int | None":
    b0 = br.read(8)
    if b0 is None:
        return None
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        return None
    val = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b is None or (b & 0xC0) != 0x80:
            return None
        val = (val << 6) | (b & 0x3F)
    return val


BLOCK_SIZE = 4096


def encode_flac(samples, rate: int = 16000, bits: int = 16) -> bytes:
    """Encode an (n_frames,) or (n_frames, channels) integer array as
    a FLAC stream: STREAMINFO with stream MD5, fixed-blocksize frames,
    per-channel CONSTANT/VERBATIM/FIXED subframes, Rice partition
    order 0. Any bits in 4..24 (bit-packed, incl. non-byte-aligned
    widths like 12 and 20)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if not 1 <= ch <= 8 or not 4 <= bits <= 24:
        raise ValueError("unsupported channels/bits")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if n and (arr.min() < lo or arr.max() > hi):
        raise ValueError("samples exceed bit depth")

    # STREAMINFO MD5: interleaved little-endian at ceil(bits/8) bytes
    nbytes = (bits + 7) // 8
    flat = arr.reshape(-1)
    le = np.zeros((len(flat), nbytes), dtype=np.uint8)
    u = (flat & ((1 << (8 * nbytes)) - 1)).astype(np.uint64)
    for i in range(nbytes):
        le[:, i] = ((u >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(
            np.uint8
        )
    md5 = hashlib.md5(le.tobytes()).digest()

    frames = bytearray()
    frame_idx = 0
    for start in range(0, max(n, 1), BLOCK_SIZE):
        blk = arr[start : start + BLOCK_SIZE]
        bs = len(blk)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(0b0111, 4)  # block size: 16-bit at end of header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(ch - 1, 4)  # independent channels
        hdr.write(_SAMPLE_SIZE_BITS.get(bits, 0b000), 3)
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = bytearray(hdr.bytes())
        head += _utf8_coded(frame_idx)
        head += struct.pack(">H", bs - 1)
        head.append(_crc8(bytes(head)))
        body = _BitWriter()
        for c in range(ch):
            _write_subframe(body, blk[:, c], bits)
        body.align()
        frame = bytes(head) + body.bytes()
        frames += frame + struct.pack(">H", _crc16(frame))
        frame_idx += 1

    si = _BitWriter()
    si.write(min(BLOCK_SIZE, max(n, 16)), 16)  # min block size
    si.write(min(BLOCK_SIZE, max(n, 16)), 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5
    meta = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return _MAGIC + meta + bytes(frames)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def _read_residual(
    br: _BitReader, bs: int, order: int
) -> "np.ndarray | None":
    method = br.read(2)
    if method is None or method > 1:
        return None
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    if po is None:
        return None
    nparts = 1 << po
    if bs % nparts:
        return None
    out = np.empty(bs - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        cnt = (bs >> po) - (order if p == 0 else 0)
        if cnt < 0:
            return None
        k = br.read(pbits)
        if k is None:
            return None
        if k == escape:
            raw = br.read(5)
            if raw is None:
                return None
            for i in range(cnt):
                v = br.read_signed(raw) if raw else 0
                if v is None:
                    return None
                out[idx] = v
                idx += 1
        else:
            # read_unary/read INLINED with the bit cursor in locals —
            # the per-sample method calls were ~40% of decode wall
            # (round-10 profile; same pattern as the JPEG scan loops).
            data = br.data
            pos = br.pos
            total = len(data) * 8
            kmask = (1 << k) - 1
            vals = []
            for _ in range(cnt):
                # --- unary quotient ---
                q = 0
                while True:
                    if pos >= total:
                        return None
                    byte = data[pos >> 3]
                    avail = 8 - (pos & 7)
                    chunk = byte & ((1 << avail) - 1)
                    if chunk == 0:
                        q += avail
                        pos += avail
                        continue
                    lead = avail - chunk.bit_length()
                    q += lead
                    pos += lead + 1
                    break
                # --- k remainder bits ---
                if k:
                    end = pos + k
                    if end > total:
                        return None
                    r = (
                        int.from_bytes(
                            data[pos >> 3 : (end + 7) >> 3], "big"
                        )
                        >> (-end % 8)
                    ) & kmask
                    pos = end
                    u = (q << k) | r
                else:
                    u = q
                vals.append((u >> 1) if (u & 1) == 0 else -((u + 1) >> 1))
            br.pos = pos
            out[idx : idx + cnt] = vals
            idx += cnt
    return out


def _read_subframe(br: _BitReader, bs: int, bps: int) -> "np.ndarray | None":
    if br.read(1) != 0:
        return None
    t = br.read(6)
    if t is None:
        return None
    wf = br.read(1)
    if wf is None:
        return None
    wasted = 0
    if wf:
        w = br.read_unary()
        if w is None:
            return None
        wasted = w + 1
    eff = bps - wasted
    if eff <= 0:
        return None
    if t == 0b000000:  # CONSTANT
        v = br.read_signed(eff)
        if v is None:
            return None
        out = np.full(bs, v, dtype=np.int64)
    elif t == 0b000001:  # VERBATIM
        out = np.empty(bs, dtype=np.int64)
        for i in range(bs):
            v = br.read_signed(eff)
            if v is None:
                return None
            out[i] = v
    elif 0b001000 <= t <= 0b001100:  # FIXED
        order = t & 0x07
        if order > bs:
            return None
        warm = np.empty(order, dtype=np.int64)
        for i in range(order):
            v = br.read_signed(eff)
            if v is None:
                return None
            warm[i] = v
        res = _read_residual(br, bs, order)
        if res is None:
            return None
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        # the FIXED predictor of order o is the o-th finite difference,
        # so reconstruction is o successive cumulative sums seeded by
        # the warmup's difference pyramid — exact int64, replaces the
        # per-sample Python recurrence (round-10; 4096 iterations with
        # an inner coefficient loop per frame)
        if order == 0:
            out[:] = res
        elif bs > order:
            lasts = []
            cur = warm
            for _ in range(order):
                lasts.append(int(cur[-1]))
                cur = np.diff(cur)
            x = res
            for j in range(order - 1, -1, -1):
                x = lasts[j] + np.cumsum(x)
            out[order:] = x
    elif t & 0b100000:  # LPC
        order = (t & 0x1F) + 1
        if order > bs:
            return None
        warm = np.empty(order, dtype=np.int64)
        for i in range(order):
            v = br.read_signed(eff)
            if v is None:
                return None
            warm[i] = v
        prec = br.read(4)
        if prec is None or prec == 0b1111:
            return None
        prec += 1
        shift = br.read_signed(5)
        if shift is None or shift < 0:
            return None
        coefs = []
        for _ in range(order):
            c = br.read_signed(prec)
            if c is None:
                return None
            coefs.append(c)
        res = _read_residual(br, bs, order)
        if res is None:
            return None
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            acc = 0
            for j, cf in enumerate(coefs):
                acc += cf * out[i - 1 - j]
            out[i] = res[i - order] + (acc >> shift)
    else:
        return None  # reserved type
    return out << wasted if wasted else out


_BS_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(payload: bytes) -> "dict | None":
    """Decode a FLAC stream; returns the decode_wav dict contract or
    None for anything malformed (bad magic/CRCs/subframe types/
    truncation/sample-count or MD5 mismatch)."""
    b = bytes(payload)
    if len(b) < 42 or b[:4] != _MAGIC:
        return None
    # metadata blocks
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(b):
            return None
        hdr = b[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        (blen,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        body = b[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            return None
        if btype == 0:
            if blen != 34 or streaminfo is not None:
                return None
            streaminfo = body
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        return None
    sr = _BitReader(streaminfo)
    sr.read(16)  # min block
    sr.read(16)  # max block
    sr.read(24)
    sr.read(24)
    rate = sr.read(20)
    ch = sr.read(3) + 1
    bps = sr.read(5) + 1
    total = sr.read(36)
    md5 = streaminfo[18:34]
    if rate == 0:
        return None

    chans = [[] for _ in range(ch)]
    got = 0
    while got < total:
        br = _BitReader(b[pos:])
        sync = br.read(14)
        if sync != 0b11111111111110:
            return None
        if br.read(1) != 0:
            return None
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        if br.read(1) != 0:
            return None
        if _read_utf8_coded(br) is None:
            return None
        if bs_code in (0, None):
            return None
        elif bs_code == 6:
            v = br.read(8)
            if v is None:
                return None
            bs = v + 1
        elif bs_code == 7:
            v = br.read(16)
            if v is None:
                return None
            bs = v + 1
        else:
            bs = _BS_TABLE[bs_code]
        if sr_code == 0:
            pass  # from STREAMINFO
        elif sr_code == 12:
            if br.read(8) is None:
                return None
        elif sr_code in (13, 14):
            if br.read(16) is None:
                return None
        elif sr_code == 15:
            return None
        if ss_code == 0:
            f_bps = bps
        elif ss_code in _SS_TABLE:
            f_bps = _SS_TABLE[ss_code]
        else:
            return None
        hdr_len = br.byte_pos_aligned()
        crc8 = br.read(8)
        if crc8 is None or crc8 != _crc8(b[pos : pos + hdr_len]):
            return None
        if ca <= 7:
            nch = ca + 1
            widths = [f_bps] * nch
        elif ca == 8:  # left/side
            nch, widths = 2, [f_bps, f_bps + 1]
        elif ca == 9:  # right/side
            nch, widths = 2, [f_bps + 1, f_bps]
        elif ca == 10:  # mid/side
            nch, widths = 2, [f_bps, f_bps + 1]
        else:
            return None
        if nch != ch:
            return None
        subs = []
        for c in range(nch):
            s = _read_subframe(br, bs, widths[c])
            if s is None:
                return None
            subs.append(s)
        # byte-align, then CRC-16 over the whole frame
        if br.pos % 8:
            pad = br.read(8 - br.pos % 8)
            if pad is None or pad != 0:
                return None
        flen = br.byte_pos_aligned()
        crc16 = br.read(16)
        if crc16 is None or crc16 != _crc16(b[pos : pos + flen]):
            return None
        pos += flen + 2
        if ca == 8:
            left = subs[0]
            right = left - subs[1]
            subs = [left, right]
        elif ca == 9:
            right = subs[1]
            left = right + subs[0]
            subs = [left, right]
        elif ca == 10:
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        for c in range(ch):
            chans[c].append(subs[c])
        got += bs
    if got != total:
        return None
    samples = np.stack(
        [np.concatenate(c) if c else np.empty(0, dtype=np.int64) for c in chans],
        axis=1,
    )
    # verify the STREAMINFO MD5 when present (all-zero = unset)
    if md5 != b"\x00" * 16:
        nbytes = (bps + 7) // 8
        flat = samples.reshape(-1)
        le = np.zeros((len(flat), nbytes), dtype=np.uint8)
        u = (flat & ((1 << (8 * nbytes)) - 1)).astype(np.uint64)
        for i in range(nbytes):
            le[:, i] = (
                (u >> np.uint64(8 * i)) & np.uint64(0xFF)
            ).astype(np.uint8)
        if hashlib.md5(le.tobytes()).digest() != md5:
            return None
    return {"rate": rate, "channels": ch, "bits": bps, "samples": samples}
