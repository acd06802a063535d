"""From-scratch FLAC codec, pure numpy — lossless audio for the
multimodal pipeline (reference analogue: GDAL's decode-anything ingest,
/root/reference/src/io.py:41-63, extended to the audio modality the build
brief makes first-class).

Implements the public FLAC format (RFC 9639 / xiph.org): everything is
STRUCTURAL — predictors, Rice codes, CRCs — with no numerically-published
filter tables, which is what makes a conformant from-scratch implementation
possible where MPEG-audio (512-tap window table) is genuinely
codec-library-bound.

Decoder (full bit-level parse):
  - fLaC magic + metadata blocks (STREAMINFO consumed, others skipped)
  - frame header: sync, blocksize/samplerate/channel/bps codes, UTF-8-coded
    frame number, CRC-8 verified
  - subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order),
    wasted-bits shift
  - Rice residual: both 4- and 5-bit parameter methods, any partition
    order, escape partitions (raw two's-complement)
  - stereo decorrelation: independent, left-side, right-side, mid-side
    (side channel carries bps+1 bits per the spec)
  - frame CRC-16 verified
  - FIXED reconstruction is vectorized: the order-k residual is the k-th
    finite difference, so reconstruction is k successive ``np.cumsum``
    passes seeded by the warmup samples — no per-sample Python loop

Encoder (valid subset, enough to round-trip any int16 signal):
  - STREAMINFO + fixed-blocksize frames
  - per block and channel: CONSTANT when flat, else best FIXED order 0-4
    by summed residual magnitude, with VERBATIM as the cost fallback
  - single-partition Rice with exhaustive parameter search incl. escape

The oracle contract: FLAC is lossless, so decode(encode(x)) == x exactly
and integer features computed downstream get a closed-form DuckDB twin —
no expectations fixture needed (unlike the lossy-JPEG gates).
"""

from __future__ import annotations

import struct

import numpy as np

from ._hardening import malformed_guard

_SYNC = 0b11111111111110

# CRC tables generated from the spec polynomials (x^8+x^2+x+1 and
# x^16+x^15+x^2+1) — computed, not transcribed.


def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _make_crc_table(0x07, 8)
_CRC16_TAB = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for byte in data:
        r = int(_CRC8_TAB[r ^ byte])
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for byte in data:
        r = int(_CRC16_TAB[((r >> 8) ^ byte) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


def _utf8_code(val: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers (extended past
    U+10FFFF to 36 bits)."""
    if val < 0x80:
        return bytes([val])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if val < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (val >> (6 * (nbytes - 1)))]
            for k in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((val >> (6 * k)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


# ------------------------------------------------------------------ bits

class _BitWriter:
    """MSB-first bit accumulator; fields buffered then packed once."""

    def __init__(self) -> None:
        self._fields: list[tuple[int, int]] = []  # (value, nbits)
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits:
            self._fields.append((value & ((1 << nbits) - 1), nbits))
            self._nbits += nbits

    def write_unary(self, q: int) -> None:
        # q zero bits then a one — exactly the integer 1 in q+1 bits
        self.write(1, q + 1)

    def align(self) -> None:
        pad = (-self._nbits) % 8
        if pad:
            self.write(0, pad)

    def to_bytes(self) -> bytes:
        bits = np.zeros(self._nbits, dtype=np.uint8)
        pos = 0
        for value, nbits in self._fields:
            if value:
                b = np.frombuffer(
                    value.to_bytes((nbits + 7) // 8, "big"), dtype=np.uint8
                )
                bits[pos : pos + nbits] = np.unpackbits(b)[-nbits:]
            pos += nbits
        return np.packbits(bits).tobytes()


class _BitReader:
    """MSB-first reader over an unpacked bit array; unary runs resolve in
    O(log n) via a precomputed one-positions index."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.pos + nbits > len(self.bits):
            raise ValueError("flac: bitstream truncated")
        window = self.bits[self.pos : self.pos + nbits]
        self.pos += nbits
        val = 0
        for byte in np.packbits(window).tobytes():
            val = (val << 8) | byte
        return val >> ((-nbits) % 8)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        idx = np.searchsorted(self.ones, self.pos)
        if idx >= len(self.ones):
            raise ValueError("flac: unary run past end of stream")
        one_at = int(self.ones[idx])
        q = one_at - self.pos
        self.pos = one_at + 1
        return q

    def align(self) -> None:
        self.pos += (-self.pos) % 8


# ------------------------------------------------------------- predictors

# k-th fixed predictor residual = k-th finite difference of the signal
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_reconstruct(
    warmup: np.ndarray, resid: np.ndarray, order: int
) -> np.ndarray:
    """Invert the order-th difference with ``order`` cumsum passes.  At
    level j the difference sequence D_j (D_order = residual) extends to
    D_{j-1} = cumsum([seed, D_j]) where seed — the (j-1)-th difference at
    position 0 — comes entirely from the warmup prefix.  The final level
    IS the signal, warmup included, with zero per-sample Python work."""
    d = resid.astype(np.int64)
    for j in range(order, 0, -1):
        seed = _fixed_residual(warmup[:j], j - 1)  # length 1
        d = np.cumsum(np.concatenate([seed, d]))
    return d


def _zigzag(v: np.ndarray) -> np.ndarray:
    u = v.astype(np.int64)
    return np.where(u >= 0, u << 1, ((-u) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


# --------------------------------------------------------------- encoder

def _rice_cost(z: np.ndarray, k: int) -> int:
    return int(np.sum(z >> k)) + len(z) * (k + 1)


def _write_residual(bw: _BitWriter, resid: np.ndarray) -> None:
    """Single-partition (order 0) Rice, 4-bit parameter, escape when raw
    two's-complement is cheaper."""
    z = _zigzag(resid)
    best_k, best_cost = 0, _rice_cost(z, 0)
    for k in range(1, 15):
        c = _rice_cost(z, k)
        if c < best_cost:
            best_k, best_cost = k, c
    raw_bits = int(np.abs(resid.astype(np.int64)).max()).bit_length() + 1 if len(resid) else 1
    bw.write(0b00, 2)  # 4-bit rice method
    bw.write(0, 4)  # partition order 0
    if raw_bits * len(resid) < best_cost:
        bw.write(0b1111, 4)  # escape
        bw.write(raw_bits, 5)
        for v in resid:
            bw.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
        return
    bw.write(best_k, 4)
    for u in z:
        bw.write_unary(int(u) >> best_k)
        bw.write(int(u) & ((1 << best_k) - 1), best_k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best_order, best_cost, best_resid = None, n * bps, None
    for order in range(0, min(5, n)):
        resid = _fixed_residual(x, order)
        z = _zigzag(resid)
        cost = order * bps + min(_rice_cost(z, k) for k in range(15))
        if cost < best_cost:
            best_order, best_cost, best_resid = order, cost, resid
    if best_order is None:
        bw.write(0, 1)
        bw.write(0b000001, 6)  # VERBATIM
        bw.write(0, 1)
        for v in x:
            bw.write(int(v) & ((1 << bps) - 1), bps)
        return
    bw.write(0, 1)
    bw.write(0b001000 | best_order, 6)  # FIXED
    bw.write(0, 1)
    for v in x[:best_order]:
        bw.write(int(v) & ((1 << bps) - 1), bps)
    _write_residual(bw, best_resid)


def encode_flac(
    samples: np.ndarray, rate: int, block_size: int = 4096
) -> bytes:
    """int16 (n,) mono or (n, ch) multichannel -> FLAC bytes (16 bps,
    fixed block size, independent channels)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError(f"flac encoder is int16-only, got {samples.dtype}")
    n, ch = samples.shape
    if not 1 <= ch <= 8:
        raise ValueError(f"flac: {ch} channels unsupported")
    bps = 16
    # sample_rate(20) | channels-1(3) | bps-1(5) | total_samples top 4 of 36
    packed = (rate << 12) | ((ch - 1) << 9) | ((bps - 1) << 4) | (n >> 32)
    info = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2  # min/max framesize unknown
        + struct.pack(">I", packed)
        + struct.pack(">I", n & 0xFFFFFFFF)
        + b"\x00" * 16  # MD5 unset (0 = unknown, per spec)
    )
    header = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info

    frames = []
    for fi, start in enumerate(range(0, n, block_size)):
        blk = samples[start : start + block_size]
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize strategy: number = frame index
        bw.write(0b0111, 4)  # blocksize: 16-bit value at end of header
        bw.write(0b0000, 4)  # samplerate: from STREAMINFO
        bw.write(ch - 1, 4)  # independent channels
        bw.write(0b100, 3)  # 16 bps
        bw.write(0, 1)  # reserved
        head = bw.to_bytes() + _utf8_code(fi)
        head += struct.pack(">H", len(blk) - 1)
        head += bytes([_crc8(head)])

        body = _BitWriter()
        for c in range(ch):
            _encode_subframe(body, blk[:, c], bps)
        body.align()
        frame = head + body.to_bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames.append(frame)
    return header + b"".join(frames)


# --------------------------------------------------------------- decoder

_BLOCKSIZE_CODES = {
    0b0001: 192, **{c: 576 << (c - 2) for c in range(0b0010, 0b0110)},
    **{c: 256 << (c - 8) for c in range(0b1000, 0b10000)},
}
_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}
_RATE_CODES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}


def _read_utf8(data: bytes, pos: int) -> tuple[int, int]:
    first = data[pos]
    if first < 0x80:
        return first, pos + 1
    nbytes = 8 - (255 - first).bit_length()
    if pos + nbytes > len(data):
        raise ValueError("flac: truncated UTF-8 frame number")
    val = first & (0x7F >> nbytes)
    for i in range(1, nbytes):
        cont = data[pos + i]
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation in frame number")
        val = (val << 6) | (cont & 0x3F)
    return val, pos + nbytes


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac: partition order does not divide block size")
    if blocksize // nparts <= order:
        # spec requires blocksize >> porder > predictor order; letting a
        # negative first-partition count through would wrap negative
        # indices into the output tail and return garbage samples silently
        raise ValueError(
            f"flac: partition size {blocksize // nparts} <= order {order}"
        )
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        cnt = blocksize // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(cnt):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[w + i] = _unzigzag(u)
        w += cnt
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits-per-sample flag, unary k-1
        wasted = br.read_unary() + 1
        bps -= wasted
    if ftype == 0b000000:  # CONSTANT
        x = np.full(blocksize, br.read_signed(bps), dtype=np.int64)
    elif ftype == 0b000001:  # VERBATIM
        x = np.array([br.read_signed(bps) for _ in range(blocksize)], np.int64)
    elif 0b001000 <= ftype <= 0b001100:  # FIXED
        order = ftype & 0x07
        warmup = np.array([br.read_signed(bps) for _ in range(order)], np.int64)
        resid = _read_residual(br, blocksize, order)
        x = _fixed_reconstruct(warmup, resid, order)
    elif ftype >= 0b100000:  # LPC
        order = (ftype & 0x1F) + 1
        warmup = np.array([br.read_signed(bps) for _ in range(order)], np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision escape")
        shift = br.read_signed(5)
        coefs = np.array(
            [br.read_signed(prec) for _ in range(order)], np.int64
        )
        resid = _read_residual(br, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warmup
        for i in range(order, blocksize):
            pred = int(np.dot(coefs, x[i - order : i][::-1])) >> shift
            x[i] = resid[i - order] + pred
    else:
        raise ValueError(f"flac: reserved subframe type {ftype:06b}")
    return x << wasted


@malformed_guard("flac")
def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int32 samples (n, ch), sample_rate).  Verifies magic,
    CRC-8 per frame header, CRC-16 per frame."""
    if data[:4] != b"fLaC":
        raise ValueError("not a flac stream (missing fLaC magic)")
    pos, rate, ch, bps, total = 4, 0, 0, 0, 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        head = data[pos]
        btype, last = head & 0x7F, head & 0x80
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if pos + 4 + blen > len(data):
            raise ValueError("flac: truncated metadata block body")
        if btype == 0:  # STREAMINFO
            body = data[pos + 4 : pos + 4 + blen]
            if len(body) < 18:
                raise ValueError("flac: STREAMINFO too short")
            packed = struct.unpack(">I", body[10:14])[0]
            rate = packed >> 12
            ch = ((packed >> 9) & 0x7) + 1
            bps = ((packed >> 4) & 0x1F) + 1
            total = ((packed & 0xF) << 32) | struct.unpack(">I", body[14:18])[0]
        pos += 4 + blen
        if last:
            break
    if not rate:
        raise ValueError("flac: no STREAMINFO block")

    chans: list[np.ndarray] = []
    while pos < len(data):
        fstart = pos
        # frame header is >= 6 bytes (4 fixed + 1 utf8 + crc8); checking up
        # front keeps truncation a ValueError like every other bad-stream
        # path, not an IndexError
        if pos + 6 > len(data):
            raise ValueError("flac: truncated frame header")
        sync = (data[pos] << 6) | (data[pos + 1] >> 2)
        if sync != _SYNC:
            raise ValueError(f"flac: lost frame sync at {pos}")
        b1 = data[pos + 1]
        if b1 & 0x02:
            raise ValueError("flac: reserved frame-header bit set")
        bs_code = data[pos + 2] >> 4
        sr_code = data[pos + 2] & 0x0F
        ch_code = data[pos + 3] >> 4
        bps_code = (data[pos + 3] >> 1) & 0x07
        pos += 4
        _, pos = _read_utf8(data, pos)
        if bs_code == 0b0110:
            blocksize = data[pos] + 1
            pos += 1
        elif bs_code == 0b0111:
            blocksize = struct.unpack(">H", data[pos : pos + 2])[0] + 1
            pos += 2
        elif bs_code in _BLOCKSIZE_CODES:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError(f"flac: reserved blocksize code {bs_code:04b}")
        if sr_code == 0b1100:
            pos += 1
        elif sr_code in (0b1101, 0b1110):
            pos += 2
        elif sr_code and sr_code not in _RATE_CODES:
            raise ValueError(f"flac: bad samplerate code {sr_code:04b}")
        if pos >= len(data):
            raise ValueError("flac: truncated frame header")
        if data[pos] != _crc8(data[fstart:pos]):
            raise ValueError("flac: frame header CRC-8 mismatch")
        pos += 1

        if bps_code == 0b011:
            raise ValueError("flac: reserved bits-per-sample code 011")
        fbps = _BPS_CODES.get(bps_code, bps)

        def _decode_channels(br: _BitReader) -> list[np.ndarray]:
            if ch_code < 0b1000:
                return [
                    _decode_subframe(br, blocksize, fbps)
                    for _ in range(ch_code + 1)
                ]
            if ch_code == 0b1000:  # left-side
                left = _decode_subframe(br, blocksize, fbps)
                side = _decode_subframe(br, blocksize, fbps + 1)
                return [left, left - side]
            if ch_code == 0b1001:  # right-side
                side = _decode_subframe(br, blocksize, fbps + 1)
                right = _decode_subframe(br, blocksize, fbps)
                return [right + side, right]
            if ch_code == 0b1010:  # mid-side
                mid = _decode_subframe(br, blocksize, fbps)
                side = _decode_subframe(br, blocksize, fbps + 1)
                m2 = (mid << 1) | (side & 1)
                return [(m2 + side) >> 1, (m2 - side) >> 1]
            raise ValueError(f"flac: reserved channel code {ch_code:04b}")

        # Bound the reader to this frame's worst case (verbatim/escape stay
        # under ~5 bytes per sample per channel; 8 is generous slack) so a
        # long stream decodes linearly — a reader over the whole remaining
        # tail would make decode O(frames^2) in np.unpackbits work.
        window = blocksize * (ch + 1) * 8 + 16384
        br = _BitReader(data[pos : pos + window])
        try:
            sub = _decode_channels(br)
        except ValueError:
            # A spec-valid frame can outgrow the heuristic window (e.g. a
            # Rice partition with a tiny parameter and one huge residual's
            # unary run).  Retry this one frame with an unbounded reader
            # over the remaining tail before declaring the stream bad; the
            # windowed path stays the common fast case.
            if window >= len(data) - pos:
                raise  # window already covered the tail: genuinely bad
            br = _BitReader(data[pos:])
            sub = _decode_channels(br)
        br.align()
        pos += br.pos // 8
        if pos + 2 > len(data):
            raise ValueError("flac: truncated frame CRC")
        crc = struct.unpack(">H", data[pos : pos + 2])[0]
        if crc != _crc16(data[fstart:pos]):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos += 2
        chans.append(np.stack(sub, axis=1))
    out = np.concatenate(chans, axis=0) if chans else np.zeros((0, ch), np.int64)
    if total:
        out = out[:total]
    return out.astype(np.int32), rate
