"""MPEG audio (MP3) codec, from scratch per the public ISO/IEC 11172-3
layout: frame walker + CBR writers + a REAL Layer I payload codec.

Scope:

* FRAME level — sync-word scan, header field decode (version, layer,
  bitrate, sample rate, padding, mode, protection), exact frame-length
  arithmetic, and the stream walk that yields every frame's
  offset/length, from which frame count, duration, and mean bitrate
  follow exactly (``walk_frames`` / ``probe_mp3``).

* LAYER I payload — full encode + decode (``encode_mp3`` /
  ``decode_mp3``): 32-band cosine-modulated polyphase filterbank,
  per-subband 6-bit scalefactors, self-describing 4-bit bit allocation,
  and the spec's (2^nb - 1)-level midtread requantizer.  Layer I is the
  one layer implementable exactly from first principles: its bit
  allocation is carried IN the bitstream (no Table 3-B.2 allocation
  tables) and its scalefactor table is the closed form
  ``scf[i] = 2 * 2^(-i/3)`` (Table 3-B.1).  The single component the
  spec gives only as a numeric table — the 512-tap prototype window
  (Table 3-C.1) — is replaced here by a COMPUTED near-perfect-
  reconstruction pseudo-QMF prototype (power-complementary
  sqrt-raised-cosine transition, classic Vaidyanathan design), used by
  both our analysis (encoder) and synthesis (decoder); round-trip
  fidelity is pinned by an SNR contract in tests/test_mp3.py.

* LAYER II payload — full encode + decode, allocation Tables 3-B.2a
  (sblimit 27) and 3-B.2b (sblimit 30) transcribed from the public
  spec, the published quantization classes of Table 3-B.4 (grouped
  3/5/9-level codewords of 5/7/10 bits, C = 2^ceil(log2(L+1))/L,
  D = 0.5 grouped / 2^(1-nb) ungrouped), scfsi-coded scalefactors, and
  the same computed filterbank as Layer I.  Table selection from
  (sample rate, kbps per channel): 48 kHz or <= 80 kbps/ch -> B.2a,
  else B.2b; the low-rate tables B.2c/d (< 56 kbps/ch) stay out of
  scope and raise.  Intensity (joint) stereo codes for real on both
  sides IN BOTH LAYERS (mode=1, bound = (mode_ext+1)*4: one allocation
  + one sample block per shared subband, scalefactors per channel —
  the slot layout of 2.4.1.5/2.4.1.6; Layer I joined in r5).

* LAYER III decodes through the restricted profile in codec_mp3_l3.py
  (long blocks, Huffman tables 0/1 + count1B, bit reservoir + scfsi);
  streams outside that profile raise ``NotImplementedError`` naming the
  boundary — the remaining Annex B Huffman tables exist only as spec
  annex tables that cannot be re-derived.

Reference analogue: library-delegated media open in
/root/reference/src/io.py:41-63.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# bitrate table, kbps; index 0 = 'free', 15 = invalid  (MPEG1 rows)
_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
# MPEG2 / 2.5 share one table for layers II+III
_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {  # by version key
    3: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    0: [11025, 12000, 8000],  # MPEG2.5
}


@dataclass
class Mp3Frame:
    offset: int
    length: int
    version: int  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer: int  # 1..3
    bitrate_kbps: int
    sample_rate: int
    padding: int
    samples: int  # PCM samples this frame decodes to
    mode: int = 3  # 0=stereo, 1=joint, 2=dual, 3=single_channel
    mode_ext: int = 0  # joint stereo: Layer II bound = (mode_ext+1)*4
    protection: int = 1  # 0 = 16-bit CRC follows the header


def parse_frame_header(data: bytes, pos: int) -> Mp3Frame | None:
    """Decode the 4-byte header at ``pos``; None if it is not a valid
    frame sync.  Header: AAAAAAAA AAABBCCD EEEEFFGH ...  (A sync, B
    version, C layer, D protection, E bitrate idx, F samplerate idx,
    G padding)."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_code = (b1 >> 1) & 0x3  # 3=I, 2=II, 1=III, 0=reserved
    if version == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    table = _BITRATES_V1 if version == 3 else _BITRATES_V2
    bitrate = table[layer][br_idx]
    rate = _SAMPLE_RATES[version][sr_idx]
    if layer == 1:
        length = (12 * bitrate * 1000 // rate + padding) * 4
        samples = 384
    else:
        # layer III in MPEG2/2.5 halves the per-frame coefficient
        coef = 144 if (layer == 2 or version == 3) else 72
        length = coef * bitrate * 1000 // rate + padding
        samples = 1152 if (layer == 2 or version == 3) else 576
        if layer == 2:
            samples = 1152
    return Mp3Frame(
        offset=pos,
        length=length,
        version=version,
        layer=layer,
        bitrate_kbps=bitrate,
        sample_rate=rate,
        padding=padding,
        samples=samples,
        mode=(b3 >> 6) & 0x3,
        mode_ext=(b3 >> 4) & 0x3,
        protection=b1 & 0x1,
    )


def walk_frames(data: bytes) -> list[Mp3Frame]:
    """Scan for the first sync, then walk frame-to-frame by exact length
    (re-syncing on garbage).  Returns every complete frame in order."""
    frames: list[Mp3Frame] = []
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        fr = parse_frame_header(data, pos)
        if fr is None:
            pos += 1  # re-sync scan
            continue
        if pos + fr.length > n:
            break  # truncated final frame
        frames.append(fr)
        pos += fr.length
    return frames


@dataclass
class Mp3Info:
    n_frames: int
    sample_rate: int
    bitrate_kbps: int  # mean over frames (CBR -> the constant rate)
    duration_ms: int
    total_bytes: int
    is_cbr: bool


def probe_mp3(data: bytes) -> Mp3Info:
    frames = walk_frames(data)
    if not frames:
        raise ValueError("no MPEG audio frames found")
    rate = frames[0].sample_rate
    total_samples = sum(f.samples for f in frames)
    rates = {f.bitrate_kbps for f in frames}
    return Mp3Info(
        n_frames=len(frames),
        sample_rate=rate,
        bitrate_kbps=sum(f.bitrate_kbps for f in frames) // len(frames),
        duration_ms=total_samples * 1000 // rate,
        total_bytes=sum(f.length for f in frames),
        is_cbr=len(rates) == 1,
    )


def build_mp3(
    n_frames: int,
    bitrate_idx: int,
    sample_rate_idx: int,
    fill_seed: int = 0,
) -> bytes:
    """Minimal valid MPEG1 Layer III CBR stream: ``n_frames`` frames with
    correct headers and deterministic filler payload (byte j of frame k is
    ``(fill_seed + 11*k + j) % 256``) — enough structure for the walker to
    be exercised for real (header decode, length arithmetic, stream walk),
    with the payload staying opaque as in real encoded audio."""
    if not (1 <= bitrate_idx <= 14 and 0 <= sample_rate_idx <= 2):
        raise ValueError("bitrate_idx in 1..14, sample_rate_idx in 0..2")
    bitrate = _BITRATES_V1[3][bitrate_idx]
    rate = _SAMPLE_RATES[3][sample_rate_idx]
    length = 144 * bitrate * 1000 // rate  # padding=0 throughout
    hdr = bytes(
        [
            0xFF,
            0xFB,  # MPEG1, layer III, no CRC
            (bitrate_idx << 4) | (sample_rate_idx << 2),
            0xC0,  # mono, no extras
        ]
    )
    out = bytearray()
    for k in range(n_frames):
        out += hdr
        out += bytes((fill_seed + 11 * k + j) % 256 for j in range(length - 4))
    return bytes(out)


# ---------------------------------------------------------------------
# Layer I payload codec
# ---------------------------------------------------------------------

# Table 3-B.1 in closed form: scalefactor i = 2 * 2^(-i/3), i = 0..62
# (index 63 is forbidden).
_SCF_LAYER1 = 2.0 * 2.0 ** (-np.arange(63) / 3.0)

_L, _M = 512, 32  # prototype length, band count
_filterbank_cache: tuple[np.ndarray, np.ndarray, int] | None = None


def _design_prototype() -> np.ndarray:
    """512-tap linear-phase lowpass prototype for the 32-band pseudo-QMF
    bank.  ISO 11172-3 gives its prototype only as the numeric Table
    3-C.1; this one is COMPUTED instead: magnitude 1 in the passband, 0
    in the stopband, and a sqrt-raised-cosine transition centered on the
    band edge pi/64 so that |H(w)|^2 + |H(pi/32 - w)|^2 = 1 — the
    power-complementarity condition that makes adjacent-band aliasing
    cancel (near-PR cosine-modulated filterbank, Vaidyanathan ch. 8).
    Taps come from a direct inverse DTFT with the half-sample-centered
    phase a 512-tap even-symmetric filter needs, then a fixed 100 rounds
    of alternating projections (power-complementary magnitude on a dense
    FFT grid <-> 512-tap even-symmetric support) sharpen the truncated
    design from ~59 dB to ~64.5 dB reconstruction SNR (measured plateau;
    tests/test_mp3.py pins the contract)."""
    edge = np.pi / (2 * _M)  # pi/64
    w = np.linspace(0.0, np.pi, 4096)
    t = np.clip((w - edge) / edge, -1.0, 1.0)
    mag = np.cos(np.pi / 4.0 * (1.0 + t))
    n = np.arange(_L) - (_L - 1) / 2.0
    h = np.trapz(mag[None, :] * np.cos(np.outer(n, w)), w, axis=1) / np.pi

    nfft = 16384
    wf = np.fft.fftfreq(nfft) * 2.0 * np.pi
    aw = np.abs(wf)
    band = aw <= np.pi / _M
    mirror = np.rint((np.pi / _M - aw[band]) / (2.0 * np.pi / nfft)).astype(int)
    for _ in range(100):
        H = np.fft.fft(np.concatenate([h, np.zeros(nfft - _L)]))
        m = np.abs(H)
        phase = H / np.maximum(m, 1e-30)
        m2 = m.copy()
        m2[band] = m[band] / np.maximum(
            np.sqrt(m[band] ** 2 + m[mirror] ** 2), 1e-30
        )
        m2[~band] = 0.0
        h2 = np.real(np.fft.ifft(m2 * phase))[:_L]
        h = 0.5 * (h2 + h2[::-1])
    return h


def _filterbank() -> tuple[np.ndarray, np.ndarray, int]:
    """(analysis matrix A (32,512), synthesis matrix G (32,512), system
    delay in samples).  Modulation: band k center (k+0.5)*pi/32 with the
    (-1)^k * pi/4 phase offsets that cancel the main alias terms; the
    synthesis gain and the exact integer delay are calibrated once on a
    deterministic multi-sine probe."""
    global _filterbank_cache
    if _filterbank_cache is not None:
        return _filterbank_cache
    h = _design_prototype()
    n = np.arange(_L) - (_L - 1) / 2.0
    k = np.arange(_M)[:, None]
    phase = ((-1.0) ** k) * (np.pi / 4.0)
    arg = np.pi / _M * (k + 0.5) * n[None, :]
    A = h[None, :] * np.cos(arg + phase)
    G = h[None, :] * np.cos(arg - phase)
    # calibration probe: incommensurate sines spanning the band
    m = np.arange(6144, dtype=np.float64)
    x = sum(np.sin((0.011 + 0.137 * r) * m + 0.7 * r) for r in range(10)) / 10.0
    S = _analyze(x, A)
    y = _synth_raw(S, G)
    xr = x[:4096]  # keep every candidate-lag slice inside y
    corr = np.array(
        [float(np.dot(y[d : d + len(xr)], xr)) for d in range(384, 640)]
    )
    delay = 384 + int(np.argmax(corr))
    gain = corr[delay - 384] / float(np.dot(xr, xr))
    G = G / gain
    _filterbank_cache = (A, G, delay)
    return _filterbank_cache


def _analyze(x: np.ndarray, A: np.ndarray) -> np.ndarray:
    """Critically-sampled analysis: (n,) float -> (n/32, 32) subband
    samples.  Window t convolves the prototype against x[..32t+31], so
    the bank is causal with a 480-sample startup transient."""
    if len(x) % _M:
        raise ValueError("analysis input must be a multiple of 32")
    from numpy.lib.stride_tricks import sliding_window_view

    xpad = np.concatenate([np.zeros(_L - _M), x])
    win = sliding_window_view(xpad, _L)[:: _M]
    return win @ A[:, ::-1].T


def _synth_raw(S: np.ndarray, G: np.ndarray) -> np.ndarray:
    """Overlap-add synthesis: (T, 32) -> (32T + 480,) float."""
    T = S.shape[0]
    contrib = (S @ G).reshape(T, _L // _M, _M)
    out = np.zeros(_M * T + (_L - _M))
    for c in range(_L // _M):
        out[_M * c : _M * (c + T)].reshape(T, _M)[:] += contrib[:, c, :]
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nacc = 0

    def write(self, val: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (val & ((1 << nbits) - 1))
        self._nacc += nbits
        while self._nacc >= 8:
            self._nacc -= 8
            self.buf.append((self._acc >> self._nacc) & 0xFF)
        self._acc &= (1 << self._nacc) - 1

    def padded_to(self, total_bytes: int) -> bytes:
        if self._nacc:
            self.write(0, 8 - self._nacc)
        if len(self.buf) > total_bytes:
            raise ValueError("mp3: frame bit budget overflow")
        return bytes(self.buf) + b"\x00" * (total_bytes - len(self.buf))


def _finish_frame(w: _BitWriter, sec: np.ndarray, payload_bytes: int) -> bytes:
    """Join a frame's header fields (written bit-serially into ``w``)
    with its vectorized sample-section bit array ``sec``, zero-pad to the
    spec frame length, and pack to bytes."""
    head = (
        np.unpackbits(np.frombuffer(bytes(w.buf), dtype=np.uint8))
        if w.buf
        else np.zeros(0, dtype=np.uint8)
    )
    if w._nacc:
        acc = np.array(
            [(w._acc >> (w._nacc - 1 - j)) & 1 for j in range(w._nacc)],
            dtype=np.uint8,
        )
        head = np.concatenate([head, acc])
    allbits = np.concatenate([head, sec])
    if -(-len(allbits) // 8) > payload_bytes:
        raise ValueError("mp3: frame bit budget overflow")
    packed = np.packbits(allbits).tobytes()
    return packed + b"\x00" * (payload_bytes - len(packed))


class _FrameBits:
    """MSB-first reader over one frame's payload bytes."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, nbits: int) -> int:
        if self.pos + nbits > len(self.bits):
            raise ValueError("mp3: frame payload truncated")
        val = 0
        for b in self.bits[self.pos : self.pos + nbits]:
            val = (val << 1) | int(b)
        self.pos += nbits
        return val

    def read_matrix(self, offsets: np.ndarray, width: int) -> np.ndarray:
        """Vectorized fixed-width extraction: unsigned ``width``-bit
        integers starting at ``self.pos + offsets`` (any shape), MSB
        first — the whole sample section of a frame in a few numpy ops
        instead of one Python loop iteration per coded sample."""
        pos = self.pos + np.asarray(offsets, dtype=np.int64)
        if pos.size and (pos.min() < 0 or pos.max() + width > len(self.bits)):
            raise ValueError("mp3: frame payload truncated")
        idx = pos[..., None] + np.arange(width, dtype=np.int64)
        weights = 1 << np.arange(width - 1, -1, -1, dtype=np.int64)
        return self.bits[idx].astype(np.int64) @ weights


_SR_IDX_V1 = {44100: 0, 48000: 1, 32000: 2}


def _scf_indices(amax: np.ndarray) -> np.ndarray:
    """Tightest scalefactor per subband: the largest i with
    scf[i] > amax (scf is descending), so samples/scf land in (-1, 1)."""
    return np.clip(
        (_SCF_LAYER1[None, None, :] > amax[..., None]).sum(axis=-1) - 1, 0, 62
    )


def encode_mp3(
    sig: np.ndarray,
    sample_rate: int,
    bitrate_idx: int = 12,
    layer: int = 1,
    joint_bound: int | None = None,
) -> bytes:
    """MPEG-1 Layer I/II CBR encoder: int16 PCM (n,) or (n, ch<=2) ->
    spec-framed stream.  ``layer=2`` routes to the table-driven Layer II
    encoder (``_encode_layer2``); the rest of this docstring describes
    the Layer I path.  Per frame (384 samples/channel): 32-band
    analysis, per-subband scalefactor, greedy noise-proxy bit allocation
    into the exact CBR bit budget, midtread quantization with the wire
    code's MSB inverted (anti sync-emulation), zero-bit padding to the
    spec frame length.  Two silent flush frames are appended so the
    filterbank delay drains and every input sample is reconstructable."""
    sig = np.asarray(sig)
    if sig.ndim == 1:
        sig = sig[:, None]
    n, ch = sig.shape
    if ch not in (1, 2):
        raise ValueError("mp3: 1 or 2 channels only")
    if sample_rate not in _SR_IDX_V1:
        raise ValueError("mp3: MPEG1 sample rate must be 32000/44100/48000")
    if not 1 <= bitrate_idx <= 14:
        raise ValueError("bitrate_idx in 1..14")
    if layer == 2:
        return _encode_layer2(sig, sample_rate, bitrate_idx, joint_bound)
    if layer == 3:
        if joint_bound is not None:
            raise ValueError("mp3: joint_bound is Layer II only")
        from . import codec_mp3_l3

        return codec_mp3_l3.encode_mp3_l3(sig, sample_rate, bitrate_idx)
    if layer != 1:
        raise ValueError("mp3: encoder supports layer 1, 2 or 3")
    if joint_bound is not None:
        if ch != 2:
            raise ValueError("mp3: joint stereo needs 2 channels")
        if joint_bound not in (4, 8, 12, 16):
            raise ValueError("mp3: joint_bound must be 4, 8, 12 or 16")
    bound = 32 if joint_bound is None else joint_bound
    slots = _l2_slots(32, ch, bound)  # Layer I shares the slot layout
    sr_idx = _SR_IDX_V1[sample_rate]
    bitrate = _BITRATES_V1[1][bitrate_idx]
    frame_len = (12 * bitrate * 1000 // sample_rate) * 4  # padding bit 0
    budget0 = frame_len * 8 - 32 - 4 * len(slots)
    if budget0 < 0:
        raise ValueError("mp3: bitrate too low for the allocation headers")

    nframes = -(-n // 384) + 2
    x = np.zeros((384 * nframes, ch))
    x[:n] = sig.astype(np.float64) / 32768.0
    A, _G, _d = _filterbank()
    S = np.stack([_analyze(x[:, c], A) for c in range(ch)], axis=2)

    if ch == 1:
        b3 = 0xC0
    elif joint_bound is None:
        b3 = 0x00
    else:
        b3 = 0x40 | ((joint_bound // 4 - 1) << 4)
    hdr = bytes(
        [
            0xFF,
            0xFF,  # MPEG1, Layer I, no CRC
            (bitrate_idx << 4) | (sr_idx << 2),
            b3,
        ]
    )
    out = bytearray()
    nslots = len(slots)
    for f in range(nframes):
        Sf = S[12 * f : 12 * (f + 1)].copy()  # (12, 32, ch)
        # shared (joint) slots code the channel mean; fold it into BOTH
        # channels so scalefactors/quantization read one signal (the
        # same intensity-stereo encoding choice as _encode_layer2)
        for sb, chans in slots:
            if len(chans) == 2:
                mean = Sf[:, sb, :].mean(axis=1)
                Sf[:, sb, 0] = Sf[:, sb, 1] = mean
        amax = np.abs(Sf).max(axis=0)  # (32, ch)
        scf_idx = _scf_indices(amax)
        scf_val = _SCF_LAYER1[scf_idx]
        # greedy allocation: repeatedly grow the SLOT whose quantized
        # noise proxy scf/2^nb is largest (first step buys nb=2 plus a
        # 6-bit scalefactor per carried channel); deterministic argmax
        # tie-break = lowest slot
        nbs = np.zeros(nslots, dtype=np.int64)
        prio = np.full(nslots, -1.0)
        for k, (sb, chans) in enumerate(slots):
            if amax[sb, chans[0]] > 0:
                prio[k] = scf_val[sb, chans[0]]
        budget = budget0
        while True:
            k = int(np.argmax(prio))
            if prio[k] <= 0:
                break
            sb, chans = slots[k]
            cost = 12 + (6 * len(chans) + 12 if nbs[k] == 0 else 0)
            if cost > budget:
                prio[k] = -1.0  # can't afford: retire this slot
                continue
            nbs[k] += 2 if nbs[k] == 0 else 1
            budget -= cost
            prio[k] = (
                -1.0 if nbs[k] >= 15
                else scf_val[sb, chans[0]] / 2.0 ** nbs[k]
            )

        w = _BitWriter()
        for k in range(nslots):
            w.write(int(nbs[k]) - 1 if nbs[k] else 0, 4)
        for k, (sb, chans) in enumerate(slots):
            if nbs[k]:
                for c in chans:
                    w.write(int(scf_idx[sb, c]), 6)
        # vectorized sample section (same fixed layout the decoder
        # gathers from): each coded slot quantizes its 12 samples and
        # scatters their bits in one shot
        ends = np.cumsum(nbs)
        offs, stride = ends - nbs, int(ends[-1])
        srange = stride * np.arange(12, dtype=np.int64)
        sec = np.zeros(12 * stride, dtype=np.uint8)
        for k in np.flatnonzero(nbs):
            b = int(nbs[k])
            sb, chans = slots[k]
            lv = (1 << b) - 1
            xq = Sf[:, sb, chans[0]] / scf_val[sb, chans[0]]
            codes = np.rint(
                (xq * lv / (1 << b) + 1.0 - 2.0 ** (1 - b)) * 2.0 ** (b - 1)
            ).astype(np.int64)
            codes = np.clip(codes, 0, lv - 1) ^ (1 << (b - 1))
            pos = (offs[k] + srange)[:, None] + np.arange(b)
            sec[pos] = (codes[:, None] >> np.arange(b - 1, -1, -1)) & 1
        out += hdr + _finish_frame(w, sec, frame_len - 4)
    return bytes(out)


# ---------------------------------------------------------------------
# Layer II payload codec (allocation Tables 3-B.2a / 3-B.2b)
# ---------------------------------------------------------------------

# Table 3-B.2a (sblimit 27): per-subband allocation-field width and the
# list of possible quantization LEVEL COUNTS the field indexes (0 = no
# bits).  Transcribed from the public ISO/IEC 11172-3 table; the spec
# quirks are real: subbands 0-2 skip the grouped 5/9-level classes,
# subbands 3-10 jump 8191 -> 65535 (no 16383/32767).
_L2_LIST_LOW = [0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
                8191, 16383, 32767, 65535]
_L2_LIST_MID = [0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
                4095, 8191, 65535]
_L2_LIST_HIGH = [0, 3, 5, 7, 9, 15, 31, 65535]
_L2_LIST_TOP = [0, 3, 5, 65535]
_L2_TABLE_A = [_L2_LIST_LOW] * 3 + [_L2_LIST_MID] * 8 + \
    [_L2_LIST_HIGH] * 12 + [_L2_LIST_TOP] * 4
# Table 3-B.2b (sblimit 30): same pattern, three more 2-bit subbands
_L2_TABLE_B = _L2_TABLE_A + [_L2_LIST_TOP] * 3
_L2_GROUP_BITS = {3: 5, 5: 7, 9: 10}  # grouped classes: 3 samples/codeword


def _l2_table(sample_rate: int, kbps_per_ch: int) -> list[list[int]]:
    """Allocation-table selection from the spec's (sampling frequency,
    bitrate per channel) matrix, for the >= 56 kbps/ch region this codec
    implements: 48 kHz always uses B.2a; 44.1/32 kHz use B.2a up to
    80 kbps/ch and B.2b from 96 kbps/ch.  The low-rate tables B.2c/d
    (32/48 kbps/ch) are out of scope."""
    if kbps_per_ch < 56:
        raise NotImplementedError(
            "mp3: Layer II below 56 kbps/channel uses allocation tables "
            "B.2c/B.2d, which this codec does not implement"
        )
    if sample_rate == 48000 or kbps_per_ch <= 80:
        return _L2_TABLE_A
    return _L2_TABLE_B


def _l2_width(levels: int) -> int:
    """Bits one 3-sample granule costs at this quantization class."""
    g = _L2_GROUP_BITS.get(levels)
    return g if g is not None else 3 * levels.bit_length()


def _l2_cd(levels: int) -> tuple[float, float]:
    """(C, D) of quantization-class Table 3-B.4: the requantization is
    s'' = C * (s''' + D).  Both constants close over the level count:
    C = 2^ceil(log2(L+1)) / L for every class (4/3, 8/5, 8/7, 16/9,
    16/15, ... matching the spec's decimal table), D = 1/2 for the
    grouped classes and 2^(1-nb) for the 2^nb - 1 ones."""
    nb = levels.bit_length()
    if levels in _L2_GROUP_BITS:
        return (1 << nb) / levels, 0.5
    return (1 << nb) / levels, 2.0 ** (1 - nb)


_L2_ALLOWED_KBPS_PER_CH = (56, 64, 80, 96, 112, 128, 160, 192)


def _l2_slots(sblimit: int, ch: int, bound: int) -> list[tuple[int, tuple]]:
    """Layer II coding slots in spec wire order (subband outer, channel
    inner): below ``bound`` one slot per (subband, channel); from
    ``bound`` up one SHARED slot carrying both channels — the intensity
    (joint) stereo layout of ISO 11172-3 2.4.1.6.  Mono / normal stereo
    is the ``bound >= sblimit`` degenerate case."""
    slots: list[tuple[int, tuple]] = []
    for sb in range(sblimit):
        if ch == 2 and sb >= bound:
            slots.append((sb, (0, 1)))
        else:
            slots.extend((sb, (c,)) for c in range(ch))
    return slots


def _encode_layer2(
    sig: np.ndarray,
    sample_rate: int,
    bitrate_idx: int,
    joint_bound: int | None = None,
) -> bytes:
    """MPEG-1 Layer II CBR encoder.  Per frame (1152 samples/channel =
    36 subband windows in 3 parts of 12): table-driven allocation walked
    greedily by the same noise proxy as Layer I, scfsi=0 (all three
    scalefactors transmitted — always valid, never optimal), grouped
    codewords for the 3/5/9-level classes, spec payload order
    (allocation, scfsi, scalefactors, then 12 granules x subband x
    channel).

    ``joint_bound`` (4/8/12/16, stereo input only) emits intensity
    (joint) stereo: subbands above the bound carry ONE set of samples
    (the channel mean) with the shared scalefactor written for both
    channels — one allocation and one sample block instead of two, the
    spec's bit saving for correlated highs."""
    n, ch = sig.shape
    bitrate = _BITRATES_V1[2][bitrate_idx]
    kbps_ch = bitrate // ch
    if kbps_ch not in _L2_ALLOWED_KBPS_PER_CH:
        raise ValueError(
            f"mp3: Layer II needs 56..192 kbps per channel (got {bitrate} "
            f"kbps / {ch} ch); pick bitrate_idx 3..10 mono, 7..14 stereo"
        )
    if joint_bound is not None:
        if ch != 2:
            raise ValueError("mp3: joint stereo needs 2 channels")
        if joint_bound not in (4, 8, 12, 16):
            raise ValueError("mp3: joint_bound must be 4, 8, 12 or 16")
    table = _l2_table(sample_rate, kbps_ch)
    sblimit = len(table)
    nbal = [len(lst).bit_length() - 1 for lst in table]
    bound = sblimit if joint_bound is None else min(joint_bound, sblimit)
    slots = _l2_slots(sblimit, ch, bound)
    frame_len = 144 * bitrate * 1000 // sample_rate  # padding bit 0
    budget0 = frame_len * 8 - 32 - sum(nbal[sb] for sb, _ in slots)
    sr_idx = _SR_IDX_V1[sample_rate]

    nframes = -(-n // 1152) + 1  # one flush frame drains the filterbank
    x = np.zeros((1152 * nframes, ch))
    x[:n] = sig.astype(np.float64) / 32768.0
    A, _G, _d = _filterbank()
    S = np.stack([_analyze(x[:, c], A) for c in range(ch)], axis=2)

    if ch == 1:
        b3 = 0xC0
    elif joint_bound is None:
        b3 = 0x00
    else:
        b3 = 0x40 | ((joint_bound // 4 - 1) << 4)
    hdr = bytes(
        [
            0xFF,
            0xFD,  # MPEG1, Layer II, no CRC
            (bitrate_idx << 4) | (sr_idx << 2),
            b3,
        ]
    )
    out = bytearray()
    for f in range(nframes):
        Sf = S[36 * f : 36 * (f + 1)].copy()  # (36, 32, ch)
        # shared slots code the channel mean; fold it into BOTH channels
        # so scalefactors/quantization read from one consistent signal
        for sb, chans in slots:
            if len(chans) == 2:
                mean = Sf[:, sb, :].mean(axis=1)
                Sf[:, sb, 0] = Sf[:, sb, 1] = mean
        # one scalefactor per 12-window part (scfsi=0 transmits all 3)
        amax3 = np.abs(Sf.reshape(3, 12, 32, ch)).max(axis=1)  # (3,32,ch)
        scf_idx = _scf_indices(amax3)  # (3, 32, ch)
        scf_val = _SCF_LAYER1[scf_idx]
        amax = amax3.max(axis=0)  # (32, ch)
        scf_top = _SCF_LAYER1[_scf_indices(amax)]

        # greedy allocation over the table's level ladder: grow the SLOT
        # whose quantized-noise proxy scf/levels is largest; first step
        # additionally buys (2 scfsi + 18 scf) bits PER CHANNEL the slot
        # carries (a shared slot still transmits both channels' factors)
        nslots = len(slots)
        idx = np.zeros(nslots, dtype=np.int64)
        prio = np.full(nslots, -1.0)
        top = np.zeros(nslots)
        for k, (sb, chans) in enumerate(slots):
            top[k] = max(scf_top[sb, c] for c in chans)
            if max(amax[sb, c] for c in chans) > 0:
                prio[k] = top[k]
        budget = budget0
        while True:
            k = int(np.argmax(prio))
            if prio[k] <= 0:
                break
            sb, chans = slots[k]
            lst = table[sb]
            cost = 12 * (
                _l2_width(lst[idx[k] + 1])
                - (_l2_width(lst[idx[k]]) if idx[k] else 0)
            ) + ((2 + 18) * len(chans) if idx[k] == 0 else 0)
            if cost > budget:
                prio[k] = -1.0
                continue
            idx[k] += 1
            budget -= cost
            prio[k] = (
                -1.0 if idx[k] + 1 >= len(lst) else top[k] / lst[idx[k]]
            )

        w = _BitWriter()
        for k, (sb, _) in enumerate(slots):
            w.write(int(idx[k]), nbal[sb])
        for k, (sb, chans) in enumerate(slots):
            if idx[k]:
                for _ in chans:
                    w.write(0, 2)  # scfsi = 0: three scalefactors follow
        for k, (sb, chans) in enumerate(slots):
            if idx[k]:
                for c in chans:
                    for p in range(3):
                        w.write(int(scf_idx[p, sb, c]), 6)
        # vectorized sample section (the decoder gathers from the same
        # fixed layout): per coded slot, quantize all 12 granules and
        # scatter codeword bits in one shot
        lev_flat = np.array(
            [table[sb][idx[k]] for k, (sb, _) in enumerate(slots)],
            dtype=np.int64,
        )
        widths = np.array(
            [_l2_width(int(L)) if L else 0 for L in lev_flat], dtype=np.int64
        )
        ends = np.cumsum(widths)
        offs, stride = ends - widths, int(ends[-1])
        grange = stride * np.arange(12, dtype=np.int64)
        scf_g = np.repeat(scf_val, 4, axis=0)  # part p covers granules 4p..
        sec = np.zeros(12 * stride, dtype=np.uint8)
        for k in np.flatnonzero(lev_flat):
            L = int(lev_flat[k])
            sb, chans = slots[k]
            c = chans[0]  # shared slots folded both channels to the mean
            C, D = _l2_cd(L)
            xq = Sf[:, sb, c].reshape(12, 3) / scf_g[:, sb, c][:, None]
            if L in _L2_GROUP_BITS:
                gw = _L2_GROUP_BITS[L]
                codes = np.clip(
                    np.rint((xq / C - D + 1.0) * (L - 1)).astype(np.int64),
                    0, L - 1,
                )
                # first sample = lowest base-L digit
                v = codes[:, 0] + L * codes[:, 1] + L * L * codes[:, 2]
                pos = (offs[k] + grange)[:, None] + np.arange(gw)
                sec[pos] = (v[:, None] >> np.arange(gw - 1, -1, -1)) & 1
            else:
                b = L.bit_length()
                codes = np.clip(
                    np.rint(
                        (xq * L / (1 << b) + 1.0 - 2.0 ** (1 - b))
                        * 2.0 ** (b - 1)
                    ).astype(np.int64),
                    0, L - 1,
                ) ^ (1 << (b - 1))
                pos = (
                    (offs[k] + grange)[:, None, None]
                    + (b * np.arange(3))[None, :, None]
                    + np.arange(b)[None, None, :]
                )
                sec[pos] = (codes[:, :, None] >> np.arange(b - 1, -1, -1)) & 1
        out += hdr + _finish_frame(w, sec, frame_len - 4)
    return bytes(out)


def _decode_layer2(data: bytes, frames: list[Mp3Frame], ch: int) -> np.ndarray:
    """Parse Layer II frames into the (36*nframes, 32, ch) subband
    array (requantized, scalefactored); synthesis happens in the shared
    decode_mp3 tail.  Joint (intensity) stereo frames (mode=1) share one
    allocation and one sample block per subband above
    bound = (mode_ext+1)*4, with scalefactors still per channel — each
    channel reconstructs the shared codes at its own intensity
    (ISO 11172-3 2.4.2.4)."""
    f0 = frames[0]
    table = _l2_table(f0.sample_rate, f0.bitrate_kbps // ch)
    sblimit = len(table)
    nbal = [len(lst).bit_length() - 1 for lst in table]
    bound = (f0.mode_ext + 1) * 4 if (f0.mode == 1 and ch == 2) else sblimit
    slots = _l2_slots(sblimit, ch, min(bound, sblimit))
    nslots = len(slots)
    S = np.zeros((36 * len(frames), 32, ch))
    for fi, fr in enumerate(frames):
        pos = fr.offset + 4 + (2 if fr.protection == 0 else 0)
        bits = _FrameBits(data[pos : fr.offset + fr.length])
        alloc = np.zeros(nslots, dtype=np.int64)
        for k, (sb, _) in enumerate(slots):
            alloc[k] = bits.read(nbal[sb])
        scfsi = np.zeros((32, ch), dtype=np.int64)
        for k, (sb, chans) in enumerate(slots):
            if alloc[k]:
                for c in chans:
                    scfsi[sb, c] = bits.read(2)
        scf = np.ones((3, 32, ch))
        for k, (sb, chans) in enumerate(slots):
            if not alloc[k]:
                continue
            for c in chans:
                n_scf = {0: 3, 1: 2, 2: 1, 3: 2}[int(scfsi[sb, c])]
                vals = []
                for _ in range(n_scf):
                    i = bits.read(6)
                    if i > 62:
                        raise ValueError("mp3: forbidden scalefactor 63")
                    vals.append(_SCF_LAYER1[i])
                if scfsi[sb, c] == 0:
                    parts = vals
                elif scfsi[sb, c] == 1:  # first covers parts 0+1
                    parts = [vals[0], vals[0], vals[1]]
                elif scfsi[sb, c] == 2:  # one for the whole frame
                    parts = [vals[0]] * 3
                else:  # 3: second covers parts 1+2
                    parts = [vals[0], vals[1], vals[1]]
                scf[:, sb, c] = parts
        # sample section: granule g of slot k sits at off(k) + g * stride
        # with per-slot width gw (grouped codeword) or 3*nb (three
        # consecutive codes) — each coded slot extracts its 12 granules
        # in one numpy gather; a shared slot's codes fan out to both
        # channels under each channel's own scalefactor
        lev_flat = np.array(
            [table[sb][alloc[k]] if alloc[k] else 0
             for k, (sb, _) in enumerate(slots)],
            dtype=np.int64,
        )
        widths = np.array(
            [_l2_width(int(L)) if L else 0 for L in lev_flat], dtype=np.int64
        )
        ends = np.cumsum(widths)
        offs, stride = ends - widths, int(ends[-1])
        grange = stride * np.arange(12, dtype=np.int64)
        scf_g = np.repeat(scf, 4, axis=0)  # part p covers granules 4p..4p+3
        for k in np.flatnonzero(lev_flat):
            L = int(lev_flat[k])
            sb, chans = slots[k]
            C, D = _l2_cd(L)
            if L in _L2_GROUP_BITS:
                v = bits.read_matrix(offs[k] + grange, _L2_GROUP_BITS[L])
                if int(v.max()) >= L * L * L:
                    raise ValueError("mp3: grouped code out of range")
                # first sample = lowest base-L digit
                codes = np.stack([v % L, (v // L) % L, v // (L * L)], axis=1)
                sq = C * ((codes - (L - 1)) / (L - 1) + D)
            else:
                b = L.bit_length()
                pos = (offs[k] + grange)[:, None] + b * np.arange(3)
                codes = bits.read_matrix(pos, b) ^ (1 << (b - 1))
                sq = C * (codes * 2.0 ** (1 - b) - 1.0 + D)
            for c in chans:
                S[36 * fi : 36 * (fi + 1), sb, c] = (
                    sq * scf_g[:, sb, c][:, None]
                ).reshape(-1)
        bits.pos += 12 * stride
    return S


def decode_mp3(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG audio stream to PCM: (samples int16 (n, ch), rate).
    Layers I and II decode for real (allocation/scalefactor/sample
    parse, Table 3-B.4 requantization s'' = C * (s''' + D), 32-band
    synthesis filterbank); Layer III decodes through the restricted
    profile in codec_mp3_l3.py (long blocks, Huffman tables 0/1 +
    count1B, scalefactors, bit reservoir + scfsi) — streams outside
    that profile raise NotImplementedError naming the specific
    boundary."""
    frames = walk_frames(data)
    if not frames:
        raise ValueError("no MPEG audio frames found")
    f0 = frames[0]
    if f0.layer == 3:
        # restricted-profile Layer III (codec_mp3_l3.py): long blocks,
        # Huffman tables 0/1 + count1B, bit reservoir + scfsi; anything
        # outside the profile raises NotImplementedError from the
        # side-info / Huffman parse with the specific boundary named
        from . import codec_mp3_l3

        if f0.mode == 1:
            raise NotImplementedError(
                "mp3 L3: joint stereo not supported (LR/mono profile)"
            )
        ch3 = 1 if f0.mode == 3 else 2
        for fr in frames:
            if (fr.layer, fr.mode, fr.sample_rate) != (
                f0.layer, f0.mode, f0.sample_rate,
            ):
                raise ValueError("mp3: inconsistent stream parameters")
        return codec_mp3_l3.decode_mp3_l3(data, frames, ch3)
    ch = 1 if f0.mode == 3 else 2
    for fr in frames:
        if (fr.layer, fr.mode, fr.mode_ext, fr.sample_rate) != (
            f0.layer, f0.mode, f0.mode_ext, f0.sample_rate,
        ):
            raise ValueError("mp3: inconsistent stream parameters")

    if f0.layer == 2:
        # table selection keys off the bitrate, so Layer II additionally
        # needs CBR (every frame on one allocation table)
        if any(fr.bitrate_kbps != f0.bitrate_kbps for fr in frames):
            raise ValueError("mp3: VBR Layer II not supported")
        S = _decode_layer2(data, frames, ch)
        _A, G, _d = _filterbank()
        n_out = S.shape[0] * 32
        pcm = np.stack(
            [_synth_raw(S[:, :, c], G)[:n_out] for c in range(ch)], axis=1
        )
        return (
            np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16),
            f0.sample_rate,
        )

    # Layer I intensity (joint) stereo (mode=1): subbands >= bound carry
    # ONE allocation + ONE sample set, scalefactors still per channel —
    # the same slot layout as Layer II (ISO 11172-3 2.4.1.5)
    l1_bound = (f0.mode_ext + 1) * 4 if (f0.mode == 1 and ch == 2) else 32
    slots = _l2_slots(32, ch, l1_bound)
    nslots = len(slots)
    S = np.zeros((12 * len(frames), 32, ch))
    for fi, fr in enumerate(frames):
        pos = fr.offset + 4 + (2 if fr.protection == 0 else 0)
        bits = _FrameBits(data[pos : fr.offset + fr.length])
        nbs = np.zeros(nslots, dtype=np.int64)
        for k in range(nslots):
            a = bits.read(4)
            if a == 15:
                raise ValueError("mp3: forbidden allocation code 15")
            nbs[k] = a + 1 if a else 0
        scf = np.ones((32, ch))
        for k, (sb, chans) in enumerate(slots):
            if nbs[k]:
                for c in chans:
                    idx = bits.read(6)
                    if idx > 62:
                        raise ValueError("mp3: forbidden scalefactor 63")
                    scf[sb, c] = _SCF_LAYER1[idx]
        # sample section: fixed layout once the allocation is known —
        # slot k's sample s sits at off(k) + s * stride, so every coded
        # slot extracts its 12 samples in one numpy gather; a shared
        # slot fans the same requantized samples into both channels
        # through each channel's own scalefactor
        ends = np.cumsum(nbs)
        offs, stride = ends - nbs, int(ends[-1])
        srange = stride * np.arange(12, dtype=np.int64)
        for k in np.flatnonzero(nbs):
            b = int(nbs[k])
            sb, chans = slots[k]
            codes = bits.read_matrix(offs[k] + srange, b) ^ (1 << (b - 1))
            lv = (1 << b) - 1
            sq = (1 << b) / lv * (
                codes * 2.0 ** (1 - b) - 1.0 + 2.0 ** (1 - b)
            )
            for c in chans:
                S[12 * fi : 12 * (fi + 1), sb, c] = sq * scf[sb, c]
        bits.pos += 12 * stride

    _A, G, _d = _filterbank()
    n_out = 12 * len(frames) * 32
    pcm = np.stack(
        [_synth_raw(S[:, :, c], G)[:n_out] for c in range(ch)], axis=1
    )
    return (
        np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16),
        f0.sample_rate,
    )


# total encoder+decoder latency in samples (filterbank group delay);
# exposed so fidelity tests can align round-tripped audio
def codec_delay() -> int:
    return _filterbank()[2]
