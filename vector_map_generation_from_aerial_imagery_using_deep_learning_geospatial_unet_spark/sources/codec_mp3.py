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

* LAYER II/III payloads stay stubbed (tested ``NotImplementedError``):
  their bit-allocation / Huffman tables exist only as spec tables that
  cannot be re-derived, which is this repo's codec-library boundary.

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


_SR_IDX_V1 = {44100: 0, 48000: 1, 32000: 2}


def _scf_indices(amax: np.ndarray) -> np.ndarray:
    """Tightest scalefactor per subband: the largest i with
    scf[i] > amax (scf is descending), so samples/scf land in (-1, 1)."""
    return np.clip(
        (_SCF_LAYER1[None, None, :] > amax[..., None]).sum(axis=-1) - 1, 0, 62
    )


def encode_mp3(
    sig: np.ndarray, sample_rate: int, bitrate_idx: int = 12
) -> bytes:
    """MPEG-1 Layer I CBR encoder: int16 PCM (n,) or (n, ch<=2) ->
    spec-framed Layer I stream.  Per frame (384 samples/channel): 32-band
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
    sr_idx = _SR_IDX_V1[sample_rate]
    bitrate = _BITRATES_V1[1][bitrate_idx]
    frame_len = (12 * bitrate * 1000 // sample_rate) * 4  # padding bit 0
    budget0 = frame_len * 8 - 32 - 4 * 32 * ch
    if budget0 < 0:
        raise ValueError("mp3: bitrate too low for the allocation headers")

    nframes = -(-n // 384) + 2
    x = np.zeros((384 * nframes, ch))
    x[:n] = sig.astype(np.float64) / 32768.0
    A, _G, _d = _filterbank()
    S = np.stack([_analyze(x[:, c], A) for c in range(ch)], axis=2)

    hdr = bytes(
        [
            0xFF,
            0xFF,  # MPEG1, Layer I, no CRC
            (bitrate_idx << 4) | (sr_idx << 2),
            0xC0 if ch == 1 else 0x00,
        ]
    )
    out = bytearray()
    for f in range(nframes):
        Sf = S[12 * f : 12 * (f + 1)]  # (12, 32, ch)
        amax = np.abs(Sf).max(axis=0)  # (32, ch)
        scf_idx = _scf_indices(amax)
        scf_val = _SCF_LAYER1[scf_idx]
        # greedy allocation: repeatedly grow the subband whose quantized
        # noise proxy scf/2^nb is largest (first step buys nb=2 plus the
        # 6-bit scalefactor); deterministic argmax tie-break = lowest
        # (sb, ch)
        nb = np.zeros((32, ch), dtype=np.int64)
        prio = np.where(amax > 0, scf_val, -1.0)
        budget = budget0
        while True:
            i = int(np.argmax(prio))
            sb, c = divmod(i, ch)
            if prio[sb, c] <= 0:
                break
            cost = 12 + (6 + 12 if nb[sb, c] == 0 else 0)
            if cost > budget:
                prio[sb, c] = -1.0  # can't afford: retire this subband
                continue
            nb[sb, c] += 2 if nb[sb, c] == 0 else 1
            budget -= cost
            prio[sb, c] = (
                -1.0 if nb[sb, c] >= 15 else scf_val[sb, c] / 2.0 ** nb[sb, c]
            )

        w = _BitWriter()
        for sb in range(32):
            for c in range(ch):
                w.write(int(nb[sb, c]) - 1 if nb[sb, c] else 0, 4)
        for sb in range(32):
            for c in range(ch):
                if nb[sb, c]:
                    w.write(int(scf_idx[sb, c]), 6)
        for s in range(12):
            for sb in range(32):
                for c in range(ch):
                    b = int(nb[sb, c])
                    if not b:
                        continue
                    lv = (1 << b) - 1
                    xq = Sf[s, sb, c] / scf_val[sb, c]
                    code = int(
                        np.rint(
                            (xq * lv / (1 << b) + 1.0 - 2.0 ** (1 - b))
                            * 2.0 ** (b - 1)
                        )
                    )
                    code = min(max(code, 0), lv - 1)
                    w.write(code ^ (1 << (b - 1)), b)
        out += hdr + w.padded_to(frame_len - 4)
    return bytes(out)


def decode_mp3(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG audio stream to PCM: (samples int16 (n, ch), rate).
    Layer I decodes for real (allocation/scalefactor/sample parse,
    spec (2^nb-1)-level requantization s = scf * (2^nb/(2^nb-1)) *
    (code*2^(1-nb) - 1 + 2^(1-nb)), 32-band synthesis filterbank); Layer
    II/III payloads raise NotImplementedError — their allocation/Huffman
    tables are the documented codec-library boundary."""
    frames = walk_frames(data)
    if not frames:
        raise ValueError("no MPEG audio frames found")
    f0 = frames[0]
    if f0.layer != 1:
        raise NotImplementedError(
            f"mp3: layer {'I II III'.split()[f0.layer - 1]} payload decode "
            "not implemented (Layer II/III bit-allocation and Huffman "
            "tables are codec-library-bound); Layer I decodes for real"
        )
    if f0.mode == 1:
        raise NotImplementedError("mp3: intensity (joint) stereo")
    ch = 1 if f0.mode == 3 else 2
    for fr in frames:
        if (fr.layer, fr.mode, fr.sample_rate) != (
            f0.layer, f0.mode, f0.sample_rate,
        ):
            raise ValueError("mp3: inconsistent stream parameters")

    S = np.zeros((12 * len(frames), 32, ch))
    for fi, fr in enumerate(frames):
        pos = fr.offset + 4 + (2 if fr.protection == 0 else 0)
        bits = _FrameBits(data[pos : fr.offset + fr.length])
        nb = np.zeros((32, ch), dtype=np.int64)
        for sb in range(32):
            for c in range(ch):
                a = bits.read(4)
                if a == 15:
                    raise ValueError("mp3: forbidden allocation code 15")
                nb[sb, c] = a + 1 if a else 0
        scf = np.ones((32, ch))
        for sb in range(32):
            for c in range(ch):
                if nb[sb, c]:
                    idx = bits.read(6)
                    if idx > 62:
                        raise ValueError("mp3: forbidden scalefactor 63")
                    scf[sb, c] = _SCF_LAYER1[idx]
        for s in range(12):
            for sb in range(32):
                for c in range(ch):
                    b = int(nb[sb, c])
                    if not b:
                        continue
                    code = bits.read(b) ^ (1 << (b - 1))
                    lv = (1 << b) - 1
                    sq = (1 << b) / lv * (
                        code * 2.0 ** (1 - b) - 1.0 + 2.0 ** (1 - b)
                    )
                    S[12 * fi + s, sb, c] = sq * scf[sb, c]

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
