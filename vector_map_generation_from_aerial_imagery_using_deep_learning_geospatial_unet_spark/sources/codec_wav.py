"""Pure-stdlib PCM + G.711 WAV (RIFF) codec — upgrades 'wav' from stub
to real.

Baseline containers deserve real decoders even without codec libraries:
RIFF/WAVE with integer PCM is pure struct parsing, and the two telephony
companding laws (ITU-T G.711 mu-law = audio_format 7, A-law = 6) are
closed-form 8-bit<->16-bit maps.  Scope: PCM (audio_format 1) at
8/16/24/32-bit, G.711 mu-law/A-law at 8-bit, any channel count;
compressed formats (MP3/AAC inside WAV, IEEE float) are rejected loudly
and stay with the documented stubs in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

from ._hardening import malformed_guard

_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}

# WAVE_FORMAT_* tags (RIFF spec / RFC 2361 registry)
_FMT_PCM, _FMT_ALAW, _FMT_MULAW = 1, 6, 7

# ---------------------------------------------------------------------------
# ITU-T G.711 companding (both laws decode to the conventional 16-bit
# lattice: mu-law magnitudes ((m*8+132)<<e)-132 up to 32124, A-law
# (m*16+8) / ((m*16+264)<<(seg-1)) up to 32256).  Encoders are the exact
# segment-quantizers whose decode inverts them — pure integer arithmetic,
# so a DuckDB oracle can re-derive every decoded sample in SQL.

# segment thresholds: index i covers magnitudes [2^(i+8) .. 2^(i+9)-1]
_SEG_EDGES = np.array([256 << k for k in range(8)], dtype=np.int32)


def _mulaw_decode_table() -> np.ndarray:
    u = (~np.arange(256, dtype=np.int32)) & 0xFF
    sign = (u & 0x80) != 0
    e = (u >> 4) & 7
    m = u & 0x0F
    mag = (((m << 3) + 0x84) << e) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int32) ^ 0x55
    pos = (a & 0x80) != 0
    seg = (a >> 4) & 7
    m = a & 0x0F
    mag = np.where(seg == 0, (m << 4) + 8, ((m << 4) + 0x108) << np.maximum(seg - 1, 0))
    return np.where(pos, mag, -mag).astype(np.int16)


MULAW_TABLE = _mulaw_decode_table()
ALAW_TABLE = _alaw_decode_table()


def linear_to_mulaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> G.711 mu-law bytes (uint8)."""
    s = samples.astype(np.int32)
    neg = s < 0
    mag = np.minimum(np.abs(s), 32635) + 0x84
    # e = bit_length(mag) - 8 clamped to 0 = number of edges <= mag
    e = np.searchsorted(_SEG_EDGES, mag, side="right")  # 0..7
    m = (mag >> (e + 3)) & 0x0F
    byte = np.where(neg, 0x80, 0) | (e << 4) | m
    return ((~byte) & 0xFF).astype(np.uint8)


def linear_to_alaw(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> G.711 A-law bytes (uint8)."""
    s = samples.astype(np.int32)
    pos = s >= 0
    mag = np.minimum(np.abs(s), 32767)
    seg = np.searchsorted(_SEG_EDGES, mag, side="right")  # 0..7
    m = np.where(seg == 0, mag >> 4, (mag >> (seg + 3)) & 0x0F)
    byte = np.where(pos, 0x80, 0) | (seg << 4) | m
    return (byte ^ 0x55).astype(np.uint8)


def _riff(fmt_tag: int, ch: int, rate: int, bits: int, data: bytes) -> bytes:
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * block, block, bits)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 (n,) mono or (n, ch) -> RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"wav encoder is int16-only, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    return _riff(_FMT_PCM, samples.shape[1], rate, 16, data)


def encode_wav24(samples: np.ndarray, rate: int) -> bytes:
    """int32 values in [-2^23, 2^23) (n,) or (n, ch) -> 24-bit PCM WAV."""
    s = np.asarray(samples)
    if s.dtype.kind != "i":
        raise ValueError(f"wav24 encoder wants signed ints, got {s.dtype}")
    if s.min(initial=0) < -(1 << 23) or s.max(initial=0) >= (1 << 23):
        raise ValueError("wav24 samples out of 24-bit range")
    if s.ndim == 1:
        s = s[:, None]
    le32 = np.ascontiguousarray(s.astype("<i4")).view(np.uint8).reshape(-1, 4)
    data = le32[:, :3].tobytes()  # little-endian: low 3 bytes
    return _riff(_FMT_PCM, s.shape[1], rate, 24, data)


def encode_wav_g711(samples: np.ndarray, rate: int, law: str) -> bytes:
    """int16 (n,) or (n, ch) -> 8-bit G.711 WAV ('mu' or 'a' law)."""
    if samples.dtype != np.int16:
        raise ValueError(f"g711 encoder is int16-only, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if law == "mu":
        data, tag = linear_to_mulaw(samples).tobytes(), _FMT_MULAW
    elif law == "a":
        data, tag = linear_to_alaw(samples).tobytes(), _FMT_ALAW
    else:
        raise ValueError(f"unknown companding law {law!r} (want 'mu' or 'a')")
    return _riff(tag, samples.shape[1], rate, 8, data)


@malformed_guard("wav")
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> ((n, ch) int array, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_chunk = raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or raw is None:
        raise ValueError("wav stream missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt_chunk[:16])
    if ch == 0 or rate == 0:
        # zeroed header fields divide downstream (frames//ch, n/rate)
        raise ValueError(f"wav: zero channels/rate (ch={ch}, rate={rate})")
    if audio_format in (_FMT_MULAW, _FMT_ALAW):
        if bits != 8:
            raise ValueError(f"G.711 wav must be 8-bit, header says {bits}")
        table = MULAW_TABLE if audio_format == _FMT_MULAW else ALAW_TABLE
        samples = table[np.frombuffer(raw, dtype=np.uint8)]
    elif audio_format != 1:
        raise NotImplementedError(
            f"non-PCM wav (format {audio_format}) unsupported — stub territory"
        )
    elif bits == 24:
        # 3-byte little-endian signed: widen to int32 with sign extension
        n3 = len(raw) - len(raw) % 3
        b = np.frombuffer(raw[:n3], dtype=np.uint8).reshape(-1, 3)
        wide = np.zeros((b.shape[0], 4), dtype=np.uint8)
        wide[:, 1:] = b  # low byte into bits 8..31, then arithmetic >> 8
        samples = wide.view("<i4").ravel() >> 8
    elif bits not in _DTYPES:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    else:
        samples = np.frombuffer(raw, dtype=_DTYPES[bits])
        if bits == 8:
            # 8-bit PCM is UNSIGNED, biased at 128 (WAV spec) — convert to
            # signed so zero-crossing/abs features mean what they say
            samples = samples.astype(np.int16) - 128
    samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch)
    return samples, rate
