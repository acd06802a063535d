"""Pure-stdlib PCM WAV (RIFF) codec — upgrades 'wav' from stub to real.

Baseline containers deserve real decoders even without codec libraries:
RIFF/WAVE with integer PCM is pure struct parsing.  Scope: PCM
(audio_format 1), 8/16/32-bit, any channel count; compressed formats
(MP3/AAC inside WAV, IEEE float) are rejected loudly and stay with the
documented stubs in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

from ._hardening import malformed_guard

_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 (n,) mono or (n, ch) -> RIFF/WAVE PCM bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"wav encoder is int16-only, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


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
    if audio_format != 1:
        raise NotImplementedError(
            f"non-PCM wav (format {audio_format}) unsupported — stub territory"
        )
    if bits not in _DTYPES:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    samples = np.frombuffer(raw, dtype=_DTYPES[bits])
    if bits == 8:
        # 8-bit PCM is UNSIGNED, biased at 128 (WAV spec) — convert to
        # signed so zero-crossing/abs features mean what they say
        samples = samples.astype(np.int16) - 128
    samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch)
    return samples, rate
