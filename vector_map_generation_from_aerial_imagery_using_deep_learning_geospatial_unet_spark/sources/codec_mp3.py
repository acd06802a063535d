"""MPEG audio (MP3) frame walker + minimal CBR writer, from scratch per
the public ISO/IEC 11172-3 frame-header layout.

Scope: FRAME level — sync-word scan, header field decode (version, layer,
bitrate, sample rate, padding), exact frame-length arithmetic, and the
stream walk that yields every frame's offset/length, from which frame
count, duration, and mean bitrate follow exactly.  This is what an ingest
pipeline computes for audio metadata at scale; decoding the payload
(Huffman + IMDCT + synthesis filterbank) is genuinely codec-library-bound
and remains stubbed in ``operators/multimodal.py``.

Reference analogue: library-delegated media open in
/root/reference/src/io.py:41-63.
"""

from __future__ import annotations

from dataclasses import dataclass

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


def parse_frame_header(data: bytes, pos: int) -> Mp3Frame | None:
    """Decode the 4-byte header at ``pos``; None if it is not a valid
    frame sync.  Header: AAAAAAAA AAABBCCD EEEEFFGH ...  (A sync, B
    version, C layer, D protection, E bitrate idx, F samplerate idx,
    G padding)."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, _b3 = data[pos : pos + 4]
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
