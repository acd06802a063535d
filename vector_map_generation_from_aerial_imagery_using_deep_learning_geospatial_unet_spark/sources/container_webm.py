"""EBML / Matroska (WebM) container parser + minimal writer, from scratch
per the public Matroska/EBML specs (RFC 8794 + matroska.org element IDs).

Scope: CONTAINER level only — EBML varint decoding, element tree walking,
segment info (timestamp scale, duration), track entries (type, codec ID,
video dimensions, audio sampling rate), and exact SimpleBlock extraction
(track, absolute timestamp, encoded payload).  The codec payload (VP9/
Opus bitstreams) stays opaque — decode is genuinely codec-library-bound
and remains stubbed in ``operators/multimodal.py``.

Reference analogue: GDAL-backed any-format open in
/root/reference/src/io.py:41-63 (container handling delegated to a lib
there; implemented from the spec here).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

# element IDs (with marker bits, as they appear on the wire)
EBML = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CLUSTER = 0x1F43B675
TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3

_MASTER = {EBML, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO, CLUSTER}


def read_vint(
    data: bytes, pos: int, keep_marker: bool, is_size: bool = False
) -> tuple[int, int]:
    """EBML variable-size integer at ``pos`` -> (value, new_pos).

    The count of leading zero bits of the first byte gives the width;
    element IDs keep the marker bit (compared marker-and-all), sizes and
    block track numbers strip it.  The all-ones = 'unknown' sentinel
    (returned as -1) applies ONLY to element SIZES (``is_size=True``) —
    a SimpleBlock track number 127 is legitimately encoded as the 1-byte
    vint 0xFF and must decode as 127, not as unknown."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError(f"invalid EBML varint at {pos}")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("truncated EBML varint")
    val = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    if is_size and val == (1 << (7 * length)) - 1:
        val = -1  # unknown size
    return val, pos + length


def walk_elements(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) for each element in
    data[start:end]; unknown-size elements extend to the region end."""
    pos = start
    while pos < end:
        eid, pos = read_vint(data, pos, keep_marker=True)
        size, pos = read_vint(data, pos, keep_marker=False, is_size=True)
        pe = end if size < 0 else pos + size
        if pe > end:
            raise ValueError(f"element 0x{eid:X} overruns region")
        yield eid, pos, pe
        pos = pe


def _uint(data: bytes, ps: int, pe: int) -> int:
    return int.from_bytes(data[ps:pe], "big")


def _float(data: bytes, ps: int, pe: int) -> float:
    n = pe - ps
    if n == 4:
        return struct.unpack(">f", data[ps:pe])[0]
    if n == 8:
        return struct.unpack(">d", data[ps:pe])[0]
    raise ValueError(f"bad EBML float width {n}")


@dataclass
class WebmTrack:
    number: int
    track_type: int  # 1=video, 2=audio
    codec: str
    width: int = 0
    height: int = 0
    sample_rate: int = 0


@dataclass
class WebmBlock:
    track: int
    timestamp_ms: int  # absolute (cluster + relative), in timestamp-scale ms
    payload: bytes


@dataclass
class WebmInfo:
    doctype: str
    timestamp_scale: int  # ns per tick (default 1_000_000 = 1 ms)
    duration_ms: int
    tracks: list[WebmTrack]
    blocks: list[WebmBlock] = field(default_factory=list)


def probe_webm(data: bytes) -> WebmInfo:
    """Parse the container.  Malformed streams (truncated varints, size
    lies, short blocks) raise ValueError — never hang, over-allocate, or
    leak struct/index errors."""
    try:
        return _probe_webm(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed WebM: {e}") from e


def _probe_webm(data: bytes) -> WebmInfo:
    doctype = ""
    for eid, ps, pe in walk_elements(data, 0, len(data)):
        if eid == EBML:
            for e2, p2, q2 in walk_elements(data, ps, pe):
                if e2 == DOCTYPE:
                    doctype = data[p2:q2].decode("latin-1")
    seg = [
        (ps, pe) for eid, ps, pe in walk_elements(data, 0, len(data)) if eid == SEGMENT
    ]
    if not seg:
        raise ValueError("not a WebM/Matroska file: no Segment element")
    ss, se = seg[0]
    scale = 1_000_000
    duration_ticks = 0.0
    tracks: list[WebmTrack] = []
    blocks: list[WebmBlock] = []
    for eid, ps, pe in walk_elements(data, ss, se):
        if eid == INFO:
            for e2, p2, q2 in walk_elements(data, ps, pe):
                if e2 == TIMESTAMP_SCALE:
                    scale = _uint(data, p2, q2)
                    if scale == 0:
                        raise ValueError("webm: TimestampScale of zero")
                elif e2 == DURATION:
                    duration_ticks = _float(data, p2, q2)
                    # hostile bytes: an EBML float is trivially inf/nan,
                    # and int(inf) below would leak OverflowError past the
                    # clean-ValueError parser contract
                    if not math.isfinite(duration_ticks) or duration_ticks < 0:
                        raise ValueError("webm: non-finite or negative Duration")
        elif eid == TRACKS:
            for e2, p2, q2 in walk_elements(data, ps, pe):
                if e2 != TRACK_ENTRY:
                    continue
                tr = WebmTrack(number=0, track_type=0, codec="")
                for e3, p3, q3 in walk_elements(data, p2, q2):
                    if e3 == TRACK_NUMBER:
                        tr.number = _uint(data, p3, q3)
                    elif e3 == TRACK_TYPE:
                        tr.track_type = _uint(data, p3, q3)
                    elif e3 == CODEC_ID:
                        tr.codec = data[p3:q3].decode("latin-1")
                    elif e3 == VIDEO:
                        for e4, p4, q4 in walk_elements(data, p3, q3):
                            if e4 == PIXEL_WIDTH:
                                tr.width = _uint(data, p4, q4)
                            elif e4 == PIXEL_HEIGHT:
                                tr.height = _uint(data, p4, q4)
                    elif e3 == AUDIO:
                        for e4, p4, q4 in walk_elements(data, p3, q3):
                            if e4 == SAMPLING_FREQUENCY:
                                tr.sample_rate = int(_float(data, p4, q4))
                tracks.append(tr)
        elif eid == CLUSTER:
            cluster_ts = 0
            for e2, p2, q2 in walk_elements(data, ps, pe):
                if e2 == TIMESTAMP:
                    cluster_ts = _uint(data, p2, q2)
                elif e2 == SIMPLE_BLOCK:
                    tno, bp = read_vint(data, p2, keep_marker=False)
                    if q2 - bp < 3:
                        raise ValueError("SimpleBlock too short for header")
                    rel = struct.unpack(">h", data[bp : bp + 2])[0]
                    # bp+2 = flags byte; lacing unsupported (flags & 0x06
                    # must be 0 — our writer never laces)
                    if data[bp + 2] & 0x06:
                        raise ValueError("laced SimpleBlock not supported")
                    blocks.append(
                        WebmBlock(
                            track=tno,
                            timestamp_ms=(cluster_ts + rel) * scale // 1_000_000,
                            payload=data[bp + 3 : q2],
                        )
                    )
    # the PRODUCT can still overflow to inf with finite operands (lying
    # Duration x lying TimestampScale), so validate the final value too
    dur_ms = duration_ticks * scale / 1_000_000
    if not math.isfinite(dur_ms):
        raise ValueError("webm: Duration * TimestampScale overflows")
    return WebmInfo(
        doctype=doctype,
        timestamp_scale=scale,
        duration_ms=int(dur_ms),
        tracks=tracks,
        blocks=blocks,
    )


# ---------------------------------------------------------------- writer

def _vint_size(val: int) -> bytes:
    """Encode a size as a minimal-width EBML varint."""
    for length in range(1, 9):
        if val < (1 << (7 * length)) - 1:
            out = val | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError("size too large for EBML varint")


def _eid(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, payload: bytes) -> bytes:
    return _eid(eid) + _vint_size(len(payload)) + payload


def _el_uint(eid: int, val: int) -> bytes:
    return _el(eid, val.to_bytes(max((val.bit_length() + 7) // 8, 1), "big"))


def build_webm(
    blocks: list[tuple[int, bytes]],
    width: int,
    height: int,
    codec: str = "V_VP9",
    blocks_per_cluster: int = 4,
) -> bytes:
    """Minimal valid single-video-track WebM for fixtures/round-trips.
    ``blocks`` is [(timestamp_ms, payload)]; timestamp scale is the 1 ms
    default, clusters carry the base timestamp and blocks the s16 relative
    offset, so the cluster/relative split is exercised for real."""
    header = _el(
        EBML,
        _el_uint(0x4286, 1)  # EBMLVersion
        + _el_uint(0x42F7, 1)  # EBMLReadVersion
        + _el_uint(0x42F2, 4)  # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)  # EBMLMaxSizeLength
        + _el(DOCTYPE, b"webm")
        + _el_uint(0x4287, 2)  # DocTypeVersion
        + _el_uint(0x4285, 2),  # DocTypeReadVersion
    )
    duration = float(blocks[-1][0] + 40) if blocks else 0.0
    info = _el(
        INFO,
        _el_uint(TIMESTAMP_SCALE, 1_000_000)
        + _el(DURATION, struct.pack(">d", duration)),
    )
    video = _el(VIDEO, _el_uint(PIXEL_WIDTH, width) + _el_uint(PIXEL_HEIGHT, height))
    entry = _el(
        TRACK_ENTRY,
        _el_uint(TRACK_NUMBER, 1)
        + _el_uint(0x73C5, 1)  # TrackUID
        + _el_uint(TRACK_TYPE, 1)
        + _el(CODEC_ID, codec.encode("latin-1"))
        + video,
    )
    tracks = _el(TRACKS, entry)
    clusters = b""
    for ci in range(0, len(blocks), blocks_per_cluster):
        chunk = blocks[ci : ci + blocks_per_cluster]
        base = chunk[0][0]
        body = _el_uint(TIMESTAMP, base)
        for ts, payload in chunk:
            blk = _vint_size(1) + struct.pack(">h", ts - base) + b"\x80" + payload
            body += _el(SIMPLE_BLOCK, blk)
        clusters += _el(CLUSTER, body)
    return header + _el(SEGMENT, info + tracks + clusters)
