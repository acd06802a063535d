"""ISO Base Media File Format (MP4) container parser + minimal writer,
from scratch per ISO/IEC 14496-12 (public spec).

Scope: CONTAINER level only — box tree walking, track metadata (handler,
codec fourcc, dimensions, sample rate), and exact per-sample extraction
via the stsz/stsc/stco sample tables.  The codec payload inside each
sample (H.264/VP9/AAC bitstreams) stays opaque: decoding it is genuinely
codec-library-bound and remains stubbed in ``operators/multimodal.py``.
This mirrors what a 100-TB ingest pipeline actually does with video —
probe metadata and slice encoded samples; pixel decode happens in a
later GPU stage.

Reference analogue: GDAL-backed any-raster open in
/root/reference/src/io.py:41-63 (the reference delegates container
handling to a library; we implement the container layer ourselves).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# boxes whose payload is a sequence of child boxes
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts",
    b"mvex", b"udta", b"moof", b"traf",
}


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for each top-level box
    in data[start:end].  Handles 64-bit largesize (size==1) and
    to-end-of-file (size==0) per §4.2."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {fourcc!r} at {pos}")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """All (payload_start, payload_end) spans of boxes matching the fourcc
    path (descending through container boxes)."""
    spans = [(start, end)]
    for fourcc in path:
        nxt = []
        for s, e in spans:
            for fc, ps, pe in walk_boxes(data, s, e):
                if fc == fourcc:
                    nxt.append((ps, pe))
        spans = nxt
    return spans


@dataclass
class Mp4Track:
    track_id: int
    handler: str  # 'vide' | 'soun' | ...
    codec: str  # sample-entry fourcc, e.g. 'avc1', 'mp4a'
    width: int
    height: int
    sample_rate: int
    timescale: int
    duration: int  # in track (mdhd) timescale units
    sample_sizes: list[int] = field(default_factory=list)
    sample_offsets: list[int] = field(default_factory=list)  # absolute file offsets
    sample_deltas: list[int] = field(default_factory=list)  # per-sample stts deltas

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale if self.timescale else 0


@dataclass
class Mp4Info:
    timescale: int
    duration: int  # movie (mvhd) timescale units
    brand: str
    tracks: list[Mp4Track]

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale if self.timescale else 0


def _parse_stsd(
    data: bytes, ps: int, pe: int, handler: str
) -> tuple[str, int, int, int]:
    """(codec_fourcc, width, height, sample_rate) from the first sample
    entry.  The entry layout depends on the TRACK handler — the same byte
    offsets hold width/height in a VisualSampleEntry (u16 at entry offset
    24/26 past the 8-byte reserved+dref_index prefix) but samplerate in an
    AudioSampleEntry (16.16 fixed at prefix offset 16) — so parse only the
    fields the handler's layout defines, and bound every read by the
    ENTRY's own end: a short or foreign entry yields zeros, never bytes
    belonging to the following box."""
    count = struct.unpack_from(">I", data, ps + 4)[0]
    if count < 1:
        return "", 0, 0, 0
    entries = list(walk_boxes(data, ps + 8, pe))
    if not entries:
        return "", 0, 0, 0
    fc, es, ee = entries[0]
    codec = fc.decode("latin-1")
    body = es + 8  # skip 6 reserved + 2 data_reference_index
    w = h = rate = 0
    if handler == "vide" and ee >= body + 28:
        w = struct.unpack_from(">H", data, body + 16)[0]
        h = struct.unpack_from(">H", data, body + 18)[0]
    elif handler == "soun" and ee >= body + 20:
        rate = struct.unpack_from(">I", data, body + 16)[0] >> 16
    return codec, w, h, rate


def _sample_offsets(
    sizes: list[int], stsc: list[tuple[int, int]], stco: list[int]
) -> list[int]:
    """Absolute file offset of every sample from the chunk map.

    stsc rows are (first_chunk, samples_per_chunk) runs (1-based, each run
    extends to the next row's first_chunk); stco is the absolute offset of
    each chunk; within a chunk samples are contiguous in stsz order.
    Hostile tables (0-based or out-of-range chunk indices, runs past the
    chunk count) raise instead of wrapping into Python negative indexing
    or spinning through a lying run length."""
    offsets: list[int] = []
    n_chunks = len(stco)
    si = 0
    for ri, (first, per) in enumerate(stsc):
        if first < 1:
            raise ValueError(f"stsc first_chunk {first} is not 1-based")
        last = stsc[ri + 1][0] - 1 if ri + 1 < len(stsc) else n_chunks
        for chunk in range(first, min(last, n_chunks) + 1):
            base = stco[chunk - 1]
            for _ in range(per):
                if si >= len(sizes):
                    return offsets
                offsets.append(base)
                base += sizes[si]
                si += 1
    return offsets


def _table_count(cnt: int, data: bytes, what: str) -> int:
    """Plausibility bound for declared sample-table entry counts: a real
    table can't describe more entries than the file has bytes, so a lying
    32-bit count raises instead of allocating gigabytes ([fixed]*cnt /
    [delta]*n expansion — 100 TB ingest sees hostile bytes for certain)."""
    if cnt > len(data):
        raise ValueError(f"implausible {what} count {cnt} in {len(data)}-byte file")
    return cnt


def probe_mp4(data: bytes) -> Mp4Info:
    """Parse the container: movie header, every track's metadata and its
    full sample table (exact sizes, absolute offsets, timestamps).
    Malformed streams (truncations, length-field lies, hostile table
    counts) raise ValueError — never hang, over-allocate, or leak
    struct/index errors."""
    try:
        return _probe_mp4(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed MP4: {e}") from e


def _probe_mp4(data: bytes) -> Mp4Info:
    brand = ""
    for fc, ps, pe in walk_boxes(data):
        if fc == b"ftyp":
            brand = data[ps : ps + 4].decode("latin-1")
    mvhd = _find(data, 0, len(data), [b"moov", b"mvhd"])
    if not mvhd:
        raise ValueError("not an MP4: no moov/mvhd box")
    ps, _ = mvhd[0]
    version = data[ps]
    if version == 1:
        timescale = struct.unpack_from(">I", data, ps + 20)[0]
        duration = struct.unpack_from(">Q", data, ps + 24)[0]
    else:
        timescale = struct.unpack_from(">I", data, ps + 12)[0]
        duration = struct.unpack_from(">I", data, ps + 16)[0]

    tracks = []
    for ts, te in _find(data, 0, len(data), [b"moov", b"trak"]):
        tkhd = _find(data, ts, te, [b"tkhd"])
        track_id = 0
        if tkhd:
            hs, _ = tkhd[0]
            track_id = struct.unpack_from(
                ">I", data, hs + (20 if data[hs] == 1 else 12)
            )[0]
        mdhd = _find(data, ts, te, [b"mdia", b"mdhd"])
        tsc = dur = 0
        if mdhd:
            hs, _ = mdhd[0]
            if data[hs] == 1:
                tsc = struct.unpack_from(">I", data, hs + 20)[0]
                dur = struct.unpack_from(">Q", data, hs + 24)[0]
            else:
                tsc = struct.unpack_from(">I", data, hs + 12)[0]
                dur = struct.unpack_from(">I", data, hs + 16)[0]
        hdlr = _find(data, ts, te, [b"mdia", b"hdlr"])
        handler = ""
        if hdlr:
            hs, _ = hdlr[0]
            handler = data[hs + 8 : hs + 12].decode("latin-1")

        codec = ""
        w = h = rate = 0
        stsd = _find(data, ts, te, [b"mdia", b"minf", b"stbl", b"stsd"])
        if stsd:
            codec, w, h, rate = _parse_stsd(data, *stsd[0], handler)

        sizes: list[int] = []
        stsz = _find(data, ts, te, [b"mdia", b"minf", b"stbl", b"stsz"])
        if stsz:
            hs, _ = stsz[0]
            fixed, cnt = struct.unpack_from(">II", data, hs + 4)
            cnt = _table_count(cnt, data, "stsz sample")
            sizes = (
                [fixed] * cnt
                if fixed
                else list(struct.unpack_from(f">{cnt}I", data, hs + 12))
            )
        stsc_rows: list[tuple[int, int]] = []
        stsc = _find(data, ts, te, [b"mdia", b"minf", b"stbl", b"stsc"])
        if stsc:
            hs, _ = stsc[0]
            cnt = struct.unpack_from(">I", data, hs + 4)[0]
            for i in range(cnt):
                first, per, _di = struct.unpack_from(">III", data, hs + 8 + 12 * i)
                stsc_rows.append((first, per))
        chunk_offsets: list[int] = []
        stco = _find(data, ts, te, [b"mdia", b"minf", b"stbl", b"stco"])
        if stco:
            hs, _ = stco[0]
            cnt = struct.unpack_from(">I", data, hs + 4)[0]
            chunk_offsets = list(struct.unpack_from(f">{cnt}I", data, hs + 8))
        co64 = _find(data, ts, te, [b"mdia", b"minf", b"stbl", b"co64"])
        if co64:
            hs, _ = co64[0]
            cnt = struct.unpack_from(">I", data, hs + 4)[0]
            chunk_offsets = list(struct.unpack_from(f">{cnt}Q", data, hs + 8))
        deltas: list[int] = []
        stts = _find(data, ts, te, [b"mdia", b"minf", b"stbl", b"stts"])
        if stts:
            hs, _ = stts[0]
            cnt = struct.unpack_from(">I", data, hs + 4)[0]
            for i in range(cnt):
                n, d = struct.unpack_from(">II", data, hs + 8 + 8 * i)
                _table_count(len(deltas) + n, data, "stts cumulative sample")
                deltas.extend([d] * n)

        tracks.append(
            Mp4Track(
                track_id=track_id,
                handler=handler,
                codec=codec,
                width=w,
                height=h,
                sample_rate=rate,
                timescale=tsc,
                duration=dur,
                sample_sizes=sizes,
                sample_offsets=_sample_offsets(sizes, stsc_rows, chunk_offsets),
                sample_deltas=deltas,
            )
        )
    return Mp4Info(timescale=timescale, duration=duration, brand=brand, tracks=tracks)


def extract_samples(data: bytes, track: Mp4Track) -> list[bytes]:
    """The encoded payload bytes of every sample, in decode order."""
    return [
        data[off : off + sz]
        for off, sz in zip(track.sample_offsets, track.sample_sizes)
    ]


# ---------------------------------------------------------------- writer

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def _chunk_map(
    samples: list[bytes], base: int, samples_per_chunk: int
) -> tuple[list[int], list[tuple[int, int]]]:
    """(absolute chunk offsets, stsc (first_chunk, samples_per_chunk) runs)
    for samples laid out contiguously from ``base``, grouped
    ``samples_per_chunk`` per chunk with run compression for the tail."""
    chunk_offsets = []
    off = base
    for i, s in enumerate(samples):
        if i % samples_per_chunk == 0:
            chunk_offsets.append(off)
        off += len(s)
    n, n_chunks = len(samples), len(chunk_offsets)
    tail = n - (n_chunks - 1) * samples_per_chunk if n_chunks else 0
    stsc_rows: list[tuple[int, int]] = []
    if n_chunks:
        if n_chunks > 1:
            stsc_rows.append((1, samples_per_chunk))
            if tail != samples_per_chunk:
                stsc_rows.append((n_chunks, tail))
        else:
            stsc_rows.append((1, tail))
    return chunk_offsets, stsc_rows


def _trak(
    samples: list[bytes],
    chunk_offsets: list[int],
    stsc_rows: list[tuple[int, int]],
    handler: str,
    codec: str,
    width: int,
    height: int,
    timescale: int,
    sample_delta: int,
    track_id: int,
    sample_rate: int,
) -> bytes:
    n = len(samples)
    duration = n * sample_delta
    if handler == "soun":
        # AudioSampleEntry body per §12.2.3: channelcount/samplesize +
        # 16.16 fixed-point samplerate
        entry_body = (
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HHHH", 2, 16, 0, 0)
            + struct.pack(">I", sample_rate << 16)
        )
    else:
        # VisualSampleEntry body per §12.1.3 (box framing added by _box)
        entry_body = (
            b"\x00" * 6
            + struct.pack(">H", 1)
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + struct.pack(">I", 0)
            + struct.pack(">H", 1)
            + b"\x00" * 32
            + struct.pack(">Hh", 24, -1)
        )
    entry = _box(codec.encode("latin-1"), entry_body)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_rows))
        + b"".join(struct.pack(">III", f, p, 1) for f, p in stsc_rows),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    if handler == "soun":
        mhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    else:
        mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", mhd + dinf + stbl)
    hdlr = _full(
        b"hdlr",
        0,
        0,
        struct.pack(">I", 0) + handler.encode("latin-1") + b"\x00" * 12 + b"\x00",
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, track_id, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    return _box(b"trak", tkhd + mdia)


def build_mp4(
    samples: list[bytes],
    width: int,
    height: int,
    codec: str = "avc1",
    timescale: int = 1000,
    sample_delta: int = 40,
    samples_per_chunk: int = 3,
    handler: str = "vide",
    sample_rate: int = 48000,
    audio_samples: list[bytes] | None = None,
    audio_codec: str = "mp4a",
    audio_rate: int = 48000,
    audio_delta: int = 1024,
) -> bytes:
    """Minimal valid MP4 (ftyp + mdat + moov) for fixtures and round-trip
    tests.  Samples are grouped ``samples_per_chunk`` per chunk so
    stsc/stco interleaving is exercised for real, not just the trivial
    one-chunk case.  ``handler='soun'`` makes the main track audio
    (AudioSampleEntry + smhd).  ``audio_samples`` adds a SECOND track — an
    mp4a audio track written BEFORE the video trak in moov, as real
    muxers often do, so multi-track walking and video-track preference are
    exercised; its payload follows the main track's in mdat."""
    n = len(samples)
    duration = n * sample_delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp42")
    payload = b"".join(samples)
    audio_payload = b"".join(audio_samples) if audio_samples else b""
    mdat = _box(b"mdat", payload + audio_payload)
    base = len(ftyp) + 8  # absolute offset of first sample in file

    chunk_offsets, stsc_rows = _chunk_map(samples, base, samples_per_chunk)
    traks = _trak(
        samples, chunk_offsets, stsc_rows, handler, codec, width, height,
        timescale, sample_delta, 1, sample_rate,
    )
    if audio_samples is not None:
        a_off, a_rows = _chunk_map(
            audio_samples, base + len(payload), samples_per_chunk
        )
        traks = (
            _trak(
                audio_samples, a_off, a_rows, "soun", audio_codec, 0, 0,
                audio_rate, audio_delta, 2, audio_rate,
            )
            + traks
        )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 3),
    )
    moov = _box(b"moov", mvhd + traks)
    return ftyp + mdat + moov
