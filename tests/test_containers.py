"""Container-layer codecs: ISO BMFF (mp4), EBML/Matroska (webm), MPEG
audio frame walk (mp3) — round-trips through our from-scratch writers,
plus the Spark-side container_meta / frame_sample real paths."""

import struct

import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import (
    codec_mp3,
    container_mp4,
    container_webm,
)


def _samples(pk: int, n: int) -> list[bytes]:
    return [
        bytes((pk + 11 * k + j) % 256 for j in range(50 + (pk * 13 + 7 * k) % 100))
        for k in range(n)
    ]


# ------------------------------------------------------------------ mp4

def test_mp4_roundtrip_exact():
    samples = _samples(5, 8)
    data = container_mp4.build_mp4(samples, 160, 120, codec="avc1")
    info = container_mp4.probe_mp4(data)
    assert info.brand == "isom"
    (t,) = info.tracks
    assert (t.handler, t.codec, t.width, t.height) == ("vide", "avc1", 160, 120)
    assert t.sample_sizes == [len(s) for s in samples]
    assert container_mp4.extract_samples(data, t) == samples
    assert t.sample_deltas == [40] * 8
    assert info.duration_ms == t.duration_ms == 8 * 40


@pytest.mark.parametrize("n,per_chunk", [(1, 3), (2, 10), (9, 3), (6, 3), (7, 1)])
def test_mp4_chunking_edge_cases(n, per_chunk):
    """stsc run compression (full chunks + short tail) must reproduce the
    exact per-sample offsets for every tail shape."""
    samples = _samples(n, n)
    data = container_mp4.build_mp4(samples, 64, 48, samples_per_chunk=per_chunk)
    t = container_mp4.probe_mp4(data).tracks[0]
    assert container_mp4.extract_samples(data, t) == samples


def test_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        container_mp4.probe_mp4(b"\x00" * 64)


def test_mp4_largesize_box():
    """size==1 + 64-bit largesize header must walk identically."""
    payload = b"abcdef"
    box = struct.pack(">I", 1) + b"test" + struct.pack(">Q", 16 + len(payload)) + payload
    got = list(container_mp4.walk_boxes(box))
    assert got == [(b"test", 16, 16 + len(payload))]


# ----------------------------------------------------------------- webm

def test_webm_roundtrip_exact():
    blocks = [(k * 40, s) for k, s in enumerate(_samples(3, 9))]
    data = container_webm.build_webm(blocks, 320, 180, codec="V_VP9")
    info = container_webm.probe_webm(data)
    assert info.doctype == "webm"
    assert info.timestamp_scale == 1_000_000
    (t,) = info.tracks
    assert (t.number, t.track_type, t.codec, t.width, t.height) == (1, 1, "V_VP9", 320, 180)
    assert [b.timestamp_ms for b in info.blocks] == [b[0] for b in blocks]
    assert [b.payload for b in info.blocks] == [b[1] for b in blocks]
    assert info.duration_ms == blocks[-1][0] + 40


def test_webm_cluster_relative_timestamps():
    """Blocks crossing cluster boundaries carry the cluster base + s16
    relative split; absolute timestamps must survive it."""
    blocks = [(k * 37, bytes([k])) for k in range(11)]
    data = container_webm.build_webm(blocks, 16, 16, blocks_per_cluster=4)
    info = container_webm.probe_webm(data)
    assert [b.timestamp_ms for b in info.blocks] == [k * 37 for k in range(11)]


def test_webm_vint_widths():
    """Multi-byte EBML varints: value and width must both be exact."""
    for val in (0, 1, 126, 127, 128, 16382, 16383, 16384, 2**21 - 2, 2**28 - 2):
        enc = container_webm._vint_size(val)
        got, pos = container_webm.read_vint(enc, 0, keep_marker=False)
        assert (got, pos) == (val, len(enc)), val


def test_webm_rejects_garbage():
    with pytest.raises(ValueError):
        container_webm.probe_webm(b"\xff" + b"\x00" * 32)


# ------------------------------------------------------------------ mp3

@pytest.mark.parametrize("bi,si,n", [(1, 0, 1), (9, 0, 20), (14, 2, 7), (5, 1, 12)])
def test_mp3_walk_exact(bi, si, n):
    data = codec_mp3.build_mp3(n, bi, si, fill_seed=3)
    info = codec_mp3.probe_mp3(data)
    br = codec_mp3._BITRATES_V1[3][bi]
    sr = codec_mp3._SAMPLE_RATES[3][si]
    assert info.n_frames == n
    assert info.bitrate_kbps == br and info.sample_rate == sr
    assert info.total_bytes == n * (144 * br * 1000 // sr) == len(data)
    assert info.duration_ms == n * 1152 * 1000 // sr
    assert info.is_cbr


def test_mp3_resync_over_garbage():
    data = b"ID3junk\xff\x00garbage" + codec_mp3.build_mp3(4, 9, 0)
    assert codec_mp3.probe_mp3(data).n_frames == 4


def test_mp3_truncated_tail_frame_dropped():
    data = codec_mp3.build_mp3(3, 9, 0)
    assert codec_mp3.probe_mp3(data[:-10]).n_frames == 2


def test_mp3_no_frames_raises():
    with pytest.raises(ValueError):
        codec_mp3.probe_mp3(b"\x00" * 100)


# -------------------------------------------------------- spark plumbing

def test_container_meta_mixed_formats(spark):
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    mp4 = container_mp4.build_mp4(_samples(2, 4), 100, 80, codec="avc1")
    webm = container_webm.build_webm(
        [(k * 40, s) for k, s in enumerate(_samples(3, 5))], 60, 40, codec="V_VP9"
    )
    mp3 = codec_mp3.build_mp3(6, 9, 0)
    df = spark.createDataFrame(
        [("a", mp4, "mp4"), ("b", webm, "webm"), ("c", mp3, "mp3")],
        "media_id string, bytes binary, fmt string",
    )
    out = {r["media_id"]: r for r in MM.container_meta(df).collect()}
    assert out["a"]["codec"] == "avc1" and out["a"]["n_samples"] == 4
    assert out["a"]["w"] == 100 and out["a"]["duration_ms"] == 160
    assert out["b"]["codec"] == "V_VP9" and out["b"]["n_samples"] == 5
    assert out["b"]["duration_ms"] == 200
    assert out["c"]["container"] == "mp3" and out["c"]["n_samples"] == 6
    assert out["c"]["sample_rate"] == 44100


def test_frame_sample_real_mp4_webm_payloads(spark):
    """frame_sample must return the REAL encoded sample bytes from the
    container (not fakes) when fmt is mp4/webm."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    s_mp4 = _samples(7, 6)
    s_webm = _samples(4, 5)
    df = spark.createDataFrame(
        [
            ("v4", container_mp4.build_mp4(s_mp4, 32, 24), "mp4"),
            ("vw", container_webm.build_webm(
                [(k * 40, s) for k, s in enumerate(s_webm)], 32, 24
            ), "webm"),
        ],
        "video_id string, bytes binary, fmt string",
    )
    out = MM.frame_sample(df, every_n=2).collect()
    got = {(r["video_id"], r["frame_idx"]): bytes(r["frame_bytes"]) for r in out}
    assert got[("v4", 0)] == s_mp4[0] and got[("v4", 2)] == s_mp4[2]
    assert got[("v4", 4)] == s_mp4[4]
    assert got[("vw", 0)] == s_webm[0] and got[("vw", 4)] == s_webm[4]
    assert all(r["w"] == 32 and r["h"] == 24 for r in out)


def test_mp4_audio_track_roundtrip():
    """AudioSampleEntry path: handler 'soun', 16.16 samplerate decode, and
    the same exact sample extraction."""
    samples = _samples(9, 7)
    data = container_mp4.build_mp4(
        samples, 0, 0, codec="mp4a", handler="soun",
        sample_rate=44100, timescale=44100, sample_delta=1024,
    )
    (t,) = container_mp4.probe_mp4(data).tracks
    assert (t.handler, t.codec, t.sample_rate) == ("soun", "mp4a", 44100)
    assert container_mp4.extract_samples(data, t) == samples
    assert t.duration_ms == 7 * 1024 * 1000 // 44100


def test_mp4_two_tracks_audio_first(spark):
    """Real-muxer shape: audio trak written before the video trak.  Both
    tracks' sample tables must extract exactly, and container_meta must
    prefer the VIDEO track for codec/dims while counting both streams."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    vid_s, aud_s = _samples(1, 5), _samples(8, 4)
    data = container_mp4.build_mp4(
        vid_s, 80, 60, audio_samples=aud_s, audio_rate=44100
    )
    info = container_mp4.probe_mp4(data)
    assert [t.handler for t in info.tracks] == ["soun", "vide"]
    aud, vid = info.tracks
    assert container_mp4.extract_samples(data, vid) == vid_s
    assert container_mp4.extract_samples(data, aud) == aud_s
    assert (aud.codec, aud.sample_rate, aud.track_id) == ("mp4a", 44100, 2)

    df = spark.createDataFrame(
        [("m", data, "mp4")], "media_id string, bytes binary, fmt string"
    )
    (row,) = MM.container_meta(df).collect()
    assert row["codec"] == "avc1" and row["w"] == 80 and row["h"] == 60
    assert row["n_streams"] == 2 and row["n_samples"] == 5


# ----------------------------------------------- real-codec track decode

def test_video_decode_frames_mjpeg_both_containers(spark):
    """MJPEG tracks ('jpeg' fourcc in mp4, 'V_MJPEG' in webm) must decode
    to REAL pixels: per-frame sums equal a single-process numpy reference
    of the same encode->decode chain."""
    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_jpeg

    def frames(seed, n, w, h):
        out = []
        for fi in range(n):
            a = np.full((h, w), (seed * 7 + 11 * fi) % 256, dtype=np.uint8)
            a[:, w // 2 :] = (seed * 13 + 17 * fi + 128) % 256
            out.append(a)
        return out

    f4, fw = frames(3, 5, 64, 48), frames(8, 4, 48, 32)
    enc4 = [codec_jpeg.encode_jpeg(a, quality=50) for a in f4]
    encw = [codec_jpeg.encode_jpeg(a, quality=50) for a in fw]
    df = spark.createDataFrame(
        [
            ("v4", container_mp4.build_mp4(enc4, 64, 48, codec="jpeg"), "mp4"),
            ("vw", container_webm.build_webm(
                [(k * 40, s) for k, s in enumerate(encw)], 48, 32,
                codec="V_MJPEG",
            ), "webm"),
        ],
        "video_id string, bytes binary, fmt string",
    )
    out = {
        (r["video_id"], r["frame_idx"]): r
        for r in MM.video_decode_frames(df, every_n=2).collect()
    }
    assert set(out) == {("v4", 0), ("v4", 2), ("v4", 4), ("vw", 0), ("vw", 2)}
    for vid, encs, dims in (("v4", enc4, (64, 48)), ("vw", encw, (48, 32))):
        for fi in range(0, len(encs), 2):
            ref = codec_jpeg.decode_jpeg(encs[fi])
            r = out[(vid, fi)]
            assert (r["fw"], r["fh"]) == dims
            assert r["n_px"] == ref.size
            assert r["sum_px"] == int(ref.sum(dtype=np.int64))


def test_video_decode_frames_rejects_interframe_codecs(spark):
    """H.264/VP9 tracks must raise, not silently fake pixels."""
    import pytest as _pytest

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [("v", container_mp4.build_mp4(_samples(1, 3), 32, 24, codec="avc1"),
          "mp4")],
        "video_id string, bytes binary, fmt string",
    )
    with _pytest.raises(Exception, match="codec-library-bound"):
        MM.video_decode_frames(df).collect()


def test_audio_track_pcm_exact(spark):
    """'sowt' PCM audio track out of a multi-trak mp4: decoded integer
    features must match numpy exactly; mp4a tracks must raise."""
    import numpy as np
    import pytest as _pytest

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    i = np.arange(256, dtype=np.int64)
    chunks = [
        (((31 + k * 7 + i * 3) % 65536) - 32768).astype("<i2").tobytes()
        for k in range(4)
    ]
    ref = np.concatenate(
        [np.frombuffer(c, dtype="<i2").astype(np.int64) for c in chunks]
    )
    data = container_mp4.build_mp4(
        _samples(2, 2), 32, 24, audio_samples=chunks,
        audio_codec="sowt", audio_rate=16000,
    )
    df = spark.createDataFrame(
        [("m", data, "mp4")], "media_id string, bytes binary, fmt string"
    )
    (row,) = MM.audio_track_pcm(df).collect()
    assert row["sample_rate"] == 16000
    assert row["n_samples"] == ref.size
    assert row["sum_s"] == int(ref.sum())
    assert (row["min_s"], row["max_s"]) == (int(ref.min()), int(ref.max()))
    assert row["sum_abs"] == int(np.abs(ref).sum())

    bad = container_mp4.build_mp4(
        _samples(2, 2), 32, 24, audio_samples=chunks, audio_codec="mp4a"
    )
    dfb = spark.createDataFrame(
        [("m", bad, "mp4")], "media_id string, bytes binary, fmt string"
    )
    with _pytest.raises(Exception, match="codec-library-bound"):
        MM.audio_track_pcm(dfb).collect()


def test_webm_track_number_127_one_byte_vint():
    """Track number 127 encodes as the 1-byte vint 0xFF — the all-ones
    'unknown' sentinel applies only to element SIZES, so blocks on track
    127 must not be dropped."""
    assert container_webm.read_vint(b"\xff", 0, keep_marker=False) == (127, 1)
    assert container_webm.read_vint(
        b"\xff", 0, keep_marker=False, is_size=True
    ) == (-1, 1)


def test_mp4_audio_only_probe_reports_zero_dims():
    """An audio-only mp4's AudioSampleEntry must not be misread as
    VisualSampleEntry: dims stay 0 and the samplerate decodes, instead of
    the 16.16 rate bytes appearing as width."""
    samples = _samples(3, 4)
    data = container_mp4.build_mp4(
        samples, 0, 0, codec="sowt", handler="soun",
        sample_rate=8000, timescale=8000, sample_delta=256,
    )
    (t,) = container_mp4.probe_mp4(data).tracks
    assert (t.handler, t.codec) == ("soun", "sowt")
    assert (t.width, t.height) == (0, 0)
    assert t.sample_rate == 8000


# ------------------------------------------------------- hostile-byte fuzz
# At 100 TB ingest, malformed and adversarial streams are certain.  The
# parser contract: raise ValueError (or the decoder's NotImplementedError
# capability guard) cleanly — never hang, over-allocate, or leak
# struct.error/IndexError.  (FLAC got the same hardening in round 3.)

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _fuzz_probe(fn, data, allowed=(ValueError,)):
    try:
        fn(data)
    except allowed:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_fuzz_random_bytes_all_parsers(data):
    _fuzz_probe(container_mp4.probe_mp4, data)
    _fuzz_probe(container_webm.probe_webm, data)
    _fuzz_probe(codec_mp3.probe_mp3, data)
    _fuzz_probe(
        codec_mp3.decode_mp3, data, (ValueError, NotImplementedError)
    )


def _valid_mp4() -> bytes:
    return container_mp4.build_mp4(_samples(9, 5), 160, 120, codec="avc1")


def _valid_webm() -> bytes:
    return container_webm.build_webm(
        [(40 * k, s) for k, s in enumerate(_samples(9, 5))], 160, 120
    )


def _valid_mp3() -> bytes:
    sig = np.rint(
        8000 * np.sin(np.arange(2000) * 0.07)
    ).astype(np.int16)
    return codec_mp3.encode_mp3(sig, 32000, bitrate_idx=7)


def _valid_mp3_l2() -> bytes:
    # Layer II blob: hostile bytes must also walk the table-driven
    # allocation/scfsi/grouped-codeword parse path cleanly
    sig = np.rint(
        8000 * np.sin(np.arange(2500) * 0.05)
    ).astype(np.int16)
    return codec_mp3.encode_mp3(sig, 48000, bitrate_idx=8, layer=2)


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_fuzz_truncations_of_valid_files(data):
    for blob, fns in (
        (_valid_mp4(), [container_mp4.probe_mp4]),
        (_valid_webm(), [container_webm.probe_webm]),
        (_valid_mp3(), [codec_mp3.probe_mp3, codec_mp3.decode_mp3]),
        (_valid_mp3_l2(), [codec_mp3.probe_mp3, codec_mp3.decode_mp3]),
    ):
        cut = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
        for fn in fns:
            _fuzz_probe(fn, blob[:cut], (ValueError, NotImplementedError))


@settings(max_examples=120, deadline=None)
@given(st.data())
def test_fuzz_byte_flips_of_valid_files(data):
    for blob, fns in (
        (_valid_mp4(), [container_mp4.probe_mp4]),
        (_valid_webm(), [container_webm.probe_webm]),
        (_valid_mp3(), [codec_mp3.probe_mp3, codec_mp3.decode_mp3]),
        (_valid_mp3_l2(), [codec_mp3.probe_mp3, codec_mp3.decode_mp3]),
    ):
        mut = bytearray(blob)
        for _ in range(data.draw(st.integers(min_value=1, max_value=8))):
            i = data.draw(st.integers(min_value=0, max_value=len(mut) - 1))
            mut[i] = data.draw(st.integers(min_value=0, max_value=255))
        for fn in fns:
            _fuzz_probe(fn, bytes(mut), (ValueError, NotImplementedError))


def test_mp4_lying_stsz_count_never_allocates():
    """fixed-size stsz declaring 2^32-1 samples must raise, not build a
    four-billion-entry list."""
    blob = bytearray(_valid_mp4())
    i = blob.find(b"stsz")
    assert i > 0
    # payload starts at i+4: ver/flags(4) sample_size(4) sample_count(4)
    blob[i + 8 : i + 12] = struct.pack(">I", 1)  # fixed size 1
    blob[i + 12 : i + 16] = struct.pack(">I", 0xFFFFFFFF)
    with pytest.raises(ValueError, match="implausible"):
        container_mp4.probe_mp4(bytes(blob))


def test_mp4_lying_stts_run_never_allocates():
    """a single stts run declaring 2^32-1 samples must raise at the
    cumulative-plausibility bound."""
    blob = bytearray(_valid_mp4())
    i = blob.find(b"stts")
    assert i > 0
    # stts payload: ver/flags(4) entry_count(4) [count delta]...
    blob[i + 12 : i + 16] = struct.pack(">I", 0xFFFFFFFF)
    with pytest.raises(ValueError, match="implausible|malformed"):
        container_mp4.probe_mp4(bytes(blob))


def test_mp4_zero_based_stsc_rejected():
    blob = bytearray(_valid_mp4())
    i = blob.find(b"stsc")
    assert i > 0
    # stsc payload: ver/flags(4) entry_count(4) first_chunk(4) ...
    blob[i + 12 : i + 16] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="1-based|malformed"):
        container_mp4.probe_mp4(bytes(blob))


def test_mp4_lying_box_size_rejected():
    blob = bytearray(_valid_mp4())
    blob[0:4] = struct.pack(">I", len(blob) + 1000)
    with pytest.raises(ValueError):
        container_mp4.probe_mp4(bytes(blob))


def test_webm_short_simpleblock_rejected():
    blob = container_webm.build_webm([(0, b"xy")], 32, 32)
    i = blob.find(b"\xa3")  # SimpleBlock id
    assert i > 0
    # shrink the block's declared size to 2 (< track vint + s16 + flags)
    mut = bytearray(blob)
    mut[i + 1] = 0x82
    with pytest.raises(ValueError):
        container_webm.probe_webm(bytes(mut))


def test_webm_truncated_varint_at_region_end():
    blob = container_webm.build_webm([(0, b"xy")], 32, 32)
    with pytest.raises(ValueError):
        container_webm.probe_webm(blob + b"\x40")  # dangling 2-byte id
