"""Baseline JPEG codec (sources/codec_jpeg.py): round-trip PSNR bound per
the input_hint contract (decoded-pixel PSNR >= 40 dB for lossy formats),
dispatch wiring, and format-edge behavior."""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec, codec_jpeg as J


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def ortho(h, w):
    """Deterministic pseudo-ortho like sources/images.render_rgb."""
    yy = (np.arange(h, dtype=np.uint32)[:, None] * 7 + 3) % 97
    xx = (np.arange(w, dtype=np.uint32)[None, :] * 13 + 3) % 89
    base = (40 + yy + xx).astype(np.uint8)
    img = np.stack([base, base + 17, base + 31], axis=-1).astype(np.uint8)
    img[50:90, 30:110] = (220, 210, 200)
    return img


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((200, 200), {}),                    # grayscale
        ((200, 200, 3), {}),                 # RGB 4:4:4
        ((200, 200, 3), {"subsample": True}),  # RGB 4:2:0
        ((197, 189, 3), {}),                 # non-multiple-of-8 dims
        ((8, 8), {}),                        # single block
        ((1, 1, 3), {}),                     # degenerate
    ],
)
def test_roundtrip_psnr_bound(shape, kw):
    img = ortho(shape[0], shape[1])
    if len(shape) == 2:
        img = img[:, :, 0]
    enc = J.encode_jpeg(img, quality=95, **kw)
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert psnr(img, dec) >= 40.0, psnr(img, dec)


def test_noise_roundtrip_exercises_byte_stuffing():
    """High-entropy input at q=100 emits 0xFF bytes in the entropy stream;
    the stuffing/unstuffing pair must survive it losslessly enough."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
    enc = J.encode_jpeg(img, quality=100)
    # stuffed pair must actually appear for the test to mean anything
    assert b"\xff\x00" in enc
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 30.0  # q100 on noise is still lossy-but-close


def test_codec_dispatch_jpeg():
    img = ortho(80, 120)
    enc = codec.encode(img, "jpeg")
    out = codec.decode(enc, "jpeg", 120, 80)
    assert out.shape == (80, 120, 3)
    with pytest.raises(ValueError):
        codec.decode(enc, "jpeg", 64, 64)  # dims validated vs columns


def test_rejects_lossless_and_garbage():
    """Progressive (0xC2) decodes for real since r5 (codec_jpeg_prog);
    the remaining SOF boundary is lossless/hierarchical.  A baseline
    stream FORGED to claim SOF2 must fail as malformed (its single
    full-band scan violates the progressive scan rules), not decode."""
    img = ortho(32, 32)
    enc = bytearray(J.encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC3  # lossless sequential
    with pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(enc))
    enc[sof + 1] = 0xC2  # forged progressive over a baseline scan
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01\x02")


def test_quant_quality_monotone():
    """Lower quality -> smaller payload, lower fidelity (sanity on the
    libjpeg quality-scaling convention)."""
    img = ortho(96, 96)
    hi = J.encode_jpeg(img, quality=95)
    lo = J.encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    assert psnr(img, J.decode_jpeg(lo)) < psnr(img, J.decode_jpeg(hi))


def test_multimodal_features_over_real_jpeg(spark):
    """decode_features runs the REAL jpeg path (no stub) end-to-end."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    rows = []
    for i in range(6):
        img = ortho(100 + i, 90 + i)
        rows.append((f"j{i}", codec.encode(img, "jpeg"), 90 + i, 100 + i, "jpeg"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["image_id"]: r for r in MM.decode_features(df, resize_to=32).collect()}
    assert len(got) == 6
    for i in range(6):
        r = got[f"j{i}"]
        assert r["n_px"] == (100 + i) * (90 + i)
        # jpeg is lossy but means stay close to the source image's
        src = ortho(100 + i, 90 + i)
        assert abs(r["mean_r"] - src[:, :, 0].mean()) < 1.0


# ---------------------------------------------------------------------- #
# PCM WAV codec (sources/codec_wav.py)
# ---------------------------------------------------------------------- #

def test_wav_roundtrip_mono_stereo():
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav as W

    rng = np.random.RandomState(5)
    mono = rng.randint(-32768, 32767, size=2000, dtype=np.int16)
    s, rate = W.decode_wav(W.encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (2000, 1)
    np.testing.assert_array_equal(s[:, 0], mono)

    stereo = rng.randint(-32768, 32767, size=(500, 2), dtype=np.int16)
    s2, rate2 = W.decode_wav(W.encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (500, 2)
    np.testing.assert_array_equal(s2, stereo)


def test_wav_odd_chunk_alignment_and_extra_chunks():
    """Decoder must skip unknown chunks and honor word alignment."""
    import struct

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav as W

    base = bytearray(W.encode_wav(np.arange(10, dtype=np.int16), 16000))
    # splice an odd-sized LIST chunk between WAVE id and fmt
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad to even
    spliced = bytes(base[:12]) + extra + bytes(base[12:])
    s, rate = W.decode_wav(spliced)
    assert rate == 16000 and s.shape == (10, 1)


def test_wav_rejects_non_pcm_and_garbage():
    import struct

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav as W

    enc = bytearray(W.encode_wav(np.zeros(4, dtype=np.int16), 16000))
    fmt_at = bytes(enc).find(b"fmt ") + 8
    enc[fmt_at : fmt_at + 2] = struct.pack("<H", 2)  # MS ADPCM
    with pytest.raises(NotImplementedError):
        W.decode_wav(bytes(enc))
    # IEEE float decodes for real since r5, but 16-bit floats don't exist
    enc[fmt_at : fmt_at + 2] = struct.pack("<H", 3)
    with pytest.raises(ValueError):
        W.decode_wav(bytes(enc))
    with pytest.raises(ValueError):
        W.decode_wav(b"nope")


def test_audio_features_over_real_wav(spark):
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav as W

    s = np.array([100, -50, 30, -30, 0, 10], dtype=np.int16)
    df = spark.createDataFrame(
        [("a1", W.encode_wav(s, 1000), "wav")],
        "audio_id string, bytes binary, fmt string",
    )
    r = MM.audio_features(df).collect()[0]
    assert r["n_samples"] == 6 and r["sample_rate"] == 1000
    assert r["duration_ms"] == 6
    assert r["sum_abs"] == 220
    # strict sign products: (100,-50) (-50,30) (30,-30) (-30,0) (0,10) -> 3
    assert r["zero_crossings"] == 3


# ---------------------------------------------------------------------- #
# GIF codec (sources/codec_gif.py)
# ---------------------------------------------------------------------- #

def test_gif_roundtrip_variants():
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_gif as G

    rng = np.random.RandomState(0)
    pal16 = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    f0 = rng.randint(0, 16, size=(90, 130), dtype=np.uint8)
    frames, _ = G.decode_gif(G.encode_gif([f0], pal16))
    np.testing.assert_array_equal(frames[0][:, :, :3], pal16[f0])

    # animation with delays
    f1 = (f0 + 1) % 16
    fr, de = G.decode_gif(G.encode_gif([f0, f1, f0], pal16, delays=[5, 10, 15]))
    assert len(fr) == 3 and de == [5, 10, 15]
    np.testing.assert_array_equal(fr[1][:, :, :3], pal16[f1])

    # 256-color random frame: exercises width growth to 12 bits
    pal256 = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    big = rng.randint(0, 256, size=(200, 200), dtype=np.uint8)
    fb, _ = G.decode_gif(G.encode_gif([big], pal256))
    np.testing.assert_array_equal(fb[0][:, :, :3], pal256[big])

    # gradient: exercises the 4096-entry dictionary reset
    grad = (np.add.outer(np.arange(300), np.arange(300)) % 256).astype(np.uint8)
    fg, _ = G.decode_gif(G.encode_gif([grad], pal256))
    np.testing.assert_array_equal(fg[0][:, :, :3], pal256[grad])

    with pytest.raises(ValueError):
        G.decode_gif(b"NOPE")


def test_frame_sample_real_gif_path(spark):
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_gif as G
    import zlib

    pal = np.stack([np.arange(8) * 30] * 3, axis=1).astype(np.uint8)
    frames = [np.full((6, 9), k, dtype=np.uint8) for k in range(5)]
    gif = G.encode_gif(frames, pal)
    df = spark.createDataFrame(
        [("v1", gif, "gif")], "video_id string, bytes binary, fmt string"
    )
    out = {r["frame_idx"]: r for r in MM.frame_sample(df, every_n=2).collect()}
    assert set(out) == {0, 2, 4}
    for fi, r in out.items():
        fr = np.frombuffer(
            zlib.decompress(bytes(r["frame_bytes"])), dtype=np.uint8
        ).reshape(6, 9, 3)
        assert (fr == fi * 30).all()


def test_wav_8bit_pcm_is_unsigned_biased():
    """8-bit PCM is unsigned with a 128 bias (WAV spec): decode must
    return signed values so zero-crossings/abs features are meaningful."""
    import struct

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav as W

    # hand-build an 8-bit mono wav: samples 0, 128, 255 -> -128, 0, 127
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    wav += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    wav += b"data" + struct.pack("<I", len(data)) + data + b"\x00"  # pad
    s, rate = W.decode_wav(wav)
    assert rate == 8000
    assert s[:, 0].tolist() == [-128, 0, 127]
