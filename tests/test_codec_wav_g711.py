"""G.711 mu-law/A-law + 24-bit PCM WAV paths (sources/codec_wav.py).

Reference semantics: the classic ITU-T G.711 tables (the Sun g711.c
lattice every telephony stack reproduces).  Known-vector checks pin the
byte<->linear convention; the lattice-idempotence test proves encoder
and decoder are exact inverses on all 256 code points.
"""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav as W


def test_mulaw_known_vectors():
    assert W.MULAW_TABLE[0x00] == -32124
    assert W.MULAW_TABLE[0x80] == 32124
    assert W.MULAW_TABLE[0xFF] == 0
    assert W.MULAW_TABLE[0x7F] == 0  # negative zero collapses to 0


def test_alaw_known_vectors():
    assert W.ALAW_TABLE[0x55] == -8
    assert W.ALAW_TABLE[0xD5] == 8
    assert W.ALAW_TABLE[0xAA] == 32256
    assert W.ALAW_TABLE[0x2A] == -32256


def test_mulaw_lattice_idempotent():
    # encode(decode(b)) == b for every code point except negative zero
    bytes_in = np.arange(256, dtype=np.uint8)
    recon = W.MULAW_TABLE[bytes_in].astype(np.int16)
    back = W.linear_to_mulaw(recon)
    keep = bytes_in != 0x7F  # -0 re-encodes as +0 (0xFF)
    assert np.array_equal(back[keep], bytes_in[keep])
    assert back[~keep][0] == 0xFF


def test_alaw_lattice_idempotent():
    bytes_in = np.arange(256, dtype=np.uint8)
    recon = W.ALAW_TABLE[bytes_in].astype(np.int16)
    assert np.array_equal(W.linear_to_alaw(recon), bytes_in)


def test_companding_error_bound_full_range():
    s = np.arange(-32768, 32768, dtype=np.int16)
    mu = W.MULAW_TABLE[W.linear_to_mulaw(s)].astype(np.int32)
    al = W.ALAW_TABLE[W.linear_to_alaw(s)].astype(np.int32)
    s32 = s.astype(np.int32)
    # per-segment step: mu-law step = 8<<e over mag [2^(e+7)..), so the
    # relative error is bounded; the absolute worst case is the top
    # segment step (mu 1024, a 1024) plus the mu clip at 32635
    assert np.abs(mu - s32).max() <= 1024 + (32768 - 32124)
    assert np.abs(al - s32).max() <= 1024
    # sign is never flipped (zero allowed)
    assert np.all(mu * s32 >= 0)
    assert np.all(al * s32 >= 0)


def test_mulaw_monotonic():
    # decode over code points ordered by linear value must be monotonic:
    # sort-by-table equals sort-by-value for each law
    for table in (W.MULAW_TABLE, W.ALAW_TABLE):
        vals = np.sort(table.astype(np.int32))
        assert np.all(np.diff(vals) >= 0)


@pytest.mark.parametrize("law,tag", [("mu", 7), ("a", 6)])
def test_wav_g711_roundtrip(law, tag):
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=(501, 2), dtype=np.int16)
    blob = W.encode_wav_g711(s, 8000, law)
    out, rate = W.decode_wav(blob)
    assert rate == 8000 and out.shape == (501, 2)
    table = W.MULAW_TABLE if law == "mu" else W.ALAW_TABLE
    enc = W.linear_to_mulaw(s) if law == "mu" else W.linear_to_alaw(s)
    assert np.array_equal(out, table[enc].reshape(501, 2))
    # format tag round-trips through the header
    import struct
    assert struct.unpack("<H", blob[20:22])[0] == tag


def test_wav24_roundtrip_exact():
    rng = np.random.default_rng(11)
    s = rng.integers(-(1 << 23), 1 << 23, size=(400, 3), dtype=np.int32)
    out, rate = W.decode_wav(W.encode_wav24(s, 48000))
    assert rate == 48000
    assert np.array_equal(out, s)


def test_wav24_range_guard():
    with pytest.raises(ValueError):
        W.encode_wav24(np.array([1 << 23], dtype=np.int32), 8000)


def test_g711_bits_guard():
    blob = bytearray(W.encode_wav_g711(np.zeros(8, dtype=np.int16), 8000, "mu"))
    blob[34] = 16  # forge bits=16 on a G.711 stream
    with pytest.raises(ValueError):
        W.decode_wav(bytes(blob))


def test_float_wav_still_stub():
    blob = bytearray(W.encode_wav(np.zeros(8, dtype=np.int16), 8000))
    blob[20] = 3  # WAVE_FORMAT_IEEE_FLOAT
    with pytest.raises(NotImplementedError):
        W.decode_wav(bytes(blob))
