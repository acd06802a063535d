"""From-scratch FLAC codec: lossless round-trips through our encoder,
plus hand-built bitstreams for every decoder path the encoder never
emits — LPC subframes, rice2 method, partition orders > 0, escape
partitions, wasted bits, and the three stereo-decorrelation modes."""

import struct

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.codec_flac import (
    _SYNC,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_code,
    _zigzag,
    decode_flac,
    encode_flac,
)


# ------------------------------------------------------------ round-trip

@pytest.mark.parametrize("n,block", [(1, 4096), (100, 64), (4096, 4096),
                                     (5000, 1024), (9000, 4096)])
def test_roundtrip_mono_exact(n, block):
    x = ((np.arange(n, dtype=np.int64) * 37 + 11) % 65536 - 32768).astype(
        np.int16
    )
    dec, rate = decode_flac(encode_flac(x, 16000, block_size=block))
    assert rate == 16000
    assert np.array_equal(dec[:, 0], x.astype(np.int32))


def test_roundtrip_stereo_and_noise():
    rng = np.random.RandomState(3)
    x = np.stack(
        [
            rng.randint(-32768, 32768, 5000).astype(np.int16),
            (np.arange(5000) % 512 - 256).astype(np.int16),
        ],
        axis=1,
    )
    dec, _ = decode_flac(encode_flac(x, 44100))
    assert np.array_equal(dec, x.astype(np.int32))


def test_roundtrip_constant_compresses_hard():
    x = np.full(8000, 777, np.int16)
    data = encode_flac(x, 8000)
    assert len(data) < 120  # CONSTANT subframes, not samples
    dec, _ = decode_flac(data)
    assert np.array_equal(dec[:, 0], x.astype(np.int32))


def test_rejects_garbage_and_crc_corruption():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"\x00" * 64)
    data = bytearray(encode_flac(np.arange(500, dtype=np.int16), 8000))
    data[-10] ^= 0xFF  # flip a residual byte -> frame CRC-16 must trip
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


# ------------------------------------------- hand-built decoder streams

def _stream(frames: bytes, rate: int, ch: int, n: int) -> bytes:
    packed = (rate << 12) | ((ch - 1) << 9) | (15 << 4) | 0
    info = (
        struct.pack(">HH", 4096, 4096)
        + b"\x00\x00\x00" * 2
        + struct.pack(">I", packed)
        + struct.pack(">I", n)
        + b"\x00" * 16
    )
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info + frames


def _frame(ch_code: int, blocksize: int, body: _BitWriter) -> bytes:
    bw = _BitWriter()
    bw.write(_SYNC, 14)
    bw.write(0, 2)
    bw.write(0b0111, 4)  # 16-bit blocksize at end of header
    bw.write(0b0000, 4)  # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(0b100, 3)  # 16 bps
    bw.write(0, 1)
    head = bw.to_bytes() + _utf8_code(0) + struct.pack(">H", blocksize - 1)
    head += bytes([_crc8(head)])
    body.align()
    frame = head + body.to_bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _write_rice(bw: _BitWriter, resid, param: int) -> None:
    for u in _zigzag(np.asarray(resid)):
        bw.write_unary(int(u) >> param)
        bw.write(int(u) & ((1 << param) - 1), param)


def _fixed_subframe(
    bw: _BitWriter, x, order: int, param: int = 3, bits: int = 16
) -> None:
    x = np.asarray(x, dtype=np.int64)
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)
    bw.write(0, 1)
    for v in x[:order]:
        bw.write(int(v) & ((1 << bits) - 1), bits)
    r = x.copy()
    for _ in range(order):
        r = np.diff(r)
    bw.write(0b00, 2)
    bw.write(0, 4)
    bw.write(param, 4)
    _write_rice(bw, r, param)


def test_lpc_subframe_decodes():
    """LPC with coefs [2, -1] shift 0 = linear extrapolation; residuals
    hand-computed, reconstruction must match the reference recurrence."""
    n = 64
    x = ((np.arange(n) * 5) % 97 - 48).astype(np.int64)
    order, coefs, shift = 2, [2, -1], 0
    resid = [
        int(x[i] - ((coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> 0))
        for i in range(order, n)
    ]
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b100000 | (order - 1), 6)
    bw.write(0, 1)
    for v in x[:order]:
        bw.write(int(v) & 0xFFFF, 16)
    bw.write(4 - 1, 4)  # precision 4 bits
    bw.write(shift & 0x1F, 5)
    for c in coefs:
        bw.write(c & 0xF, 4)
    bw.write(0b00, 2)
    bw.write(0, 4)
    bw.write(4, 4)
    _write_rice(bw, resid, 4)
    data = _stream(_frame(0b0000, n, bw), 8000, 1, n)
    dec, _ = decode_flac(data)
    assert np.array_equal(dec[:, 0], x)


def test_rice2_method_and_partitions():
    """5-bit-parameter method with partition order 2 (4 partitions)."""
    n = 64
    x = ((np.arange(n) * 13) % 201 - 100).astype(np.int64)
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b001001, 6)  # FIXED order 1
    bw.write(0, 1)
    bw.write(int(x[0]) & 0xFFFF, 16)
    r = np.diff(x)
    bw.write(0b01, 2)  # rice2
    bw.write(2, 4)  # partition order 2
    parts = [r[: n // 4 - 1], r[n // 4 - 1 : n // 2 - 1],
             r[n // 2 - 1 : 3 * n // 4 - 1], r[3 * n // 4 - 1 :]]
    for p in parts:
        bw.write(5, 5)
        _write_rice(bw, p, 5)
    dec, _ = decode_flac(_stream(_frame(0b0000, n, bw), 8000, 1, n))
    assert np.array_equal(dec[:, 0], x)


def test_escape_partition_raw_twos_complement():
    n = 16
    x = np.array([0, 30000, -30000, 25000] * 4, dtype=np.int64)
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b001000, 6)  # FIXED order 0
    bw.write(0, 1)
    bw.write(0b00, 2)
    bw.write(0, 4)
    bw.write(0b1111, 4)  # escape
    bw.write(16, 5)
    for v in x:
        bw.write(int(v) & 0xFFFF, 16)
    dec, _ = decode_flac(_stream(_frame(0b0000, n, bw), 8000, 1, n))
    assert np.array_equal(dec[:, 0], x)


def test_wasted_bits_shift():
    n = 32
    x = (np.arange(n, dtype=np.int64) - 16) * 4  # 2 wasted bits
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b001000, 6)  # FIXED order 0
    bw.write(1, 1)  # wasted-bits flag
    bw.write_unary(1)  # unary(k-1) with k=2
    bw.write(0b00, 2)
    bw.write(0, 4)
    bw.write(4, 4)
    _write_rice(bw, x >> 2, 4)
    dec, _ = decode_flac(_stream(_frame(0b0000, n, bw), 8000, 1, n))
    assert np.array_equal(dec[:, 0], x)


@pytest.mark.parametrize("mode", ["left-side", "right-side", "mid-side"])
def test_stereo_decorrelation_modes(mode):
    n = 48
    left = ((np.arange(n) * 7) % 300 - 150).astype(np.int64)
    right = left + ((np.arange(n) % 5) - 2)
    side = left - right
    bw = _BitWriter()
    if mode == "left-side":
        code = 0b1000
        _fixed_subframe(bw, left, 1)
        _fixed_subframe(bw, side, 1, bits=17)
    elif mode == "right-side":
        code = 0b1001
        _fixed_subframe(bw, side, 1, bits=17)
        _fixed_subframe(bw, right, 1)
    else:
        code = 0b1010
        mid = (left + right) >> 1
        _fixed_subframe(bw, mid, 1)
        _fixed_subframe(bw, side, 1, bits=17)
    dec, _ = decode_flac(_stream(_frame(code, n, bw), 8000, 2, n))
    assert np.array_equal(dec[:, 0], left)
    assert np.array_equal(dec[:, 1], right)


def test_truncated_streams_raise_valueerror():
    """Truncation anywhere must surface as ValueError (the decoder's
    bad-stream contract), never IndexError/struct.error."""
    full = encode_flac((np.arange(600) % 200 - 100).astype(np.int16), 8000)
    for cut in [4, 6, 20, 40, len(full) // 2, len(full) - 1]:
        with pytest.raises(ValueError):
            decode_flac(full[:cut])


def test_partition_order_exceeding_predictor_order_raises():
    """blocksize >> porder <= order would wrap negative indices into the
    output tail and return garbage silently — must raise instead."""
    n = 16
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(0b001100, 6)  # FIXED order 4
    bw.write(0, 1)
    for v in range(4):
        bw.write(v, 16)
    bw.write(0b00, 2)
    bw.write(3, 4)  # partition order 3 -> 16/8 = 2 <= order 4
    bw.write(0, 4)
    for _ in range(n - 4):
        bw.write_unary(0)
    with pytest.raises(ValueError, match="partition size"):
        decode_flac(_stream(_frame(0b0000, n, bw), 8000, 1, n))
