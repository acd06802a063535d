"""Progressive JPEG (SOF2): the decisive check is the bit-identity
contract — a progressive stream carries exactly the quantized
coefficients of the baseline encoding, so decode(progressive) must
equal decode(baseline) for the same pixels/quality/subsampling.  Any
slip anywhere in the scan protocol (DC point transforms, EOB runs,
refinement correction-bit ordering, ZRL flushing, noninterleaved block
grids) breaks that equality on random content."""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_jpeg as J
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_jpeg_prog as JP


def _cases():
    rng = np.random.default_rng(17)
    cases = [
        ((16, 16), False, 90), ((8, 8), False, 95), ((17, 23), False, 85),
        ((64, 48, 3), False, 90), ((33, 41, 3), False, 75),
        ((33, 41, 3), True, 90), ((40, 40, 3), True, 95),
        ((200, 200, 3), False, 95), ((1, 1), False, 95), ((9, 8, 3), True, 85),
    ]
    for t in range(20):
        if t % 2:
            shape = (int(rng.integers(1, 70)), int(rng.integers(1, 70)), 3)
        else:
            shape = (int(rng.integers(1, 70)), int(rng.integers(1, 70)))
        cases.append(
            (shape, bool(t % 3 == 0 and len(shape) == 3),
             int(rng.integers(30, 100)))
        )
    return cases


def test_progressive_equals_baseline_bit_for_bit():
    rng = np.random.default_rng(23)
    for trial, (shape, sub, q) in enumerate(_cases()):
        kind = trial % 3
        if kind == 0:
            arr = rng.integers(0, 256, shape).astype(np.uint8)
        elif kind == 1:
            arr = (np.indices(shape).sum(0) * 3 % 256).astype(np.uint8)
        else:
            arr = np.full(shape, 128, np.uint8)
            arr[: shape[0] // 2] = 30
        base = J.decode_jpeg(J.encode_jpeg(arr, quality=q, subsample=sub))
        prog = J.decode_jpeg(
            JP.encode_jpeg_progressive(arr, quality=q, subsample=sub)
        )  # decodes via codec_jpeg's SOF2 routing
        assert np.array_equal(base, prog), (shape, sub, q)


def test_scan_script_structure():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    b_rgb = JP.encode_jpeg_progressive(rgb)
    b_gray = JP.encode_jpeg_progressive(gray)
    assert b_rgb.count(b"\xff\xc2") == 1 and b"\xff\xc0" not in b_rgb[:200]
    # rgb: 2 DC scans + 4 AC-first + 3 AC-refine = 9; gray: 2 DC + 2 AC
    # first (bands 1-5, 6-63) + 1 AC refine = 5
    assert b_rgb.count(b"\xff\xda") == 9
    assert b_gray.count(b"\xff\xda") == 5


def test_eobn_run_decodes():
    """The encoder never emits EOBn>0 (Annex K tables lack those
    symbols), but the decoder must handle general end-of-band runs: a
    hand-built two-block scan whose single EOB1 symbol covers both."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.codec_jpeg import (
        DC_LUMA, Q_LUMA, ZIGZAG, _BitWriter, _build_codes, _dht_payload,
        _magnitude, _scale_q, _seg,
    )

    arr = np.zeros((8, 16), np.uint8)
    arr[:, :8] = 50
    arr[:, 8:] = 200  # two flat blocks -> AC exactly zero

    ql = _scale_q(Q_LUMA, 90)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].tolist()))
    sof = bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
    sof += bytes([1, 1, 0x11, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA))
    # custom AC table: single 1-bit code '0' -> symbol 0x10 (EOB, r=1)
    out += _seg(0xC4, _dht_payload(1, 0, ([1] + [0] * 15, [0x10])))

    # DC first scan (Al=0)
    dc_codes = _build_codes(DC_LUMA)
    bw = _BitWriter()
    pred = 0
    for v in (50, 200):
        dc = int(np.round((v - 128.0) * 8.0 / ql.reshape(8, 8)[0, 0]))
        s, bits = _magnitude(dc - pred)
        code, length = dc_codes[s]
        bw.write(code, length)
        bw.write(bits, s)
        pred = dc
    bw.flush()
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += bw.buf

    # AC first scan: EOB1 + one extra bit 0 -> run covers exactly 2 blocks
    bw = _BitWriter()
    bw.write(0, 1)   # the '0' code for symbol 0x10
    bw.write(0, 1)   # EOBRUN extra bit
    bw.flush()
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += bw.buf
    out += b"\xff\xd9"

    got = JP.decode_jpeg_progressive(bytes(out))
    want = J.decode_jpeg(J.encode_jpeg(arr, quality=90))
    assert np.array_equal(got, want)


def test_guards():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    base = J.encode_jpeg(arr)
    with pytest.raises(ValueError, match="wrong SOF"):
        JP.decode_jpeg_progressive(base)
    prog = bytearray(JP.encode_jpeg_progressive(arr))
    # forge a DRI with nonzero interval before the first SOS
    at = prog.index(b"\xff\xda")
    forged = bytes(prog[:at]) + b"\xff\xdd\x00\x04\x00\x10" + bytes(prog[at:])
    with pytest.raises(NotImplementedError, match="restart"):
        JP.decode_jpeg_progressive(forged)
    with pytest.raises(ValueError):
        JP.decode_jpeg_progressive(b"\x00\x01")
    with pytest.raises(ValueError, match="decode cap"):
        big = bytearray(JP.encode_jpeg_progressive(arr))
        s = big.index(b"\xff\xc2") + 5
        big[s:s + 4] = b"\xff\xff\xff\xff"  # 65535 x 65535 SOF dims
        JP.decode_jpeg_progressive(bytes(big))


def test_hostile_bytes_two_exception_contract():
    """Random single-byte corruptions of a valid progressive stream must
    either decode to an array or raise exactly ValueError /
    NotImplementedError (the malformed_guard contract)."""
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (24, 17, 3)).astype(np.uint8)
    blob = bytearray(JP.encode_jpeg_progressive(arr, quality=80))
    for _ in range(300):
        i = int(rng.integers(2, len(blob)))
        old = blob[i]
        blob[i] = int(rng.integers(0, 256))
        try:
            out = J.decode_jpeg(bytes(blob))
            assert isinstance(out, np.ndarray)
        except (ValueError, NotImplementedError):
            pass
        finally:
            blob[i] = old
    # truncations
    for cut in range(2, len(blob), max(1, len(blob) // 60)):
        try:
            out = J.decode_jpeg(bytes(blob[:cut]))
            assert isinstance(out, np.ndarray)
        except (ValueError, NotImplementedError):
            pass
