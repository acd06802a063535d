"""PNG/raw codec round-trips (SURVEY.md §7 step 1 hard part)."""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec


@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 3), (16, 9, 4), (1, 1), (200, 200, 3)])
def test_png_roundtrip(shape):
    rng = np.random.RandomState(42)
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = codec.decode_png(codec.encode_png(arr))
    exp = arr if arr.ndim == 3 else arr
    np.testing.assert_array_equal(out, exp)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_raw_roundtrip(c):
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(11, 13, c), dtype=np.uint8).squeeze()
    data = codec.encode_raw(arr)
    out = codec.decode_raw(data, 13, 11)
    np.testing.assert_array_equal(out, arr)


def test_png_filters_decode():
    """Decoder handles Sub/Up/Average/Paeth-filtered streams."""
    import struct
    import zlib

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    h, w, c = arr.shape

    # build filtered scanlines manually, one filter type per row
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4, 2]):
        cur = arr[y].reshape(-1).astype(np.int32)
        enc = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            left = cur[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        codec._PNG_SIG
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + codec._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codec.decode_png(png), arr)


def test_decode_validates_dims():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        codec.decode(codec.encode_png(arr), "png", 5, 4)


def _build_palette_png(w, h, depth, palette, idx, trns=None):
    """Hand-assemble a palette PNG (the encoder never emits type 3)."""
    import struct
    import zlib

    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.codec import _PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    stride = (w * depth + 7) // 8
    lines = []
    for y in range(h):
        if depth == 8:
            packed = bytes(idx[y])
        else:
            bits = []
            for v in idx[y]:
                bits.extend(int(b) for b in format(v, f"0{depth}b"))
            bits += [0] * (stride * 8 - len(bits))
            packed = np.packbits(np.array(bits, dtype=np.uint8)).tobytes()
        lines.append(b"\x00" + packed)
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", bytes(np.array(palette, dtype=np.uint8).ravel()))
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    out += _chunk(b"IDAT", zlib.compress(b"".join(lines)))
    out += _chunk(b"IEND", b"")
    return out


def test_decode_palette_png_depths():
    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 2], [1, 1, 3, 2, 0]], dtype=np.uint8)
    for depth in (2, 4, 8):
        png = _build_palette_png(5, 3, depth, palette, idx)
        got = codec.decode_png(png)
        assert got.shape == (3, 5, 3)
        exp = np.array(palette, dtype=np.uint8)[idx]
        np.testing.assert_array_equal(got, exp)
    # depth 1 with a 2-entry palette
    idx1 = np.array([[0, 1, 1, 0, 1]], dtype=np.uint8)
    got1 = codec.decode_png(_build_palette_png(5, 1, 1, palette[:2], idx1))
    np.testing.assert_array_equal(
        got1, np.array(palette[:2], dtype=np.uint8)[idx1]
    )


def test_decode_palette_png_trns_alpha():
    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec

    palette = [(10, 20, 30), (40, 50, 60)]
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    png = _build_palette_png(2, 2, 8, palette, idx, trns=[128])  # idx 0 half-alpha
    got = codec.decode_png(png)
    assert got.shape == (2, 2, 4)
    assert got[0, 0, 3] == 128 and got[0, 1, 3] == 255
    np.testing.assert_array_equal(got[0, 0, :3], [10, 20, 30])


@pytest.mark.parametrize("shape", [(7, 5), (13, 17), (5, 9, 3), (8, 8, 4), (1, 1), (9, 1, 3), (1, 9)])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_16bit_adam7_roundtrip(shape, dtype, interlace):
    """16-bit depth (DEM layout) and Adam7 interlace, all combinations."""
    rng = np.random.RandomState(11)
    hi = 256 if dtype == np.uint8 else 65536
    arr = rng.randint(0, hi, size=shape).astype(dtype)
    out = codec.decode_png(codec.encode_png(arr, interlace=interlace))
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, arr)


def test_png_adam7_pass_grid_partitions():
    """The 7 passes tile every pixel exactly once, any dims."""
    for w, h in [(1, 1), (8, 8), (17, 13), (9, 7), (3, 2), (2, 3), (16, 1)]:
        cnt = np.zeros((h, w), int)
        for x0, y0, dx, dy, pw, ph in codec._adam7_dims(w, h):
            cnt[y0::dy, x0::dx] += 1
        assert (cnt == 1).all(), (w, h)


def test_png_interlaced_matches_straight():
    """Same pixels through both layouts decode identically."""
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 65536, size=(31, 23)).astype(np.uint16)
    a = codec.decode_png(codec.encode_png(arr, interlace=False))
    b = codec.decode_png(codec.encode_png(arr, interlace=True))
    np.testing.assert_array_equal(a, b)


def test_png_16bit_byte_order_is_network():
    """Depth-16 samples are big-endian per the PNG spec: a crafted
    one-pixel stream with bytes 0x12 0x34 must decode to 0x1234."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png = (
        codec._PNG_SIG
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IDAT", zlib.compress(b"\x00\x12\x34"))
        + codec._chunk(b"IEND", b"")
    )
    assert codec.decode_png(png)[0, 0] == 0x1234


def test_png_interlaced_palette_rejected():
    """Sub-byte interlaced palettes stay out of scope — loud reject."""
    import struct

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 1)
    png = (
        codec._PNG_SIG
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        codec.decode_png(png)


def test_png_interlaced_bomb_guard():
    """The inflate cap uses the per-pass expected size: oversized pixel
    data in an interlaced stream still rejects."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    png = (
        codec._PNG_SIG
        + codec._chunk(b"IHDR", ihdr)
        + codec._chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + codec._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        codec.decode_png(png)


def test_render_dem16_closed_form():
    """render_dem16 sums match the oracle's separable formulas."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import render_dem16

    for pk, w, h in [(1, 200, 200), (7, 237, 411), (42, 1001, 353)]:
        a = render_dem16(pk, w, h).astype(np.int64)
        assert a.max() <= 52176 and a.min() >= 1000
        y = np.arange(h, dtype=np.int64)
        x = np.arange(w, dtype=np.int64)
        syy = ((y * 7 + pk) % 97).sum()
        sxx = ((x * 13 + pk) % 89).sum()
        syy_w = (y * ((y * 7 + pk) % 97)).sum()
        sxx_w = (x * ((x * 13 + pk) % 89)).sum()
        assert a.sum() == 512 * w * syy + 23 * h * sxx + 1000 * w * h
        assert (a * y[:, None]).sum() == 512 * w * syy_w + (23 * sxx + 1000 * w) * (h * (h - 1) // 2)
        assert (a * x[None, :]).sum() == 23 * h * sxx_w + (512 * syy + 1000 * h) * (w * (w - 1) // 2)
