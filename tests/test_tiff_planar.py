"""PlanarConfiguration=2 TIFF read/write (sources/codec_tiff.py, r5).

Planar files store each component's segments contiguously (all plane-0
strips/tiles, then plane 1, ...) — the layout GDAL writes under
INTERLEAVE=BAND.  Reference analogue: the GDAL-backed read_tif ingest
(/root/reference/src/io.py:41-63) accepts either interleave.
"""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_tiff as T


def _rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
def test_planar_strip_roundtrip(compression):
    a = _rgb(37, 53)
    blob = T.encode_tiff(a, compression=compression, planar=True)
    assert np.array_equal(T.decode_tiff(blob), a)


def test_planar_tiled_roundtrip():
    a = _rgb(70, 90, seed=9)
    blob = T.encode_tiff(a, compression="deflate", tiling=(32, 32), planar=True)
    assert np.array_equal(T.decode_tiff(blob), a)


def test_planar_rgba_roundtrip():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(25, 31, 4), dtype=np.uint8)
    blob = T.encode_tiff(a, compression="lzw", planar=True)
    assert np.array_equal(T.decode_tiff(blob), a)


def test_planar_predictor_roundtrip():
    # predictor 2 differences within each plane (spp=1 per segment)
    a = _rgb(41, 29, seed=11)
    blob = T.encode_tiff(a, compression="deflate", predictor=True, planar=True)
    assert np.array_equal(T.decode_tiff(blob), a)


def test_planar_matches_chunky():
    a = _rgb(33, 47, seed=13)
    chunky = T.decode_tiff(T.encode_tiff(a, planar=False))
    planar = T.decode_tiff(T.encode_tiff(a, planar=True))
    assert np.array_equal(chunky, planar)


def test_planar_window_read_strips():
    a = _rgb(64, 80, seed=17)
    blob = T.encode_tiff(a, compression="deflate", rows_per_strip=8, planar=True)
    win = T.decode_tiff_window(blob, 13, 21, 30, 25)
    assert np.array_equal(win, a[21:46, 13:43])


def test_planar_window_read_tiles():
    a = _rgb(96, 128, seed=19)
    blob = T.encode_tiff(a, compression="lzw", tiling=(32, 32), planar=True)
    win = T.decode_tiff_window(blob, 40, 50, 60, 30)
    assert np.array_equal(win, a[50:80, 40:100])


def test_planar_single_band_degrades_to_chunky():
    a = np.arange(30 * 20, dtype=np.uint8).reshape(30, 20)
    blob = T.encode_tiff(a, planar=True)
    # one band: planar flag is a no-op; tag 284 stays 1
    assert np.array_equal(T.decode_tiff(blob), a)


def test_planar_jpeg_rejected():
    with pytest.raises(ValueError):
        T.encode_tiff(_rgb(32, 32), compression="jpeg", planar=True)


def test_planar_jpeg_decode_guarded():
    # forge tag 284=2 onto a JPEG-compressed chunky file: the decoder
    # must name the capability boundary, not mis-assemble pixels
    blob = bytearray(T.encode_tiff(_rgb(32, 32), compression="jpeg"))
    idx = _find_tag(bytes(blob), 284)
    blob[idx + 8] = 2
    with pytest.raises(NotImplementedError):
        T.decode_tiff(bytes(blob))


def test_invalid_planar_value_rejected():
    blob = bytearray(T.encode_tiff(_rgb(16, 16)))
    idx = _find_tag(bytes(blob), 284)
    blob[idx + 8] = 3
    with pytest.raises(ValueError):
        T.decode_tiff(bytes(blob))


def _find_tag(data: bytes, tag: int) -> int:
    """Byte offset of a tag's 12-byte IFD entry (little-endian classic)."""
    import struct

    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        (t,) = struct.unpack("<H", data[e : e + 2])
        if t == tag:
            return e
    raise AssertionError(f"tag {tag} not found")
