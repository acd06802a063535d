"""From-scratch TIFF/GeoTIFF codec (sources/codec_tiff.py).

Covers the reference's native raster format (GDAL GeoTIFF,
/root/reference/src/io.py:41-90): strip + tile organisation, both byte
orders, all four supported compressions with/without the horizontal
predictor, 8/16-bit samples, WhiteIsZero inversion, the GeoTIFF
geotransform tags, and the malformed-stream contract (bounded
allocation, ValueError/NotImplementedError only).
"""

import struct

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import (
    codec,
    codec_tiff as T,
)

RNG = np.random.default_rng(42)


# ------------------------------------------------------------- LZW core
def test_lzw_known_vector():
    """Hand-packed bitstream for input 7x5: codes 256,7,258,258,257 at
    9 bits MSB-first (the 258 re-use exercises the KwKwK decode path)."""
    data = bytes([7, 7, 7, 7, 7])
    enc = T.lzw_encode(data)
    assert enc.hex() == "8001e0502808"
    assert T.lzw_decode(enc, len(data)) == data


def test_lzw_width_changes_and_clear():
    """Incompressible input grows the table through the 511/1023/2047
    early-change boundaries and past the 4094 writer reset."""
    blob = RNG.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
    assert T.lzw_decode(T.lzw_encode(blob), len(blob)) == blob


def test_lzw_decode_rejects_garbage():
    with pytest.raises(ValueError):
        T.lzw_decode(b"\xff\xff\xff\xff", 100)  # code beyond table
    with pytest.raises(ValueError):
        T.lzw_decode(b"\x80\x00", 100)  # ends without EOI


def test_packbits_roundtrip():
    blob = b"\x00" * 300 + bytes(range(256)) + b"\xaa" * 5
    assert T.packbits_decode(T.packbits_encode(blob), len(blob)) == blob


# --------------------------------------------------------- round-trips
@pytest.mark.parametrize("comp", ["none", "deflate", "packbits", "lzw"])
@pytest.mark.parametrize("pred", [False, True])
def test_roundtrip_matrix(comp, pred):
    for shape, dt in [
        ((37, 53), np.uint8),
        ((37, 53, 3), np.uint8),
        ((20, 31, 4), np.uint8),
        ((37, 53), np.uint16),
    ]:
        arr = RNG.integers(0, np.iinfo(dt).max + 1, size=shape, dtype=dt)
        out = T.decode_tiff(T.encode_tiff(arr, compression=comp, predictor=pred))
        assert out.shape == arr.shape and out.dtype == arr.dtype
        assert (out == arr).all()


def test_multi_strip_large_mask():
    """>1 strip (256 KiB strip target) over a mask-like low-entropy image."""
    m = np.zeros((1000, 1500, 3), np.uint8)
    m[100:400, 200:900] = (220, 210, 200)
    blob = T.encode_tiff(m)
    # strip layout really engaged: 1000 rows at 4500 B/row >> 256 KiB
    assert (T.decode_tiff(blob) == m).all()


def test_codec_dispatch_tif():
    arr = RNG.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    blob = codec.encode(arr, "tif")
    assert (codec.decode(blob, "tif", 40, 30) == arr).all()
    assert (codec.decode(blob, "tiff", 40, 30) == arr).all()


# ------------------------------------------- hand-built foreign layouts
def _be_tiled_gray(img: np.ndarray, tw: int = 16, th: int = 16) -> bytes:
    """Minimal BIG-ENDIAN tiled writer (decode-only coverage: our encoder
    emits little-endian strips, real GeoTIFFs are frequently MM/tiled)."""
    h, w = img.shape
    ntx, nty = -(-w // tw), -(-h // th)
    tiles = []
    for ty in range(nty):
        for tx in range(ntx):
            t = np.zeros((th, tw), np.uint8)
            ch = min(th, h - ty * th)
            cw = min(tw, w - tx * tw)
            t[:ch, :cw] = img[ty * th : ty * th + ch, tx * tw : tx * tw + cw]
            tiles.append(t.tobytes())
    offs, pos = [], 8
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    ifd_off = pos
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 8),
        (259, 3, 1, 1),
        (262, 3, 1, 1),
        (277, 3, 1, 1),
        (322, 4, 1, tw),
        (323, 4, 1, th),
    ]
    n_inline = len(entries) + 2  # + tile offsets/counts arrays
    arrays_off = ifd_off + 2 + 12 * n_inline + 4
    out = bytearray(b"MM\x00\x2a" + struct.pack(">I", ifd_off))
    for t in tiles:
        out += t
    packed = []
    for tag, typ, cnt, val in entries:
        fmt = ">I" if typ == 4 else ">HH"
        vraw = struct.pack(">I", val) if typ == 4 else struct.pack(">H2x", val)
        packed.append(struct.pack(">HHI", tag, typ, cnt) + vraw)
    packed.append(
        struct.pack(">HHI", 324, 4, len(tiles)) + struct.pack(">I", arrays_off)
    )
    packed.append(
        struct.pack(">HHI", 325, 4, len(tiles))
        + struct.pack(">I", arrays_off + 4 * len(tiles))
    )
    packed.sort(key=lambda e: struct.unpack(">H", e[:2])[0])
    out += struct.pack(">H", len(packed)) + b"".join(packed)
    out += struct.pack(">I", 0)
    out += struct.pack(f">{len(tiles)}I", *offs)
    out += struct.pack(f">{len(tiles)}I", *[len(t) for t in tiles])
    return bytes(out)


def test_big_endian_tiled_decode():
    img = RNG.integers(0, 256, (18, 21), dtype=np.uint8)
    assert (T.decode_tiff(_be_tiled_gray(img)) == img).all()


def test_white_is_zero_inversion():
    """Photometric 0 means 0=white: decoded values must invert."""
    img = RNG.integers(0, 256, (10, 12), dtype=np.uint8)
    blob = bytearray(T.encode_tiff(img, compression="none"))
    # our writer emits photometric tag 262 value 1; flip it to 0 in place
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 262:
            blob[e + 8 : e + 10] = struct.pack("<H", 0)
    assert (T.decode_tiff(bytes(blob)) == 255 - img).all()


# ------------------------------------------------------------- GeoTIFF
def test_geotiff_geodata_roundtrip():
    img = np.zeros((200, 300), np.uint8)
    blob = T.encode_tiff(img, geo=(420.0, 3990.0, 0.1, -0.1, "SYNTH:METRIC"))
    g = T.geotiff_geodata(blob)
    assert g == {
        "ulx": 420.0,
        "uly": 3990.0,
        "sx": 0.1,
        "sy": -0.1,
        "w": 300,
        "h": 200,
        "crs": "SYNTH:METRIC",
    }
    assert (T.decode_tiff(blob) == img).all()


def test_geotiff_tiepoint_offset_corner():
    """A tiepoint anchored away from (0,0) still solves to the UL corner."""
    img = np.zeros((8, 8), np.uint8)
    blob = bytearray(T.encode_tiff(img, geo=(100.0, 50.0, 0.5, -0.5, "X")))
    # rewrite the tiepoint to anchor raster (4, 6) instead of (0, 0)
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 33922:
            (off,) = struct.unpack("<I", blob[e + 8 : e + 12])
            struct.pack_into(
                "<6d", blob, off, 4.0, 6.0, 0.0, 100.0 + 4 * 0.5, 50.0 - 6 * 0.5, 0.0
            )
    g = T.geotiff_geodata(bytes(blob))
    assert g["ulx"] == 100.0 and g["uly"] == 50.0


def test_geo_requires_negative_sy():
    with pytest.raises(ValueError, match="sy"):
        T.encode_tiff(np.zeros((4, 4), np.uint8), geo=(0.0, 0.0, 0.1, 0.1, "X"))


def test_geodata_missing_tags_raises():
    with pytest.raises(ValueError, match="georeference"):
        T.geotiff_geodata(T.encode_tiff(np.zeros((4, 4), np.uint8)))


# ------------------------------------------------- capability boundary
def test_unsupported_variants_raise_notimplemented():
    base = T.encode_tiff(np.zeros((6, 6), np.uint8), compression="none")

    def patched(tag, val):
        blob = bytearray(base)
        ifd_off = struct.unpack("<I", blob[4:8])[0]
        (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            if struct.unpack("<H", blob[e : e + 2])[0] == tag:
                blob[e + 8 : e + 10] = struct.pack("<H", val)
        return bytes(blob)

    with pytest.raises(ValueError):
        T.decode_tiff(b"II\x2c\x00" + base[4:])  # unknown magic 44
    with pytest.raises(NotImplementedError):
        T.decode_tiff(patched(259, 6))  # old-style JPEG
    with pytest.raises(ValueError):
        # compression 7 is supported, but the raw strip is not a JPEG
        T.decode_tiff(patched(259, 7))
    with pytest.raises(NotImplementedError):
        T.decode_tiff(patched(262, 3))  # palette
    with pytest.raises(NotImplementedError):
        T.decode_tiff(patched(258, 1))  # bilevel
    with pytest.raises(NotImplementedError):
        T.decode_tiff(patched(339, 3))  # float samples
    # planar (284=2) decodes for real since r5 — on a single-band image
    # it is layout-identical to chunky (tests/test_tiff_planar.py covers
    # the real multi-plane paths; only invalid values reject)
    with pytest.raises(ValueError):
        T.decode_tiff(patched(284, 3))

    pred_base = T.encode_tiff(np.zeros((6, 6), np.uint8), compression="deflate")
    blob = bytearray(pred_base)
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 317:
            blob[e + 8 : e + 10] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="predictor 3 on integer"):
        T.decode_tiff(bytes(blob))  # float predictor on int samples


# ------------------------------------------------ malformed / hostile
def test_lying_dims_never_allocate():
    """A forged 2^30 x 2^30 header must fail the size cap, not allocate."""
    blob = bytearray(T.encode_tiff(np.zeros((6, 6), np.uint8)))
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] in (256, 257):
            blob[e + 8 : e + 12] = struct.pack("<I", 1 << 30)
    with pytest.raises(ValueError, match="cap"):
        T.decode_tiff(bytes(blob))


def test_deflate_bomb_capped():
    """A strip inflating past the declared rows*width size must raise
    (capped inflate), not expand a hostile high-ratio stream."""
    import zlib

    img = np.zeros((4, 4), np.uint8)
    blob = bytearray(T.encode_tiff(img, compression="deflate", predictor=False))
    bomb = zlib.compress(b"\x00" * (1 << 20), 9)
    # graft the bomb as strip 0's bytes (offsets point past the original
    # data; counts lie accordingly)
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    grafted = bytes(blob) + bomb
    g = bytearray(grafted)
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", g[e : e + 2])[0]
        if tag == 273:
            g[e + 8 : e + 12] = struct.pack("<I", len(blob))
        elif tag == 279:
            g[e + 8 : e + 12] = struct.pack("<I", len(bomb))
    with pytest.raises(ValueError):
        T.decode_tiff(bytes(g))


def test_truncated_and_flipped_raise_cleanly():
    arr = RNG.integers(0, 256, (25, 30, 3), dtype=np.uint8)
    for comp in ("none", "deflate", "packbits", "lzw"):
        blob = T.encode_tiff(arr, compression=comp)
        for cut in range(0, len(blob), max(1, len(blob) // 37)):
            try:
                T.decode_tiff(blob[:cut])
            except (ValueError, NotImplementedError):
                pass
        rng = np.random.default_rng(cut)
        for _ in range(40):
            mut = bytearray(blob)
            for _ in range(int(rng.integers(1, 8))):
                mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
            try:
                T.decode_tiff(bytes(mut))
            except (ValueError, NotImplementedError):
                pass


def _flip_tag_type(blob: bytes, tag: int, new_type: int) -> bytes:
    """Rewrite one IFD entry's type field in a little-endian classic
    TIFF produced by encode_tiff (header at 0, IFD offset at byte 4)."""
    mut = bytearray(blob)
    (ifd,) = struct.unpack("<I", mut[4:8])
    (n,) = struct.unpack("<H", mut[ifd : ifd + 2])
    for i in range(n):
        e = ifd + 2 + 12 * i
        (t,) = struct.unpack("<H", mut[e : e + 2])
        if t == tag:
            mut[e + 2 : e + 4] = struct.pack("<H", new_type)
            return bytes(mut)
    raise AssertionError(f"tag {tag} not in IFD")


@pytest.mark.parametrize("tag", [258, 273, 279, 322, 323])
def test_type_flipped_numeric_tags_raise_valueerror(tag):
    """A hostile type flip on ARRAY-valued numeric tags (BitsPerSample,
    strip offsets/counts) must fail as ValueError — float elements would
    otherwise TypeError out of bytes slicing / np.dtype arithmetic,
    escaping the ROW_ERRORS quarantine contract."""
    arr = RNG.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    blob = T.encode_tiff(arr, compression="none")
    try:
        mut = _flip_tag_type(blob, tag, 5)  # RATIONAL -> float values
    except AssertionError:
        pytest.skip(f"encoder does not emit tag {tag} for strip layout")
    with pytest.raises((ValueError, NotImplementedError)):
        T.decode_tiff(mut)


def test_type_flipped_tile_offsets_raise_valueerror():
    arr = RNG.integers(0, 256, (48, 48), dtype=np.uint8)
    blob = T.encode_tiff(arr, tiling=(16, 16))
    for tag in (324, 325):
        mut = _flip_tag_type(blob, tag, 5)
        with pytest.raises((ValueError, NotImplementedError)):
            T.decode_tiff(mut)


# ------------------------------------------- raster-directory ingest
def test_load_raster_dir(spark, tmp_path):
    """binaryFile ingest of a GeoTIFF folder -> images-shaped table:
    the reference's walk + read_tif on-ramp (io.py:10-63), ext filter
    pushed to the file listing, tag-only parse (no pixel decode)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.catalog import (
        load_raster_dir,
    )

    imgs = {}
    for i in range(4):
        arr = RNG.integers(0, 256, (20 + i, 30 + i), dtype=np.uint8)
        geo = (
            (100.0 * i, 50.0 * i, 0.1, -0.1, "SYNTH:METRIC")
            if i % 2 == 0
            else None
        )
        (tmp_path / f"img_{i}.tif").write_bytes(T.encode_tiff(arr, geo=geo))
        imgs[f"img_{i}"] = (arr, geo)
    (tmp_path / "notes.txt").write_bytes(b"not a raster")  # ext-filtered out

    df = load_raster_dir(spark, str(tmp_path)).orderBy("image_id")
    rows = df.collect()
    assert [r.image_id for r in rows] == sorted(imgs)
    for r in rows:
        arr, geo = imgs[r.image_id]
        assert (r.h, r.w) == arr.shape and r.fmt == "tif"
        assert r.caption is None and r.phash is None
        assert (T.decode_tiff(bytes(r.bytes)) == arr).all()
        if geo:
            assert (r.ulx, r.uly, r.sx, r.sy, r.crs) == geo
        else:
            assert r.ulx is None and r.crs is None


def test_load_raster_dir_on_error_skip(spark, tmp_path):
    (tmp_path / "good.tif").write_bytes(
        T.encode_tiff(np.zeros((8, 8), np.uint8))
    )
    (tmp_path / "bad.tif").write_bytes(b"II\x2a\x00hostile")
    import pytest as _pt

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.catalog import (
        load_raster_dir,
    )

    got = load_raster_dir(spark, str(tmp_path), on_error="skip").collect()
    assert [r.image_id for r in got] == ["good"]
    with _pt.raises(Exception, match="malformed|truncated|IFD"):
        load_raster_dir(spark, str(tmp_path)).collect()


def test_tiled_encode_roundtrip():
    """tiling=(tw, th) writes tile organisation (322-325); the decoder's
    tile-assembly path reconstructs edge-cropped content exactly."""
    for shape in [(100, 130, 3), (64, 64), (33, 47)]:
        arr = RNG.integers(0, 256, shape, dtype=np.uint8)
        for comp in ("none", "deflate", "lzw"):
            blob = T.encode_tiff(arr, compression=comp, tiling=(32, 16))
            assert (T.decode_tiff(blob) == arr).all(), (shape, comp)
    # u16 single band too
    a16 = RNG.integers(0, 1 << 16, (40, 50), dtype=np.uint16)
    assert (T.decode_tiff(T.encode_tiff(a16, tiling=(16, 16))) == a16).all()


def test_tiled_encode_rejects_bad_tile_dims():
    with pytest.raises(ValueError, match="multiples of 16"):
        T.encode_tiff(np.zeros((8, 8), np.uint8), tiling=(10, 16))


# ------------------------------------------- multi-IFD overview chains
def test_overviews_roundtrip_and_geo():
    """encode_tiff_overviews writes IFD 0 + N reduced-resolution IFDs:
    each level decodes to the nearest-2x downsample, the geotransform
    pixel size doubles per level, and the model-space footprint is
    level-invariant (same map extent at every zoom)."""
    m = np.zeros((600, 500), np.uint8)
    m[37:251, 102:346] = 255
    blob = T.encode_tiff_overviews(
        m, n_overviews=3, geo=(420.0, 3990.0, 0.1, -0.1, "SYNTH:METRIC")
    )
    assert T.ifd_count(blob) == 4
    cur = m
    for i in range(4):
        lvl = T.decode_tiff(blob, ifd=i)
        assert (lvl == cur).all(), i
        g = T.geotiff_geodata(blob, ifd=i)
        assert g["sx"] == 0.1 * (1 << i) and g["sy"] == -0.1 * (1 << i)
        # footprint invariance to within one coarse pixel (odd dims
        # ceil-round when halved, exactly like GDAL overviews)
        assert g["ulx"] == 420.0 and g["uly"] == 3990.0
        assert abs(g["w"] * g["sx"] - 50.0) <= g["sx"]
        cur = cur[::2, ::2]


def test_overviews_plain_reader_sees_full_res():
    """A reader unaware of the chain (ifd=0 default) gets the full-res
    raster — overview IFDs are purely additive."""
    arr = RNG.integers(0, 256, (70, 90, 3), dtype=np.uint8)
    blob = T.encode_tiff_overviews(arr, n_overviews=2)
    assert (T.decode_tiff(blob) == arr).all()
    assert (codec.decode(blob, "tif", 90, 70) == arr).all()


def test_ifd_chain_cycle_guard():
    """A forged next-IFD pointer looping back on itself must raise, not
    walk forever."""
    blob = bytearray(T.encode_tiff_overviews(np.zeros((40, 40), np.uint8), 1))
    ifd0 = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd0 : ifd0 + 2])
    nxt_at = ifd0 + 2 + 12 * n
    struct.pack_into("<I", blob, nxt_at, ifd0)  # 0 -> 0 cycle
    with pytest.raises(ValueError, match="cycle"):
        T.decode_tiff(bytes(blob), ifd=5)


def test_ifd_out_of_range_raises():
    blob = T.encode_tiff(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="absent"):
        T.decode_tiff(blob, ifd=1)


# --------------------------------------------------- float DEM rasters
def test_float_dem_roundtrip():
    """GDAL DEMs are float rasters and the reference's read_tif works in
    float64 (io.py:41-63): SampleFormat=3 single-band encode/decode,
    bit-exact incl. NaN payloads (deflate/lzw engage the TechNote 3
    floating-point predictor, byte-level and therefore lossless)."""
    for dt in (np.float32, np.float64):
        dem = (
            100.0 * np.sin(np.arange(60)[:, None] * 0.1)
            + np.arange(80)[None, :] * 0.25
        ).astype(dt)
        dem[3, 7] = np.nan  # nodata as NaN must survive verbatim
        for comp in ("none", "deflate", "lzw", "packbits"):
            out = T.decode_tiff(T.encode_tiff(dem, compression=comp))
            assert out.dtype == dt
            np.testing.assert_array_equal(out, dem)
    # geo + tiled float works too
    dem32 = np.linspace(0, 500, 64 * 48, dtype=np.float32).reshape(48, 64)
    blob = T.encode_tiff(
        dem32, tiling=(32, 16), geo=(0.0, 100.0, 0.5, -0.5, "X")
    )
    np.testing.assert_array_equal(T.decode_tiff(blob), dem32)
    assert T.geotiff_geodata(blob)["sx"] == 0.5


def test_float_predictor2_rejected():
    """A stream claiming horizontal differencing over float samples is
    malformed (predictor 2 is integer-only)."""
    blob = bytearray(T.encode_tiff(np.zeros((8, 8), np.float32), predictor=False))
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    entries = [
        struct.pack("<HHI", 317, 3, 1) + struct.pack("<H2x", 2)
    ]
    # easiest forgery: rewrite tag 284 (chunky, value 1) into 317=2
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 284:
            blob[e : e + 12] = entries[0]
    with pytest.raises(ValueError, match="predictor 2 on float"):
        T.decode_tiff(bytes(blob))


# ------------------------------------------------------------- BigTIFF
def test_bigtiff_roundtrip_all_compressions():
    """BigTIFF (magic 43, 8-byte offsets, 20-byte entries): the layout
    any >4 GiB GeoTIFF mosaic ships in.  Same decode path, same pixels."""
    for shape, dt in [((37, 53, 3), np.uint8), ((40, 30), np.uint16)]:
        arr = RNG.integers(0, np.iinfo(dt).max + 1, size=shape, dtype=dt)
        for comp in ("none", "deflate", "packbits", "lzw"):
            blob = T.encode_tiff(arr, compression=comp, bigtiff=True)
            assert blob[:4] == b"II+\x00"
            out = T.decode_tiff(blob)
            assert out.dtype == arr.dtype and (out == arr).all(), comp


def test_bigtiff_geo_overviews_and_tiling():
    m = np.zeros((300, 400), np.uint8)
    m[50:120, 80:310] = 255
    blob = T.encode_tiff_overviews(
        m, n_overviews=2, geo=(0.0, 30.0, 0.1, -0.1, "SYNTH:METRIC"),
        bigtiff=True,
    )
    assert blob[:4] == b"II+\x00"
    assert T.ifd_count(blob) == 3
    assert (T.decode_tiff(blob) == m).all()
    assert (T.decode_tiff(blob, ifd=2) == m[::4, ::4]).all()
    g = T.geotiff_geodata(blob, ifd=2)
    assert g["sx"] == pytest.approx(0.4) and g["crs"] == "SYNTH:METRIC"


def test_bigtiff_lying_count_refused_early():
    """A 64-bit tag count claiming more values than the file holds must
    raise before any allocation proportional to it."""
    blob = bytearray(T.encode_tiff(np.zeros((8, 8), np.uint8), bigtiff=True))
    ifd_off = struct.unpack("<Q", blob[8:16])[0]
    (n,) = struct.unpack("<Q", blob[ifd_off : ifd_off + 8])
    for i in range(n):
        e = ifd_off + 8 + 20 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 258:  # BitsPerSample
            struct.pack_into("<Q", blob, e + 4, 1 << 40)
    with pytest.raises(ValueError, match="count exceeds"):
        T.decode_tiff(bytes(blob))


def test_bigtiff_bad_offset_size_rejected():
    blob = bytearray(T.encode_tiff(np.zeros((8, 8), np.uint8), bigtiff=True))
    blob[4] = 4  # offset size must be 8
    with pytest.raises(ValueError, match="offset size"):
        T.decode_tiff(bytes(blob))


# ------------------------------------------------------ property-based
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 70),
    st.integers(1, 70),
    st.sampled_from([1, 3, 4]),
    st.sampled_from(["none", "deflate", "packbits", "lzw"]),
    st.booleans(),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_property_roundtrip(w, h, c, comp, pred, big, seed):
    """Any uint8 raster survives encode->decode bit-exactly across the
    full compression x predictor x BigTIFF matrix (tiling drawn when the
    raster is large enough)."""
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, c) if c > 1 else (h, w), dtype=np.uint8)
    blob = T.encode_tiff(
        arr, compression=comp, predictor=pred, bigtiff=big,
        tiling=(16, 16) if (w > 16 and h > 16 and seed % 2) else None,
    )
    out = T.decode_tiff(blob)
    assert out.shape == arr.shape and (out == arr).all()


# ------------------------------------------------------- JPEG-in-TIFF
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import (  # noqa: E402
    codec_jpeg as J,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _photo_like(shape, seed=3):
    """Low-frequency gradient + mild noise: a realistic aerial-photo
    stand-in (pure noise would make PSNR meaningless for any lossy fmt)."""
    rng = np.random.default_rng(seed)
    h, w = shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 199.0 / max(w - 1, 1) + yy * 56.0 / max(h - 1, 1)) / 2
    img = base + rng.normal(0, 3, (h, w))  # luma noise, not chroma noise
    img = np.clip(img, 0, 255).astype(np.uint8)
    if len(shape) > 2:
        img = np.stack([img, np.clip(img + 12, 0, 255), img // 2], axis=-1)
    return img


def test_jpeg_strip_rgb_roundtrip_psnr_and_geo():
    rgb = _photo_like((45, 62, 3))
    geo = (500000.0, 4100000.0, 0.5, -0.5, "EPSG:32643")
    blob = T.encode_tiff(rgb, compression="jpeg", geo=geo, rows_per_strip=16)
    out = T.decode_tiff(blob)
    assert out.shape == rgb.shape and out.dtype == np.uint8
    assert _psnr(rgb, out) >= 40.0
    g = T.geotiff_geodata(blob)
    assert (g["ulx"], g["uly"], g["sx"], g["sy"]) == geo[:4]
    assert g["crs"] == "EPSG:32643"


def test_jpeg_single_strip_matches_jpeg_codec_exactly():
    """One strip == one baseline stream: decode_tiff must equal the JPEG
    codec's own decode of the same pixels (shared implementation)."""
    rgb = _photo_like((40, 56, 3))
    blob = T.encode_tiff(rgb, compression="jpeg", rows_per_strip=40)
    ref = J.decode_jpeg(J.encode_jpeg(rgb, quality=95))
    assert np.array_equal(T.decode_tiff(blob), ref)


def test_jpeg_tiled_matches_per_tile_oracle():
    """Tiled decode == independently assembling per-(padded-)tile
    encode/decode through the JPEG codec (exact, incl. edge tiles)."""
    rgb = _photo_like((45, 70, 3), seed=9)
    blob = T.encode_tiff(rgb, compression="jpeg", tiling=(32, 32))
    out = T.decode_tiff(blob)
    h, w = rgb.shape[:2]
    exp = np.zeros_like(rgb)
    for ty in range(-(-h // 32)):
        for tx in range(-(-w // 32)):
            t = np.zeros((32, 32, 3), np.uint8)
            ch, cw = min(32, h - ty * 32), min(32, w - tx * 32)
            t[:ch, :cw] = rgb[ty * 32 : ty * 32 + ch, tx * 32 : tx * 32 + cw]
            dec = J.decode_jpeg(J.encode_jpeg(t, quality=95))
            exp[ty * 32 : ty * 32 + ch, tx * 32 : tx * 32 + cw] = dec[:ch, :cw]
    assert np.array_equal(out, exp)


def test_jpeg_gray_and_overviews():
    g = _photo_like((64, 48))
    blob = T.encode_tiff(g, compression="jpeg", rows_per_strip=16)
    out = T.decode_tiff(blob)
    assert out.shape == g.shape and _psnr(g, out) >= 40.0
    ov = T.encode_tiff_overviews(g, n_overviews=2, compression="jpeg", tiling=None)
    assert T.ifd_count(ov) == 3
    assert T.decode_tiff(ov, ifd=2).shape == (16, 12)


def _split_jpeg_tables(stream: bytes):
    """Split a standalone baseline stream into (tables-stream, abbreviated
    stream): DQT/DHT hoisted out, everything else kept in order."""
    assert stream[:2] == b"\xff\xd8"
    pos, tables, rest = 2, b"", bytearray(b"\xff\xd8")
    while pos < len(stream):
        assert stream[pos] == 0xFF
        m = stream[pos + 1]
        if m == 0xDA:  # SOS: entropy-coded tail, keep whole
            rest += stream[pos:]
            break
        ln = int.from_bytes(stream[pos + 2 : pos + 4], "big")
        seg = stream[pos : pos + 2 + ln]
        if m in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        pos += 2 + ln
    return b"\xff\xd8" + tables + b"\xff\xd9", bytes(rest)


def test_jpeg_tables_tag_spliced():
    """Hand-assembled grayscale TIFF with shared JPEGTables (tag 347,
    type UNDEFINED) + an abbreviated strip: must decode identically to
    the standalone stream (TechNote 2 JPEGTables layout)."""
    g = _photo_like((24, 40))
    standalone = J.encode_jpeg(g, quality=90)
    tables, abbrev = _split_jpeg_tables(standalone)
    assert len(abbrev) < len(standalone)

    seg_off = 8
    tab_off = seg_off + len(abbrev) + (len(abbrev) & 1)
    ifd_off = tab_off + len(tables) + (len(tables) & 1)
    entries = [
        (256, 4, 1, struct.pack("<I", 40)),
        (257, 4, 1, struct.pack("<I", 24)),
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 7, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 1, struct.pack("<I", seg_off)),
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 4, 1, struct.pack("<I", 24)),
        (279, 4, 1, struct.pack("<I", len(abbrev))),
        (347, 7, len(tables), struct.pack("<I", tab_off)),
    ]
    blob = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    blob += abbrev + b"\x00" * (len(abbrev) & 1)
    blob += tables + b"\x00" * (len(tables) & 1)
    blob += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        blob += struct.pack("<HHI", tag, typ, cnt) + val
    blob += struct.pack("<I", 0)

    out = T.decode_tiff(bytes(blob))
    assert np.array_equal(out, J.decode_jpeg(standalone))

    # malformed JPEGTables (no SOI/EOI framing) must raise cleanly
    bad = bytearray(blob)
    bad[tab_off : tab_off + 2] = b"\x00\x00"
    with pytest.raises(ValueError, match="JPEGTables"):
        T.decode_tiff(bytes(bad))


def test_jpeg_encode_validation():
    with pytest.raises(ValueError, match="uint8"):
        T.encode_tiff(np.zeros((8, 8), np.uint16), compression="jpeg")
    with pytest.raises(ValueError, match="samples"):
        T.encode_tiff(np.zeros((8, 8, 4), np.uint8), compression="jpeg")


def test_jpeg_quality_knob_changes_size():
    rgb = _photo_like((48, 48, 3), seed=11)
    hi = T.encode_tiff(rgb, compression="jpeg", jpeg_quality=95)
    lo = T.encode_tiff(rgb, compression="jpeg", jpeg_quality=30)
    assert len(lo) < len(hi)
    assert _psnr(rgb, T.decode_tiff(lo)) >= 25.0  # still an image


def test_undefined_type_tag_is_carried_not_fatal():
    """A type-7 (UNDEFINED) tag such as XMP (700) must parse as opaque
    bytes, not crash the IFD walk (regression: _TYPE_FMT had no entry)."""
    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    base = T.encode_tiff(g, compression="none")
    ifd_off = struct.unpack("<I", base[4:8])[0]
    (n,) = struct.unpack("<H", base[ifd_off : ifd_off + 2])
    body, tail = base[: ifd_off + 2 + 12 * n], base[ifd_off + 2 + 12 * n :]
    extra = struct.pack("<HHI", 700, 7, 3) + b"xm\x00\x00"
    patched = (
        base[:ifd_off]
        + struct.pack("<H", n + 1)
        + body[ifd_off + 2 :]
        + extra
        + tail
    )
    assert np.array_equal(T.decode_tiff(patched), g)


# ------------------------------------- float predictor 3 / EPSG GeoKey
def test_float_predictor3_roundtrip_and_tag():
    """deflate/lzw float rasters engage the TechNote 3 predictor: tag
    317=3 on the wire, bit-exact round-trip (NaN payloads included),
    and the predicted stream deflates smaller on smooth DEM data."""
    dem = (
        100.0 * np.sin(np.arange(120)[:, None] * 0.05)
        + np.arange(90)[None, :] * 0.25
    ).astype(np.float32)
    dem[5, 9] = np.nan
    for comp in ("deflate", "lzw"):
        blob = T.encode_tiff(dem, compression=comp)
        tags, _ = T._read_ifd(blob)
        assert tags[317][1] == [3]
        np.testing.assert_array_equal(T.decode_tiff(blob), dem)
    flat = T.encode_tiff(dem, compression="deflate", predictor=False)
    pred = T.encode_tiff(dem, compression="deflate", predictor=True)
    assert len(pred) < len(flat)
    # float64 + tiled organisation too
    dem64 = dem.astype(np.float64)[:64, :64]
    blob = T.encode_tiff(dem64, compression="deflate", tiling=(32, 32))
    np.testing.assert_array_equal(T.decode_tiff(blob), dem64)


def test_float_predictor3_foreign_bigendian():
    """A big-endian (MM) file with predictor 3 must decode to the same
    values: the byte planes are MSB-first regardless of byte order."""
    dem = np.linspace(-50, 300, 24 * 17, dtype=np.float32).reshape(24, 17)
    blob = bytearray(T.encode_tiff(dem, compression="none"))
    # decode path only: simulate by hand-applying the predictor to a
    # fresh raw little-endian strip and flipping the predictor tag in
    raw = T._apply_predictor_float(dem)
    assert len(raw) == dem.nbytes
    # splice the predicted bytes over the original strip payload
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    strip_off = None
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 273:
            (strip_off,) = struct.unpack("<I", blob[e + 8 : e + 12])
    blob[strip_off : strip_off + len(raw)] = raw
    # append a predictor tag by rewriting 284 (chunky=1, default anyway)
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 284:
            blob[e : e + 12] = struct.pack("<HHI", 317, 3, 1) + struct.pack(
                "<H2x", 3
            )
    np.testing.assert_array_equal(T.decode_tiff(bytes(blob)), dem)


def test_epsg_geokey_written_and_resolved():
    img = np.zeros((8, 8), np.uint8)
    blob = T.encode_tiff(img, geo=(5e5, 4.1e6, 0.5, -0.5, "EPSG:32643"))
    tags, _ = T._read_ifd(blob)
    gk = tags[34735][1]
    keys = {gk[4 * k]: gk[4 * k + 3] for k in range(1, gk[3] + 1)}
    assert keys[1024] == 1 and keys[3072] == 32643  # projected CRS
    geo = (0.0, 50.0, 0.1, -0.1, "EPSG:4326")
    gk2 = T._read_ifd(T.encode_tiff(img, geo=geo))[0][34735][1]
    keys2 = {gk2[4 * k]: gk2[4 * k + 3] for k in range(1, gk2[3] + 1)}
    assert keys2[1024] == 2 and keys2[2048] == 4326  # geographic CRS
    # free-text crs: no CRS key, citation only
    gk3 = T._read_ifd(T.encode_tiff(img, geo=(0, 1, 1, -1, "SYNTH")))[0][34735][1]
    keys3 = {gk3[4 * k] for k in range(1, gk3[3] + 1)}
    assert 3072 not in keys3 and 2048 not in keys3


def test_epsg_resolved_when_citation_absent():
    """Foreign files often carry only the ProjectedCSType key: crs must
    resolve to EPSG:<code> when GeoAsciiParams is missing."""
    img = np.zeros((8, 8), np.uint8)
    blob = bytearray(T.encode_tiff(img, geo=(5e5, 4.1e6, 0.5, -0.5, "EPSG:32643")))
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 34737:
            blob[e : e + 2] = struct.pack("<H", 60000)  # hide the citation
    g = T.geotiff_geodata(bytes(blob))
    assert g["crs"] == "EPSG:32643"


# ------------------------------------------- windowed (COG-style) decode
@pytest.mark.parametrize("comp", ["none", "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("tiling", [None, (16, 16)])
def test_window_matches_full_slice(comp, tiling):
    """decode_tiff_window == full decode then numpy slice, for strips
    and tiles across every entropy coder, on windows that straddle
    segment boundaries."""
    img = RNG.integers(0, 255, (40, 56, 3), np.uint8)
    blob = T.encode_tiff(img, compression=comp, tiling=tiling, rows_per_strip=7)
    full = T.decode_tiff(blob)
    for win in [(0, 0, 56, 40), (5, 3, 20, 11), (13, 30, 43, 10), (55, 39, 1, 1)]:
        x0, y0, ww, wh = win
        got = T.decode_tiff_window(blob, x0, y0, ww, wh)
        np.testing.assert_array_equal(got, full[y0 : y0 + wh, x0 : x0 + ww])


def test_window_16bit_and_float_predictors():
    g16 = RNG.integers(0, 65535, (33, 21), np.uint16)
    b16 = T.encode_tiff(g16, compression="lzw", rows_per_strip=5)
    np.testing.assert_array_equal(
        T.decode_tiff_window(b16, 2, 9, 13, 17), g16[9:26, 2:15]
    )
    dem = RNG.normal(size=(32, 32)).astype(np.float32)
    bf = T.encode_tiff(dem, compression="deflate", tiling=(16, 16))
    np.testing.assert_array_equal(
        T.decode_tiff_window(bf, 10, 10, 12, 12), dem[10:22, 10:22]
    )


def test_window_decodes_only_intersecting_segments(monkeypatch):
    """The point of the COG path: a 16x16 window of a 64x64 tiled
    raster must entropy-decode exactly the 1 (aligned) or 4
    (straddling) tiles it touches, not all 16."""
    img = RNG.integers(0, 255, (64, 64), np.uint8)
    blob = T.encode_tiff(img, compression="deflate", tiling=(16, 16))
    calls = []
    real = T._decompress
    monkeypatch.setattr(T, "_decompress", lambda *a: calls.append(1) or real(*a))
    T.decode_tiff_window(blob, 16, 32, 16, 16)  # tile-aligned
    assert len(calls) == 1
    calls.clear()
    T.decode_tiff_window(blob, 8, 8, 16, 16)  # straddles 2x2 tiles
    assert len(calls) == 4
    calls.clear()
    T.decode_tiff(blob)
    assert len(calls) == 16


def test_window_strips_skip_nonintersecting(monkeypatch):
    img = RNG.integers(0, 255, (60, 8), np.uint8)
    blob = T.encode_tiff(img, compression="deflate", rows_per_strip=10)
    calls = []
    real = T._decompress
    monkeypatch.setattr(T, "_decompress", lambda *a: calls.append(1) or real(*a))
    T.decode_tiff_window(blob, 0, 25, 8, 10)  # rows 25..34 -> strips 2,3
    assert len(calls) == 2


def test_window_bounds_validation():
    blob = T.encode_tiff(np.zeros((10, 10), np.uint8))
    for bad in [(-1, 0, 2, 2), (0, -1, 2, 2), (9, 0, 2, 2), (0, 9, 2, 2),
                (0, 0, 0, 1), (0, 0, 1, 0), (0, 0, 11, 1)]:
        with pytest.raises(ValueError):
            T.decode_tiff_window(blob, *bad)


def test_window_white_is_zero_and_overview_ifd():
    img = RNG.integers(0, 255, (32, 32), np.uint8)
    blob = bytearray(T.encode_tiff(img, compression="none"))
    # flip photometric 1 -> 0 (WhiteIsZero)
    ifd_off = struct.unpack("<I", blob[4:8])[0]
    (n,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 262:
            blob[e + 8 : e + 12] = struct.pack("<I", 0)
    inv = T.decode_tiff_window(bytes(blob), 4, 4, 8, 8)
    np.testing.assert_array_equal(inv, 255 - img[4:12, 4:12])
    # overview chain: window against a reduced-res IFD
    ov = T.encode_tiff_overviews(img, n_overviews=1, compression="deflate")
    lvl1 = T.decode_tiff(ov, ifd=1)
    np.testing.assert_array_equal(
        T.decode_tiff_window(ov, 3, 2, 9, 7, ifd=1), lvl1[2:9, 3:12]
    )


def test_window_jpeg_tiled_matches_full():
    img = RNG.integers(0, 255, (48, 48, 3), np.uint8)
    blob = T.encode_tiff(img, compression="jpeg", tiling=(16, 16))
    full = T.decode_tiff(blob)
    got = T.decode_tiff_window(blob, 10, 20, 25, 17)
    np.testing.assert_array_equal(got, full[20:37, 10:35])
