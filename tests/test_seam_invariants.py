"""North-rule invariants: tile-boundary seams, tiled==direct pipeline,
caption/phash byte-identity through every shuffle, pixel equality through
slice/stitch round trip (input_hint per-row invariant)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import grid, raster
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.plans import pipeline
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

SF = "/root/testdata/sf0.001"
LIMIT = 15


@pytest.fixture(scope="module")
def imgs(spark):
    return IMG.images_table(spark, SF, fmt="png", kind="mask", limit=LIMIT).cache()


def test_slice_stitch_roundtrip_pixel_exact(spark, imgs):
    """S5 is the exact inverse of O2: stitched mosaic == original pixels."""
    stitched = raster.stitch_tiles(raster.slice_tiles(imgs))
    orig = {r["image_id"]: r for r in imgs.collect()}
    for r in stitched.collect():
        a = codec.decode(bytes(r["bytes"]), r["fmt"], r["w"], r["h"])
        o = orig[r["image_id"]]
        b = codec.decode(bytes(o["bytes"]), o["fmt"], o["w"], o["h"])
        np.testing.assert_array_equal(a, b, err_msg=r["image_id"])


def test_slice_tiles_enumeration_matches_gen_tiles(spark, imgs):
    """The Python-side grid enumeration inside slice_tiles (one Arrow hop per
    image, no bytes amplification) must agree with the JVM-side gen_tiles on
    every metadata column — same O1/O2/O8 closed forms, two implementations."""
    cols = ["image_id", "tile_id", "tiy", "tix", "off_x", "off_y", "tw", "th"]
    sliced = sorted(map(tuple, raster.slice_tiles(imgs).select(cols).collect()))
    enumerated = sorted(
        map(tuple, grid.gen_tiles(imgs, with_geo=False).select(cols).collect())
    )
    assert sliced == enumerated and len(sliced) > 0


def test_overlap_strip_identical_between_adjacent_tiles(spark, imgs):
    """Seam test: the 10-px overlap columns carry identical pixels in tile
    (tix) and tile (tix+1)."""
    tiles = raster.slice_tiles(imgs).collect()
    by_img = {}
    for t in tiles:
        by_img.setdefault(t["image_id"], {})[(t["tiy"], t["tix"])] = t
    checked = 0
    for grid_tiles in by_img.values():
        for (tiy, tix), t in grid_tiles.items():
            nb = grid_tiles.get((tiy, tix + 1))
            if nb is None:
                continue
            a = codec.decode(bytes(t["bytes"]), t["fmt"], t["tw"], t["th"])
            b = codec.decode(bytes(nb["bytes"]), nb["fmt"], nb["tw"], nb["th"])
            ov = t["off_x"] + t["tw"] - nb["off_x"]
            assert ov >= 10
            np.testing.assert_array_equal(a[:, -ov:], b[:, :ov])
            checked += 1
    assert checked > 3


def test_tiled_equals_direct_pipeline(spark, imgs):
    """Stitched-from-tiles path == whole-image path, row for row."""
    cols = ["image_id", "poly_id", "value", "area_m2", "ring"]
    tiled = {
        (r["image_id"], r["poly_id"]): (r["value"], r["area_m2"], r["ring"])
        for r in pipeline.mask_to_polygons(imgs, tiled=True).select(cols).collect()
    }
    direct = {
        (r["image_id"], r["poly_id"]): (r["value"], r["area_m2"], r["ring"])
        for r in pipeline.mask_to_polygons(imgs, tiled=False).select(cols).collect()
    }
    assert tiled == direct and len(tiled) > 0


def test_fused_equals_unfused_plan(spark, imgs):
    cols = ["image_id", "poly_id", "value", "area_m2"]
    a = sorted(
        map(tuple, pipeline.mask_to_polygons(imgs).select(cols).collect())
    )
    b = sorted(
        map(tuple, pipeline.mask_to_polygons_unfused(imgs).select(cols).collect())
    )
    assert a == b


def test_caption_phash_survive_shuffles(spark, imgs):
    """input_hint invariant: caption byte-equality + phash preservation
    through repartition/join/groupBy shuffles."""
    expected = {
        r["image_id"]: (r["caption"], r["phash"]) for r in imgs.collect()
    }
    shuffled = (
        imgs.repartition(7, "phash")
        .join(imgs.select("image_id", F.col("w").alias("w2")), "image_id")
        .groupBy("image_id", "caption", "phash")
        .agg(F.count("*").alias("n"))
    )
    got = {r["image_id"]: (r["caption"], r["phash"]) for r in shuffled.collect()}
    assert got == expected
    # unicode content actually present (caption carries non-ASCII)
    assert any("â" in c for c, _ in expected.values())


def test_decoded_pixels_exact_after_shuffle(spark, imgs):
    """Lossless fmt -> decoded pixels exactly equal after a shuffle
    (PSNR>=40dB degenerates to equality, FIXTURES.md §1)."""
    orig = {r["image_id"]: r["bytes"] for r in imgs.collect()}
    after = {
        r["image_id"]: r["bytes"]
        for r in imgs.repartition(5, "image_id").collect()
    }
    for iid, b in orig.items():
        assert bytes(after[iid]) == bytes(b)


def test_stitch_nodata_rule_identical_on_same_image_grids(spark, imgs):
    """The VRTNodata=-9999 skip (reference io.py:184-188) and the default
    unconditional later-tile-wins produce IDENTICAL mosaics when every tile
    comes from the same image — the documented deviation's safety claim."""
    tiles = raster.slice_tiles(imgs)
    plain = {
        r["image_id"]: bytes(r["bytes"])
        for r in raster.stitch_tiles(tiles).collect()
    }
    nodata = {
        r["image_id"]: bytes(r["bytes"])
        for r in raster.stitch_tiles(tiles, nodata=-9999).collect()
    }
    assert plain == nodata and len(plain) >= LIMIT


def test_stitch_canvas_nodata_skip_preserves_earlier_tile():
    """Direct kernel check: with nodata set, a later tile's nodata pixels do
    NOT clobber earlier data (BuildVRT semantics); without it they do."""
    import pandas as pd

    nd = 200  # uint8 stand-in for the reference's -9999 sentinel
    t0 = np.full((4, 4), 7, dtype=np.uint8)
    t1 = np.full((4, 4), nd, dtype=np.uint8)
    t1[0, 0] = 5
    pdf = pd.DataFrame(
        {
            "image_id": ["i", "i"],
            "bytes": [t0.tobytes(), t1.tobytes()],
            "fmt": ["raw", "raw"],
            "w": [6, 6], "h": [4, 4],
            "tiy": [1, 1], "tix": [1, 2],
            "off_x": [0, 2], "off_y": [0, 0],
            "tw": [4, 4], "th": [4, 4],
        }
    )
    skip, _, _ = raster._stitch_canvas(pdf, nodata=nd)
    # overlap cols 2-3: later tile is nodata there except (0,0)->col2
    assert skip[0, 2] == 5 and skip[1, 2] == 7 and skip[0, 3] == 7
    clobber, _, _ = raster._stitch_canvas(pdf)
    assert clobber[1, 2] == nd
