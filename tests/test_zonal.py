"""raster.zonal_stats — per-zone pixel aggregates across images.

Contract: stats equal a per-pixel numpy recomputation (cross-image
zones, partial windows, zones that clip image edges), zones that touch
nothing are absent, and on_error='skip' drops exactly the undecodable
image's contribution."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.config import DEFAULT_CONFIG
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import render_mask

CELL = DEFAULT_CONFIG.cell_size_m


def _mk_images(spark, specs):
    """specs: (image_id, pk, w, h, ulx, uly). Returns (df, arrays)."""
    arrays, rows = {}, []
    for iid, pk, w, h, ulx, uly in specs:
        a = render_mask(pk, w, h)
        arrays[iid] = (a, ulx, uly)
        rows.append((iid, codec.encode(a, "png"), w, h, "png", float(ulx), float(uly)))
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "ulx double, uly double",
    )
    return df, arrays


def _expected(arrays, zones):
    out = {}
    for zid, minx, miny, maxx, maxy in zones:
        n_img = n_px = fg = sv = 0
        for a, ulx, uly in arrays.values():
            h, w = a.shape[:2]
            # outward snap, as box_windows (eps irrelevant: margins used)
            wx0 = max(int(np.floor((minx - ulx) / CELL + 1e-6)), 0)
            wx1 = min(int(np.ceil((maxx - ulx) / CELL - 1e-6)), w)
            wy0 = max(int(np.floor((uly - maxy) / CELL + 1e-6)), 0)
            wy1 = min(int(np.ceil((uly - miny) / CELL - 1e-6)), h)
            if wx1 <= wx0 or wy1 <= wy0:
                continue
            win = a[wy0:wy1, wx0:wx1]
            n_img += 1
            n_px += win.size
            fg += int((win > 0).sum())
            sv += int(win.sum(dtype=np.int64))
        if n_img:
            out[zid] = (n_img, n_px, fg, sv)
    return out


def _zones_df(spark, zones):
    return spark.createDataFrame(
        [(z, float(a), float(b), float(c), float(d)) for z, a, b, c, d in zones],
        "zone_id string, minx double, miny double, maxx double, maxy double",
    )


def test_zonal_matches_numpy_cross_image(spark):
    # two images side by side in world space + one offset below
    specs = [
        ("imA", 3, 120, 100, 0.0, 100.0),
        ("imB", 7, 80, 90, 12.0, 100.0),   # starts at pixel 120 of imA's frame
        ("imC", 11, 100, 100, 4.0, 80.0),
    ]
    imgs, arrays = _mk_images(spark, specs)
    m = 0.3 * CELL
    zones = [
        # spans imA and imB horizontally, clips both
        ("z_span", 5.0 + m, 92.0 + m, 15.0 - m, 100.0 - m),
        # interior of imC only
        ("z_c", 5.0 + m, 73.0 + m, 9.0 - m, 78.0 - m),
        # empty zone far away -> absent from output
        ("z_void", 9000.0, 9000.0, 9100.0, 9100.0),
        # covers everything
        ("z_all", 0.0, 0.0, 200.0, 200.0),
    ]
    got = {
        r.zone_id: (r.n_images, r.n_px, r.fg_px, r.sum_val)
        for r in raster.zonal_stats(imgs, _zones_df(spark, zones)).collect()
    }
    want = _expected(arrays, zones)
    assert got == want
    assert "z_void" not in got and got["z_span"][0] == 2 and got["z_all"][0] == 3


def test_zonal_on_error_skip_drops_bad_image(spark):
    specs = [("good", 3, 60, 50, 0.0, 50.0)]
    imgs, arrays = _mk_images(spark, specs)
    bad = spark.createDataFrame(
        [("bad", b"junk", 60, 50, "png", 0.0, 50.0)], imgs.schema
    )
    zones = [("z", 0.0, 0.0, 100.0, 100.0)]
    zdf = _zones_df(spark, zones)
    with pytest.raises(Exception):
        raster.zonal_stats(imgs.union(bad), zdf).collect()
    got = {
        r.zone_id: (r.n_images, r.n_px, r.fg_px, r.sum_val)
        for r in raster.zonal_stats(
            imgs.union(bad), zdf, on_error="skip"
        ).collect()
    }
    assert got == _expected(arrays, zones)
