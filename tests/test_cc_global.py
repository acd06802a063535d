"""Distributed cross-tile connected components (operators/cc_global.py):
must equal the in-memory stitched CC on seam-crossing regions, count every
pixel exactly once across overlap strips, and converge within the round
bound."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark as vm
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.config import DEFAULT_CONFIG as CFG
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import kernels_morph as km
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import cc_global, raster
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec

SF = "/root/testdata/sf0.001"


def _tiles_from_arrays(spark, arrays):
    """Build tile rows by slicing synthetic masks through the real
    slice_tiles operator."""
    import pandas as pd

    rows = []
    for i, arr in enumerate(arrays):
        rows.append(
            (
                f"t{i:03d}", codec.encode(arr, "png"),
                arr.shape[1], arr.shape[0], "png",
                f"cap{i}", i, 0.0, 0.0, "SYNTH:METRIC",
            )
        )
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, ulx double, uly double, crs string",
    )
    return raster.slice_tiles(df, CFG)


def _expected_regions(arrays):
    """Oracle: in-memory CC areas per image."""
    exp = {}
    for i, arr in enumerate(arrays):
        lab = km.label((arr >= 128).astype(np.uint8), connectivity=1)
        areas = sorted(
            int((lab == v).sum()) for v in np.unique(lab) if v > 0
        )
        exp[f"t{i:03d}"] = areas
    return exp


def test_distributed_cc_matches_inmemory_on_seam_crossers(spark):
    """Regions deliberately crossing tile seams, living inside overlap
    strips, and spanning 2x2 tile corners."""
    rng = np.random.RandomState(3)
    arrays = []
    # image 0: blob exactly inside the first overlap band (the round-1 bug
    # shape: never touches the band's first column)
    a = np.zeros((300, 600), dtype=np.uint8)
    a[40:80, 192:199] = 255
    arrays.append(a)
    # image 1: long bar crossing three tiles horizontally + a 2x2-corner
    # spanning square + an L of touching rects
    b = np.zeros((450, 650), dtype=np.uint8)
    b[30:40, 50:620] = 255
    b[170:240, 170:240] = 255
    b[300:310, 100:200] = 255
    b[250:310, 190:200] = 255
    arrays.append(b)
    # image 2: random sprinkle of rects (some crossing seams by chance)
    c = np.zeros((400, 400), dtype=np.uint8)
    for _ in range(12):
        y, x = rng.randint(0, 370, 2)
        hh, ww = rng.randint(4, 30, 2)
        c[y : y + hh, x : x + ww] = 255
    arrays.append(c)

    got = {}
    out = cc_global.distributed_cc_areas(_tiles_from_arrays(spark, arrays), CFG)
    for r in out.collect():
        got.setdefault(r["image_id"], []).append(int(r["region_px"]))
    exp = _expected_regions(arrays)
    for k in exp:
        assert sorted(got.get(k, [])) == exp[k], k


def test_distributed_cc_single_tile_image(spark):
    """No seams at all: reduces to plain per-tile CC."""
    a = np.zeros((150, 180), dtype=np.uint8)
    a[10:20, 10:30] = 255
    a[50:60, 50:55] = 255
    out = cc_global.distributed_cc_areas(_tiles_from_arrays(spark, [a]), CFG)
    assert sorted(r["region_px"] for r in out.collect()) == [50, 200]


def test_distributed_cc_convergence_guard(spark):
    """A seam-crossing region with max_rounds=0 must raise, not silently
    emit split regions."""
    a = np.zeros((150, 600), dtype=np.uint8)
    a[30:40, 50:560] = 255
    tiles = _tiles_from_arrays(spark, [a])
    with pytest.raises(RuntimeError, match="converge"):
        cc_global.distributed_cc_areas(tiles, CFG, max_rounds=0)


def test_pack_nid_bounds_raise_loudly():
    """The packed node id must fail loudly instead of silently colliding."""
    assert cc_global._pack_nid(3, 5, 100) == (3 << 37) | (5 << 16)
    with pytest.raises(ValueError, match="bounds"):
        cc_global._pack_nid(1, 1, 1 << 16)
    with pytest.raises(ValueError, match="bounds"):
        cc_global._pack_nid(1, 1 << 21, 10)


def test_distributed_cc_rejects_zero_overlap(spark):
    """ADVICE r2: overlap_px=0 emits no seam-anchor rows, so cross-tile
    components would silently stay split — must raise instead."""
    import dataclasses

    a = np.zeros((150, 180), dtype=np.uint8)
    a[10:20, 10:30] = 255
    cfg0 = dataclasses.replace(CFG, overlap_px=0)
    with pytest.raises(ValueError, match="overlap_px"):
        cc_global.distributed_cc_areas(_tiles_from_arrays(spark, [a]), cfg0)
