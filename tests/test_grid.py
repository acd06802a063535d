"""Tiling operator vs a straight transcription of the reference formulas
(/root/reference/src/bf_gridding.py:104-120, 341-403, 689-722)."""

import pytest
from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.config import DEFAULT_CONFIG
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import grid

SF_TINY = "/root/testdata/sf0.001"


def ref_count(size: int, t: int, ov: int) -> int:
    # tile_info.__init__ verbatim (bf_gridding.py:112-119)
    c = 1
    if size > t:
        c += int((size - t + (t - ov) - 1) / (t - ov))
    return c


def ref_tiles(w: int, h: int, t: int, ov: int):
    # tileImage loop verbatim (bf_gridding.py:363-379)
    nx, ny = ref_count(w, t, ov), ref_count(h, t, ov)
    digits = len(str(max(nx, ny)))
    out = []
    for yi in range(1, ny + 1):
        for xi in range(1, nx + 1):
            oy, ox = (yi - 1) * (t - ov), (xi - 1) * (t - ov)
            tw = t if ox + t <= w else w - ox
            th = t if oy + t <= h else h - oy
            tid = f"_{yi:0{digits}d}_{xi:0{digits}d}"
            out.append((yi, xi, ox, oy, tw, th, tid))
    return out


EDGE_SIZES = [200, 201, 380, 381, 389, 390, 391, 500, 579, 580, 581, 1000, 2000]


@pytest.mark.parametrize("ov", [10, 20])
def test_tile_counts_match_reference_formula(spark, ov):
    rows = [(f"i{w}x{h}", w, h) for w in EDGE_SIZES for h in EDGE_SIZES[:5]]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = {
        r["image_id"]: (r["nx"], r["ny"])
        for r in grid.with_tile_counts(df, DEFAULT_CONFIG, ov).collect()
    }
    for name, w, h in rows:
        assert got[name] == (ref_count(w, 200, ov), ref_count(h, 200, ov)), (w, h, ov)


@pytest.mark.parametrize("ov", [10, 20])
def test_gen_tiles_matches_reference_enumeration(spark, ov):
    rows = [("imgA", 381, 390), ("imgB", 200, 200), ("imgC", 1000, 201)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = (
        grid.gen_tiles(df, DEFAULT_CONFIG, overlap=ov, with_geo=False)
        .orderBy("image_id", "tiy", "tix")
        .collect()
    )
    exp = []
    for name, w, h in sorted(rows):
        for yi, xi, ox, oy, tw, th, suffix in ref_tiles(w, h, 200, ov):
            exp.append((name, yi, xi, ox, oy, tw, th, name + suffix))
    assert [
        (r["image_id"], r["tiy"], r["tix"], r["off_x"], r["off_y"], r["tw"], r["th"], r["tile_id"])
        for r in got
    ] == exp


def test_coverage_and_overlap_properties(spark):
    """Tiles exactly cover [0,w)x[0,h); adjacent tiles share `ov` columns."""
    rows = [(f"p{w}", w, 263) for w in EDGE_SIZES]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    tiles = grid.gen_tiles(df, DEFAULT_CONFIG, with_geo=False).collect()
    by_img = {}
    for r in tiles:
        by_img.setdefault(r["image_id"], []).append(r)
    for name, w in [(f"p{w}", w) for w in EDGE_SIZES]:
        ts = sorted(by_img[name], key=lambda r: (r["tiy"], r["tix"]))
        # row 1 horizontal coverage
        row1 = [r for r in ts if r["tiy"] == 1]
        assert row1[0]["off_x"] == 0
        assert row1[-1]["off_x"] + row1[-1]["tw"] == w
        for a, b in zip(row1, row1[1:]):
            assert b["off_x"] == a["off_x"] + 190  # stride
            assert a["off_x"] + a["tw"] - b["off_x"] >= 10  # >= overlap cols shared
        assert all(r["tw"] >= 1 and r["th"] >= 1 for r in ts)


def test_tile_geotransform_shift(spark):
    """Per-tile gt = [ulx + ox*sx, sx, 0, uly + oy*sy, 0, sy]
    (bf_gridding.py:519-529)."""
    df = spark.createDataFrame(
        [("g", 381, 390, 1000.0, 2000.0)],
        "image_id string, w int, h int, ulx double, uly double",
    )
    got = grid.gen_tiles(df, DEFAULT_CONFIG).orderBy("tiy", "tix").collect()
    for r in got:
        assert r["gt"] == [
            1000.0 + r["off_x"] * 0.1, 0.1, 0.0,
            2000.0 + r["off_y"] * -0.1, 0.0, -0.1,
        ]
        assert r["tminx"] == pytest.approx(1000.0 + r["off_x"] * 0.1)
        assert r["tmaxy"] == pytest.approx(2000.0 - r["off_y"] * 0.1)


def test_plan_has_no_python_udf(spark):
    """gen_tiles must stay entirely JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    df = spark.createDataFrame([("x", 500, 500)], "image_id string, w int, h int")
    plan = grid.gen_tiles(df, DEFAULT_CONFIG, with_geo=False)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_derived_images_meta_matches_duckdb(spark):
    import duckdb

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import derived

    con = duckdb.connect()
    con.execute(
        f"create view part as select * from read_parquet('{SF_TINY}/part.parquet')"
    )
    odf = con.execute(
        derived.with_ctes(derived.IMAGES_META_SQL, body="SELECT * FROM images_meta")
    ).fetchdf()
    sdf = derived.images_meta(spark, SF_TINY).toPandas()
    odf = odf.sort_values("image_id").reset_index(drop=True)
    sdf = sdf.sort_values("image_id").reset_index(drop=True)
    assert (odf["w"] == sdf["w"]).all()
    assert (odf["ulx"] == sdf["ulx"]).all()
    assert (odf["uly"] == sdf["uly"]).all()
