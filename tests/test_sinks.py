"""Sinks + M9 loss aggregation."""

import json
import math
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import sinks
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.datagen import weighted_bce
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.grid import gen_tiles
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.derived import images_meta

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp()
    request.addfinalizer(lambda: shutil.rmtree(d, ignore_errors=True))
    return d


def test_tile_index_roundtrip(spark, tmp):
    tiles = gen_tiles(images_meta(spark, SF).limit(20))
    sinks.write_tile_index(tiles, f"{tmp}/idx")
    back = spark.read.parquet(f"{tmp}/idx")
    assert back.count() == tiles.count()
    assert set(back.columns) >= {"tile_id", "tminx", "tmaxy", "image_id"}
    sinks.write_tile_index_csv(tiles, f"{tmp}/csv")
    csv = spark.read.option("header", True).csv(f"{tmp}/csv")
    assert csv.count() == tiles.count()


def test_polygons_to_geojson_valid(spark):
    df = spark.createDataFrame(
        [("i1", 1, 1, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]], 0.5)],
        "image_id string, poly_id int, value int, ring array<array<double>>, area_m2 double",
    )
    row = sinks.polygons_to_geojson(df).first()
    feat = json.loads(row["geojson"])
    assert feat["type"] == "Feature"
    assert feat["geometry"]["coordinates"][0][0] == [0.0, 0.0]
    assert feat["properties"]["area"] == 0.5


def test_weighted_bce_matches_numpy(spark):
    rng = np.random.RandomState(3)
    y = rng.randint(0, 2, 200).astype(float)
    p = rng.uniform(0.01, 0.99, 200)
    w = rng.uniform(0.5, 2.0, 200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y, p, w)],
        "y double, p double, weight double",
    )
    got = weighted_bce(df).first()["weighted_bce"]
    eps = 1e-7
    pc = np.clip(p, eps, 1 - eps)
    exp = np.mean(-w * (y * np.log(pc) + (1 - y) * np.log(1 - pc)))
    assert got == pytest.approx(exp, rel=1e-9)
    assert math.isfinite(got)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """write_bucketed co-location: joining two tables bucketed on the same
    (key, buckets) plans with no Exchange on either side."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.sinks import write_bucketed

    a = spark.range(500).selectExpr("concat('img_', id) as image_id", "id as va")
    b = spark.range(500).selectExpr("concat('img_', id) as image_id", "id * 2 as vb")
    write_bucketed(a, "bkt_a", buckets=8)
    write_bucketed(b, "bkt_b", buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "image_id")
        jvm = spark._jvm
        plan = j._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "Exchange" not in plan, plan
        assert j.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("drop table if exists bkt_a")
        spark.sql("drop table if exists bkt_b")


def test_geojson_emits_interior_rings(spark):
    """A donut region's GeoJSON carries exterior + hole rings — the hole
    must not be rendered as built-up area."""
    import json

    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.sinks import polygons_to_geojson

    plane = np.zeros((20, 20), dtype=np.int32)
    plane[2:18, 2:18] = 1
    plane[8:12, 8:12] = 0  # courtyard
    df = spark.createDataFrame(
        [("img_x", plane.tobytes(), 20, 20, "npy:<i4", 0.0, 0.0)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "ulx double, uly double",
    )
    polys = raster.polygonize_stage(df).collect()
    assert len(polys) == 1 and polys[0]["n_holes"] == 1
    assert len(polys[0]["holes"]) == 1
    gj = polygons_to_geojson(raster.polygonize_stage(df)).first()
    feat = json.loads(gj["geojson"])
    assert len(feat["geometry"]["coordinates"]) == 2  # exterior + 1 hole


def test_shapefile_roundtrip_pure():
    """Donut polygon + attrs survive the .shp/.shx/.dbf round trip with
    ESRI orientation enforced (outer CW, holes CCW)."""
    import tempfile

    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import shapefile as shp

    outer = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]  # CCW as given
    hole = [[3, 3], [3, 6], [6, 6], [6, 3], [3, 3]]       # CW as given
    base = tempfile.mktemp()
    n = shp.write_polygon_shapefile(
        base,
        [
            ([outer, hole], {"id": 1, "value": 2, "Area": 91.0}),
            ([[[20, 20], [24, 20], [24, 24], [20, 20]]], {"id": 2, "value": 3, "Area": 8.0}),
        ],
    )
    assert n == 2
    got = list(shp.read_polygon_shapefile(base))
    assert len(got) == 2
    rings0, attrs0 = got[0]
    assert attrs0 == {"id": 1, "value": 2, "Area": 91.0}
    # outer came back clockwise (negative shoelace), hole counter-clockwise
    assert shp._signed_area(rings0[0]) < 0 < shp._signed_area(rings0[1])
    # same vertex sets regardless of orientation flips
    assert {tuple(p) for p in rings0[0].tolist()} == {tuple(map(float, p)) for p in outer}
    (rings1, attrs1) = got[1]
    assert len(rings1) == 1 and attrs1["id"] == 2 and attrs1["Area"] == 8.0


def test_shapefile_spark_sink(spark):
    """pipeline polygons -> shapefile sink -> read back: counts + areas."""
    import tempfile

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import shapefile as shp
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import sinks
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.plans import pipeline
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, "/root/testdata/sf0.001", kind="mask", limit=6)
    polys = pipeline.mask_to_polygons(imgs, separation="cc", tiled=False)
    base = tempfile.mktemp()
    n = sinks.write_shapefile(polys, base)
    rows = polys.select("poly_id", "value", "area_m2").collect()
    assert n == len(rows) > 0
    got = list(shp.read_polygon_shapefile(base))
    assert len(got) == n
    exp_areas = sorted(round(r["area_m2"], 6) for r in rows)
    assert sorted(a["Area"] for _, a in got) == exp_areas


def test_catalog_load_images_parquet_fallback(spark, tmp_path):
    """load_images resolves paths to the parquet stand-in when no Iceberg
    runtime is present, validates the input_hint schema, and rejects
    mis-shaped tables loudly."""
    import pytest

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import catalog, images as IMG

    p = str(tmp_path / "imgs.parquet")
    IMG.images_table(spark, "/root/testdata/sf0.001", limit=4).write.parquet(p)
    df = catalog.load_images(spark, p)
    assert df.count() > 0
    assert set(catalog.INPUT_HINT_COLUMNS) <= set(df.columns)

    bad = str(tmp_path / "bad.parquet")
    spark.range(3).write.parquet(bad)
    with pytest.raises(ValueError, match="input_hint"):
        catalog.load_images(spark, bad)

    # catalog-table path: registered temp view name resolves via read.table
    spark.read.parquet(p).createOrReplaceTempView("imgs_cat")
    assert catalog.load_images(spark, "imgs_cat").count() == df.count()


def test_catalog_iceberg_real_roundtrip(spark, tmp_path):
    """Exercises the REAL Iceberg write/read path when the runtime jars are
    on the classpath (skipped in this container, green on any deployment
    that ships them): register a hadoop catalog, `writeTo(...).create()`
    the input_hint table, and resolve it back through the same
    `load_images` table-name seam production uses."""
    import pytest

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import catalog, images as IMG

    if not catalog.iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jars not on the classpath")

    spark.conf.set("spark.sql.catalog.it_test", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_test.warehouse", str(tmp_path / "wh"))
    imgs = IMG.images_table(spark, "/root/testdata/sf0.001", limit=4)
    imgs.writeTo("it_test.db.images").create()
    back = catalog.load_images(spark, "it_test.db.images")
    assert back.count() == imgs.count()
    assert set(catalog.INPUT_HINT_COLUMNS) <= set(back.columns)


def test_shapefile_dbf_overflow_raises():
    import tempfile

    import pytest

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import shapefile as shp

    ring = [[0, 0], [1, 0], [1, 1], [0, 0]]
    with pytest.raises(ValueError, match="width"):
        shp.write_polygon_shapefile(
            tempfile.mktemp(),
            [([ring], {"id": 1, "value": 1, "Area": 1e18})],  # 25 chars > 19
        )


def test_catalog_path_vs_table_heuristic():
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import catalog

    assert catalog._looks_like_path("imgs.parquet")       # data-file ext
    assert catalog._looks_like_path("/data/imgs")         # separator
    assert catalog._looks_like_path("s3://bucket/imgs")   # URI scheme
    assert not catalog._looks_like_path("db.images")      # catalog name
    assert not catalog._looks_like_path("images_v2")      # bare table


def test_geotiff_dir_sink_roundtrips_through_raster_ingest(spark, tmp_path):
    """write_geotiff_dir -> load_raster_dir is the identity on pixels and
    georeference: the engine can hand its outputs straight back to its
    own (or the reference's GDAL) ingest."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import sinks
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.catalog import (
        load_raster_dir,
    )

    src = IMG.images_table(
        spark, "/root/testdata/sf0.001", fmt="png", kind="mask", limit=12
    )
    out = str(tmp_path / "rasters")
    n = sinks.write_geotiff_dir(src, out)
    orig = {r.image_id: r for r in src.collect()}
    assert n == len(orig) > 0

    back = load_raster_dir(spark, out).collect()
    assert len(back) == n
    for r in back:
        o = orig[r.image_id]
        assert (r.w, r.h, r.fmt) == (o.w, o.h, "tif")
        assert (r.ulx, r.uly, r.crs) == (o.ulx, o.uly, o.crs)
        assert r.sx == 0.1 and r.sy == -0.1
        import numpy as np

        got = codec.decode(bytes(r.bytes), "tif", r.w, r.h)
        want = codec.decode(bytes(o.bytes), "png", o.w, o.h)
        assert np.array_equal(got, want)


def test_write_geotiff_dir_jpeg_compression(spark, tmp_path):
    """The orthophoto-output variant: jpeg-compressed GeoTIFFs load back
    with intact georeference and PSNR>=40 pixels (lossy, so equality is
    per the engine's lossy-format contract, not bit-exact)."""
    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import sinks
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.catalog import (
        load_raster_dir,
    )

    src = IMG.images_table(
        spark, "/root/testdata/sf0.001", fmt="png", kind="rgb", limit=6
    )
    out = str(tmp_path / "ortho")
    n = sinks.write_geotiff_dir(src, out, compression="jpeg")
    orig = {r.image_id: r for r in src.collect()}
    assert n == len(orig) > 0

    back = load_raster_dir(spark, out).collect()
    assert len(back) == n
    for r in back:
        o = orig[r.image_id]
        assert (r.ulx, r.uly, r.crs) == (o.ulx, o.uly, o.crs)
        got = codec.decode(bytes(r.bytes), "tif", r.w, r.h).astype(np.float64)
        want = codec.decode(bytes(o.bytes), "png", o.w, o.h).astype(np.float64)
        mse = np.mean((got - want) ** 2)
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        assert psnr >= 40.0
