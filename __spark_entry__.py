"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness pairs; every
SQL-checkable query derives its geo inputs with pure arithmetic from the
pre-registered tables (part/customer/events/...), so the DuckDB oracle
computes the identical result analytically.  See SURVEY.md §2 for the
operator inventory these cover.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark as vm
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import grid
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import derived

CFG = vm.DEFAULT_CONFIG


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("part", "customer", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# --------------------------------------------------------------------------- #
# queries
# --------------------------------------------------------------------------- #

def q_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 tile-grid cardinality per image (bf_gridding.py:104-120)."""
    imgs = derived.images_meta(spark, sf_dir)
    return grid.with_tile_counts(imgs, CFG).select(
        "image_id", "w", "h", "nx", "ny", (F.col("nx") * F.col("ny")).alias("n_tiles")
    )


def q_gen_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3/O8 full tile enumeration: offsets, border clamp, tile ids."""
    imgs = derived.images_meta(spark, sf_dir)
    return grid.gen_tiles(imgs, CFG, with_geo=False).select(
        "image_id", "tiy", "tix", "tile_id", "off_x", "off_y", "tw", "th"
    )


def q_gen_tiles_overlap20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 training path: overlap = int(200*10/100) = 20 px (io.py:100-106)."""
    imgs = derived.images_meta(spark, sf_dir)
    ov = CFG.overlap_px_from_percent()
    return grid.gen_tiles(imgs, CFG, overlap=ov, with_geo=False).select(
        "image_id", "tiy", "tix", "tile_id", "off_x", "off_y", "tw", "th"
    )


def q_image_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O6 image footprint bbox from the affine geotransform."""
    imgs = derived.images_meta(spark, sf_dir)
    return grid.image_extents(imgs, CFG).select(
        "image_id", "minx", "miny", "maxx", "maxy"
    )


def q_mosaic_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 mosaic_info: global layer extent + pixel dims at 0.1 m
    (xsize = round((lrx-ulx)/scaleX), bf_gridding.py:130-175)."""
    ext = grid.image_extents(derived.images_meta(spark, sf_dir), CFG)
    return ext.agg(
        F.min("minx").alias("ulx"),
        F.max("maxy").alias("uly"),
        F.max("maxx").alias("lrx"),
        F.min("miny").alias("lry"),
        F.round((F.max("maxx") - F.min("minx")) / 0.1).cast("long").alias("xsize"),
        F.round((F.max("maxy") - F.min("miny")) / 0.1).cast("long").alias("ysize"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tile_counts": q_tile_counts,
    "gen_tiles": q_gen_tiles,
    "gen_tiles_overlap20": q_gen_tiles_overlap20,
    "image_extents": q_image_extents,
    "mosaic_extent": q_mosaic_extent,
}


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_views(spark, sf_dir)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _wrap(v) for k, v in QUERIES.items()}


# --------------------------------------------------------------------------- #
# oracles (DuckDB SQL over the same pre-registered parquet views)
# --------------------------------------------------------------------------- #

def oracle_sql() -> dict[str, str]:
    gt = grid.gen_tiles_sql(CFG.tile_size, CFG.overlap_px)
    gt20 = grid.gen_tiles_sql(CFG.tile_size, CFG.overlap_px_from_percent())
    return {
        "tile_counts": derived.with_ctes(
            derived.IMAGES_META_SQL,
            body="""
SELECT image_id, w, h,
  CAST(1 + FLOOR((greatest(w - 200, 0) + 189) / 190) AS INT) AS nx,
  CAST(1 + FLOOR((greatest(h - 200, 0) + 189) / 190) AS INT) AS ny,
  CAST(1 + FLOOR((greatest(w - 200, 0) + 189) / 190) AS INT)
    * CAST(1 + FLOOR((greatest(h - 200, 0) + 189) / 190) AS INT) AS n_tiles
FROM images_meta""",
        ),
        "gen_tiles": derived.with_ctes(
            derived.IMAGES_META_SQL,
            gt,
            body="SELECT image_id, tiy, tix, tile_id, off_x, off_y, tw, th FROM tiles",
        ),
        "gen_tiles_overlap20": derived.with_ctes(
            derived.IMAGES_META_SQL,
            gt20,
            body="SELECT image_id, tiy, tix, tile_id, off_x, off_y, tw, th FROM tiles",
        ),
        "image_extents": derived.with_ctes(
            derived.IMAGES_META_SQL,
            body="""
SELECT image_id,
  ulx              AS minx,
  uly + h * (-0.1) AS miny,
  ulx + w * 0.1    AS maxx,
  uly              AS maxy
FROM images_meta""",
        ),
        "mosaic_extent": derived.with_ctes(
            derived.IMAGES_META_SQL,
            body="""
SELECT
  min(ulx)              AS ulx,
  max(uly)              AS uly,
  max(ulx + w * 0.1)    AS lrx,
  min(uly + h * (-0.1)) AS lry,
  CAST(round((max(ulx + w * 0.1) - min(ulx)) / 0.1) AS BIGINT)    AS xsize,
  CAST(round((max(uly) - min(uly + h * (-0.1))) / 0.1) AS BIGINT) AS ysize
FROM images_meta""",
        ),
    }


# --------------------------------------------------------------------------- #
# flagship
# --------------------------------------------------------------------------- #

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tile enumeration with per-tile geotransforms at
    sf0.001; the driver checks rows>0 and a stable schema."""
    sf_dir = "/root/testdata/sf0.001"
    _register_views(spark, sf_dir)
    imgs = derived.images_meta(spark, sf_dir)
    tiles = grid.gen_tiles(imgs, CFG, with_geo=True)
    return tiles.select(
        "image_id", "tile_id", "tiy", "tix", "off_x", "off_y", "tw", "th",
        "tminx", "tminy", "tmaxx", "tmaxy",
    )
