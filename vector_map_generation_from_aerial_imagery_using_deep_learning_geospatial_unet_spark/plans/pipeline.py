"""End-to-end plans mirroring the reference's entry points (SURVEY.md §3).

``mask_to_polygons`` is the Spark lifecycle replacing test.py's inference
chain (/root/reference/test.py:152-387):

    images scan -> gen_tiles+slice (O2/O3) -> stitch (S5) -> threshold (M7)
    -> erosion (P1) -> [watershed (P3) | cc-label] -> polygonize+simplify+
    mbr+area (P4-P8)

One lazy logical plan; the only shuffle is the stitch groupBy(image_id) —
tile slicing, thresholding, morphology and polygonize are all
narrow/mapInPandas stages that AQE pipelines through.  The tile round-trip
(slice then stitch) is semantically the identity on pixels — it exists
because real deployments run prediction per-tile; seam tests pin that the
round-trip is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import DEFAULT_CONFIG, EngineConfig
from ..operators import raster


def mask_to_polygons(
    images: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    separation: str = "cc",
    tiled: bool = True,
) -> DataFrame:
    """Binary-mask images -> instance polygons.

    separation='cc'        — plain connected components (analytically
                             checkable: the DuckDB oracle path).
    separation='watershed' — the reference's P3 instance separation.
    tiled=False skips the tile round-trip (direct whole-image path; used by
    seam tests to prove tiled == direct).
    """
    if tiled:
        # one Python hop from tiles to polygons: the stitched canvas and the
        # label plane stay inside the UDF (no full-plane Arrow round-trips)
        return raster.tiles_to_polygons(
            raster.slice_tiles(images, cfg), cfg, separation=separation
        )
    df = raster.postprocess_stage(images, cfg, separation=separation)
    return raster.polygonize_stage(df, cfg)


def mask_to_polygons_unfused(
    images: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    separation: str = "cc",
    tiled: bool = True,
) -> DataFrame:
    """Same plan through the fine-grained single-stage operators (one Arrow
    hop per stage) — result-identical to :func:`mask_to_polygons`; kept for
    operator-level composition and the equivalence test."""
    df = images
    if tiled:
        df = raster.stitch_tiles(raster.slice_tiles(df, cfg))
    df = raster.threshold_mask(df)
    df = raster.erosion_stage(df, cfg)
    if separation == "watershed":
        df = raster.watershed_stage(df, cfg)
    else:
        df = raster.cc_label_stage(df, connectivity=1)
    return raster.polygonize_stage(df, cfg)
