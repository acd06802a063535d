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
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions.cellindex import WORLD_GRID
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import grid, joins
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


def q_reproject_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRS normalization (functions/geodesy.py + operators/reproject.py):
    a mixed-UTM-zone catalog — the one projection family the reference's
    single-WKT assumption (/root/reference/src/io.py:62,80) breaks on at
    corpus scale — reprojected to WGS84 lon/lat bounds with 16-sample
    border densification, via the from-scratch Karney-series transverse
    Mercator (round-trip/Newton/meridian-constant verified by
    tests/test_geodesy.py).  Synthetic placement is pure arithmetic in
    pk (spec duplicated bit-for-bit by the single-process fixture run,
    tools/build_reproject_fixture.py):

        zone = 1 + pk % 60;  south = (pk % 2 == 1)
        e0 = 300000 + (pk % 97) * 2000.0
        n0 = north: 500000 + (pk % 89) * 40000.0
             south: 6500000 + (pk % 89) * 10000.0
        extent = (e0, n0, e0 + w*0.1, n0 + h*0.1);  crs = EPSG:326zz/327zz

    Output bounds are nanodegrees (rint(deg*1e9), ~0.1 mm) so the value
    hash is integer-stable.  Oracle: the frozen expectations parquet."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import reproject as RP

    meta = derived.images_meta(spark, sf_dir).withColumn(
        "pk", F.substring("image_id", 5, 18).cast("long")
    )
    meta = meta.repartition(spark.sparkContext.defaultParallelism * 2, "image_id")

    def synth(batches):
        for pdf in batches:
            pk = pdf["pk"].values.astype(np.int64)
            w = pdf["w"].values.astype(np.int64)
            h = pdf["h"].values.astype(np.int64)
            south = pk % 2 == 1
            zone = 1 + pk % 60
            e0 = 300000.0 + (pk % 97) * 2000.0
            n0 = np.where(
                south,
                6500000.0 + (pk % 89) * 10000.0,
                500000.0 + (pk % 89) * 40000.0,
            )
            epsg = np.where(south, 32700 + zone, 32600 + zone)
            yield pd.DataFrame({
                "image_id": pdf["image_id"].values,
                "minx": e0,
                "miny": n0,
                "maxx": e0 + w * 0.1,
                "maxy": n0 + h * 0.1,
                "crs": "EPSG:" + pd.Series(epsg).astype(str),
            })

    utm = meta.mapInPandas(
        synth,
        schema="image_id string, minx double, miny double, "
               "maxx double, maxy double, crs string",
    )
    ext = RP.extents_to_wgs84(utm, densify=16)
    nd = RP.nanodeg_udf()
    return ext.select(
        "image_id",
        "epsg",
        nd("lon_min").alias("lon_min_nd"),
        nd("lat_min").alias("lat_min_nd"),
        nd("lon_max").alias("lon_max_nd"),
        nd("lat_max").alias("lat_max_nd"),
    )


def q_mosaic_extent_wgs84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 mosaic_info across MIXED UTM zones — impossible in projected
    coordinates (eastings from different zones are incomparable), and
    exactly the query the reference's single-projection assumption
    forbids: the global corpus footprint in WGS84, via reproject_extents'
    normalization.  Map-side-combinable global agg: 4 mins/maxes + two
    counts over the pure-map reprojection — one 1-row exchange total."""
    ext = q_reproject_extents(spark, sf_dir)
    return ext.agg(
        F.min("lon_min_nd").alias("lon_min_nd"),
        F.min("lat_min_nd").alias("lat_min_nd"),
        F.max("lon_max_nd").alias("lon_max_nd"),
        F.max("lat_max_nd").alias("lat_max_nd"),
        F.count("*").alias("n_images"),
        F.countDistinct("epsg").alias("n_zones"),
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


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-indexed point-in-polygon join, JVM-side ray-cast refine."""
    pts = derived.points_meta(spark, sf_dir)
    polys = derived.footprint_rings(spark, sf_dir).join(
        derived.footprints_with_env(spark, sf_dir).select(
            "fp_id", "minx", "miny", "maxx", "maxy"
        ),
        "fp_id",
    )
    # 15k footprints ~ a few MB exploded: broadcast kills the probe-side
    # shuffle entirely (the shuffle path, default, is the 10^12-scale plan)
    return joins.pip_join(
        pts, polys, WORLD_GRID, strategy="expr", broadcast_polygons=True
    ).select("pt_id", "fp_id")


def q_pip_join_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join, vectorized numpy ray-cast in mapInPandas (Arrow batches)."""
    pts = derived.points_meta(spark, sf_dir)
    polys = derived.footprint_rings(spark, sf_dir).join(
        derived.footprints_with_env(spark, sf_dir).select(
            "fp_id", "minx", "miny", "maxx", "maxy"
        ),
        "fp_id",
    )
    return joins.pip_join(
        pts, polys, WORLD_GRID, strategy="arrow", broadcast_polygons=True
    ).select("pt_id", "fp_id")


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN building lookup via k-ring expansion."""
    pts = derived.points_meta(spark, sf_dir)
    centers = derived.footprints_meta(spark, sf_dir).select("fp_id", "cx", "cy")
    # 15k centers: broadcast build side (shuffle join stays the scale path)
    return joins.knn_join(
        pts, centers, WORLD_GRID, k=5, broadcast_centers=True
    ).select("pt_id", "fp_id", "rank")


def q_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 spatial range query: tile footprints x building envelopes."""
    tiles = grid.gen_tiles(derived.images_meta(spark, sf_dir), CFG).select(
        "tile_id",
        F.col("tminx").alias("minx"),
        F.col("tminy").alias("miny"),
        F.col("tmaxx").alias("maxx"),
        F.col("tmaxy").alias("maxy"),
    )
    fps = derived.footprints_with_env(spark, sf_dir).select(
        "fp_id", "minx", "miny", "maxx", "maxy"
    )
    return joins.bbox_range_join(tiles, fps, WORLD_GRID).select(
        F.col("l_tile_id").alias("tile_id"), F.col("r_fp_id").alias("fp_id")
    )


def q_point_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star headline: assign every point to the tile(s) containing it
    (overlap strips -> up to 4 tiles)."""
    pts = derived.points_meta(spark, sf_dir).select(
        "pt_id",
        F.col("px").alias("minx"),
        F.col("py").alias("miny"),
        F.col("px").alias("maxx"),
        F.col("py").alias("maxy"),
    )
    tiles = grid.gen_tiles(derived.images_meta(spark, sf_dir), CFG).select(
        "tile_id",
        F.col("tminx").alias("minx"),
        F.col("tminy").alias("miny"),
        F.col("tmaxx").alias("maxx"),
        F.col("tmaxy").alias("maxy"),
    )
    # points are the small side here (100k ids+coords); broadcasting them
    # lets the exploded tile grid stream shuffle-free off its scan
    return joins.bbox_range_join(pts, tiles, WORLD_GRID, broadcast="left").select(
        F.col("l_pt_id").alias("pt_id"), F.col("r_tile_id").alias("tile_id")
    )


PIPE_CAP = 400  # pk cap for raster-pipeline queries (keeps the gate fast)


def q_pipeline_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship raster->vector round-trip: synth mask images -> tile slice ->
    overlap-stitch -> threshold -> 3x3 open -> CC label -> polygonize ->
    simplify -> shoelace area.  The oracle computes the same answer
    analytically from the blob parameters."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.plans import pipeline
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="mask", limit=PIPE_CAP)
    polys = pipeline.mask_to_polygons(imgs, CFG, separation="cc", tiled=True)
    return polys.select(
        "image_id",
        "poly_id",
        "value",
        "area_m2",
        "mbr_area_m2",
        F.array_min(F.transform("ring", lambda v: v[0])).alias("minx"),
        F.array_max(F.transform("ring", lambda v: v[0])).alias("maxx"),
        F.array_min(F.transform("ring", lambda v: v[1])).alias("miny"),
        F.array_max(F.transform("ring", lambda v: v[1])).alias("maxy"),
    )


def q_pipeline_watershed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 watershed pipeline, exact-gated (round-3): the ``mask_sparse``
    fixture keeps every rect >= 76 px (Chebyshev) from its neighbors —
    strictly beyond the (2*75+1) peak max-filter window — so each rect's
    EDT ridge plateau survives as exactly one 4-connected marker and
    watershed labels each rect as one region of rw*rh px.  The full chain
    (tile slice -> stitch -> threshold -> open -> EDT -> peaks -> priority
    flood -> polygonize -> shoelace) then has a closed-form area oracle.
    Free-form masks (where inter-blob peak suppression makes the marker set
    non-analytic) stay covered by the numpy oracles in pytest and the
    dumbbell split gate (``watershed_split``)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.plans import pipeline
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="mask_sparse", limit=100)
    polys = pipeline.mask_to_polygons(imgs, CFG, separation="watershed", tiled=True)
    return polys.select("image_id", "area_m2")


def q_dice_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 global Dice/Jaccard between the thresholded mask and the opened
    mask (blobs survive the 3x3 open intact -> analytic pixel sums)."""
    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import kernels_morph as _KM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="mask", limit=PIPE_CAP)
    # pred is a pure function of truth -> fused self-comparison: one decode
    # per row, no join, no persist (a persist here would pin the byte
    # column in executor storage for the rest of the session)
    kernel = lambda a: _KM.erosion_clean(
        (a >= 128).astype(np.uint8) * 255,
        CFG.erosion_filter,
        CFG.min_object_area_px,
    )
    return raster.dice_jaccard_self(imgs, kernel, CFG)


# ---------------------------------------------------------------------- #
# text / dedup / similarity / pyramid suite
# ---------------------------------------------------------------------- #

def _skeleton_px_counts(sk: DataFrame) -> DataFrame:
    """Shared tail of both skeletonize gates: per-image nonzero-pixel
    count of the thinned plane (one helper so the rows-only and the
    oracle-gated query can never drift apart)."""
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec

    def count(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = codec.decode(bytes(r.bytes), r.fmt, r.w, r.h)
                rows.append((r.image_id, int((a != 0).sum())))
            yield pd.DataFrame(rows, columns=["image_id", "skeleton_px"])

    return sk.mapInPandas(count, schema="image_id string, skeleton_px long")


def q_skeletonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 skeletonize (linearFeature branch) — per-image medial-line pixel
    count on the free-form blob masks.  Zhang-Suen thinning has no closed
    SQL form, so the oracle is the frozen single-process expectations
    table (tools/build_skeleton_fixture.py); the axis-aligned twin
    (q_skeletonize_bars) additionally closes analytically."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="mask", limit=60)
    return _skeleton_px_counts(raster.skeletonize_stage(imgs, CFG))


def q_skeletonize_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 exact gate: on axis-aligned bar fixtures, Zhang-Suen thinning of
    the 5x5-dilated bar yields exactly max(|bw - bh|, 1) centerline pixels
    (dilation grows both dims by 4 — difference invariant; property
    verified over 100 fixture images).  The free-form mask variant stays
    rows-only (Q:skeletonize)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="bars", limit=60)
    return _skeleton_px_counts(raster.skeletonize_stage(imgs, CFG))


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.exact_dedup(T.corpus(spark, sf_dir))


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.minhash_signature(T.corpus(spark, sf_dir))


def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.lsh_candidate_pairs(T.minhash_signature(T.corpus(spark, sf_dir)))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    c = T.corpus(spark, sf_dir)
    pairs = T.lsh_candidate_pairs(T.minhash_signature(c))
    return T.ngram_jaccard_pairs(c, pairs)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.simhash32(T.corpus(spark, sf_dir))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.text_stats(T.corpus(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.fingerprint(T.corpus(spark, sf_dir))


def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.lang_stats(T.corpus(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram heuristic (build-brief operator): deterministic
    integer scoring, exact SQL twin; discrimination on real multilingual
    snippets is pinned in tests/test_text_ops.py."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    return T.lang_id(T.corpus(spark, sf_dir))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return S.ann_bruteforce_topk(queries_df, emb.select("vec_id", "embedding"), k=10).select(
        "qid", "rank", "vec_id"
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path) — deterministic hyperplanes make the
    bucketing SQL-expressible: exact oracle (_ann_lsh_sql); recall vs brute
    force additionally pinned in pytest."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # 16 probe-exploded queries: broadcast them so the corpus is scored
    # straight off its scan (the bucket equi-join stays the scale default)
    return S.ann_lsh_topk(
        queries_df, emb.select("vec_id", "embedding"), k=10, dim=64,
        broadcast_queries=True,
    ).select("qid", "rank", "vec_id")


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list ANN (scale path #2), exact-gated (round-3): the
    deterministic Lloyd quantizer (6-decimal-rounded components, so the
    result is reproducible across runs/parallelism) is frozen to
    ``fixtures/ivf_centroids_sf0_01.parquet`` by tools/build_ivf_fixture.py;
    the DuckDB oracle re-derives list assignment, probe selection and the
    final ranking from that side table in pure SQL.  Recall vs brute force
    additionally pinned in pytest."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return S.ann_ivf_topk(
        queries_df, emb.select("vec_id", "embedding"), k=10,
        n_centroids=16, nprobe=4,
    ).select("qid", "rank", "vec_id")


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 1000
    )
    # synthetic embeddings are near-orthogonal (max pairwise cos ~0.51);
    # 0.35 marks the top ~0.1% most-similar pairs as "near-dups"
    return S.embedding_near_dup_pairs(emb, threshold=0.35).select("id_a", "id_b")


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucket-pruned near-dup (scale path) — deterministic buckets give
    it an exact oracle (_near_dup_lsh_sql); subset+recall vs the exact pair
    set additionally pinned in pytest."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 1000
    )
    return S.embedding_near_dup_pairs_lsh(emb, threshold=0.35, dim=64).select(
        "id_a", "id_b"
    )


def q_pyramid_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import pyramid as P

    return P.pyramid_meta(derived.images_meta(spark, sf_dir), levels=5).select(
        "image_id", "level", "lw", "lh", "lscale"
    )


def q_pyramid_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 per-level re-gridding (createPyramidTile,
    /root/reference/src/bf_gridding.py:447-503): every pyramid level's dims
    re-enter gen_tiles, so the level->grid chain is one composed lazy plan —
    level 0 reproduces the base grid, deeper levels shrink to 1 tile."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import pyramid as P

    lv = P.pyramid_meta(derived.images_meta(spark, sf_dir), levels=3).select(
        "image_id", "level", F.col("lw").alias("w"), F.col("lh").alias("h")
    )
    return grid.gen_tiles(lv, CFG, with_geo=False).select(
        "image_id", "level", "tiy", "tix", "tile_id", "off_x", "off_y", "tw", "th"
    )


def q_multires_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import pyramid as P

    return P.multires_meta(derived.images_meta(spark, sf_dir), CFG).select(
        "image_id", "res_idx", "resolution", "rw", "rh"
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode->resize->feature plumbing, exact-gated (round-3):
    channel means / n_px / nonzero_frac close analytically from render_rgb;
    thumb_mean joins from the single-process expectations fixture
    (tools/build_multimodal_fixture.py)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="rgb", limit=100)
    return MM.decode_features(imgs, resize_to=64)


def q_multimodal_jpeg_prog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG (SOF2) multimodal path (r5,
    sources/codec_jpeg_prog.py — full spectral selection + successive
    approximation, the default large-photo mode of web export
    pipelines; reference analogue: GDAL decode-anything ingest,
    /root/reference/src/io.py:41-63).  Same diagonal-tile transcode as
    q_multimodal_jpeg but through the progressive encoder's 9-scan
    script; decode routes via the SOF2 dispatch in codec_jpeg.

    Oracle: REUSES q_multimodal_jpeg's frozen fixture verbatim — a
    progressive stream carries exactly the baseline encoding's
    quantized coefficients, so decoded pixels (and therefore every
    feature) must match the baseline gate BIT-FOR-BIT.  The scan
    protocol itself is additionally pinned by tests/test_jpeg_prog.py's
    identity property over random/structured/subsampled images."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec, codec_jpeg_prog, images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="rgb", limit=8)
    t, step = CFG.tile_size, CFG.tile_size - CFG.overlap_px

    def transcode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                nx = 1 + max(int(r.w) - t + step - 1, 0) // step
                ny = 1 + max(int(r.h) - t + step - 1, 0) // step
                for i in range(min(nx, ny)):
                    ox, oy = i * step, i * step
                    tile = arr[oy : oy + t, ox : ox + t]
                    rows.append(
                        (
                            f"{r.image_id}_{i + 1}_{i + 1}",
                            codec_jpeg_prog.encode_jpeg_progressive(
                                np.ascontiguousarray(tile), quality=95
                            ),
                            tile.shape[1], tile.shape[0], "jpeg",
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    jpeg_tiles = imgs.mapInPandas(
        transcode, schema="image_id string, bytes binary, w int, h int, fmt string"
    )
    return MM.decode_features(jpeg_tiles, resize_to=64)


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-JPEG multimodal path, exact-gated (round-3) against the
    single-process expectations fixture (tools/build_multimodal_fixture.py;
    lossy DCT pixels have no closed SQL form — the PSNR>=40 contract is
    additionally pinned in tests/test_jpeg.py): slice a diagonal tile
    sample, transcode each 200^2 tile to baseline JFIF with the pure-numpy
    codec, run decode->resize->feature extraction — the web-data jpeg shape
    of a training pipeline at tile granularity."""
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec, images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="rgb", limit=8)
    t, step = CFG.tile_size, CFG.tile_size - CFG.overlap_px

    import numpy as np

    def transcode(batches):
        # fused decode -> diagonal tile windows -> jpeg encode: one image
        # decode per row, and only the sampled tiles are ever encoded
        # (slice_tiles would png-encode the FULL grid first)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                nx = 1 + max(int(r.w) - t + step - 1, 0) // step
                ny = 1 + max(int(r.h) - t + step - 1, 0) // step
                for i in range(min(nx, ny)):
                    ox, oy = i * step, i * step
                    tile = arr[oy : oy + t, ox : ox + t]
                    rows.append(
                        (
                            f"{r.image_id}_{i + 1}_{i + 1}",
                            codec.encode(np.ascontiguousarray(tile), "jpeg"),
                            tile.shape[1], tile.shape[0], "jpeg",
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    jpeg_tiles = imgs.mapInPandas(
        transcode, schema="image_id string, bytes binary, w int, h int, fmt string"
    )
    return MM.decode_features(jpeg_tiles, resize_to=64)


def q_multimodal_tiff_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG-compressed GeoTIFF gate (TIFF compression 7 — the layout real
    aerial orthomosaic corpora ship in): the q_multimodal_jpeg diagonal
    tiles, but containerised as multi-strip TIFF so the expectations pin
    strip reassembly, JPEGTables-free standalone segments AND the lossy
    payload through decode -> resize -> features.  Oracle: frozen
    single-process expectations (tools/build_multimodal_fixture.py)."""
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec, codec_tiff, images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="rgb", limit=8)
    t, step = CFG.tile_size, CFG.tile_size - CFG.overlap_px

    import numpy as np

    def transcode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                nx = 1 + max(int(r.w) - t + step - 1, 0) // step
                ny = 1 + max(int(r.h) - t + step - 1, 0) // step
                for i in range(min(nx, ny)):
                    ox, oy = i * step, i * step
                    tile = arr[oy : oy + t, ox : ox + t]
                    rows.append(
                        (
                            f"{r.image_id}_{i + 1}_{i + 1}",
                            codec_tiff.encode_tiff(
                                np.ascontiguousarray(tile),
                                compression="jpeg",
                                rows_per_strip=64,
                            ),
                            tile.shape[1], tile.shape[0], "tif",
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    tiles = imgs.mapInPandas(
        transcode, schema="image_id string, bytes binary, w int, h int, fmt string"
    )
    return MM.decode_features(tiles, resize_to=64)


def _await_stream(spark: SparkSession, start_fn, state_partitions: int = 8):
    """Run an availableNow stateful stream to completion with a bounded
    state-partition count.  The state store spawns one task per shuffle
    partition per microbatch, and at gate-scale state (a few thousand
    keys) those tasks are pure overhead: 64 -> 8 partitions measured
    4.7 -> 2.1 s warm on stream_ingest_stats at sf0.1.  The partition
    count is pinned by the query's FIRST run into its checkpoint — a
    deployment sizes it to state volume, exactly like
    spark.sql.shuffle.partitions for batch — so it must stay set until
    the run completes (restoring right after start() would race the
    stream thread's planning)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        start_fn().awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _capped_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(image_id, pk) for pk <= 60 — the shared driver of every per-pk
    media fixture (wav/gif/mp3/mp4/webm synth).  The filtered meta arrives
    as ONE split; per-row codec work is CPU-bound, so spread rows across
    the cluster before entering Python (cheap metadata-only shuffle)."""
    meta = derived.images_meta(spark, sf_dir).select(
        "image_id", F.substring("image_id", 5, 18).cast("long").alias("pk")
    ).filter(F.col("pk") <= 60)
    return meta.repartition(spark.sparkContext.defaultParallelism, "image_id")


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio path: deterministic sawtooth PCM WAVs (synthesized
    per-pk, encoded through the real RIFF codec) -> integer features with
    a closed-form SQL twin.  s[i] = ((i*a + b) % 65536) - 32768."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                a, b = 3 + pk % 7, (pk * 97) % 65536
                n = 4000 + (pk % 50) * 137
                i = np.arange(n, dtype=np.int64)
                s0 = (((i * a + b) % 65536) - 32768).astype(np.int16)
                ch = 1 + pk % 2
                s = np.stack([s0] * ch, axis=1)
                rows.append((r.image_id, codec_wav.encode_wav(s, 16000), "wav"))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_audio_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-float WAV (audio_format 3, the studio/DAW interchange
    layout, r5): the deterministic sawtooth family scaled to [-1, 1]
    floats, encoded through the real float-WAV writer (32-bit on even
    pk, 64-bit on odd), decoded back as float64 and quantized by
    audio_features' rint(32767 x).  The quantization recovers the int16
    sawtooth EXACTLY (float32 relative error x 32767 < 0.07 < 0.5,
    pinned by tests/test_codec_wav_g711.py), so the oracle is the same
    closed-form integer SQL as the PCM gate — no fixture."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                a, b = 2 + pk % 9, (pk * 131) % 65536
                n = 3500 + (pk % 45) * 119
                i = np.arange(n, dtype=np.int64)
                s0 = ((i * a + b) % 65536) - 32768
                ch = 1 + pk % 2
                f = np.stack([s0 / 32767.0] * ch, axis=1)
                bits = 32 if pk % 2 == 0 else 64
                if bits == 32:
                    f = f.astype(np.float32)
                rows.append(
                    (
                        r.image_id,
                        codec_wav.encode_wav_float(f, 22050, bits=bits),
                        "wav",
                    )
                )
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_audio_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telephony + studio WAV layouts (r5): the same deterministic
    sawtooth as q_audio_features, routed per-pk through G.711 mu-law
    (pk%3==0), G.711 A-law (pk%3==1), or 24-bit PCM (pk%3==2, scaled
    x201 into the 24-bit range).  The SQL twin re-derives every decoded
    sample — the companding laws are closed-form segment quantizers, so
    the oracle is exact integer arithmetic, no fixture."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                a, b = 3 + pk % 7, (pk * 97) % 65536
                n = 3000 + (pk % 40) * 101
                i = np.arange(n, dtype=np.int64)
                s0 = (((i * a + b) % 65536) - 32768).astype(np.int16)
                ch = 1 + pk % 2
                s = np.stack([s0] * ch, axis=1)
                variant = pk % 3
                if variant == 0:
                    blob = codec_wav.encode_wav_g711(s, 8000, "mu")
                elif variant == 1:
                    blob = codec_wav.encode_wav_g711(s, 8000, "a")
                else:
                    blob = codec_wav.encode_wav24(
                        s.astype(np.int32) * 201, 48000
                    )
                rows.append((r.image_id, blob, "wav"))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_audio_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA/DVI ADPCM WAV gate (r5, audio_format 0x11 — the classic 4:1
    compressed-WAV layout): per-pk deterministic two-tone PCM encoded
    through the from-scratch IMA quantizer (sources/codec_wav.py), decoded
    back by the vectorized block decoder, reduced to audio_features ints.
    Signal spec (mirrored verbatim by tools/build_adpcm_fixture.py):

        rate = [8000, 22050, 44100][pk % 3];  n = 2500 + (pk % 6) * 500
        x = 0.55 sin(2 pi f1 i / rate) + 0.3 sin(2 pi f2 i / rate + 0.7)
        f1 = 150 + 29 (pk % 11);  f2 = 900 + 41 (pk % 9)
        ch0 = rint(30000 x); odd pk adds ch1 = -ch0 // 3

    ADPCM is lossy (staircase quantizer), so the oracle is the frozen
    single-process expectations table — the same pattern as mp3_audio."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                rate = [8000, 22050, 44100][pk % 3]
                n = 2500 + (pk % 6) * 500
                i = np.arange(n, dtype=np.float64)
                f1 = 150 + 29 * (pk % 11)
                f2 = 900 + 41 * (pk % 9)
                x = 0.55 * np.sin(2 * np.pi * f1 / rate * i) + 0.3 * np.sin(
                    2 * np.pi * f2 / rate * i + 0.7
                )
                ch0 = np.rint(30000 * x).astype(np.int16)
                if pk % 2:
                    sig = np.stack([ch0, (-ch0 // 3).astype(np.int16)], axis=1)
                else:
                    sig = ch0
                rows.append(
                    (r.image_id, codec_wav.encode_wav_adpcm(sig, rate), "wav")
                )
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real animation path: deterministic animated GIFs (encoded through
    the real LZW codec), frame-sampled every 2nd frame, per-frame exact
    channel sums.  idx[y][x] = (y + 3x + pk + 7*frame) % 16 over a 16-color
    arithmetic palette — the SQL twin re-derives every pixel."""
    import numpy as np
    import pandas as pd
    import zlib as _z

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_gif

    meta = _capped_media_meta(spark, sf_dir)

    pal = np.stack(
        [
            (np.arange(16) * 17) % 256,
            (np.arange(16) * 29) % 256,
            (np.arange(16) * 41) % 256,
        ],
        axis=1,
    ).astype(np.uint8)

    def synth(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                h, w = 40 + pk % 7, 50 + pk % 11
                n = 6 + pk % 5
                y, x = np.mgrid[0:h, 0:w]
                frames = [
                    ((y + 3 * x + pk + 7 * k) % 16).astype(np.uint8)
                    for k in range(n)
                ]
                rows.append((r.image_id, codec_gif.encode_gif(frames, pal), "gif"))
            yield pd.DataFrame(rows, columns=["video_id", "bytes", "fmt"])

    gifs = meta.mapInPandas(
        synth, schema="video_id string, bytes binary, fmt string"
    )
    sampled = MM.frame_sample(gifs, every_n=2)

    def sums(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                fr = np.frombuffer(
                    _z.decompress(bytes(r.frame_bytes)), dtype=np.uint8
                ).reshape(int(r.h), int(r.w), 3)
                s = fr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append(
                    (r.video_id, int(r.frame_idx), int(s[0]), int(s[1]), int(s[2]))
                )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "sum_r", "sum_g", "sum_b"]
            )

    return sampled.mapInPandas(
        sums,
        schema="video_id string, frame_idx int, sum_r long, sum_g long, sum_b long",
    )


def q_cc_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed cross-tile connected components (the unbounded-mosaic
    scale path, operators/cc_global.py): per-tile labels -> seam
    equivalence join -> iterative min-id propagation -> exact per-region
    pixel counts, never materializing an image.  Oracle: each synthetic
    blob is one region of exactly rw*rh pixels."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import cc_global, raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="mask", limit=120)
    tiles = raster.slice_tiles(imgs, CFG)
    return cc_global.distributed_cc_areas(tiles, CFG)


def q_multimodal_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decode gate: per-image int64 channel sums over the rgb
    corpus — every decoded byte enters the oracle, so codec framing /
    unfilter / channel-order bugs cannot hide (closed-form twin from the
    separable gradient + rect overwrites of render_rgb)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="rgb", limit=80)
    return MM.pixel_sums(imgs)


def q_multimodal_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP-lossless decode gate: the same exact per-image channel-sum
    oracle as ``multimodal_pixel_sums``, but the payloads are VP8L streams
    from the from-scratch codec (sources/codec_webp.py) — lossless, so the
    closed-form sums hold bit-exactly through RIFF framing, prefix-code
    decode, and the literal fast path."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="webp", kind="rgb", limit=60)
    return MM.pixel_sums(imgs)


def q_multimodal_png16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit PNG decode gate over the DEM/elevation layout (the raster
    shape GDAL most often hands the reference's ``read_tif``,
    /root/reference/src/io.py:41-63): even-pk payloads are Adam7
    INTERLACED, odd-pk straight, so one gate drives both reassembly
    paths of sources/codec.py.  Oracle: closed-form sum + row/column-
    weighted moments — position-sensitive, so a pass scattered to the
    wrong rows preserves sum_elev but breaks sum_wy/sum_wx."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="dem16", limit=60)
    return MM.elev_stats(imgs)


def q_multimodal_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF decode gate: the reference's NATIVE raster format (GDAL
    GeoTIFF, /root/reference/src/io.py:41-63), from-scratch strip
    DEFLATE + horizontal-predictor codec (sources/codec_tiff.py).
    Lossless, so the same exact closed-form per-image channel-sum oracle
    as ``multimodal_pixel_sums`` holds bit-for-bit."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="tif", kind="rgb", limit=60)
    return MM.pixel_sums(imgs)


def q_multimodal_tiff_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter gate for the NATIVE TIFF decode path: every 4th
    image's payload becomes a forged TIFF — a structurally valid
    little-endian container whose BitsPerSample IFD entry is
    type-flipped to RATIONAL, exactly the hostile shape the fuzz suite
    found escaping as TypeError before codec_tiff._tag_ints.  The gate
    proves the fix at the ROW level: pixel_sums(on_error='quarantine')
    must return exact closed-form sums for intact rows and a NULL-
    feature ok=false row for each forgery — one hostile IFD never costs
    a good row or a task.  Companion to multimodal_quarantine (PNG
    path); reference analogue /root/reference/src/io.py:41-63 where one
    unreadable file aborts the ingest run."""
    import struct

    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_tiff
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    base = codec_tiff.encode_tiff(
        np.zeros((4, 4, 3), np.uint8), compression="none"
    )
    mut = bytearray(base)
    (ifd,) = struct.unpack("<I", mut[4:8])
    (n_entries,) = struct.unpack("<H", mut[ifd : ifd + 2])
    for i in range(n_entries):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", mut[e : e + 2])[0] == 258:
            mut[e + 2 : e + 4] = struct.pack("<H", 5)  # SHORT -> RATIONAL
    hostile = bytes(mut)

    imgs = IMG.images_table(spark, sf_dir, fmt="tif", kind="rgb", limit=60)
    pk = F.substring("image_id", 5, 18).cast("long")
    corrupted = imgs.withColumn(
        "bytes",
        F.when(pk % 4 == 0, F.lit(hostile)).otherwise(F.col("bytes")),
    )
    out = MM.pixel_sums(corrupted, on_error="quarantine")
    return out.select(
        "image_id", "n_px", "sum_r", "sum_g", "sum_b",
        F.col("error").isNull().alias("ok"),
    )


def q_geotiff_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 getGeodata through REAL GeoTIFF bytes: write_tif with the
    ModelPixelScale/ModelTiepoint georeference tags, then recover the
    affine geotransform by parsing the tags back (no pixel decode) and
    project the footprint bbox — the reference's write_tif ->
    getTileIndexFromFiles flow (/root/reference/src/io.py:55-90,
    bf_gridding.py:304-332), whereas ``image_extents`` trusts catalog
    columns.  Oracle: the same pure-arithmetic extents, plus crs_ok
    asserting the citation string survived the tag round-trip."""
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_tiff, images

    meta = derived.images_meta(spark, sf_dir).withColumn(
        "pk", F.substring("image_id", 5, 18).cast("long")
    ).filter(F.col("pk") <= 80)
    meta = meta.repartition(spark.sparkContext.defaultParallelism * 2, "image_id")

    def roundtrip(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = images.render_mask(int(r.pk), int(r.w), int(r.h))
                blob = codec_tiff.encode_tiff(
                    arr,
                    geo=(float(r.ulx), float(r.uly), 0.1, -0.1, images.CRS_TOKEN),
                    level=1,
                )
                g = codec_tiff.geotiff_geodata(blob)
                rows.append(
                    (
                        r.image_id,
                        g["ulx"],
                        g["uly"] + g["h"] * g["sy"],
                        g["ulx"] + g["w"] * g["sx"],
                        g["uly"],
                        g["crs"] == images.CRS_TOKEN,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "minx", "miny", "maxx", "maxy", "crs_ok"],
            )

    return meta.mapInPandas(
        roundtrip,
        schema=(
            "image_id string, minx double, miny double, "
            "maxx double, maxy double, crs_ok boolean"
        ),
    )


def q_geotiff_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cloud-optimized-GeoTIFF windowed-read gate: every mask raster is
    encoded as a TILED GeoTIFF (16x16 internal tiles, deflate) and a
    pk-derived half-size pixel window is decoded through
    ``codec_tiff.decode_tiff_window`` — entropy-decoding ONLY the tiles
    the window intersects, O(window) not O(raster)
    (test_codec_tiff counts the segment decodes).  This is the access
    pattern a 100 TB mosaic corpus demands: the reference's createTile
    loop re-reads the full scene per tile (/root/reference/src/
    bf_gridding.py:304-332 via io.read_tif); on a COG layout each task
    needs one range-request's worth of tiles instead.  Oracle: masks are
    disjoint 255-rects (one per quadrant), so the window sum is exact
    rect-overlap arithmetic: 255 * sum(|rect ∩ window|)."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_tiff, images

    meta = derived.images_meta(spark, sf_dir).withColumn(
        "pk", F.substring("image_id", 5, 18).cast("long")
    ).filter(F.col("pk") <= 60)
    meta = meta.repartition(spark.sparkContext.defaultParallelism * 2, "image_id")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk, w, h = int(r.pk), int(r.w), int(r.h)
                blob = codec_tiff.encode_tiff(
                    images.render_mask(pk, w, h),
                    compression="deflate",
                    tiling=(16, 16),
                    geo=(float(r.ulx), float(r.uly), 0.1, -0.1, images.CRS_TOKEN),
                )
                ww, wh = w // 2, h // 2
                wx0, wy0 = (pk * 13) % (w - ww), (pk * 17) % (h - wh)
                win = codec_tiff.decode_tiff_window(blob, wx0, wy0, ww, wh)
                rows.append(
                    (r.image_id, wx0, wy0, ww, wh, int(win.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "wx0", "wy0", "ww", "wh", "sum_v"]
            )

    return meta.mapInPandas(
        run,
        schema=(
            "image_id string, wx0 int, wy0 int, ww int, wh int, sum_v bigint"
        ),
    )


def q_window_chips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raster.read_windows operator gate: training-chip extraction at
    coordinates, end-to-end through the operator's real plan — window
    list grouped per image (collect_list), joined to the raster table on
    image_id (one blob crossing per image however many chips it serves),
    TIFF payloads window-decoded O(window).  The reference's training
    sampler reads whole rasters and crops in-process
    (/root/reference/src/dataGenerator.py:33-76); at 100 TB the chips
    must come to the executors, not the scenes to one process.  Same
    closed-form rect-overlap oracle as ``geotiff_window`` (limit 40) but
    the sums are computed from the DECODED CHIP BYTES the operator
    emitted, so the join/groupBy plumbing and chip re-encode are inside
    the gate."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="tif", kind="mask", limit=40)
    meta = derived.images_meta(spark, sf_dir).withColumn(
        "pk", F.substring("image_id", 5, 18).cast("long")
    ).filter(F.col("pk") <= 40)
    wins = meta.select(
        "image_id",
        ((F.col("pk") * 13) % (F.col("w") - F.floor(F.col("w") / 2)))
        .cast("int").alias("wx0"),
        ((F.col("pk") * 17) % (F.col("h") - F.floor(F.col("h") / 2)))
        .cast("int").alias("wy0"),
        F.floor(F.col("w") / 2).cast("int").alias("ww"),
        F.floor(F.col("h") / 2).cast("int").alias("wh"),
    )
    chips = raster.read_windows(imgs, wins, tile_fmt="png")

    def sums(batches):
        for pdf in batches:
            rows = [
                (
                    r.image_id, int(r.wx0), int(r.wy0), int(r.ww), int(r.wh),
                    int(
                        codec.decode(bytes(r.bytes), r.fmt, int(r.ww), int(r.wh))
                        .sum(dtype=np.int64)
                    ),
                )
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                rows, columns=["image_id", "wx0", "wy0", "ww", "wh", "sum_v"]
            )

    return chips.mapInPandas(
        sums,
        schema="image_id string, wx0 int, wy0 int, ww int, wh int, sum_v bigint",
    )


def q_box_chips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raster.read_boxes gate: the reference's geo-addressed read flow —
    getTileIndexFromFiles matches world windows to scenes, createTile
    ReadRasters the window (/root/reference/src/bf_gridding.py:304-332,
    545-560) — as a distributed plan: world boxes -> cell-index spatial
    join against the footprints (joins.bbox_range_join, no cartesian) ->
    -projwin pixel snapping -> windowed chip decode.  The boxes are the
    pk-derived windows of ``window_chips`` re-expressed in MODEL
    coordinates with a 0.3-cell interior margin, so the outward snap
    must recover exactly the same integer windows and the same
    closed-form rect-overlap oracle applies (limit 30)."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="tif", kind="mask", limit=30)
    meta = derived.images_meta(spark, sf_dir).withColumn(
        "pk", F.substring("image_id", 5, 18).cast("long")
    ).filter(F.col("pk") <= 30)
    wx0 = (F.col("pk") * 13) % (F.col("w") - F.floor(F.col("w") / 2))
    wy0 = (F.col("pk") * 17) % (F.col("h") - F.floor(F.col("h") / 2))
    ww, wh = F.floor(F.col("w") / 2), F.floor(F.col("h") / 2)
    cell = CFG.cell_size_m
    boxes = meta.select(
        F.concat(F.lit("box_"), "image_id").alias("box_id"),
        (F.col("ulx") + wx0 * cell + 0.3 * cell).alias("minx"),
        (F.col("ulx") + (wx0 + ww) * cell - 0.3 * cell).alias("maxx"),
        (F.col("uly") - (wy0 + wh) * cell + 0.3 * cell).alias("miny"),
        (F.col("uly") - wy0 * cell - 0.3 * cell).alias("maxy"),
    )
    chips = raster.read_boxes(imgs, boxes, CFG)

    def sums(batches):
        for pdf in batches:
            rows = [
                (
                    r.image_id, int(r.wx0), int(r.wy0), int(r.ww), int(r.wh),
                    int(
                        codec.decode(bytes(r.bytes), r.fmt, int(r.ww), int(r.wh))
                        .sum(dtype=np.int64)
                    ),
                )
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                rows, columns=["image_id", "wx0", "wy0", "ww", "wh", "sum_v"]
            )

    return chips.mapInPandas(
        sums,
        schema="image_id string, wx0 int, wy0 int, ww int, wh int, sum_v bigint",
    )


def q_multimodal_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row error-policy gate (operators/multimodal.py on_error):
    every 4th image's payload is replaced with a hostile blob (valid PNG
    magic, garbage body — exercising the hardened decoder, sources/
    _hardening.py), then ``pixel_sums(on_error='quarantine')`` must
    return the EXACT closed-form channel sums for every intact row and a
    NULL-feature quarantine row (ok=false) for every corrupted one — one
    bad payload never costs a good row, and never a task.  At 100 TB
    this is the ingest posture: Spark's default exception->task-retry->
    job-death path is not an option against a corpus that certainly
    contains hostile bytes.  Reference analogue: the ingest loop opens
    every raster GDAL can parse (/root/reference/src/io.py:41-63) and a
    single unreadable file aborts the run — the engine upgrades that to
    an accounted-for dead-letter row."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="rgb", limit=80)
    pk = F.substring("image_id", 5, 18).cast("long")
    corrupted = imgs.withColumn(
        "bytes",
        F.when(
            pk % 4 == 0, F.lit(b"\x89PNG\r\n\x1a\nhostile-bytes")
        ).otherwise(F.col("bytes")),
    )
    out = MM.pixel_sums(corrupted, on_error="quarantine")
    return out.select(
        "image_id", "n_px", "sum_r", "sum_g", "sum_b",
        F.col("error").isNull().alias("ok"),
    )


def q_training_tensors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M5 tensor prep, exact-gated (round-3): the rgb x-side resizes
    from native dims through the real bilinear kernel (M3); the label
    y-side is rendered tile-sized (200x200) so its resize is the identity
    and the tensor sum closes analytically — label plane = sum(rw*rh)
    (255->1 remap, M4) and the EDT weight plane (M5) is the same integer
    onion-ring arithmetic as ``edt_weight_hist``, with every weight
    float32-rounded exactly as the kernel emits it."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import datagen as DG
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="rgb", limit=50)
    labels = IMG.images_table(
        spark, sf_dir, fmt="png", kind="mask",
        limit=50, size=(CFG.tile_size, CFG.tile_size),
    )
    paired = DG.pair_image_label(imgs, labels)
    t = DG.training_tensors(paired, CFG)
    return t.select(
        "image_id",
        F.size("x").alias("x_len"),
        F.size("y").alias("y_len"),
        F.round(F.aggregate("y", F.lit(0.0), lambda a, v: a + v), 2).alias("y_sum"),
    )


def q_watershed_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 watershed partial oracle: dumbbell masks (two squares + bridge =
    ONE connected component) must split into exactly TWO instances; region
    count and total foreground area are closed-form, the seam itself is not
    (flat-bridge EDT ties) — so the gate checks counts + areas, the
    analytically-determined part of the watershed output."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="dumbbell", limit=80)
    labels = raster.postprocess_stage(imgs, CFG, separation="watershed")
    return raster.label_stats(labels)


def q_edt_weight_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4+M5 exact gate: integer histogram of the EDT distance-weight plane
    over native-resolution masks; closed-form "onion ring" oracle."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import datagen as DG
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    labels = IMG.images_table(spark, sf_dir, fmt="png", kind="mask", limit=50)
    return DG.edt_weight_hist(labels)


def _synth_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mp4 (even pk) / webm (odd pk) corpus through the REAL
    from-scratch container writers: n = 5+pk%6 samples, w = 160+pk%32,
    h = 120+pk%16, sample k is 50+(pk*13+7k)%100 bytes with byte j =
    (pk+11k+j)%256, timestamps 40 ms apart — every field closed-form for
    the SQL twin."""
    import pandas as pd

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import container_mp4, container_webm

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                n, w, h = 5 + pk % 6, 160 + pk % 32, 120 + pk % 16
                samples = [
                    bytes(
                        (pk + 11 * k + j) % 256
                        for j in range(50 + (pk * 13 + 7 * k) % 100)
                    )
                    for k in range(n)
                ]
                if pk % 2 == 0:
                    data = container_mp4.build_mp4(
                        samples, w, h, codec="avc1", timescale=1000, sample_delta=40
                    )
                else:
                    data = container_webm.build_webm(
                        [(40 * k, s) for k, s in enumerate(samples)],
                        w, h, codec="V_VP9",
                    )
                rows.append((r.image_id, data, "mp4" if pk % 2 == 0 else "webm"))
            yield pd.DataFrame(rows, columns=["video_id", "bytes", "fmt"])

    return meta.mapInPandas(synth, schema="video_id string, bytes binary, fmt string")


def q_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container probing (mixed mp4 + webm corpus): ISO BMFF
    box walk / EBML element walk -> exact per-file stream metadata
    (codec fourcc, dimensions, sample count, encoded byte total, duration)
    — the metadata pass an ingest pipeline runs on every blob before any
    codec decode.  Every output field is closed-form in pk."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    return MM.container_meta(_synth_videos(spark, sf_dir), id_col="video_id")


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-level frame extraction: every 2nd encoded sample is
    sliced out of the mp4 (stsz/stsc/stco offset math) or webm
    (SimpleBlock walk) payload; the gate sums the extracted bytes, so a
    single wrong offset anywhere in the sample tables breaks it."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    sampled = MM.frame_sample(_synth_videos(spark, sf_dir), every_n=2)

    def sums(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(r.frame_bytes), dtype=np.uint8)
                rows.append(
                    (r.video_id, int(r.frame_idx), int(buf.size),
                     int(buf.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "frame_sz", "payload_sum"]
            )

    return sampled.mapInPandas(
        sums,
        schema="video_id string, frame_idx int, frame_sz int, payload_sum long",
    )


def q_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-audio frame walk (sources/codec_mp3.py): deterministic
    CBR streams (n = 8+pk%9 frames, bitrate index 1+pk%14, sample-rate
    index pk%3) -> exact frame count, byte total, duration, bitrate via
    sync-walk + the spec's frame-length arithmetic."""
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_mp3

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                data = codec_mp3.build_mp3(
                    8 + pk % 9, 1 + pk % 14, pk % 3, fill_seed=pk
                )
                rows.append((r.image_id, data, "mp3"))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(synth, schema="audio_id string, bytes binary, fmt string")
    return MM.container_meta(audio, id_col="audio_id")


def _synth_mjpeg_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Motion-JPEG corpus through the REAL writers: even pk
    -> mp4 with an ISO 'jpeg' video sample entry, odd pk -> webm with a
    Matroska 'V_MJPEG' track; every sample is a complete baseline-JFIF
    image from our own encoder (quality 50, so DC quantization genuinely
    bites).  Frames are grayscale planes of two 8px-aligned constant
    vertical bands (cols [0,80) = va, [80,w) = vb) — per-block-constant
    planes survive the lossy DCT as exactly one deterministic value per
    band (DC-only blocks), which is what lets the oracle stay closed-form
    through a REAL lossy codec.  w = 160+8*(pk%5), h = 120+8*(pk%3),
    n = 4+pk%5, va = (pk*7+11*fi)%256, vb = (pk*13+17*fi+128)%256."""
    import numpy as np
    import pandas as pd

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import (
            codec_jpeg, container_mp4, container_webm,
        )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                w, h = 160 + 8 * (pk % 5), 120 + 8 * (pk % 3)
                n = 4 + pk % 5
                samples = []
                for fi in range(n):
                    frame = np.full(
                        (h, w), (pk * 7 + 11 * fi) % 256, dtype=np.uint8
                    )
                    frame[:, 80:] = (pk * 13 + 17 * fi + 128) % 256
                    samples.append(codec_jpeg.encode_jpeg(frame, quality=50))
                if pk % 2 == 0:
                    data = container_mp4.build_mp4(
                        samples, w, h, codec="jpeg", timescale=1000,
                        sample_delta=40,
                    )
                else:
                    data = container_webm.build_webm(
                        [(40 * k, s) for k, s in enumerate(samples)],
                        w, h, codec="V_MJPEG",
                    )
                rows.append(
                    (r.image_id, data, "mp4" if pk % 2 == 0 else "webm")
                )
            yield pd.DataFrame(rows, columns=["video_id", "bytes", "fmt"])

    return meta.mapInPandas(
        synth, schema="video_id string, bytes binary, fmt string"
    )


def q_video_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video PIXEL decode (mixed mp4 + webm Motion-JPEG corpus):
    container probe -> encoded-sample extraction -> per-frame baseline-JFIF
    decode -> exact per-frame pixel sums, all in one Arrow hop.  The gate
    is exact THROUGH a lossy codec: per-8px-band-constant frames decode to
    one deterministic value per band (DC-only quantization), tabulated by
    the oracle from single-process 8x8 roundtrips."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    return MM.video_decode_frames(
        _synth_mjpeg_videos(spark, sf_dir), every_n=2, id_col="video_id"
    )


def q_video_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM audio-track decode out of multi-trak MP4s: files carry a
    video track plus a 'sowt' (16-bit LE PCM) audio track written FIRST in
    moov (as real muxers do); the engine must pick the soun trak, walk its
    own stsz/stsc/stco tables, and decode the PCM — every output an exact
    integer with a pure-arithmetic SQL twin.  chunk k sample i:
    s = ((pk*31 + k*7 + i*3) % 65536) - 32768."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import container_mp4

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                vid_samples = [
                    bytes((pk + 3 * k + j) % 256 for j in range(40))
                    for k in range(2)
                ]
                n_chunks = 3 + pk % 4
                i = np.arange(256, dtype=np.int64)
                chunks = []
                for k in range(n_chunks):
                    s = ((pk * 31 + k * 7 + i * 3) % 65536) - 32768
                    chunks.append(s.astype("<i2").tobytes())
                data = container_mp4.build_mp4(
                    vid_samples, 64, 48, codec="avc1",
                    audio_samples=chunks, audio_codec="sowt",
                    audio_rate=8000 + (pk % 5) * 2000,
                )
                rows.append((r.image_id, data, "mp4"))
            yield pd.DataFrame(rows, columns=["media_id", "bytes", "fmt"])

    media = meta.mapInPandas(
        synth, schema="media_id string, bytes binary, fmt string"
    )
    return MM.audio_track_pcm(media, id_col="media_id")


def q_flac_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless FLAC decode (sources/codec_flac.py, from scratch:
    fixed predictors + Rice coding + CRCs): deterministic int16 signals —
    a 256-sample constant head (CONSTANT subframes) then a sawtooth body
    (FIXED-order residuals) — encoded through our encoder, decoded back by
    the engine under test into exact integer features.  FLAC is lossless,
    so the SQL twin re-derives every sample by pure arithmetic; even pk is
    mono, odd pk adds a small second channel (independent stereo).
    s0[i] = c for i < 256 else ((i*a + b) % 65536) - 32768;
    s1[i] = ((i*3 + 7) % 256) - 128."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_flac

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                n = 3000 + (pk % 40) * 111
                a, b = 5 + pk % 9, (pk * 131) % 65536
                c = (pk * 77) % 65536 - 32768
                i = np.arange(n, dtype=np.int64)
                s0 = np.where(i < 256, c, ((i * a + b) % 65536) - 32768)
                if pk % 2 == 0:
                    sig = s0.astype(np.int16)
                else:
                    s1 = ((i * 3 + 7) % 256) - 128
                    sig = np.stack([s0, s1], axis=1).astype(np.int16)
                rate = 8000 + (pk % 3) * 4000
                rows.append(
                    (r.image_id, codec_flac.encode_flac(sig, rate), "flac")
                )
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_mp3_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer I payload decode (sources/codec_mp3.py, from
    scratch: computed near-PR pseudo-QMF filterbank, spec bit layout,
    (2^nb-1)-level requantizer): deterministic multisine PCM encoded
    through our Layer I encoder, decoded back by the engine into exact
    integer features.  Layer I is lossy, so the oracle is the frozen
    single-process expectations table (tools/build_mp3_fixture.py, the
    multimodal_jpeg pattern); the codec's rate/distortion contract is
    separately pinned by tests/test_mp3.py.  Signal spec (mirrored in
    the fixture tool): rate = [32000,44100,48000][pk%3], bitrate_idx =
    6+pk%8, n = 2000+(pk%7)*400, three pk-keyed sines; odd pk adds a
    second channel reversed(ch0)//2."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_mp3

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                rate = [32000, 44100, 48000][pk % 3]
                n = 2000 + (pk % 7) * 400
                i = np.arange(n, dtype=np.float64)
                f1 = 200 + 17 * (pk % 13)
                f2 = 1100 + 37 * (pk % 11)
                f3 = 3800 + 53 * (pk % 7)
                x = (
                    0.3 * np.sin(2 * np.pi * f1 / rate * i)
                    + 0.25 * np.sin(2 * np.pi * f2 / rate * i + 1.0)
                    + 0.2 * np.sin(2 * np.pi * f3 / rate * i + 2.0)
                )
                ch0 = np.rint(32767 * x).astype(np.int16)
                sig = (
                    np.stack([ch0, ch0[::-1] // 2], axis=1) if pk % 2 else ch0
                )
                rows.append(
                    (
                        r.image_id,
                        codec_mp3.encode_mp3(sig, rate, 6 + pk % 8),
                        "mp3",
                    )
                )
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_mp3_audio_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer II payload decode (sources/codec_mp3.py, from
    scratch: spec allocation Tables 3-B.2a/3-B.2b, Table 3-B.4
    quantization classes with grouped 3/5/9-level codewords, scfsi
    scalefactor coding, the same computed filterbank as Layer I): a
    distinct multisine family encoded through our Layer II encoder and
    decoded back by the engine into exact integer features.  The oracle
    is the frozen single-process expectations table
    (tools/build_mp3_fixture.py :: mp3_l2_signal, which also documents
    the signal spec); the codec's rate/distortion contract is pinned by
    tests/test_mp3.py.  48 kHz streams hit B.2a and >= 96 kbps/ch
    44.1/32 kHz streams hit B.2b, so both transcribed tables are under
    the gate."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_mp3

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                rate = [32000, 44100, 48000][pk % 3]
                n = 3000 + (pk % 5) * 600
                i = np.arange(n, dtype=np.float64)
                f1 = 180 + 19 * (pk % 13)
                f2 = 950 + 41 * (pk % 11)
                f3 = 3400 + 59 * (pk % 7)
                x = (
                    0.3 * np.sin(2 * np.pi * f1 / rate * i)
                    + 0.25 * np.sin(2 * np.pi * f2 / rate * i + 1.0)
                    + 0.2 * np.sin(2 * np.pi * f3 / rate * i + 2.0)
                )
                ch0 = np.rint(32767 * x).astype(np.int16)
                if pk % 2:
                    sig, bi = np.stack([ch0, ch0[::-1] // 2], axis=1), 7 + pk % 8
                else:
                    sig, bi = ch0, 3 + pk % 8
                rows.append(
                    (
                        r.image_id,
                        codec_mp3.encode_mp3(sig, rate, bi, layer=2),
                        "mp3",
                    )
                )
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_mp3_audio_l3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer III payload decode (sources/codec_mp3_l3.py,
    from scratch: 17/32-byte side-info bit layout, part2 scalefactor
    decode, Huffman big-values pairs + count1 quadruples, x^(4/3)
    requantization, alias-reduction butterflies, 36-point IMDCT with
    overlap-add, frequency inversion, the shared polyphase synthesis
    filterbank).  Restricted profile documented in the module docstring
    (long blocks, tables 0/1 + count1B, bit reservoir + scfsi scale-
    factor sharing both live) — the last MPEG-1 audio layer, leaving
    AAC as the only audio stub.  Oracle:
    frozen single-process expectations
    (tools/build_mp3_fixture.py :: mp3_l3_signal, which documents the
    signal spec); rate/distortion pinned by tests/test_mp3.py."""
    import numpy as np
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import multimodal as MM

    meta = _capped_media_meta(spark, sf_dir)

    def synth(batches):
        from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_mp3

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk = int(r.pk)
                rate = [32000, 44100, 48000][pk % 3]
                n = 2600 + (pk % 6) * 500
                i = np.arange(n, dtype=np.float64)
                f1 = 160 + 23 * (pk % 13)
                f2 = 870 + 43 * (pk % 11)
                f3 = 3100 + 61 * (pk % 7)
                x = (
                    0.3 * np.sin(2 * np.pi * f1 / rate * i)
                    + 0.25 * np.sin(2 * np.pi * f2 / rate * i + 1.0)
                    + 0.2 * np.sin(2 * np.pi * f3 / rate * i + 2.0)
                )
                ch0 = np.rint(32767 * x).astype(np.int16)
                if pk % 2:
                    sig = np.stack([ch0, ch0[::-1] // 2], axis=1)
                else:
                    sig = ch0
                rows.append(
                    (
                        r.image_id,
                        codec_mp3.encode_mp3(sig, rate, 13 + pk % 2, layer=3),
                        "mp3",
                    )
                )
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "fmt"])

    audio = meta.mapInPandas(
        synth, schema="audio_id string, bytes binary, fmt string"
    )
    return MM.audio_features(audio)


def q_stream_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming path under an exact oracle: the images
    catalog lands as files, a readStream -> watermarked 5 s window ->
    append-mode parquet sink runs to completion (availableNow), and the
    gate returns the sunk windows.  Event time is deterministic —
    base + (pk*7 % 97) seconds — so append-mode semantics are exact SQL:
    every window with win_end <= max event time has been flushed by the
    final watermark, the tail window stays pending (the documented
    append-mode contract, streaming/stream.py).  Windows are reported as
    offsets from the base timestamp so session/oracle timezones cancel."""
    import tempfile

    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_ingest_stats

    base = "2026-01-01 00:00:00"
    meta = derived.images_meta(spark, sf_dir).select(
        "image_id", "w", "h",
        F.substring("image_id", 5, 18).cast("long").alias("pk"),
    )
    stamped = meta.select(
        "image_id", "w", "h",
        (
            F.to_timestamp(F.lit(base))
            + F.make_interval(secs=((F.col("pk") * 7) % 97).cast("double"))
        ).alias("event_ts"),
    )
    tmp = tempfile.mkdtemp(prefix="stream_gate_")
    src, out, cp = f"{tmp}/src", f"{tmp}/out", f"{tmp}/cp"
    # >= 2 source files so the stream sees multiple microbatches, the
    # shape that actually exercises watermark advancement
    stamped.repartition(8).write.parquet(src)
    sch = StructType(
        [
            StructField("image_id", StringType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("event_ts", TimestampType()),
        ]
    )
    _await_stream(
        spark,
        lambda: stream_ingest_stats(
            spark, src, out, cp,
            window="5 seconds", watermark="0 seconds",
            event_time_col="event_ts", schema=sch,
        ),
    )
    res = spark.read.parquet(out)
    base_s = F.unix_timestamp(F.to_timestamp(F.lit(base)))
    return res.select(
        (F.unix_timestamp("win_start") - base_s).alias("win_off_s"),
        "images", "pixels", "tiles",
    )


def q_stream_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_gen_tiles under the SAME exact oracle: the
    images catalog streams in (readStream over parquet files), gen_tiles
    expands every image incrementally, and the append-mode parquet sink
    accumulates the full grid — proving the batch operator composes
    unchanged into the incremental path (streaming/stream.py
    stream_tiles, checkpointed so a restart resumes, the streaming twin
    of the manifest-based batch resume)."""
    import tempfile

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_tiles

    meta = derived.images_meta(spark, sf_dir).select(
        "image_id",
        F.lit(None).cast("binary").alias("bytes"),
        "w", "h",
        F.lit("png").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
        "ulx", "uly",
        F.lit("EPSG:32643").alias("crs"),
    )
    tmp = tempfile.mkdtemp(prefix="stream_tiles_gate_")
    src, out, cp = f"{tmp}/src", f"{tmp}/out", f"{tmp}/cp"
    meta.repartition(8).write.parquet(src)
    q = stream_tiles(spark, src, out, cp, CFG)
    q.awaitTermination()
    return spark.read.parquet(out).select(
        "image_id", "tiy", "tix", "tile_id", "off_x", "off_y", "tw", "th"
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup under an exact oracle: the images catalog
    streams in with a deterministic synthetic phash (pk % 251, NULL on
    every 10th pk), dropDuplicatesWithinWatermark keeps the first
    arrival per hash, null-phash rows bypass dedup
    (streaming/stream.py stream_dedup_images).  WHICH duplicate
    survives is scheduler-dependent, so the gate compares the
    deterministic projection: one row per distinct surviving phash with
    its row count (1 for every hash, #nulls for the NULL group)."""
    import tempfile

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_dedup_images

    meta = derived.images_meta(spark, sf_dir).select(
        "image_id",
        F.lit(None).cast("binary").alias("bytes"),
        "w", "h",
        F.lit("png").alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.substring("image_id", 5, 18).cast("long").alias("pk"),
        "ulx", "uly",
        F.lit("EPSG:32643").alias("crs"),
    ).withColumn(
        "phash",
        F.when(F.col("pk") % 10 == 0, F.lit(None).cast("long")).otherwise(
            (F.col("pk") % 251).cast("long")
        ),
    ).drop("pk").select(  # IMAGES_SCHEMA column order
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "ulx",
        "uly", "crs",
    )
    tmp = tempfile.mkdtemp(prefix="stream_dedup_gate_")
    src, out, cp = f"{tmp}/src", f"{tmp}/out", f"{tmp}/cp"
    meta.repartition(8).write.parquet(src)
    _await_stream(spark, lambda: stream_dedup_images(spark, src, out, cp))
    return (
        spark.read.parquet(out)
        .groupBy("phash")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_stream_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState) under
    an exact oracle: the full tile grid streams in out of order across
    microbatches, per-image state counts tiles seen, and one
    (image_id, n_tiles, complete=true) row is emitted the moment the
    image's grid is complete (streaming/stream.py
    stream_image_completion; availableNow runs under NoTimeout — the
    non-termination this gate originally caught is documented there).
    The backlog is complete, so exactly one row per image emerges with
    n_tiles = nx*ny — the same closed-form grid arithmetic as the
    gen_tiles oracle."""
    import tempfile

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_image_completion

    # pk cap: the gate's cost is stateful-shuffle bound, not insight
    # bound — 500 images (~19k tiles) still split across microbatches
    # and accumulate state across them at every SF
    imgs = derived.images_meta(spark, sf_dir).filter(
        F.substring("image_id", 5, 18).cast("long") <= 500
    )
    tiles = grid.gen_tiles(imgs, CFG, with_geo=False).select(
        "image_id", "tile_id", "tiy", "tix", "w", "h"
    )
    tmp = tempfile.mkdtemp(prefix="stream_completion_gate_")
    src, out, cp = f"{tmp}/src", f"{tmp}/out", f"{tmp}/cp"
    # many files -> several microbatches (maxFilesPerTrigger=4), so most
    # images genuinely accumulate state across batches before completing
    tiles.repartition(16).write.parquet(src)
    _await_stream(spark, lambda: stream_image_completion(spark, src, out, cp, CFG))
    return spark.read.parquet(out).select("image_id", "n_tiles", "complete")


_PHASH_PK_CAP = 60  # matches tools/build_phash_fixture.py


def q_phash_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/imagehash.phash64 gate: the input_hint ``phash`` column
    computed from decoded pixels (gray -> 32x32 -> DCT-II -> 8x8 median
    threshold), Arrow-batched end-to-end.  Oracle: frozen expectations
    from a SINGLE-PROCESS run of the same public kernel
    (tools/build_phash_fixture.py) — the IVF-centroid/skeleton fixture
    pattern; kernel-level correctness is pinned by
    tests/test_imagehash.py."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import imagehash as IH
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(
        spark, sf_dir, fmt="png", kind="rgb", limit=_PHASH_PK_CAP
    )
    return IH.phash64(imgs).select("image_id", "phash")


def _planted_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic near-dup-planted hash table, expressible identically
    in DuckDB (see _phash_near_dup_sql): groups of 4 consecutive pks
    share a 62-bit LCG base; members 0/1 carry it verbatim (exact dups),
    member 2 flips 1 bit, member 3 flips 2 — every in-group pair sits at
    Hamming <= 2, cross-group pairs at ~31."""
    meta = derived.images_meta(spark, sf_dir).withColumn(
        "pk", F.substring("image_id", 5, 18).cast("long")
    )
    g = F.floor(F.col("pk") / 4).cast("long")
    base = ((g * 1103515245 + 12345) % 1073741824) * F.lit(4294967296).cast(
        "long"
    ) + (g * 69069 + 1) % 1073741824
    m = F.col("pk") % 4
    mask = (
        F.when(m == 2, 1).when(m == 3, 3).otherwise(0).cast("long")
    )
    return meta.select(
        "image_id", base.bitwiseXOR(mask).cast("long").alias("phash")
    )


def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/imagehash.hamming_near_dup gate: all image pairs within
    Hamming 3 over a planted 64-bit hash column, found by the pigeonhole
    band multi-index (4 x 16-bit bands over DISTINCT hashes, equi-join,
    bit_count verify).  The DuckDB oracle brute-forces ALL pairs with
    xor+bit_count — a fully independent algorithm, so it checks the
    banding's completeness, not just its self-consistency."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import imagehash as IH

    return IH.hamming_near_dup(
        _planted_phash(spark, sf_dir), "image_id", "phash", max_hamming=3
    )


def q_phash_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.connected_components gate — the full dedup chain:
    planted hashes -> Hamming pair generation (banded multi-index) ->
    transitive closure (min-label propagation + pointer jumping) ->
    per-group rollup (component = min image_id, member count).  The
    oracle needs no graph algorithm at all: the plant makes every group
    of 4 consecutive pks one clique (pairwise Hamming <= 2) with no
    cross-group edge at Hamming <= 3 (verified by the brute-force
    phash_near_dup oracle emitting exactly the in-group pairs), so
    groups close as GROUP BY floor(pk/4)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import graph as G
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import imagehash as IH

    planted = _planted_phash(spark, sf_dir)
    pairs = IH.hamming_near_dup(planted, "image_id", "phash", max_hamming=3)
    comps = G.connected_components(
        pairs, vertices=planted.select("image_id"), id_col="image_id"
    )
    return comps.groupBy("component").agg(
        F.count("*").cast("long").alias("n_members")
    )


_ZONAL_PK_CAP = 120


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raster.zonal_stats gate: per-zone pixel aggregates over the mask
    corpus — 200 world-rectangle zones (50 image-grid columns x 4
    pixel-strip bands of 500 px = 50 m), each spanning every image in
    its column, so the zone rollup genuinely aggregates ACROSS images.
    The strip edges sit 0.3 cells inside exact pixel boundaries (the
    box_chips margin trick), so the -projwin snap recovers integer
    windows and the oracle closes in pure integer rect-overlap
    arithmetic (mask rects are disjoint)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(
        spark, sf_dir, fmt="png", kind="mask", limit=_ZONAL_PK_CAP
    )
    cell = CFG.cell_size_m
    zones = spark.range(200).select(
        F.floor(F.col("id") / 4).cast("int").alias("c"),
        (F.col("id") % 4).cast("int").alias("s"),
    )
    zones = zones.select(
        F.concat(
            F.lit("z_"), F.col("c").cast("string"),
            F.lit("_"), F.col("s").cast("string"),
        ).alias("zone_id"),
        (F.col("c") * 210.0 + F.col("s") * 500 * cell + 0.3 * cell).alias("minx"),
        F.lit(0.0).alias("miny"),
        (F.col("c") * 210.0 + (F.col("s") + 1) * 500 * cell - 0.3 * cell).alias("maxx"),
        F.lit(10500.0 - 0.3 * cell).alias("maxy"),
    )
    return raster.zonal_stats(imgs, zones, CFG)


def q_zonal_stats_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raster.zonal_stats_poly gate: the polygon-zone path (envelope
    join -> window snap -> per-pixel-center ray-cast mask -> in-decode
    reduction) over the SAME strip zones as ``zonal_stats``, expressed
    as explicit 4-gon vertex rings.  For rects whose edges sit 0.3
    cells inside pixel boundaries, the center-inside pixel set equals
    the snapped window exactly, so the integer rect-overlap oracle
    applies verbatim — while the query still exercises the general
    polygon machinery (pip_grid over every window pixel)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(
        spark, sf_dir, fmt="png", kind="mask", limit=_ZONAL_PK_CAP
    )
    cell = CFG.cell_size_m
    zones = spark.range(200).select(
        F.floor(F.col("id") / 4).cast("int").alias("c"),
        (F.col("id") % 4).cast("int").alias("s"),
    )
    minx = F.col("c") * 210.0 + F.col("s") * 500 * cell + 0.3 * cell
    maxx = F.col("c") * 210.0 + (F.col("s") + 1) * 500 * cell - 0.3 * cell
    miny, maxy = F.lit(0.0), F.lit(10500.0 - 0.3 * cell)
    zones = zones.select(
        F.concat(
            F.lit("z_"), F.col("c").cast("string"),
            F.lit("_"), F.col("s").cast("string"),
        ).alias("zone_id"),
        F.array(minx, maxx, maxx, minx).alias("xs"),
        F.array(miny, miny, maxy, maxy).alias("ys"),
    )
    return raster.zonal_stats_poly(imgs, zones, CFG)


def q_mvt_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vectortiles gate: polygon rows -> Mapbox Vector Tile blobs (z=3,
    8x8 tiles over a 10752 m square world, extent 4096) -> decode the
    blobs back and aggregate the DECODED integer geometry per tile.
    Exercises the full encode -> shuffle -> protobuf decode loop: tile
    assignment (envelope + sequence explode, JVM-side), Sutherland-
    Hodgman clip, floor quantization, MVT 2.1 winding, command-stream
    and zigzag-delta coding, tags/values tables, feature ids.  The 300
    synthetic rects are formula-derived (many straddle tile borders; 63
    of 64 tiles covered), so the oracle closes in pure clamp+floor
    arithmetic — for axis-aligned rects the clip IS the clamp."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import vectortiles as VT

    tiles = VT.polygons_to_mvt(
        _mvt_test_polys(spark), (0.0, 0.0, 10752.0, 10752.0), zoom=3
    )
    return VT.mvt_tile_stats(tiles)


def _mvt_test_polys(spark: SparkSession) -> DataFrame:
    """300 formula-derived axis-aligned rects over the 10752 m square
    world — shared by the single-zoom and pyramid MVT gates."""
    pk = F.col("id")
    x0 = (pk * 37 % 97) * 110.0 + 17.0
    y0 = (pk * 53 % 89) * 115.0 + 23.0
    x1 = F.least(x0 + 420.0 + (pk % 7) * 310.0, F.lit(10752.0))
    y1 = F.least(y0 + 380.0 + (pk % 5) * 290.0, F.lit(10752.0))
    return spark.range(300).select(
        pk.alias("polygon_id"),
        F.array(
            F.array(x0, y0), F.array(x1, y0),
            F.array(x1, y1), F.array(x0, y1),
        ).alias("ring"),
        ((pk % 13) - 3).alias("value"),
    )


def q_mvt_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-zoom vector-tile pyramid gate (the reference's product is a
    multi-level overview pyramid, /root/reference/src/io.py:188-192 +
    O7): the SAME polygon layer tiled at zooms 0..3 in one output —
    1 + 4 + 16 + 64 tile grid, every level encoded, shuffled, and
    protobuf-decoded back.  Each zoom's tile width 10752/2^z is an exact
    binary division, so the clamp+floor oracle of q_mvt_tiles holds at
    every level with ts parameterized per zoom."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import vectortiles as VT

    polys = _mvt_test_polys(spark)
    bounds = (0.0, 0.0, 10752.0, 10752.0)
    out = None
    for z in range(4):
        stats = VT.mvt_tile_stats(VT.polygons_to_mvt(polys, bounds, zoom=z))
        out = stats if out is None else out.unionByName(stats)
    return out


def q_mvt_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vectortiles POINT gate (detection centroids / POI markers over
    REAL derived data): the events-derived point table -> points_to_mvt
    (single-MoveTo type-1 geometry, one tile per point at buffer 0) ->
    decode back and aggregate.  Every point is strictly inside the z=3
    scheme, so tile assignment and quantization are the same floor
    expressions DuckDB evaluates over POINTS_META_SQL."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import vectortiles as VT
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import derived

    pts = derived.points_meta(spark, sf_dir)
    tiles = VT.points_to_mvt(
        pts, (0.0, 0.0, 10752.0, 10752.0), zoom=3, id_col="pt_id"
    )
    return VT.mvt_tile_stats(tiles)


def q_skeleton_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raster.skeleton_paths gate: P2 skeleton planes -> vector
    centerline polylines (8-connected chain tracing + exact collinear
    merge).  On the bar fixtures each dilated bar thins to one straight
    horizontal run, so per image: n_paths = bar count, per-path pixel
    count = bw - bh (diff >= 4 by construction), and the collinear
    merge leaves exactly the 2 endpoints per path — all closed-form in
    SQL over the same bar formulas."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import raster
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

    imgs = IMG.images_table(spark, sf_dir, fmt="png", kind="bars", limit=60)
    paths = raster.skeleton_paths(raster.skeletonize_stage(imgs, CFG), CFG)
    return paths.groupBy("image_id").agg(
        F.count("*").alias("n_paths"),
        F.sum("n_px").alias("sum_px"),
        F.max("n_px").alias("max_px"),
        F.min("n_px").alias("min_px"),
        F.sum("n_vertices").alias("sum_vertices"),
    )


def q_mvt_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vectortiles LINESTRING gate (the road-centerline half of the
    vector map): 400 axis-aligned formula segments, alternating
    horizontal/vertical, many spanning several tiles -> lines_to_mvt
    (Liang-Barsky clip + floor quantization + MVT type-2 command
    stream) -> decode back and aggregate.  Axis-aligned segments make
    the clip a clamp on one axis and the fixed coordinate pins the
    covered row/column, so the oracle closes in CASE-on-parity
    clamp+floor SQL; a 2-vertex part has zero shoelace area, so
    sum_area2 = 0 doubles as a degenerate-geometry check."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import vectortiles as VT

    pk = F.col("id")
    horiz = (pk % 2) == 0
    c = (pk * 29 % 83) * 129.0 + 7.5
    a0 = (pk * 31 % 71) * 95.0 + 11.0
    a1 = F.least(a0 + 700.0 + (pk % 9) * 430.0, F.lit(10752.0))
    path = F.when(
        horiz, F.array(F.array(a0, c), F.array(a1, c))
    ).otherwise(F.array(F.array(c, a0), F.array(c, a1)))
    lines = spark.range(400).select(
        pk.alias("line_id"),
        path.alias("path"),
        ((pk % 11) - 5).alias("value"),
    )
    tiles = VT.lines_to_mvt(lines, (0.0, 0.0, 10752.0, 10752.0), zoom=3)
    return VT.mvt_tile_stats(tiles)


# Ordered for the driver's budget-bound correctness sweep: gates that have
# never appeared in a driver CORRECTNESS artifact run FIRST (the r1-r4 sweeps
# truncated at ~50 queries, always dropping the tail), then the cheap
# long-evidenced gates, with the most expensive already-evidenced pipelines
# last so a truncated sweep loses only redundant evidence.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- never driver-sampled before round 5: run first ------------------- #
    "reproject_extents": q_reproject_extents,
    "mosaic_extent_wgs84": q_mosaic_extent_wgs84,
    "audio_float": q_audio_float,
    "multimodal_jpeg_prog": q_multimodal_jpeg_prog,
    "multimodal_png16": q_multimodal_png16,
    "audio_adpcm": q_audio_adpcm,
    "audio_g711": q_audio_g711,
    "phash_compute": q_phash_compute,
    "phash_near_dup": q_phash_near_dup,
    "phash_dedup_groups": q_phash_dedup_groups,
    "zonal_stats": q_zonal_stats,
    "zonal_stats_poly": q_zonal_stats_poly,
    "mvt_tiles": q_mvt_tiles,
    "mvt_pyramid": q_mvt_pyramid,
    "mvt_lines": q_mvt_lines,
    "mvt_points": q_mvt_points,
    "skeleton_paths": q_skeleton_paths,
    "stream_ingest_stats": q_stream_ingest_stats,
    "stream_tiles": q_stream_tiles,
    "stream_dedup": q_stream_dedup,
    "stream_completion": q_stream_completion,
    "video_frames": q_video_frames,
    "video_pixels": q_video_pixels,
    "video_audio": q_video_audio,
    "mp3_meta": q_mp3_meta,
    "mp3_audio": q_mp3_audio,
    "mp3_audio_l2": q_mp3_audio_l2,
    "mp3_audio_l3": q_mp3_audio_l3,
    "flac_audio": q_flac_audio,
    "multimodal_tiff_quarantine": q_multimodal_tiff_quarantine,
    # --- previously driver-evidenced, cheap metadata/text gates ----------- #
    "tile_counts": q_tile_counts,
    "gen_tiles": q_gen_tiles,
    "gen_tiles_overlap20": q_gen_tiles_overlap20,
    "image_extents": q_image_extents,
    "mosaic_extent": q_mosaic_extent,
    "pyramid_meta": q_pyramid_meta,
    "pyramid_tiles": q_pyramid_tiles,
    "multires_meta": q_multires_meta,
    "exact_dedup": q_exact_dedup,
    "minhash_signature": q_minhash_signature,
    "lsh_pairs": q_lsh_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash": q_simhash,
    "text_stats": q_text_stats,
    "fingerprint": q_fingerprint,
    "lang_stats": q_lang_stats,
    "lang_id": q_lang_id,
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "video_meta": q_video_meta,
    "audio_features": q_audio_features,
    "gif_frames": q_gif_frames,
    "multimodal_features": q_multimodal_features,
    "multimodal_jpeg": q_multimodal_jpeg,
    "multimodal_pixel_sums": q_multimodal_pixel_sums,
    "multimodal_webp": q_multimodal_webp,
    "multimodal_tiff": q_multimodal_tiff,
    "multimodal_tiff_jpeg": q_multimodal_tiff_jpeg,
    "multimodal_quarantine": q_multimodal_quarantine,
    "geotiff_extents": q_geotiff_extents,
    "geotiff_window": q_geotiff_window,
    "window_chips": q_window_chips,
    "box_chips": q_box_chips,
    # --- previously driver-evidenced, expensive raster/join pipelines ----- #
    "bbox_join": q_bbox_join,
    "point_tile_assign": q_point_tile_assign,
    "pip_join": q_pip_join,
    "pip_join_arrow": q_pip_join_arrow,
    "knn_join": q_knn_join,
    "training_tensors": q_training_tensors,
    "edt_weight_hist": q_edt_weight_hist,
    "skeletonize": q_skeletonize,
    "skeletonize_bars": q_skeletonize_bars,
    "dice_jaccard": q_dice_jaccard,
    "cc_distributed": q_cc_distributed,
    "watershed_split": q_watershed_split,
    "pipeline_polygons": q_pipeline_polygons,
    "pipeline_watershed": q_pipeline_watershed,
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
            # constants derived from CFG like the other tile oracles, so an
            # EngineConfig change can't silently split engine from oracle
            body=f"""
SELECT image_id, w, h,
  CAST(1 + FLOOR((greatest(w - {CFG.tile_size}, 0) + {CFG.tile_size - CFG.overlap_px - 1}) / {CFG.tile_size - CFG.overlap_px}) AS INT) AS nx,
  CAST(1 + FLOOR((greatest(h - {CFG.tile_size}, 0) + {CFG.tile_size - CFG.overlap_px - 1}) / {CFG.tile_size - CFG.overlap_px}) AS INT) AS ny,
  CAST(1 + FLOOR((greatest(w - {CFG.tile_size}, 0) + {CFG.tile_size - CFG.overlap_px - 1}) / {CFG.tile_size - CFG.overlap_px}) AS INT)
    * CAST(1 + FLOOR((greatest(h - {CFG.tile_size}, 0) + {CFG.tile_size - CFG.overlap_px - 1}) / {CFG.tile_size - CFG.overlap_px}) AS INT) AS n_tiles
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
  uly + h * (-1e-1) AS miny,
  ulx + w * 1e-1    AS maxx,
  uly              AS maxy
FROM images_meta""",
        ),
        "mosaic_extent": derived.with_ctes(
            derived.IMAGES_META_SQL,
            body="""
SELECT
  min(ulx)              AS ulx,
  max(uly)              AS uly,
  max(ulx + w * 1e-1)    AS lrx,
  min(uly + h * (-1e-1)) AS lry,
  CAST(round((max(ulx + w * 1e-1) - min(ulx)) / 1e-1) AS BIGINT)    AS xsize,
  CAST(round((max(uly) - min(uly + h * (-1e-1))) / 1e-1) AS BIGINT) AS ysize
FROM images_meta""",
        ),
        "pip_join": _PIP_SQL,
        "pip_join_arrow": _PIP_SQL,
        "pipeline_polygons": _pipeline_polygons_sql(),
        "pipeline_watershed": _pipeline_watershed_sql(),
        "dice_jaccard": _dice_jaccard_sql(),
        "training_tensors": _training_tensors_sql(),
        "exact_dedup": "WITH " + T.EXACT_DEDUP_SQL,
        "minhash_signature": "WITH " + T.minhash_signature_sql(),
        "lsh_pairs": "WITH " + T.lsh_candidate_pairs_sql(),
        "ngram_jaccard": _ngram_jaccard_sql(),
        "simhash": "WITH " + T.simhash32_sql(),
        "text_stats": "WITH " + T.TEXT_STATS_SQL,
        "fingerprint": "WITH " + T.fingerprint_sql(),
        "lang_stats": "WITH " + T.LANG_STATS_SQL,
        "lang_id": "WITH " + T.lang_id_sql(),
        "ann_topk": """
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 16),
cand AS (
  SELECT q.qid, e.vec_id,
    row_number() OVER (
      PARTITION BY q.qid
      ORDER BY list_cosine_similarity(q.qvec, e.embedding) DESC, e.vec_id
    ) AS rank
  FROM q CROSS JOIN embeddings e
)
SELECT qid, CAST(rank AS INT) AS rank, vec_id FROM cand WHERE rank <= 10""",
        "pyramid_meta": derived.with_ctes(
            derived.IMAGES_META_SQL,
            _pyramid_sql(5),
            body="SELECT image_id, level, lw, lh, lscale FROM pyramid",
        ),
        "pyramid_tiles": derived.with_ctes(
            derived.IMAGES_META_SQL,
            _pyramid_sql(3),
            "lvl_meta AS (SELECT image_id, level, lw AS w, lh AS h FROM pyramid)",
            grid.gen_tiles_sql(CFG.tile_size, CFG.overlap_px, src="lvl_meta"),
            body="SELECT image_id, level, tiy, tix, tile_id, off_x, off_y, tw, th FROM tiles",
        ),
        "multires_meta": derived.with_ctes(
            derived.IMAGES_META_SQL,
            _multires_sql(),
            body="SELECT image_id, res_idx, resolution, rw, rh FROM multires",
        ),
        "embedding_near_dup": """
WITH e AS (SELECT * FROM embeddings WHERE vec_id < 1000)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35""",
        # the LSH hyperplanes are deterministic arithmetic -> the bucket ids
        # are SQL-expressible and both LSH paths get exact oracles
        "ann_lsh_topk": _ann_lsh_sql(),
        "embedding_near_dup_lsh": _near_dup_lsh_sql(),
        "ann_ivf_topk": _ann_ivf_sql(),
        "edt_weight_hist": _edt_weight_hist_sql(),
        "watershed_split": _watershed_split_sql(),
        "skeletonize_bars": _skeletonize_bars_sql(),
        "skeletonize": _skeletonize_sql(),
        "multimodal_pixel_sums": _multimodal_pixel_sums_sql(),
        "multimodal_png16": _multimodal_png16_sql(),
        "multimodal_quarantine": _multimodal_quarantine_sql(),
        "multimodal_webp": _multimodal_webp_sql(),
        "multimodal_tiff": _multimodal_tiff_sql(),
        "multimodal_tiff_quarantine": _multimodal_tiff_quarantine_sql(),
        "multimodal_tiff_jpeg": _multimodal_tiff_jpeg_sql(),
        "geotiff_extents": _geotiff_extents_sql(),
        "geotiff_window": _geotiff_window_sql(),
        "window_chips": _geotiff_window_sql(limit=40),
        "box_chips": _geotiff_window_sql(limit=30),
        "multimodal_features": _multimodal_features_sql(),
        "multimodal_jpeg": _multimodal_jpeg_sql(),
        # the progressive stream carries the baseline encoding's exact
        # quantized coefficients -> identical pixels -> identical fixture
        "multimodal_jpeg_prog": _multimodal_jpeg_sql(),
        "cc_distributed": _cc_distributed_sql(),
        "audio_features": _audio_features_sql(),
        "audio_g711": _audio_g711_sql(),
        "audio_adpcm": _audio_adpcm_sql(),
        "reproject_extents": _reproject_extents_sql(),
        "audio_float": _audio_float_sql(),
        "mosaic_extent_wgs84": f"""
SELECT min(lon_min_nd) AS lon_min_nd, min(lat_min_nd) AS lat_min_nd,
       max(lon_max_nd) AS lon_max_nd, max(lat_max_nd) AS lat_max_nd,
       count(*) AS n_images, count(DISTINCT epsg) AS n_zones
FROM read_parquet('{_REPROJECT_FIXTURE}')""",
        "gif_frames": _gif_frames_sql(),
        "video_meta": _video_meta_sql(),
        "video_frames": _video_frames_sql(),
        "mp3_meta": _mp3_meta_sql(),
        "video_pixels": _video_pixels_sql(),
        "video_audio": _video_audio_sql(),
        "flac_audio": _flac_audio_sql(),
        "mp3_audio": _mp3_audio_sql(),
        "mp3_audio_l2": _mp3_audio_l2_sql(),
        "mp3_audio_l3": _mp3_audio_l3_sql(),
        "stream_ingest_stats": _stream_ingest_stats_sql(),
        "stream_dedup": _stream_dedup_sql(),
        "stream_completion": _stream_completion_sql(),
        "phash_compute": _phash_compute_sql(),
        "phash_near_dup": _phash_near_dup_sql(),
        "zonal_stats": _zonal_stats_sql(),
        # margin-aligned rect 4-gons: center-inside set == snapped window,
        # so the polygon path shares the rect path's integer oracle
        "zonal_stats_poly": _zonal_stats_sql(),
        "phash_dedup_groups": _phash_dedup_groups_sql(),
        "mvt_tiles": _mvt_tiles_sql(),
        "mvt_pyramid": _mvt_pyramid_sql(),
        "mvt_lines": _mvt_lines_sql(),
        "mvt_points": _mvt_points_sql(),
        "skeleton_paths": _skeleton_paths_sql(),
        # the streamed grid must equal the batch grid bit-for-bit, so the
        # streaming gate reuses gen_tiles' exact closed-form oracle
        "stream_tiles": derived.with_ctes(
            derived.IMAGES_META_SQL,
            gt,
            body="SELECT image_id, tiy, tix, tile_id, off_x, off_y, tw, th FROM tiles",
        ),
        "knn_join": derived.with_ctes(
            derived.POINTS_META_SQL,
            derived.FOOTPRINTS_META_SQL,
            body="""
, cand AS (
  SELECT p.pt_id, f.fp_id,
    row_number() OVER (
      PARTITION BY p.pt_id
      ORDER BY (p.px - f.cx) * (p.px - f.cx) + (p.py - f.cy) * (p.py - f.cy), f.fp_id
    ) AS rank
  FROM points_meta p CROSS JOIN footprints_meta f
)
SELECT pt_id, fp_id, CAST(rank AS INT) AS rank FROM cand WHERE rank <= 5""",
        ),
        "bbox_join": derived.with_ctes(
            derived.IMAGES_META_SQL,
            gt,
            grid.tiles_geo_sql(),
            derived.FOOTPRINTS_META_SQL,
            derived.FOOTPRINTS_ENV_SQL,
            body="""
SELECT t.tile_id, f.fp_id
FROM tiles_geo t, footprints_env f
WHERE t.tminx < f.maxx AND t.tmaxx > f.minx
  AND t.tminy < f.maxy AND t.tmaxy > f.miny""",
        ),
        "point_tile_assign": derived.with_ctes(
            derived.IMAGES_META_SQL,
            gt,
            grid.tiles_geo_sql(),
            derived.POINTS_META_SQL,
            body="""
SELECT p.pt_id, t.tile_id
FROM points_meta p, tiles_geo t
WHERE p.px > t.tminx AND p.px < t.tmaxx
  AND p.py > t.tminy AND p.py < t.tmaxy""",
        ),
    }


from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T


def _pyramid_sql(levels: int) -> str:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.pyramid import pyramid_meta_sql

    return pyramid_meta_sql(levels)


def _multires_sql() -> str:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.pyramid import multires_meta_sql

    return multires_meta_sql()


def _ann_lsh_sql() -> str:
    """DuckDB twin of q_ann_lsh_topk: same deterministic hyperplane buckets
    (inlined as literals), same multiprobe masks, same rank/tie-break."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as S

    b = S.lsh_bucket_sql("embedding", 64)
    return f"""
WITH cb AS (
  SELECT vec_id, embedding, {b} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec, bucket AS bucket0
  FROM cb WHERE vec_id < 16
),
qp AS (
  SELECT qid, qvec, xor(bucket0, m) AS bucket
  FROM q, (SELECT unnest({S.probe_masks_sql(1)}) AS m)
),
cand AS (
  SELECT DISTINCT qp.qid, qp.qvec, cb.vec_id, cb.embedding
  FROM qp JOIN cb USING (bucket)
),
ranked AS (
  SELECT qid, vec_id,
    row_number() OVER (
      PARTITION BY qid
      ORDER BY list_cosine_similarity(qvec, embedding) DESC, vec_id
    ) AS rank
  FROM cand
)
SELECT qid, CAST(rank AS INT) AS rank, vec_id FROM ranked WHERE rank <= 10"""


_IVF_FIXTURE = "/root/repo/fixtures/ivf_centroids_sf0_01.parquet"


def _ann_ivf_sql() -> str:
    """DuckDB twin of q_ann_ivf_topk over the frozen quantizer
    (tools/build_ivf_fixture.py): nearest-centroid list assignment
    (tie -> smallest cent_id, matching the engine's max_by struct), nprobe=4
    probe lists per query, exact cosine rank within the probed lists.
    Pinned to the sf0.01 corpus the driver's correctness gate runs on."""
    return f"""
WITH cents AS (
  SELECT cent_id, cvec FROM read_parquet('{_IVF_FIXTURE}')
),
lists AS (
  SELECT vec_id, embedding, cent_id FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                 c.cent_id) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, qvec, cent_id FROM (
    SELECT q.vec_id AS qid, q.embedding AS qvec, c.cent_id,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
                 c.cent_id) AS rn
    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 16
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.qid, l.vec_id,
    row_number() OVER (PARTITION BY p.qid
      ORDER BY list_cosine_similarity(p.qvec, l.embedding) DESC, l.vec_id) AS rank
  FROM probes p JOIN lists l USING (cent_id)
)
SELECT qid, CAST(rank AS INT) AS rank, vec_id FROM cand WHERE rank <= 10"""


def _near_dup_lsh_sql() -> str:
    """DuckDB twin of q_embedding_near_dup_lsh: bucket-or-multiprobe
    candidate pairs, then the exact cosine threshold."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as S

    b = S.lsh_bucket_sql("embedding", 64)
    return f"""
WITH e AS (
  SELECT vec_id, embedding, {b} AS bucket0
  FROM embeddings WHERE vec_id < 1000
),
a AS (
  SELECT vec_id AS id_a, embedding AS vec_a, xor(bucket0, m) AS bucket
  FROM e, (SELECT unnest({S.probe_masks_sql(1)}) AS m)
),
b AS (
  SELECT vec_id AS id_b, embedding AS vec_b, bucket0 AS bucket FROM e
),
cand AS (
  SELECT DISTINCT id_a, id_b, vec_a, vec_b
  FROM a JOIN b USING (bucket) WHERE id_a < id_b
)
SELECT id_a, id_b FROM cand
WHERE list_cosine_similarity(vec_a, vec_b) >= 0.35"""


def _ngram_jaccard_sql() -> str:
    """LSH candidate pairs + exact shingle-set Jaccard."""
    return (
        "WITH "
        + T._lsh_ctes()
        + """,
sh_list AS (
  SELECT cid, list_distinct(list(substr(text, CAST(g AS INT), 5))) AS sh
  FROM sh0 GROUP BY cid
)
SELECT p.cid_a, p.cid_b,
  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM pairs p
JOIN sh_list a ON a.cid = p.cid_a
JOIN sh_list b ON b.cid = p.cid_b"""
    )


def _pipeline_polygons_sql() -> str:
    """Analytic oracle for the raster pipeline: the synthetic blobs are
    non-overlapping >=4x4 rectangles >=2 px apart, so after the 3x3 open and
    CC labeling each survives verbatim; labels are assigned in raster-scan
    order of first pixel (y0, then x0)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + rects_sql()
        + f"""
SELECT image_id,
  CAST(row_number() OVER (PARTITION BY image_id ORDER BY y0, x0) AS INT) AS poly_id,
  CAST(row_number() OVER (PARTITION BY image_id ORDER BY y0, x0) AS INT) AS value,
  CAST(round(rw * rh * 1e-2, 2) AS DOUBLE) AS area_m2,
  CAST(round(rw * rh * 1e-2, 2) AS DOUBLE) AS mbr_area_m2,
  ulx + x0 * 1e-1                 AS minx,
  ulx + (x0 + rw) * 1e-1          AS maxx,
  uly + (y0 + rh) * (-1e-1)       AS miny,
  uly + y0 * (-1e-1)              AS maxy
FROM rects
WHERE pk <= {PIPE_CAP}"""
    )


def _pipeline_watershed_sql() -> str:
    """Closed-form twin of q_pipeline_watershed: on the mask_sparse fixture
    every rect is one watershed region of exactly rw*rh px (>= 76 px
    Chebyshev separation guarantees one surviving ridge-plateau marker per
    rect; see sparse_params)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        sparse_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + sparse_sql()
        + """
SELECT image_id, round(rw * rh * 1e-2, 2) AS area_m2
FROM sparse WHERE pk <= 100"""
    )


def _training_tensors_sql() -> str:
    """Closed-form twin of q_training_tensors: 200x200 labels make the
    resize the identity, so y_sum = sum(label plane) + sum(weight plane) =
    sum(rw*rh) + onion-ring weights (float32-rounded 10/d + 1, bg d=-99)
    — the same integer EDT arithmetic _edt_weight_hist_sql pins per-ring."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    t = CFG.tile_size
    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + f""",
meta_t AS (
  SELECT image_id, pk, {t} AS w, {t} AS h, ulx, uly
  FROM images_meta_pk WHERE pk <= 50
),"""
        + rects_sql(src="meta_t")
        + f""",
label AS (
  SELECT image_id, CAST(sum(rw * rh) AS BIGINT) AS label_px
  FROM rects GROUP BY image_id
),
rings AS (
  SELECT image_id, rw, rh,
    unnest(generate_series(1, (least(rw, rh) + 1) // 2)) AS d
  FROM rects
),
fg AS (
  SELECT image_id, CAST(d AS INT) AS d,
    CAST(sum(
      greatest(rw - 2*(d-1), 0) * greatest(rh - 2*(d-1), 0)
      - greatest(rw - 2*d, 0) * greatest(rh - 2*d, 0)
    ) AS BIGINT) AS n_px
  FROM rings GROUP BY image_id, d
),
wsum AS (
  SELECT image_id,
    sum(n_px * CAST(CAST(10.0 / d + 1.0 AS REAL) AS DOUBLE)) AS w_fg
  FROM fg GROUP BY image_id
)
SELECT l.image_id,
  CAST({t * t * 3} AS INT) AS x_len,
  CAST({t * t * 2} AS INT) AS y_len,
  round(l.label_px + w.w_fg
        + ({t * t} - l.label_px)
          * CAST(CAST(10.0 / -99.0 + 1.0 AS REAL) AS DOUBLE),
        2) AS y_sum
FROM label l JOIN wsum w USING (image_id)"""
    )


def _watershed_split_sql() -> str:
    """Closed-form twin of q_watershed_split: n_regions = 2 by construction
    (see dumbbell_params bounds), fg_px = 2*s^2 + bh*blen."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        dumbbell_fg_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + dumbbell_fg_sql()
        + """
SELECT image_id, CAST(2 AS INT) AS n_regions, CAST(fg_px AS BIGINT) AS fg_px,
       round(fg_px * 1e-2, 2) AS area_m2
FROM dumbbell WHERE pk <= 80"""
    )


def _video_meta_sql() -> str:
    """Closed-form twin of q_video_meta: every container field re-derived
    from the pk arithmetic of _synth_videos (the Spark side must recover
    them by PARSING the mp4/webm bytes it built)."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS video_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT video_id, pk, 5 + pk % 6 AS n, 160 + pk % 32 AS w, 120 + pk % 16 AS h
  FROM meta
),
sizes AS (
  SELECT video_id, pk, n, w, h, unnest(generate_series(0, n - 1)) AS k
  FROM params
)
SELECT video_id,
  CASE WHEN pk % 2 = 0 THEN 'mp4' ELSE 'webm' END AS container,
  CASE WHEN pk % 2 = 0 THEN 'avc1' ELSE 'V_VP9' END AS codec,
  CAST(1 AS INT) AS n_streams,
  CAST(w AS INT) AS w,
  CAST(h AS INT) AS h,
  CAST(n AS BIGINT) AS n_samples,
  CAST(sum(50 + (pk * 13 + 7 * k) % 100) AS BIGINT) AS sum_sample_bytes,
  CAST(40 * n AS BIGINT) AS duration_ms,
  CAST(0 AS INT) AS sample_rate
FROM sizes
GROUP BY video_id, pk, n, w, h"""


def _video_frames_sql() -> str:
    """Closed-form twin of q_video_frames: re-derive every sampled encoded
    frame's size and byte-sum ((pk + 11k + j) % 256 filler) — the Spark
    side must slice the identical bytes back out of the container."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS video_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT video_id, pk, 5 + pk % 6 AS n FROM meta
),
frames AS (
  SELECT video_id, pk, unnest(generate_series(0, n - 1, 2)) AS k
  FROM params
),
fb AS (
  SELECT video_id, pk, k, 50 + (pk * 13 + 7 * k) % 100 AS sz FROM frames
),
bytes AS (
  SELECT video_id, pk, k, sz, unnest(generate_series(0, sz - 1)) AS j FROM fb
)
SELECT video_id,
  CAST(k AS INT) AS frame_idx,
  CAST(sz AS INT) AS frame_sz,
  CAST(sum((pk + 11 * k + j) % 256) AS BIGINT) AS payload_sum
FROM bytes
GROUP BY video_id, k, sz"""


def _mp3_meta_sql() -> str:
    """Closed-form twin of q_mp3_meta: MPEG1 Layer III bitrate/sample-rate
    tables (ISO/IEC 11172-3) + the exact frame-length arithmetic
    144 * bitrate / rate, padding 0."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS audio_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT audio_id,
    8 + pk % 9 AS n,
    list_extract(
      [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
      CAST(1 + pk % 14 AS INT)) AS br,
    list_extract([44100, 48000, 32000], CAST(1 + pk % 3 AS INT)) AS sr
  FROM meta
)
SELECT audio_id,
  'mp3' AS container,
  'mp3' AS codec,
  CAST(1 AS INT) AS n_streams,
  CAST(0 AS INT) AS w,
  CAST(0 AS INT) AS h,
  CAST(n AS BIGINT) AS n_samples,
  CAST(n * (144 * br * 1000 // sr) AS BIGINT) AS sum_sample_bytes,
  CAST(n * 1152 * 1000 // sr AS BIGINT) AS duration_ms,
  CAST(sr AS INT) AS sample_rate
FROM params"""


def _video_pixels_sql() -> str:
    """Twin of q_video_pixels — exact through a REAL lossy codec.  Frames
    are per-8px-band-constant, so every 8x8 block is constant and only its
    DC coefficient survives quantization: the decoded plane is one
    deterministic value per band, a pure function f(v) of the band value.
    f is tabulated here by 256 single-process 8x8 encode/decode roundtrips
    (no Spark machinery shared — a distributed-plumbing bug cannot cancel
    out); geometry and band values are closed-form in pk."""
    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.codec_jpeg import (
        decode_jpeg, encode_jpeg,
    )

    vals = ",".join(
        "({}, {})".format(
            v,
            int(
                decode_jpeg(
                    encode_jpeg(np.full((8, 8), v, np.uint8), quality=50)
                )[0, 0]
            ),
        )
        for v in range(256)
    )
    return f"""
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS video_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT video_id, pk, 160 + 8 * (pk % 5) AS w, 120 + 8 * (pk % 3) AS h,
         4 + pk % 5 AS n
  FROM meta
),
frames AS (
  SELECT video_id, pk, w, h, unnest(generate_series(0, n - 1, 2)) AS fi
  FROM params
),
ftab AS (SELECT * FROM (VALUES {vals}) t(v, fv))
SELECT video_id,
  CAST(fi AS INT) AS frame_idx,
  CAST(w AS INT) AS fw,
  CAST(h AS INT) AS fh,
  CAST(w * h AS BIGINT) AS n_px,
  CAST(80 * h * fa.fv + (w - 80) * h * fb.fv AS BIGINT) AS sum_px
FROM frames
JOIN ftab fa ON fa.v = (pk * 7 + 11 * fi) % 256
JOIN ftab fb ON fb.v = (pk * 13 + 17 * fi + 128) % 256"""


def _video_audio_sql() -> str:
    """Pure-arithmetic twin of q_video_audio: re-derive every PCM sample
    of the 'sowt' audio track with staged generate_series (chunk k, then
    sample i — DuckDB zips sibling unnests, so the two levels must be
    separate CTEs) and aggregate the same exact integers."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS media_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT media_id, pk, 3 + pk % 4 AS nc, 8000 + (pk % 5) * 2000 AS rate
  FROM meta
),
ck AS (
  SELECT media_id, pk, rate, unnest(generate_series(0, nc - 1)) AS k
  FROM params
),
smp AS (
  SELECT media_id, pk, rate, k, unnest(generate_series(0, 255)) AS i
  FROM ck
),
vals AS (
  SELECT media_id, rate,
         ((pk * 31 + k * 7 + i * 3) % 65536) - 32768 AS s
  FROM smp
)
SELECT media_id,
  CAST(rate AS INT) AS sample_rate,
  CAST(count(*) AS BIGINT) AS n_samples,
  CAST(sum(s) AS BIGINT) AS sum_s,
  CAST(min(s) AS INT) AS min_s,
  CAST(max(s) AS INT) AS max_s,
  CAST(sum(abs(s)) AS BIGINT) AS sum_abs
FROM vals
GROUP BY media_id, rate"""


def _flac_audio_sql() -> str:
    """Pure-arithmetic twin of q_flac_audio — FLAC is lossless, so every
    decoded sample is re-derived exactly (constant head, sawtooth body,
    optional second channel) and the integer features must match to the
    bit; zero-crossings need the staged lag CTE (window-in-aggregate is
    not legal SQL)."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS audio_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT audio_id, pk,
    3000 + (pk % 40) * 111 AS n,
    5 + pk % 9 AS a,
    (pk * 131) % 65536 AS b,
    (pk * 77) % 65536 - 32768 AS c,
    8000 + (pk % 3) * 4000 AS rate,
    CAST(1 + pk % 2 AS INT) AS nch
  FROM meta
),
idx AS (
  SELECT audio_id, a, b, c, rate, n, nch,
         unnest(generate_series(0, n - 1)) AS i
  FROM params
),
vals AS (
  SELECT audio_id, rate, n, nch, i,
    CASE WHEN i < 256 THEN c ELSE ((i * a + b) % 65536) - 32768 END AS s0,
    ((i * 3 + 7) % 256) - 128 AS s1
  FROM idx
),
lagd AS (
  SELECT *, lag(s0) OVER (PARTITION BY audio_id ORDER BY i) AS p0 FROM vals
)
SELECT audio_id,
  CAST(n AS BIGINT) AS n_samples,
  CAST(nch AS INT) AS n_channels,
  CAST(rate AS INT) AS sample_rate,
  CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
  CAST(sum(abs(s0)) + CASE WHEN nch = 2 THEN sum(abs(s1)) ELSE 0 END
       AS BIGINT) AS sum_abs,
  CAST(sum(CASE WHEN p0 * s0 < 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS zero_crossings
FROM lagd
GROUP BY audio_id, n, nch, rate"""


def _audio_features_sql() -> str:
    """Closed-form twin of q_audio_features: re-derive every sawtooth
    sample with generate_series and aggregate the same exact integers."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS audio_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT audio_id, pk,
    3 + pk % 7 AS a, (pk * 97) % 65536 AS b,
    4000 + (pk % 50) * 137 AS n,
    CAST(1 + pk % 2 AS INT) AS ch
  FROM meta
),
samples AS (
  SELECT audio_id, a, b, n, ch, unnest(generate_series(0, n - 1)) AS i
  FROM params
),
vals AS (
  SELECT audio_id, n, ch, i,
    ((i * a + b) % 65536) - 32768 AS s,
    CASE WHEN i = 0 THEN NULL
         ELSE (((i - 1) * a + b) % 65536) - 32768 END AS prev_s
  FROM samples
)
SELECT audio_id,
  CAST(n AS BIGINT) AS n_samples,
  ch AS n_channels,
  CAST(16000 AS INT) AS sample_rate,
  CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
  CAST(ch * sum(abs(s)) AS BIGINT) AS sum_abs,
  CAST(count(*) FILTER (WHERE prev_s * s < 0) AS BIGINT) AS zero_crossings
FROM vals
GROUP BY audio_id, n, ch"""


def _audio_float_sql() -> str:
    """Closed-form twin of q_audio_float: the float32/64 encode ->
    decode -> rint(32767 x) chain recovers the int16 sawtooth exactly
    (see the gate docstring), so the oracle re-derives the same
    integers with generate_series — no fixture, no float in the SQL."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS audio_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT audio_id, pk,
    2 + pk % 9 AS a, (pk * 131) % 65536 AS b,
    3500 + (pk % 45) * 119 AS n,
    CAST(1 + pk % 2 AS INT) AS ch
  FROM meta
),
samples AS (
  SELECT audio_id, a, b, n, ch, unnest(generate_series(0, n - 1)) AS i
  FROM params
),
vals AS (
  SELECT audio_id, n, ch, i,
    ((i * a + b) % 65536) - 32768 AS s,
    CASE WHEN i = 0 THEN NULL
         ELSE (((i - 1) * a + b) % 65536) - 32768 END AS prev_s
  FROM samples
)
SELECT audio_id,
  CAST(n AS BIGINT) AS n_samples,
  ch AS n_channels,
  CAST(22050 AS INT) AS sample_rate,
  CAST(n * 1000 // 22050 AS BIGINT) AS duration_ms,
  CAST(ch * sum(abs(s)) AS BIGINT) AS sum_abs,
  CAST(count(*) FILTER (WHERE prev_s * s < 0) AS BIGINT) AS zero_crossings
FROM vals
GROUP BY audio_id, n, ch"""


def _audio_g711_sql() -> str:
    """Closed-form twin of q_audio_g711: the G.711 companding laws are
    segment quantizers (ITU-T G.711 / the Sun g711.c lattice), so every
    decoded sample is exact integer arithmetic — mag -> segment ->
    mantissa -> reconstruction, sign reapplied; the 24-bit variant is a
    x201 scale.  lag() supplies the previous sample for the strict
    zero-crossing count."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS audio_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT audio_id, pk,
    3 + pk % 7 AS a, (pk * 97) % 65536 AS b,
    3000 + (pk % 40) * 101 AS n,
    CAST(1 + pk % 2 AS INT) AS ch,
    pk % 3 AS variant
  FROM meta
),
samples AS (
  SELECT audio_id, a, b, n, ch, variant,
         unnest(generate_series(0, n - 1)) AS i
  FROM params
),
lin AS (
  SELECT audio_id, n, ch, variant, i,
    ((i * a + b) % 65536) - 32768 AS s
  FROM samples
),
mags AS (
  SELECT *, CASE WHEN variant = 0 THEN least(abs(s), 32635) + 132
                 ELSE least(abs(s), 32767) END AS mag
  FROM lin
),
segs AS (
  SELECT *, CASE WHEN mag < 256 THEN 0 WHEN mag < 512 THEN 1
                 WHEN mag < 1024 THEN 2 WHEN mag < 2048 THEN 3
                 WHEN mag < 4096 THEN 4 WHEN mag < 8192 THEN 5
                 WHEN mag < 16384 THEN 6 ELSE 7 END AS e
  FROM mags
),
quant AS (
  SELECT audio_id, n, ch, variant, i,
    CASE
      WHEN variant = 2 THEN s * 201
      WHEN variant = 0 THEN
        (CASE WHEN s < 0 THEN -1 ELSE 1 END)
        * ((((mag >> (e + 3)) & 15) * 8 + 132) * (1 << e) - 132)
      ELSE
        (CASE WHEN s < 0 THEN -1 ELSE 1 END)
        * (CASE WHEN e = 0 THEN (mag >> 4) * 16 + 8
                ELSE (((mag >> (e + 3)) & 15) * 16 + 264) * (1 << (e - 1))
           END)
    END AS val
  FROM segs
),
vals AS (
  SELECT *, lag(val) OVER (PARTITION BY audio_id ORDER BY i) AS prev_val
  FROM quant
)
SELECT audio_id,
  CAST(n AS BIGINT) AS n_samples,
  ch AS n_channels,
  CAST(CASE WHEN variant = 2 THEN 48000 ELSE 8000 END AS INT) AS sample_rate,
  CAST(n * 1000 // (CASE WHEN variant = 2 THEN 48000 ELSE 8000 END) AS BIGINT)
    AS duration_ms,
  CAST(ch * sum(abs(val)) AS BIGINT) AS sum_abs,
  CAST(count(*) FILTER (WHERE prev_val * val < 0) AS BIGINT) AS zero_crossings
FROM vals
GROUP BY audio_id, n, ch, variant"""


def _gif_frames_sql() -> str:
    """Closed-form twin of q_gif_frames: re-derive every sampled frame's
    pixels (idx = (y + 3x + pk + 7k) % 16) and sum the arithmetic palette
    channels."""
    return """
WITH meta AS (
  SELECT concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS video_id,
         p_partkey AS pk
  FROM part WHERE p_partkey <= 60
),
params AS (
  SELECT video_id, pk,
    40 + pk % 7 AS h, 50 + pk % 11 AS w, 6 + pk % 5 AS n
  FROM meta
),
ks AS (
  SELECT *, unnest(generate_series(0, n - 1, 2)) AS k FROM params
),
ys AS (SELECT *, unnest(generate_series(0, h - 1)) AS y FROM ks),
px AS (SELECT *, unnest(generate_series(0, w - 1)) AS x FROM ys),
vals AS (
  SELECT video_id, k, (y + 3 * x + pk + 7 * k) % 16 AS idx FROM px
)
SELECT video_id, CAST(k AS INT) AS frame_idx,
  CAST(sum((idx * 17) % 256) AS BIGINT) AS sum_r,
  CAST(sum((idx * 29) % 256) AS BIGINT) AS sum_g,
  CAST(sum((idx * 41) % 256) AS BIGINT) AS sum_b
FROM vals GROUP BY video_id, k"""


def _cc_distributed_sql() -> str:
    """Closed-form twin of q_cc_distributed: every synthetic blob is one
    4-connected region of exactly rw*rh pixels (blobs are >=2 px apart)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + rects_sql()
        + """
SELECT image_id, CAST(rw * rh AS BIGINT) AS region_px
FROM rects WHERE pk <= 120"""
    )


def _rgb_sums_ctes(limit: int) -> str:
    """Shared WITH-chain deriving render_rgb's closed-form channel sums.

    render_rgb is base[y][x] = 40 + (y*7+pk)%97 + (x*13+pk)%89 per channel
    (+17 g, +31 b; no uint8 wrap — max 255), with blob rects overwritten to
    (220, 210, 200).  Channel sums are separable:
      sum_r = 40wh + w*Syy + h*Sxx + 180A - B
      sum_g = 57wh + w*Syy + h*Sxx + 153A - B
      sum_b = 71wh + w*Syy + h*Sxx + 129A - B
    with Syy/Sxx the axis mod-sequence sums, A = blob px, B = the blobs'
    base-gradient sum minus its 40A constant.  Ends with CTEs
    ``imgs/rowsums/colsums/blob`` for the caller's SELECT."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + rects_sql()
        + f""",
imgs AS (SELECT image_id, pk, w, h FROM images_meta_pk WHERE pk <= {limit}),
ys AS (
  SELECT image_id, pk, unnest(generate_series(0, h - 1)) AS y FROM imgs
),
rowsums AS (
  SELECT image_id, CAST(sum((y * 7 + pk) % 97) AS BIGINT) AS syy
  FROM ys GROUP BY image_id
),
xs AS (
  SELECT image_id, pk, unnest(generate_series(0, w - 1)) AS x FROM imgs
),
colsums AS (
  SELECT image_id, CAST(sum((x * 13 + pk) % 89) AS BIGINT) AS sxx
  FROM xs GROUP BY image_id
),
rect_ys AS (
  SELECT image_id, pk, j, rw,
    unnest(generate_series(y0, y0 + rh - 1)) AS y
  FROM rects WHERE pk <= {limit}
),
rect_rowsums AS (
  SELECT image_id, j, CAST(sum(rw * ((y * 7 + pk) % 97)) AS BIGINT) AS b_y
  FROM rect_ys GROUP BY image_id, j
),
rect_xs AS (
  SELECT image_id, pk, j, rh,
    unnest(generate_series(x0, x0 + rw - 1)) AS x
  FROM rects WHERE pk <= {limit}
),
rect_colsums AS (
  SELECT image_id, j, CAST(sum(rh * ((x * 13 + pk) % 89)) AS BIGINT) AS b_x
  FROM rect_xs GROUP BY image_id, j
),
blob AS (
  SELECT r.image_id,
    CAST(sum(r.rw * r.rh) AS BIGINT) AS a,
    CAST(sum(ry.b_y + rx.b_x) AS BIGINT) AS b
  FROM rects r
  JOIN rect_rowsums ry ON ry.image_id = r.image_id AND ry.j = r.j
  JOIN rect_colsums rx ON rx.image_id = r.image_id AND rx.j = r.j
  WHERE r.pk <= {limit}
  GROUP BY r.image_id
)"""
    )


def _multimodal_webp_sql() -> str:
    """Closed-form twin of q_multimodal_webp — identical arithmetic to
    _multimodal_pixel_sums_sql (lossless codec => same sums), limit 60."""
    return (
        _rgb_sums_ctes(60)
        + """
SELECT i.image_id,
  CAST(i.w * i.h AS BIGINT) AS n_px,
  40 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 180 * bl.a - bl.b AS sum_r,
  57 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 153 * bl.a - bl.b AS sum_g,
  71 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 129 * bl.a - bl.b AS sum_b
FROM imgs i
JOIN rowsums rs USING (image_id)
JOIN colsums cs USING (image_id)
JOIN blob bl USING (image_id)"""
    )


def _multimodal_tiff_sql() -> str:
    """Closed-form twin of q_multimodal_tiff — identical arithmetic to
    _multimodal_pixel_sums_sql (lossless codec => same sums), limit 60."""
    return (
        _rgb_sums_ctes(60)
        + """
SELECT i.image_id,
  CAST(i.w * i.h AS BIGINT) AS n_px,
  40 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 180 * bl.a - bl.b AS sum_r,
  57 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 153 * bl.a - bl.b AS sum_g,
  71 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 129 * bl.a - bl.b AS sum_b
FROM imgs i
JOIN rowsums rs USING (image_id)
JOIN colsums cs USING (image_id)
JOIN blob bl USING (image_id)"""
    )


def _multimodal_tiff_quarantine_sql() -> str:
    """Twin of q_multimodal_tiff_quarantine: _multimodal_tiff_sql's
    closed-form sums for intact rows (pk % 4 != 0), NULL features +
    ok=false for the forged-IFD ones."""
    return (
        _rgb_sums_ctes(60)
        + """
SELECT i.image_id,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE CAST(i.w * i.h AS BIGINT) END AS n_px,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE 40 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 180 * bl.a - bl.b
       END AS sum_r,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE 57 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 153 * bl.a - bl.b
       END AS sum_g,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE 71 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 129 * bl.a - bl.b
       END AS sum_b,
  (i.pk % 4 <> 0) AS ok
FROM imgs i
JOIN rowsums rs USING (image_id)
JOIN colsums cs USING (image_id)
JOIN blob bl USING (image_id)"""
    )


def _geotiff_extents_sql() -> str:
    """Twin of q_geotiff_extents: the image_extents bbox arithmetic
    (float64 ulx + w * 1e-1 exactly matches the Python-side computation
    from the decoded GeoTIFF tags — the doubles round-trip bit-exactly
    through the tag encoding), restricted to pk <= 80, crs_ok constant
    true when the ASCII citation survives."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + """
SELECT image_id,
  ulx               AS minx,
  uly + h * (-1e-1) AS miny,
  ulx + w * 1e-1    AS maxx,
  uly               AS maxy,
  TRUE              AS crs_ok
FROM images_meta_pk WHERE pk <= 80"""
    )


def _geotiff_window_sql(limit: int = 60) -> str:
    """Twin of q_geotiff_window (limit 60) and q_window_chips (limit 40):
    the pk-derived window is pure integer arithmetic, the mask's rects
    are disjoint (one per quadrant), so the windowed pixel sum is 255 *
    sum over rects of the clamped per-axis overlap product.  LEFT JOIN
    keeps windows that miss every rect (sum_v = 0)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + f""",
imgs AS (SELECT * FROM images_meta_pk WHERE pk <= {limit}),"""
        + rects_sql("imgs")
        + """,
win AS (
  SELECT image_id,
    CAST((pk * 13) % (w - w // 2) AS INT) AS wx0,
    CAST((pk * 17) % (h - h // 2) AS INT) AS wy0,
    CAST(w // 2 AS INT) AS ww,
    CAST(h // 2 AS INT) AS wh
  FROM imgs
)
SELECT v.image_id, v.wx0, v.wy0, v.ww, v.wh,
  CAST(255 * COALESCE(SUM(
    GREATEST(0, LEAST(r.x0 + r.rw, v.wx0 + v.ww) - GREATEST(r.x0, v.wx0)) *
    GREATEST(0, LEAST(r.y0 + r.rh, v.wy0 + v.wh) - GREATEST(r.y0, v.wy0))
  ), 0) AS BIGINT) AS sum_v
FROM win v LEFT JOIN rects r USING (image_id)
GROUP BY v.image_id, v.wx0, v.wy0, v.ww, v.wh"""
    )


def _multimodal_quarantine_sql() -> str:
    """Twin of q_multimodal_quarantine: same closed-form sums as
    _multimodal_pixel_sums_sql for intact rows (pk % 4 != 0), NULL
    features + ok=false for the corrupted ones — the corruption rule is
    pure arithmetic on pk, so the quarantine split is fully
    oracle-checkable."""
    return (
        _rgb_sums_ctes(80)
        + """
SELECT i.image_id,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE CAST(i.w * i.h AS BIGINT) END AS n_px,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE 40 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 180 * bl.a - bl.b
       END AS sum_r,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE 57 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 153 * bl.a - bl.b
       END AS sum_g,
  CASE WHEN i.pk % 4 = 0 THEN NULL
       ELSE 71 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 129 * bl.a - bl.b
       END AS sum_b,
  (i.pk % 4 <> 0) AS ok
FROM imgs i
JOIN rowsums rs USING (image_id)
JOIN colsums cs USING (image_id)
JOIN blob bl USING (image_id)"""
    )


def _multimodal_png16_sql() -> str:
    """Closed-form twin of q_multimodal_png16 (see images.dem16_sums_ctes):
    separable 16-bit gradient, so sum and both axis-weighted moments are
    pure arithmetic over the mod-sequence sums.  ``//`` keeps the
    triangular numbers BIGINT (DuckDB ``/`` is float division)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import dem16_sums_ctes

    return (
        dem16_sums_ctes(60)
        + """
SELECT i.image_id,
  CAST(i.w * i.h AS BIGINT) AS n_px,
  512 * i.w * rs.syy + 23 * i.h * cs.sxx
    + CAST(1000 AS BIGINT) * i.w * i.h                         AS sum_elev,
  512 * i.w * rs.syy_w
    + (23 * cs.sxx + CAST(1000 AS BIGINT) * i.w)
      * ((CAST(i.h AS BIGINT) * (i.h - 1)) // 2)               AS sum_wy,
  23 * i.h * cs.sxx_w
    + (512 * rs.syy + CAST(1000 AS BIGINT) * i.h)
      * ((CAST(i.w AS BIGINT) * (i.w - 1)) // 2)               AS sum_wx
FROM imgs i
JOIN rowsums rs USING (image_id)
JOIN colsums cs USING (image_id)"""
    )


def _multimodal_pixel_sums_sql() -> str:
    """Closed-form twin of q_multimodal_pixel_sums (see _rgb_sums_ctes)."""
    return (
        _rgb_sums_ctes(80)
        + """
SELECT i.image_id,
  CAST(i.w * i.h AS BIGINT) AS n_px,
  40 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 180 * bl.a - bl.b AS sum_r,
  57 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 153 * bl.a - bl.b AS sum_g,
  71 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 129 * bl.a - bl.b AS sum_b
FROM imgs i
JOIN rowsums rs USING (image_id)
JOIN colsums cs USING (image_id)
JOIN blob bl USING (image_id)"""
    )


_MM_THUMB_FIXTURE = "/root/repo/fixtures/multimodal_thumb_sf0_01.parquet"
_MM_JPEG_FIXTURE = "/root/repo/fixtures/multimodal_jpeg_sf0_01.parquet"
_MM_TIFF_JPEG_FIXTURE = "/root/repo/fixtures/multimodal_tiff_jpeg_sf0_01.parquet"
_MP3_AUDIO_FIXTURE = "/root/repo/fixtures/mp3_audio_sf0_01.parquet"
_AUDIO_ADPCM_FIXTURE = "/root/repo/fixtures/audio_adpcm_sf0_01.parquet"
_MP3_AUDIO_L2_FIXTURE = "/root/repo/fixtures/mp3_audio_l2_sf0_01.parquet"
_MP3_AUDIO_L3_FIXTURE = "/root/repo/fixtures/mp3_audio_l3_sf0_01.parquet"
_REPROJECT_FIXTURE = "/root/repo/fixtures/reproject_extents_sf0_01.parquet"


_SKELETON_FIXTURE = "/root/repo/fixtures/skeleton_sf0_01.parquet"


def _skeletonize_sql() -> str:
    """Twin of q_skeletonize: frozen expectations from a single-process
    run of the same render -> dilate -> Zhang-Suen -> count chain
    (tools/build_skeleton_fixture.py) — retires round 3's last
    rows-only driver query."""
    return f"""
SELECT image_id, skeleton_px
FROM read_parquet('{_SKELETON_FIXTURE}')"""


_PHASH_FIXTURE = "/root/repo/fixtures/phash_sf0_01.parquet"


def _phash_compute_sql() -> str:
    """Twin of q_phash_compute: frozen expectations from a single-process
    run of the same pure-numpy pHash kernel over the same deterministic
    renders (tools/build_phash_fixture.py)."""
    return f"""
SELECT image_id, phash
FROM read_parquet('{_PHASH_FIXTURE}')"""


def _phash_near_dup_sql() -> str:
    """Twin of q_phash_near_dup — BRUTE FORCE: every pair, xor +
    bit_count, no banding, so the oracle shares no algorithm with the
    operator (quadratic is fine at the sf0.01 gate size)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import IMAGES_META_PK_SQL

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + """
, planted AS (
  SELECT image_id,
    xor(
      ((CAST(FLOOR(pk / 4) AS BIGINT) * 1103515245 + 12345) % 1073741824)
        * CAST(4294967296 AS BIGINT)
        + (CAST(FLOOR(pk / 4) AS BIGINT) * 69069 + 1) % 1073741824,
      CAST(CASE pk % 4 WHEN 2 THEN 1 WHEN 3 THEN 3 ELSE 0 END AS BIGINT)
    ) AS phash
  FROM images_meta_pk
)
SELECT a.image_id AS id_a, b.image_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM planted a JOIN planted b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3"""
    )


def _phash_dedup_groups_sql() -> str:
    """Twin of q_phash_dedup_groups: the planted components ARE the
    pk-groups of 4 (see q docstring), so the transitive closure reduces
    to a GROUP BY — no graph traversal in the oracle."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import IMAGES_META_PK_SQL

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + """
SELECT min(image_id) AS component, CAST(count(*) AS BIGINT) AS n_members
FROM images_meta_pk GROUP BY CAST(FLOOR(pk / 4) AS BIGINT)"""
    )


def _mvt_tiles_sql() -> str:
    """Twin of q_mvt_tiles in pure clamp+floor arithmetic.  For an
    axis-aligned rect, Sutherland-Hodgman clipping to the tile window is
    GREATEST/LEAST on each corner, quantization is FLOOR of the identical
    IEEE-double product (both engines evaluate the same expression tree,
    so the floors agree bit-for-bit), and a (polygon, tile) pair survives
    iff the quantized rect has nonzero width AND height — exactly the
    operator's degenerate-ring drop.  Decoded-side identities: 4 vertices
    per ring, coordinate sum = 2*(l+r) / 2*(t+b), doubled signed area =
    +2*w*h (positive iff the encoder enforced MVT 2.1 winding)."""
    return """
WITH polys AS (
  SELECT range AS pk,
         ((range*37) % 97)*110.0 + 17.0 AS x0,
         ((range*53) % 89)*115.0 + 23.0 AS y0,
         LEAST(((range*37) % 97)*110.0 + 17.0 + 420.0 + (range % 7)*310.0,
               10752.0) AS x1,
         LEAST(((range*53) % 89)*115.0 + 23.0 + 380.0 + (range % 5)*290.0,
               10752.0) AS y1,
         (range % 13) - 3 AS value
  FROM range(300)
), pairs AS (
  SELECT p.*, g1.range AS tx, g2.range AS ty,
         0.0 + g1.range*1344.0 AS wx0,
         10752.0 - g2.range*1344.0 AS wtop
  FROM polys p, range(8) g1, range(8) g2
), q AS (
  SELECT pk, tx, ty, value,
    CAST(FLOOR((GREATEST(x0, wx0) - wx0) * (4096.0/1344.0)) AS BIGINT) AS qxl,
    CAST(FLOOR((LEAST(x1, wx0 + 1344.0) - wx0) * (4096.0/1344.0)) AS BIGINT)
      AS qxr,
    CAST(FLOOR((wtop - LEAST(y1, wtop)) * (4096.0/1344.0)) AS BIGINT) AS qyt,
    CAST(FLOOR((wtop - GREATEST(y0, wtop - 1344.0)) * (4096.0/1344.0))
      AS BIGINT) AS qyb
  FROM pairs
)
SELECT CAST(3 AS INT) AS z, CAST(tx AS INT) AS tx, CAST(ty AS INT) AS ty,
       COUNT(*) AS n_features, COUNT(*) AS n_rings,
       4*COUNT(*) AS n_vertices, SUM(pk) AS sum_id,
       SUM(2*(qxl + qxr)) AS sum_qx, SUM(2*(qyt + qyb)) AS sum_qy,
       SUM(2*(qxr - qxl)*(qyb - qyt)) AS sum_area2, SUM(value) AS sum_value
FROM q WHERE qxr > qxl AND qyb > qyt
GROUP BY tx, ty"""


def _mvt_pyramid_sql() -> str:
    """Twin of q_mvt_pyramid: the q_mvt_tiles clamp+floor oracle with the
    tile size parameterized per zoom.  The zoom table carries literal
    tile widths (10752/2^z is exact in binary) so no POWER() rounding
    can split the two engines' IEEE expression trees."""
    return """
WITH polys AS (
  SELECT range AS pk,
         ((range*37) % 97)*110.0 + 17.0 AS x0,
         ((range*53) % 89)*115.0 + 23.0 AS y0,
         LEAST(((range*37) % 97)*110.0 + 17.0 + 420.0 + (range % 7)*310.0,
               10752.0) AS x1,
         LEAST(((range*53) % 89)*115.0 + 23.0 + 380.0 + (range % 5)*290.0,
               10752.0) AS y1,
         (range % 13) - 3 AS value
  FROM range(300)
), zooms(z, ts, n) AS (
  VALUES (0, 10752.0, 1), (1, 5376.0, 2), (2, 2688.0, 4), (3, 1344.0, 8)
), pairs AS (
  SELECT p.*, zz.z, zz.ts, g1.range AS tx, g2.range AS ty,
         0.0 + g1.range*zz.ts AS wx0,
         10752.0 - g2.range*zz.ts AS wtop
  FROM polys p, zooms zz, range(8) g1, range(8) g2
  WHERE g1.range < zz.n AND g2.range < zz.n
), q AS (
  SELECT pk, z, tx, ty, value,
    CAST(FLOOR((GREATEST(x0, wx0) - wx0) * (4096.0/ts)) AS BIGINT) AS qxl,
    CAST(FLOOR((LEAST(x1, wx0 + ts) - wx0) * (4096.0/ts)) AS BIGINT) AS qxr,
    CAST(FLOOR((wtop - LEAST(y1, wtop)) * (4096.0/ts)) AS BIGINT) AS qyt,
    CAST(FLOOR((wtop - GREATEST(y0, wtop - ts)) * (4096.0/ts)) AS BIGINT)
      AS qyb
  FROM pairs
)
SELECT CAST(z AS INT) AS z, CAST(tx AS INT) AS tx, CAST(ty AS INT) AS ty,
       COUNT(*) AS n_features, COUNT(*) AS n_rings,
       4*COUNT(*) AS n_vertices, SUM(pk) AS sum_id,
       SUM(2*(qxl + qxr)) AS sum_qx, SUM(2*(qyt + qyb)) AS sum_qy,
       SUM(2*(qxr - qxl)*(qyb - qyt)) AS sum_area2, SUM(value) AS sum_value
FROM q WHERE qxr > qxl AND qyb > qyt
GROUP BY z, tx, ty"""


def _mvt_lines_sql() -> str:
    """Twin of q_mvt_lines.  A horizontal segment lives in exactly the
    row ``floor((10752 - y)/1344)`` and clips by clamping x; a vertical
    one lives in column ``floor(x/1344)`` and clamps y.  A (segment,
    tile) pair survives iff the quantized endpoints differ on the
    varying axis (Liang-Barsky's empty-interval drop + quantize_line's
    single-point drop, in one inequality)."""
    return """
WITH segs AS (
  SELECT range AS pk,
         range % 2 = 0 AS horiz,
         ((range*29) % 83)*129.0 + 7.5 AS c,
         ((range*31) % 71)*95.0 + 11.0 AS a0,
         LEAST(((range*31) % 71)*95.0 + 11.0 + 700.0 + (range % 9)*430.0,
               10752.0) AS a1,
         (range % 11) - 5 AS value
  FROM range(400)
), pairs AS (
  SELECT s.*, g1.range AS tx, g2.range AS ty,
         0.0 + g1.range*1344.0 AS wx0,
         10752.0 - g2.range*1344.0 AS wtop
  FROM segs s, range(8) g1, range(8) g2
  WHERE CASE WHEN horiz
        THEN ty = CAST(FLOOR((10752.0 - c)/1344.0) AS BIGINT)
        ELSE tx = CAST(FLOOR(c/1344.0) AS BIGINT) END
), q AS (
  SELECT pk, tx, ty, value, horiz,
    CASE WHEN horiz
      THEN CAST(FLOOR((GREATEST(a0, wx0) - wx0) * (4096.0/1344.0))
           AS BIGINT)
      ELSE CAST(FLOOR((c - wx0) * (4096.0/1344.0)) AS BIGINT)
    END AS q1x,
    CASE WHEN horiz
      THEN CAST(FLOOR((LEAST(a1, wx0 + 1344.0) - wx0) * (4096.0/1344.0))
           AS BIGINT)
      ELSE CAST(FLOOR((c - wx0) * (4096.0/1344.0)) AS BIGINT)
    END AS q2x,
    CASE WHEN horiz
      THEN CAST(FLOOR((wtop - c) * (4096.0/1344.0)) AS BIGINT)
      ELSE CAST(FLOOR((wtop - LEAST(a1, wtop)) * (4096.0/1344.0))
           AS BIGINT)
    END AS q1y,
    CASE WHEN horiz
      THEN CAST(FLOOR((wtop - c) * (4096.0/1344.0)) AS BIGINT)
      ELSE CAST(FLOOR((wtop - GREATEST(a0, wtop - 1344.0)) *
                      (4096.0/1344.0)) AS BIGINT)
    END AS q2y
  FROM pairs
)
SELECT CAST(3 AS INT) AS z, CAST(tx AS INT) AS tx, CAST(ty AS INT) AS ty,
       COUNT(*) AS n_features, COUNT(*) AS n_rings,
       2*COUNT(*) AS n_vertices, SUM(pk) AS sum_id,
       SUM(q1x + q2x) AS sum_qx, SUM(q1y + q2y) AS sum_qy,
       CAST(0 AS BIGINT) AS sum_area2, SUM(value) AS sum_value
FROM q
WHERE (horiz AND q2x > q1x) OR (NOT horiz AND q2y > q1y)
GROUP BY tx, ty"""


def _zonal_stats_sql() -> str:
    """Twin of q_zonal_stats — pure integer arithmetic: zone (c, s)
    intersects image pk iff pk % 50 = c (images never cross the 210 m
    grid columns) and s*500 < w; the snapped window is then x in
    [s*500, least(w, s*500+500)) over the full height, so fg_px is the
    disjoint-rect x-overlap times rect height and sum_val is 255x that
    (mask value 255 inside rects, 0 outside)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + f""",
imgs AS (SELECT * FROM images_meta_pk WHERE pk <= {_ZONAL_PK_CAP}),"""
        + rects_sql("imgs")
        + """,
zones AS (
  SELECT c.g AS c, s.g AS s
  FROM (SELECT unnest(generate_series(0, 49)) AS g) c,
       (SELECT unnest(generate_series(0, 3)) AS g) s
),
pairs AS (
  SELECT z.c, z.s, i.image_id, i.w, i.h,
         CAST(z.s * 500 AS BIGINT)                AS wx0,
         CAST(least(i.w, z.s * 500 + 500) AS BIGINT) AS wx1
  FROM zones z JOIN imgs i ON i.pk % 50 = z.c AND z.s * 500 < i.w
),
wfg AS (
  SELECT p.c, p.s, p.image_id, p.h, p.wx1 - p.wx0 AS ww,
         COALESCE(SUM(
           greatest(0, least(r.x0 + r.rw, p.wx1) - greatest(r.x0, p.wx0))
           * r.rh
         ), 0) AS fg
  FROM pairs p LEFT JOIN rects r USING (image_id)
  GROUP BY p.c, p.s, p.image_id, p.h, p.wx0, p.wx1
)
SELECT concat('z_', CAST(c AS VARCHAR), '_', CAST(s AS VARCHAR)) AS zone_id,
       CAST(count(*) AS BIGINT)        AS n_images,
       CAST(SUM(ww * h) AS BIGINT)     AS n_px,
       CAST(SUM(fg) AS BIGINT)         AS fg_px,
       CAST(SUM(fg) * 255 AS BIGINT)   AS sum_val
FROM wfg GROUP BY c, s"""
    )


def _stream_dedup_sql() -> str:
    """Twin of q_stream_dedup: dedup of a complete backlog is DISTINCT —
    one row per non-null phash (n=1) plus the NULL group carrying every
    null-phash input row."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import IMAGES_META_PK_SQL

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + """
SELECT phash, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT DISTINCT pk % 251 AS phash FROM images_meta_pk WHERE pk % 10 <> 0
  UNION ALL
  SELECT CAST(NULL AS BIGINT) AS phash FROM images_meta_pk WHERE pk % 10 = 0
) GROUP BY phash"""
    )


def _stream_completion_sql() -> str:
    """Twin of q_stream_completion: a complete backlog completes every
    image exactly once with n_tiles = nx*ny (the gen_tiles grid
    arithmetic, shared with the other tile oracles)."""
    t, step = CFG.tile_size, CFG.tile_size - CFG.overlap_px
    nx = f"(1 + FLOOR((greatest(w - {t}, 0) + {step - 1}) / {step}))"
    ny = f"(1 + FLOOR((greatest(h - {t}, 0) + {step - 1}) / {step}))"
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import IMAGES_META_PK_SQL

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + f"""
SELECT image_id, CAST({nx} * {ny} AS BIGINT) AS n_tiles, TRUE AS complete
FROM images_meta_pk WHERE pk <= 500"""
    )


def _stream_ingest_stats_sql() -> str:
    """Closed-form twin of q_stream_ingest_stats: deterministic event
    times (off = pk*7 % 97 seconds) bucket into 5 s windows; append-mode
    emits exactly the windows whose end <= max event time (zero-delay
    watermark), the tail window stays pending.  Tile counts reuse the
    gen_tiles grid arithmetic so an EngineConfig change can't split the
    engine from the oracle."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import IMAGES_META_PK_SQL

    t, step = CFG.tile_size, CFG.tile_size - CFG.overlap_px
    nx = f"(1 + FLOOR((greatest(w - {t}, 0) + {step - 1}) / {step}))"
    ny = f"(1 + FLOOR((greatest(h - {t}, 0) + {step - 1}) / {step}))"
    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + f""",
evts AS (
  SELECT (pk * 7) % 97 AS off, w, h, {nx} * {ny} AS n_tiles
  FROM images_meta_pk
)
SELECT CAST((off // 5) * 5 AS BIGINT) AS win_off_s,
  count(*)                            AS images,
  CAST(sum(CAST(w AS BIGINT) * h) AS BIGINT) AS pixels,
  CAST(sum(n_tiles) AS BIGINT)        AS tiles
FROM evts
WHERE (off // 5) * 5 + 5 <= (SELECT max(off) FROM evts)
GROUP BY 1"""
    )


def _reproject_extents_sql() -> str:
    """Twin of q_reproject_extents: the nanodegree WGS84 bounds frozen
    by the single-process fixture run (tools/build_reproject_fixture.py)
    — no Spark machinery shared with the gated query; the transverse-
    Mercator series itself is independently pinned by
    tests/test_geodesy.py (Newton inversion + meridian constant)."""
    return f"""
SELECT image_id, epsg, lon_min_nd, lat_min_nd, lon_max_nd, lat_max_nd
FROM read_parquet('{_REPROJECT_FIXTURE}')"""


def _audio_adpcm_sql() -> str:
    """Twin of q_audio_adpcm: lossy IMA staircase samples have no SQL
    form, so the oracle is the complete expectations table from a
    single-process run of the same synth -> encode -> decode -> feature
    chain (tools/build_adpcm_fixture.py) — no Spark machinery shared, so
    a distributed-plumbing bug cannot cancel out."""
    return f"""
SELECT audio_id, n_samples, n_channels, sample_rate,
       duration_ms, sum_abs, zero_crossings
FROM read_parquet('{_AUDIO_ADPCM_FIXTURE}')"""


def _mp3_audio_sql() -> str:
    """Twin of q_mp3_audio: lossy Layer I samples have no SQL form, so
    the oracle is the complete expectations table from a single-process
    run of the same synth -> encode -> decode -> feature chain
    (tools/build_mp3_fixture.py) — no Spark machinery shared, so a
    distributed-plumbing bug cannot cancel out."""
    return f"""
SELECT audio_id, n_samples, n_channels, sample_rate,
       duration_ms, sum_abs, zero_crossings
FROM read_parquet('{_MP3_AUDIO_FIXTURE}')"""


def _mp3_audio_l2_sql() -> str:
    """Twin of q_mp3_audio_l2: the Layer II expectations table frozen by
    the same single-process fixture run (tools/build_mp3_fixture.py ::
    mp3_l2_signal) — no Spark machinery shared with the gated query."""
    return f"""
SELECT audio_id, n_samples, n_channels, sample_rate,
       duration_ms, sum_abs, zero_crossings
FROM read_parquet('{_MP3_AUDIO_L2_FIXTURE}')"""


def _mp3_audio_l3_sql() -> str:
    """Twin of q_mp3_audio_l3: the Layer III expectations table frozen
    by the same single-process fixture run (tools/build_mp3_fixture.py
    :: mp3_l3_signal) — no Spark machinery shared with the gated
    query."""
    return f"""
SELECT audio_id, n_samples, n_channels, sample_rate,
       duration_ms, sum_abs, zero_crossings
FROM read_parquet('{_MP3_AUDIO_L3_FIXTURE}')"""


def _multimodal_features_sql() -> str:
    """Twin of q_multimodal_features: five of six columns are closed-form
    (channel means = the analytic sums of _rgb_sums_ctes divided by n_px in
    the same IEEE double op numpy performs; nonzero_frac = 1.0 because every
    render_rgb byte is >= 40); thumb_mean — the 64x64 bilinear-resize mean,
    which has no SQL form — joins from the single-process expectations
    fixture built by tools/build_multimodal_fixture.py."""
    return (
        _rgb_sums_ctes(100)
        + f"""
SELECT i.image_id,
  CAST(i.w * i.h AS BIGINT) AS n_px,
  CAST(40 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 180 * bl.a - bl.b AS DOUBLE)
    / (i.w * i.h) AS mean_r,
  CAST(57 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 153 * bl.a - bl.b AS DOUBLE)
    / (i.w * i.h) AS mean_g,
  CAST(71 * i.w * i.h + i.w * rs.syy + i.h * cs.sxx + 129 * bl.a - bl.b AS DOUBLE)
    / (i.w * i.h) AS mean_b,
  t.thumb_mean,
  CAST(1.0 AS DOUBLE) AS nonzero_frac
FROM imgs i
JOIN rowsums rs USING (image_id)
JOIN colsums cs USING (image_id)
JOIN blob bl USING (image_id)
JOIN read_parquet('{_MM_THUMB_FIXTURE}') t USING (image_id)"""
    )


def _multimodal_jpeg_sql() -> str:
    """Twin of q_multimodal_jpeg: lossy DCT pixels have no SQL form, so the
    oracle is the complete expectations table from a single-process run of
    the same transcode -> decode -> resize -> feature chain
    (tools/build_multimodal_fixture.py) — no Spark machinery shared, so a
    distributed-plumbing bug cannot cancel out."""
    return f"""
SELECT image_id, n_px, mean_r, mean_g, mean_b, thumb_mean, nonzero_frac
FROM read_parquet('{_MM_JPEG_FIXTURE}')"""


def _multimodal_tiff_jpeg_sql() -> str:
    """Twin of q_multimodal_tiff_jpeg: frozen single-process expectations
    for the JPEG-in-TIFF transcode chain (same posture as
    _multimodal_jpeg_sql — lossy pixels have no SQL form)."""
    return f"""
SELECT image_id, n_px, mean_r, mean_g, mean_b, thumb_mean, nonzero_frac
FROM read_parquet('{_MM_TIFF_JPEG_FIXTURE}')"""


def _skeletonize_bars_sql() -> str:
    """Closed-form twin of q_skeletonize_bars: per-image sum of
    max(abs(bw - bh), 1) over the deterministic bar fixtures."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        bars_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + bars_sql()
        + """
SELECT image_id,
  CAST(sum(greatest(abs(bw - bh), 1)) AS BIGINT) AS skeleton_px
FROM bars WHERE pk <= 60
GROUP BY image_id"""
    )


def _mvt_points_sql() -> str:
    """Twin of q_mvt_points: tile index = clamped floor division,
    quantized coords = floor of the identical IEEE product; a point is
    a 1-vertex feature with zero area and no value tags."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import derived

    return derived.with_ctes(
        derived.POINTS_META_SQL,
        body="""
, q AS (
  SELECT pt_id, px, py,
    GREATEST(0, LEAST(7, CAST(FLOOR(px / 1344.0) AS INT))) AS tx,
    GREATEST(0, LEAST(7, CAST(FLOOR((10752.0 - py) / 1344.0) AS INT)))
      AS ty
  FROM points_meta
), qq AS (
  SELECT pt_id, tx, ty,
    CAST(FLOOR((px - tx*1344.0) * (4096.0/1344.0)) AS BIGINT) AS qx,
    CAST(FLOOR(((10752.0 - ty*1344.0) - py) * (4096.0/1344.0)) AS BIGINT)
      AS qy
  FROM q
)
SELECT CAST(3 AS INT) AS z, CAST(tx AS INT) AS tx, CAST(ty AS INT) AS ty,
       COUNT(*) AS n_features, COUNT(*) AS n_rings,
       COUNT(*) AS n_vertices, SUM(pt_id) AS sum_id,
       SUM(qx) AS sum_qx, SUM(qy) AS sum_qy,
       CAST(0 AS BIGINT) AS sum_area2, CAST(0 AS BIGINT) AS sum_value
FROM qq GROUP BY tx, ty""",
    )


def _skeleton_paths_sql() -> str:
    """Closed-form twin of q_skeleton_paths: each bar contributes one
    straight run of bw - bh pixels whose collinear merge keeps exactly
    its two endpoints."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        bars_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + bars_sql()
        + """
SELECT image_id,
  COUNT(*) AS n_paths,
  CAST(SUM(bw - bh) AS BIGINT) AS sum_px,
  CAST(MAX(bw - bh) AS BIGINT) AS max_px,
  CAST(MIN(bw - bh) AS BIGINT) AS min_px,
  CAST(2*COUNT(*) AS BIGINT) AS sum_vertices
FROM bars WHERE pk <= 60
GROUP BY image_id"""
    )


def _edt_weight_hist_sql() -> str:
    """Closed-form twin of q_edt_weight_hist: for isolated rect blobs the
    EDT of the d-th onion ring is exactly d, so per-ring pixel counts are
    inner(d) - inner(d+1); background is d = -99 with weight 10/(-99)+1."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + rects_sql()
        + """,
rings AS (
  SELECT image_id, rw, rh,
    unnest(generate_series(1, (least(rw, rh) + 1) // 2)) AS d
  FROM rects WHERE pk <= 50
),
fg AS (
  SELECT image_id, CAST(d AS INT) AS d,
    CAST(sum(
      greatest(rw - 2*(d-1), 0) * greatest(rh - 2*(d-1), 0)
      - greatest(rw - 2*d, 0) * greatest(rh - 2*d, 0)
    ) AS BIGINT) AS n_px
  FROM rings GROUP BY image_id, d
),
bg AS (
  SELECT i.image_id, CAST(-99 AS INT) AS d,
    CAST(i.w * i.h - coalesce(sum(r.rw * r.rh), 0) AS BIGINT) AS n_px
  FROM images_meta_pk i LEFT JOIN rects r ON r.image_id = i.image_id
  WHERE i.pk <= 50
  GROUP BY i.image_id, i.w, i.h
),
hist AS (SELECT * FROM fg WHERE n_px > 0 UNION ALL SELECT * FROM bg)
SELECT image_id, d, n_px, 10.0 / d + 1.0 AS weight FROM hist"""
    )


def _dice_jaccard_sql() -> str:
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import (
        IMAGES_META_PK_SQL,
        rects_sql,
    )

    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + ","
        + rects_sql()
        + f""",
s AS (SELECT CAST(sum(rw * rh) AS DOUBLE) AS fg FROM rects WHERE pk <= {PIPE_CAP})
SELECT 2e0 * fg / (fg + fg + 1e0) AS dice,
       fg / (fg + fg - fg + 1e0)  AS jaccard
FROM s"""
    )


_PIP_SQL = derived.with_ctes(
    derived.POINTS_META_SQL,
    derived.FOOTPRINTS_META_SQL,
    body="""
SELECT p.pt_id, f.fp_id
FROM points_meta p, footprints_meta f
WHERE abs( (p.px - f.cx) * cos(radians(f.theta_deg)) + (p.py - f.cy) * sin(radians(f.theta_deg))) <= f.a
  AND abs(-(p.px - f.cx) * sin(radians(f.theta_deg)) + (p.py - f.cy) * cos(radians(f.theta_deg))) <= f.b""",
)


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
