"""Physical-plan shape tests — the scale properties SURVEY.md §4 promises,
machine-checked: predicate pushdown to the scan, column pruning, single
whole-stage-codegen spans for metadata operators, broadcast engagement, no
JVM-side explode in the pixel path (Arrow byte amplification), and the
exactly-once spatial join needing no distinct."""

from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions.cellindex import WORLD_GRID
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import grid, joins, raster
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import derived
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import images as IMG

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_gen_tiles_single_codegen_no_shuffle(spark):
    """O1/O2/O8 enumeration: one WholeStageCodegen span, zero exchanges —
    tile metadata never shuffles."""
    p = plan(grid.gen_tiles(derived.images_meta(spark, SF)))
    assert "Exchange" not in p
    # every operator in the same codegen span (id 1 only)
    assert "codegen id : 2" not in p and "codegen id : 1" in p


def test_image_filter_pushed_below_explode(spark):
    """An image-level filter lands next to the scan, under both Generates."""
    df = grid.gen_tiles(
        derived.images_meta(spark, SF).filter(F.col("w") > 1000)
    )
    p = plan(df)
    # filter evaluates on the scan column, before Generate in the plan walk
    assert p.index("Condition : ") < p.index("(6) Generate")
    assert "PushedFilters: [IsNotNull(p_partkey)]" in p


def test_column_pruning_reaches_scan(spark):
    """Projecting two metadata columns reads only the key column from
    parquet (ReadSchema pruned)."""
    p = plan(derived.images_meta(spark, SF).select("image_id", "w"))
    assert "ReadSchema: struct<p_partkey:bigint>" in p


def test_slice_tiles_no_jvm_explode(spark):
    """The pixel path must NOT enumerate tiles JVM-side: an explode there
    copies each image's bytes into the Arrow stream once per tile."""
    imgs = IMG.images_table(spark, SF, limit=5)
    p = plan(raster.slice_tiles(imgs))
    assert "Generate" not in p
    assert "MapInPandas" in p


def test_pip_join_broadcast_engages(spark):
    pts = derived.points_meta(spark, SF)
    polys = derived.footprint_rings(spark, SF).join(
        derived.footprints_with_env(spark, SF).select(
            "fp_id", "minx", "miny", "maxx", "maxy"
        ),
        "fp_id",
    )
    bcast = joins.pip_join(
        pts, polys, WORLD_GRID, strategy="expr", broadcast_polygons=True
    )
    assert "BroadcastHashJoin" in plan(bcast)
    # the default path is the shuffle join (auto-broadcast only kicks in
    # because this fixture is tiny — disable it to see the scale plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffle = joins.pip_join(pts, polys, WORLD_GRID, strategy="expr")
        assert "hashpartitioning(cell_id" in plan(shuffle)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bbox_join_exactly_once_no_distinct(spark):
    """The intersection-cell dedup rule replaces a distinct: the plan must
    not contain a dedup aggregate over the pair keys."""
    tiles = grid.gen_tiles(derived.images_meta(spark, SF)).select(
        "tile_id",
        F.col("tminx").alias("minx"), F.col("tminy").alias("miny"),
        F.col("tmaxx").alias("maxx"), F.col("tmaxy").alias("maxy"),
    )
    fps = derived.footprints_with_env(spark, SF).select(
        "fp_id", "minx", "miny", "maxx", "maxy"
    )
    p = plan(joins.bbox_range_join(tiles, fps, WORLD_GRID), mode="simple")
    assert "Deduplicate" not in p and "Distinct" not in p


def test_knn_broadcast_engages(spark):
    pts = derived.points_meta(spark, SF)
    centers = derived.footprints_meta(spark, SF).select("fp_id", "cx", "cy")
    # materialize=False keeps the logical plan visible (the default eagerly
    # localCheckpoints, which truncates lineage to a block scan)
    out = joins.knn_join(
        pts, centers, WORLD_GRID, k=3, broadcast_centers=True, materialize=False
    )
    assert "BroadcastHashJoin" in plan(out, mode="simple")


def test_pyramid_tiles_single_codegen_no_shuffle(spark):
    """O7 per-level re-grid: the pyramid explode composed with the tile
    explode still plans as pure column work — zero exchanges."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import pyramid as P

    lv = P.pyramid_meta(derived.images_meta(spark, SF), levels=3).select(
        "image_id", "level", F.col("lw").alias("w"), F.col("lh").alias("h")
    )
    p = plan(grid.gen_tiles(lv, with_geo=False))
    assert "Exchange" not in p


def test_lang_id_stays_jvm_side_map_only(spark):
    """Language-ID must be a map-side JVM operator: no Python eval nodes,
    no exchanges — it streams off the scan at any corpus scale."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("cid"), "text"
    )
    p = plan(T.lang_id(docs))
    assert "Exchange" not in p
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in p


def test_near_dup_block_triangle_no_cartesian(spark):
    """The exact near-dup plan must be the block-triangle shape: a
    broadcast of the tiny block-pair relation, ONE aggregate-side exchange
    into the applyInPandas groups, and no BroadcastNestedLoopJoin /
    CartesianProduct anywhere (the O(n^2) work happens as BLAS inside the
    groups, not as a join)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        F.col("vec_id"), F.col("embedding")
    )
    p = plan(SIM.embedding_near_dup_pairs(emb, 0.9))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapGroupsInPandas" in p
    assert "BroadcastExchange" in p  # the B(B+1)/2 block-pair relation


def test_ann_lsh_topk_single_exchange_for_both_windows(spark):
    """Probe-dedup and top-k rank must share one clustering: after the
    explicit repartition on qid, neither window adds its own Exchange
    (hashpartitioning(qid) satisfies the (qid, cid) window distribution)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.limit(4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    p = plan(SIM.ann_lsh_topk(qs, emb, k=5, dim=64))
    # exchanges: scan-side shuffles for the bucket equi-join + exactly ONE
    # hashpartitioning(qid) for both windows — counting the window side:
    assert p.count("hashpartitioning(qid") == 1
    # both windows present, back to back, no exchange between them
    w1 = p.index("Window")
    w2 = p.index("Window", w1 + 1)
    assert "Exchange" not in p[w1:w2]


def test_ann_ivf_no_assignment_shuffle(spark):
    """IVF folds the literal quantizer into scan-side projections: list
    assignment and probe selection add NO join and NO exchange of their
    own — the plan's only joins/exchanges serve the candidate equi-join
    and the final per-query rank window.  (The previous formulation paid
    a corpus x centroids BroadcastHashJoin plus a full-corpus
    HashAggregate exchange before any candidate was scored.)"""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.limit(4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    import re

    p = plan(SIM.ann_ivf_topk(qs, emb, k=5, n_centroids=4, nprobe=2))
    # exactly one join in the whole plan: probes x lists on cent_id
    # (formatted mode prints each op once in the tree and once in the
    # numbered detail section — count the numbered entries)
    joins_total = len(re.findall(
        r"\(\d+\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p
    ))
    assert joins_total == 1, p
    # assignment is a projection, not an aggregation over the corpus
    assert "HashAggregate" not in p, p
    assert "max_by" not in p, p
    """The media fixture pipeline is exactly two Python stages (synth,
    probe/decode) with no exchange between them — the encoded payloads
    flow straight from the synth stage into the decode stage."""
    import __spark_entry__ as E

    df = E.q_video_pixels(spark, SF)
    tree = plan(df).split("\n\n")[0]  # the indented operator tree
    assert tree.count("MapInPandas") == 2
    first = tree.index("MapInPandas")
    second = tree.index("MapInPandas", first + 1)
    assert "Exchange" not in tree[first:second]
    # exactly the one deliberate spread shuffle below both Python stages
    assert tree.count("Exchange") == 1


def test_lsh_pairs_single_corpus_pass(spark):
    """LSH banding must NOT re-evaluate the signature aggregation per band
    per join side (the union-self-join shape cost 8 corpus passes): one
    sig lineage, band structs exploded from it, pairs enumerated inside
    the (band, bkey) buckets.  Pinned: one FileScan of the documents
    table, no join operator at all."""
    import re

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    c = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id AS cid", "text"
    )
    p = plan(T.lsh_candidate_pairs(T.minhash_signature(c)))
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert not re.findall(
        r"\(\d+\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p
    ), p


def test_exact_dedup_one_pass_one_exchange(spark):
    """Group stats ride a window, not a groupBy + join-back: one scan of
    the corpus, one exchange, no join."""
    import re

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import text as T

    c = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id AS cid", "text"
    )
    p = plan(T.exact_dedup(c))
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert not re.findall(
        r"\(\d+\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p
    ), p


def test_geotiff_extents_single_pass_one_exchange(spark):
    """S3 tag round-trip gate: one parquet scan, exactly the one pinned
    repartition (CPU spread for the Python encode stage), no joins or
    aggregates — the GeoTIFF write+read never shuffles data it doesn't
    have to."""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    p = plan(E.q_geotiff_extents(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Join" not in p and "Aggregate" not in p


def test_load_raster_dir_scan_to_arrow_only(spark, tmp_path):
    """Raster-directory ingest: binaryFile scan straight into ONE Arrow
    stage — no exchange, no driver-side listing loop."""
    import numpy as np

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import (
        codec_tiff,
    )
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.catalog import (
        load_raster_dir,
    )

    (tmp_path / "a.tif").write_bytes(
        codec_tiff.encode_tiff(np.zeros((8, 8), np.uint8))
    )
    import re

    p = plan(load_raster_dir(spark, str(tmp_path)))
    assert "Exchange" not in p
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 1, p
    assert "Scan binaryFile" in p


def test_read_windows_never_broadcasts_blobs(spark):
    """Chip extraction: the image-BYTES side must never be broadcast
    (Catalyst sizes a mapInPandas output from its tiny parquet input and
    would happily ship every scene to every executor).  Pinned shape:
    one SortMergeJoin, zero BroadcastExchange, and the blobs cross
    exactly one exchange — the pre-join spread at the shuffle-partition
    count, which the SMJ reuses (ENSURE_REQUIREMENTS adds none on that
    side)."""
    import re
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    p = plan(E.q_window_chips(spark, SF))
    assert "BroadcastExchange" not in p, p
    assert len(re.findall(r"\(\d+\) SortMergeJoin", p)) == 1, p
    # 3 shuffles total: images_table's pre-render meta spread, the one
    # blob spread the SMJ reuses, and the window-list aggregation
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 3, p


def test_mvt_single_exchange_python_only_in_assembly(spark):
    """Vector-tile sink: envelope + tile-range explode stay JVM-side in
    one pre-shuffle span; the only Exchange is the (tx, ty) groupBy that
    co-locates each tile's features, and the only Python stage is the
    per-tile FlatMapGroupsInPandas assembly."""
    from pyspark.sql import functions as F

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import vectortiles as VT

    polys = spark.range(100).select(
        F.col("id").alias("polygon_id"),
        F.array(
            F.array(F.col("id") * 1.0, F.lit(0.0)),
            F.array(F.col("id") * 1.0 + 5.0, F.lit(0.0)),
            F.array(F.col("id") * 1.0 + 5.0, F.lit(5.0)),
            F.array(F.col("id") * 1.0, F.lit(5.0)),
        ).alias("ring"),
        (F.col("id") % 3).alias("value"),
    )
    tiles = VT.polygons_to_mvt(polys, (0.0, 0.0, 128.0, 128.0), zoom=2)
    p = plan(tiles)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "hashpartitioning(tx" in p
    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas", p)) == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_reproject_is_pure_map_no_exchange(spark):
    """Reprojection must stream off the scan: extents_to_wgs84 and
    points_to_wgs84 add NO Exchange — at 100 TB the CRS normalization
    costs one Arrow pass, never a shuffle."""
    import pandas as pd

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import reproject as RP

    df = spark.createDataFrame(pd.DataFrame({
        "image_id": ["a"], "minx": [400000.0], "miny": [5000000.0],
        "maxx": [410000.0], "maxy": [5010000.0], "crs": ["EPSG:32610"],
        "x": [405000.0], "y": [5005000.0],
    }))
    assert "Exchange" not in plan(RP.extents_to_wgs84(df))
    assert "Exchange" not in plan(RP.points_to_wgs84(df))
