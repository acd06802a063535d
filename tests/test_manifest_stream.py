"""Checkpoint manifest resume + Structured Streaming ingestion."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.grid import gen_tiles
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.derived import images_meta
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming import manifest as M
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_tiles

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp()
    request.addfinalizer(lambda: shutil.rmtree(d, ignore_errors=True))
    return d


def test_run_resumable_skips_completed(spark, tmp):
    imgs = images_meta(spark, SF).filter(F.col("w") % 2 == 0)
    calls = []

    def stage(pending):
        calls.append(pending.count())
        return gen_tiles(pending, with_geo=False).select(
            "image_id", "tile_id", "tiy", "tix"
        )

    out1 = M.run_resumable(imgs, stage, "gen_tiles", tmp)
    n1 = out1.count()
    assert calls[-1] > 0 and n1 > 0

    # second run: nothing pending, no new rows
    out2 = M.run_resumable(imgs, stage, "gen_tiles", tmp)
    assert calls[-1] == 0
    assert out2.count() == n1

    # manifest has one 'done' row per image with correct per-image row counts
    m = spark.read.parquet(M.manifest_path(tmp))
    exp = {
        r["image_id"]: r["cnt"]
        for r in out1.groupBy("image_id").agg(F.count("*").alias("cnt")).collect()
    }
    got = {r["image_id"]: r["rows"] for r in m.filter("stage = 'gen_tiles'").collect()}
    assert got == exp


def test_resume_mid_grid_after_partial_run(spark, tmp):
    imgs = images_meta(spark, SF)
    half = imgs.filter(F.col("image_id") < "img_00000100")

    def stage(pending):
        return gen_tiles(pending, with_geo=False).select("image_id", "tile_id")

    M.run_resumable(half, stage, "s", tmp)
    # full input: only the other half is pending
    pending = M.resume_filter(imgs, spark, tmp, "s")
    assert pending.count() == imgs.count() - half.count()
    out = M.run_resumable(imgs, stage, "s", tmp)
    assert out.count() == gen_tiles(imgs, with_geo=False).count()


def _images_with_payload(spark, phash_col):
    return images_meta(spark, SF).withColumns(
        {
            "bytes": F.lit(b""),
            "fmt": F.lit("raw"),
            "caption": F.lit("c"),
            "phash": phash_col.cast("long"),
            "crs": F.lit("SYNTH:METRIC"),
        }
    )


def test_stream_dedup_images_first_arrival_wins(spark, tmp):
    """Uniques must NEVER drop, across multiple microbatches (regression:
    content-derived event times made later batches 'late' and silently
    discarded first arrivals)."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_dedup_images

    # phash collides in groups of ~4 -> dedup must keep one per group;
    # 24 files / maxFilesPerTrigger=8 -> at least 3 microbatches
    imgs = _images_with_payload(spark, F.xxhash64("image_id") % 500)
    src, out, cp = f"{tmp}/src", f"{tmp}/out", f"{tmp}/cp"
    imgs.repartition(24).write.parquet(src)
    q = stream_dedup_images(spark, src, out, cp)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_distinct = imgs.select("phash").distinct().count()
    assert got.count() == n_distinct
    assert got.select("phash").distinct().count() == n_distinct


def test_stream_ingest_stats_windowed_agg(spark, tmp):
    """No data is late-dropped: emitted windows partition the ingested rows;
    the only incompleteness is the tail window awaiting the next trigger."""
    import time as _time

    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_ingest_stats

    imgs = _images_with_payload(spark, F.xxhash64("image_id"))
    src, out, cp = f"{tmp}/src", f"{tmp}/out", f"{tmp}/cp"
    imgs.repartition(24).write.parquet(src)
    q = stream_ingest_stats(spark, src, out, cp, window="2 seconds")
    q.awaitTermination(120)
    # a second pass (new data arrives) advances the watermark and flushes
    # the previous run's tail windows
    imgs.limit(50).repartition(2).write.mode("append").parquet(src)
    _time.sleep(3)
    q2 = stream_ingest_stats(spark, src, out, cp, window="2 seconds")
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) >= 1
    span = {(r["win_start"], r["win_end"]) for r in rows}
    assert len(span) == len(rows)  # one emission per closed window
    total = sum(r["images"] for r in rows)
    # run-1 rows fully flushed by run 2; only run-2's tail may be pending
    assert imgs.count() <= total <= imgs.count() + 50


def test_stream_tiles_matches_batch(spark, tmp):
    imgs = images_meta(spark, SF).withColumns(
        {
            "bytes": F.lit(b""),
            "fmt": F.lit("raw"),
            "caption": F.lit("c"),
            "phash": F.lit(0).cast("long"),
            "crs": F.lit("SYNTH:METRIC"),
        }
    )
    src_dir, out_dir, cp_dir = f"{tmp}/src", f"{tmp}/out", f"{tmp}/cp"
    imgs.write.parquet(src_dir)
    q = stream_tiles(spark, src_dir, out_dir, cp_dir, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    exp = gen_tiles(imgs.drop("bytes"), with_geo=True).drop("fmt", "crs")
    assert got.count() == exp.count()
    assert (
        got.select("tile_id").exceptAll(exp.select("tile_id")).count() == 0
    )


def test_stream_image_completion_stateful(spark, tmp):
    """applyInPandasWithState accumulator: an image emits complete=true
    exactly when its full tile grid has arrived, across microbatches."""
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.grid import gen_tiles
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.streaming.stream import stream_image_completion

    imgs = images_meta(spark, SF).filter(F.col("image_id") < "img_00000040")
    tiles = gen_tiles(imgs, with_geo=False).select(
        "image_id", "tile_id", "tiy", "tix", "w", "h"
    )
    src, out, cp = f"{tmp}/tiles", f"{tmp}/done", f"{tmp}/cp"
    # write in two halves -> tiles of one image can straddle files/batches
    tiles.filter(F.col("tix") % 2 == 0).write.parquet(src)
    tiles.filter(F.col("tix") % 2 == 1).write.mode("append").parquet(src)
    q = stream_image_completion(spark, src, out, cp)
    # must TERMINATE, not just drain: under ProcessingTimeTimeout Spark
    # schedules another batch unconditionally and availableNow never stops
    # (the stream.py NoTimeout rationale) — a bare awaitTermination(120)
    # used to mask exactly that
    assert q.awaitTermination(120), "availableNow completion never terminated"
    got = spark.read.parquet(out)
    done = {r["image_id"]: r["n_tiles"] for r in got.filter("complete").collect()}
    exp = {
        r["image_id"]: r["n"]
        for r in tiles.groupBy("image_id").agg(F.count("*").alias("n")).collect()
    }
    assert done == exp


def test_resume_records_zero_output_units(spark, tmp):
    """A unit whose stage output is empty still gets a manifest entry and
    is NOT re-run on resume (regression: empty units were pending forever)."""
    imgs = images_meta(spark, SF).filter(F.col("image_id") < "img_00000020")
    calls = []

    def stage(pending):
        calls.append(pending.count())
        # emit rows only for half the units; the rest complete with 0 rows
        return gen_tiles(pending, with_geo=False).select(
            "image_id", "tile_id"
        ).filter(F.substring("image_id", 12, 1).cast("int") % 2 == 0)

    M.run_resumable(imgs, stage, "s0", tmp)
    assert calls[-1] > 0
    M.run_resumable(imgs, stage, "s0", tmp)
    assert calls[-1] == 0  # zero-output units are done too
    m = spark.read.parquet(M.manifest_path(tmp)).filter("stage = 's0'")
    assert m.filter("rows = 0").count() > 0


def test_orphan_output_rows_are_invisible_and_reconverge(spark, tmp):
    """Crash between output append and manifest append: the orphan rows are
    filtered from reads, the unit stays pending, and the retry's copy is the
    single visible one."""
    imgs = images_meta(spark, SF).filter(F.col("image_id") < "img_00000010")

    def stage(pending):
        return gen_tiles(pending, with_geo=False).select("image_id", "tile_id")

    # simulate the crashed first attempt: output lands, manifest doesn't
    out_path = f"{tmp}/s1"
    stage(imgs).withColumn("_run_id", F.lit("deadbeef")).write.mode(
        "append"
    ).parquet(out_path)
    # clean retry
    result = M.run_resumable(imgs, stage, "s1", tmp)
    exp = stage(imgs).count()
    assert result.count() == exp  # orphans not double-counted
    raw = spark.read.parquet(out_path)
    assert raw.count() == 2 * exp  # both copies are physically there


def test_clear_stage_crash_ordering_never_loses_data(spark, tmp):
    """clear_stage drops manifest rows BEFORE the output dir.  A crash
    between the two leaves output-with-no-manifest: the units read as
    pending and re-run — never 'done' rows pointing at deleted data."""
    import shutil as _sh

    imgs = images_meta(spark, SF).filter(F.col("w") % 7 == 0).limit(6)

    def stage(pending):
        return gen_tiles(pending, with_geo=False).select(
            "image_id", "tile_id", "tiy", "tix"
        )

    n_full = M.run_resumable(imgs, stage, "s", tmp).count()
    assert n_full > 0

    # simulate the crash window: manifest partition deleted, output intact
    _sh.rmtree(f"{M.manifest_path(tmp)}/stage=s", ignore_errors=True)
    done = M.completed_units(spark, tmp, "s")
    assert done.count() == 0  # everything pending again

    # re-run: all units recompute, and the stale output rows stay invisible
    out = M.run_resumable(imgs, stage, "s", tmp)
    assert out.count() == n_full


def test_clear_stage_then_fresh_run(spark, tmp):
    """Full clear (manifest rows + output) then a fresh run reconverges."""
    imgs = images_meta(spark, SF).filter(F.col("w") % 7 == 0).limit(6)

    def stage(pending):
        return gen_tiles(pending, with_geo=False).select(
            "image_id", "tile_id", "tiy", "tix"
        )

    n1 = M.run_resumable(imgs, stage, "s", tmp).count()
    M.clear_stage(spark, tmp, "s")
    assert M.completed_units(spark, tmp, "s").count() == 0
    n2 = M.run_resumable(imgs, stage, "s", tmp).count()
    assert n2 == n1


def test_clear_stage_migrates_legacy_unpartitioned_manifest(spark, tmp):
    """A round-1 manifest (stage as a DATA column, files at the root) must
    not be silently no-opped: clear_stage migrates it to the partitioned
    layout and actually forgets the stage."""
    legacy_rows = [
        ("a", "img_1", 5, 1, 0, "r1", "done", 1.0),
        ("a", "img_2", 3, 2, 0, "r1", "done", 1.0),
        ("b", "img_1", 7, 3, 0, "r1", "done", 1.0),
    ]
    df = spark.createDataFrame(
        legacy_rows,
        "stage string, image_id string, rows long, checksum long, "
        "partition_id int, run_id string, status string, wall_sec double",
    ).withColumn("ts", F.current_timestamp())
    # legacy layout: UNPARTITIONED write -> parquet files at manifest root
    df.write.parquet(M.manifest_path(tmp))

    M.clear_stage(spark, tmp, "a")
    m = spark.read.parquet(M.manifest_path(tmp))
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    assert stages == {"b"}
    assert M.completed_units(spark, tmp, "a").count() == 0
    assert M.completed_units(spark, tmp, "b").count() == 1
    # migrated to the partitioned layout: stage=b subdir exists
    import os

    assert os.path.isdir(f"{M.manifest_path(tmp)}/stage=b")


def test_resume_against_legacy_manifest_keeps_done_rows(spark, tmp):
    """ADVICE r2 (high): appending stage=<s>/ dirs next to legacy root-level
    parquet files made partition discovery silently read only the
    partitioned rows — completed units flipped back to pending and their
    prior output became invisible orphans.  Every manifest entry point now
    migrates the legacy layout first, so resuming a round-1 manifest must
    (a) not re-run the done units and (b) keep their output visible."""
    imgs = images_meta(spark, SF).filter(F.col("w") % 7 == 0).limit(6)
    calls = []

    def stage(pending):
        calls.append(pending.count())
        return gen_tiles(pending, with_geo=False).select(
            "image_id", "tile_id", "tiy", "tix"
        )

    # first run writes a partitioned manifest; rewrite it as the legacy
    # (unpartitioned, stage-as-data-column) round-1 layout in place
    n1 = M.run_resumable(imgs, stage, "s", tmp).count()
    assert calls[-1] > 0 and n1 > 0
    legacy = spark.read.parquet(M.manifest_path(tmp)).collect()
    shutil.rmtree(M.manifest_path(tmp))
    spark.createDataFrame(legacy).write.parquet(M.manifest_path(tmp))

    # resume: every unit is already done -> zero pending, output unchanged
    out2 = M.run_resumable(imgs, stage, "s", tmp)
    assert calls[-1] == 0
    assert out2.count() == n1
    # and the manifest is now fully partitioned (no root-level data files)
    import os

    root_files = [
        f for f in os.listdir(M.manifest_path(tmp)) if f.endswith(".parquet")
    ]
    assert root_files == []
    assert M.completed_units(spark, tmp, "s").count() == 6
