"""Checkpoint manifest: per-stage, per-partition lineage + metrics, and
mid-job resume (north_rule; the Spark upgrade of the reference's
``Timing.json`` stage->seconds dict, /root/reference/src/io.py:168-171,
/root/reference/test.py:87,253,300,387).

Layout: a parquet table at ``<root>/manifest``, **partitioned by stage**
(``manifest/stage=<name>/``), with one row per (stage, unit) of completed
work.  Partitioning by stage makes :func:`clear_stage` a metadata-only
directory delete — no manifest row ever travels to the driver, which
matters when the manifest is one row per stage per image at 10^12 images:

    stage: string, image_id: string, rows: long, checksum: long,
    partition_id: int, run_id: string, status: string, wall_sec: double,
    ts: timestamp

(``image_id`` is the unit-key column name regardless of the caller's
``key``; unit keys are opaque strings here.)

Crash semantics: stage output is appended FIRST, the manifest entry
SECOND, and both carry the attempt's ``run_id``.  Readers take only
output rows whose (unit, run_id) appears in the manifest — so a crash
between the two appends leaves invisible orphan rows, the unit stays
pending, and the retry's copy (a new run_id) is the single visible one:
exactly-once *read* semantics over at-least-once writes.

Resume = ``left_anti`` join of the input against completed units, so a
restarted job re-processes only unfinished units — "resumes mid-tile-grid"
because tile grids are enumerated per image.  Units whose output is empty
(e.g. an all-background mask producing zero polygons) still get a
``rows = 0`` manifest entry and are not re-run forever.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def manifest_path(root: str) -> str:
    return root.rstrip("/") + "/manifest"


def record_stage(
    result: DataFrame,
    stage: str,
    root: str,
    key: str = "image_id",
    checksum_cols: list[str] | None = None,
    units: DataFrame | None = None,
    run_id: str | None = None,
    wall_sec: float | None = None,
) -> None:
    """Aggregate the stage's output per key and append to the manifest.

    ``checksum`` is an order-insensitive xxhash64-xor over the selected
    columns — cheap, associative, and stable under shuffle, so reruns can
    be compared unit-by-unit.  ``units`` (one-column DF of unit keys), when
    given, is the COMPLETE set of units this call completed: keys with no
    output rows are recorded with rows = 0 instead of being dropped by the
    groupBy.  ``wall_sec`` is the caller-measured stage wall time (this
    function cannot observe it — the stage executes inside the caller's
    output write, not here); recorded per manifest row as the stage total.
    """
    _migrate_legacy(result.sparkSession, root)
    cols = checksum_cols or [c for c in result.columns if c != key]
    per_key = (
        result.withColumn("_pid", F.spark_partition_id())
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            _xor_agg(F.xxhash64(*[F.col(c) for c in cols])).alias("checksum"),
            F.min("_pid").alias("partition_id"),
        )
    )
    if units is not None:
        ucol = units.columns[0]
        per_key = (
            units.select(F.col(ucol).alias(key))
            .join(per_key, key, "left")
            .fillna({"rows": 0, "checksum": 0, "partition_id": -1})
        )
    (
        per_key.select(
            F.lit(stage).alias("stage"),
            F.col(key).alias("image_id"),
            "rows",
            "checksum",
            "partition_id",
            F.lit(run_id or "").alias("run_id"),
            F.lit("done").alias("status"),
            F.lit(float(wall_sec if wall_sec is not None else -1.0)).alias(
                "wall_sec"
            ),
            F.current_timestamp().alias("ts"),
        )
        .write.mode("append")
        .partitionBy("stage")
        .parquet(manifest_path(root))
    )


def _xor_agg(col):
    """Order-insensitive 64-bit combine: xor via bit ops in sum-space.

    Spark has no xor agg; emulate with two sums of the split halves, which is
    NOT collision-equivalent to xor but is order-insensitive and stable —
    adequate as a lineage checksum."""
    lo = F.pmod(col, F.lit(1 << 31))
    hi = F.floor(col / F.lit(1 << 31))
    return F.pmod(F.sum(lo), F.lit(1 << 31)) + F.pmod(F.sum(hi), F.lit(1 << 31)) * F.lit(
        1 << 31
    )


def _legacy_parts(spark: SparkSession, root: str):
    """(fs, mroot, legacy_files, has_partitioned) for the manifest dir, or
    None when the manifest doesn't exist.  'Legacy' = parquet data files at
    the manifest ROOT (pre-stage-partitioning layout, stage as a data
    column).  A metadata-only listStatus — O(#stages + #legacy files)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    mroot = jvm.org.apache.hadoop.fs.Path(manifest_path(root))
    fs = mroot.getFileSystem(hconf)
    if not fs.exists(mroot):
        return None
    legacy_files, has_partitioned = [], False
    for st in fs.listStatus(mroot):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            legacy_files.append(str(st.getPath()))
        elif st.isDirectory() and name.startswith("stage="):
            has_partitioned = True
    return fs, mroot, legacy_files, has_partitioned


def _migrate_legacy(spark: SparkSession, root: str) -> None:
    """Normalize a pre-partitioning manifest to the stage-partitioned layout
    BEFORE any partitioned read or append touches it.

    Why at every entry point (not just :func:`clear_stage`): appending
    ``stage=<s>/`` dirs next to legacy root-level parquet files makes Spark's
    partition discovery silently read ONLY the partitioned rows — every
    pre-existing 'done' row vanishes, completed units flip back to pending,
    and their output rows become invisible orphans (run_id no longer
    recorded).  So both :func:`record_stage` (the append path) and
    :func:`_read_manifest` (every read path) call this first.

    Handles the already-mixed layout too (legacy files AND stage= dirs):
    reads each part explicitly and unions, since a root-level read would
    drop the legacy rows.  Crash safety: write-tmp / delete-old / rename —
    the worst crash window leaves no manifest (everything pending →
    recompute), never silent data loss."""
    parts = _legacy_parts(spark, root)
    if parts is None:
        return
    fs, mroot, legacy_files, has_partitioned = parts
    if not legacy_files:
        return
    jvm = spark._jvm
    m = spark.read.parquet(*legacy_files)
    if has_partitioned:
        part = spark.read.parquet(manifest_path(root)).select(*m.columns)
        m = m.unionByName(part)
    tmp = manifest_path(root) + ".migrating"
    m.write.mode("overwrite").partitionBy("stage").parquet(tmp)
    fs.delete(mroot, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), mroot)


def _read_manifest(spark: SparkSession, root: str) -> DataFrame | None:
    """None only when the manifest genuinely doesn't exist yet; any other
    read failure (corruption, permissions) propagates — silently treating
    it as 'nothing done' would duplicate every completed unit's output."""
    _migrate_legacy(spark, root)
    try:
        return spark.read.parquet(manifest_path(root))
    except AnalysisException as ex:
        msg = str(ex)
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            # dir exists but every stage partition was cleared -> nothing done
            or "UNABLE_TO_INFER_SCHEMA" in msg
            or "Unable to infer schema" in msg
        ):
            return None
        raise


def completed_units(spark: SparkSession, root: str, stage: str) -> DataFrame:
    """Distinct unit keys already finished for ``stage`` (with the run_id
    that completed them); empty DF if the manifest doesn't exist yet."""
    m = _read_manifest(spark, root)
    if m is None:
        return spark.createDataFrame([], "image_id string, run_id string")
    return (
        m.filter((F.col("stage") == stage) & (F.col("status") == "done"))
        .select("image_id", "run_id")
        .distinct()
    )


def resume_filter(
    inputs: DataFrame,
    spark: SparkSession,
    root: str,
    stage: str,
    key: str = "image_id",
) -> DataFrame:
    """inputs minus already-completed units — the restart path."""
    done = completed_units(spark, root, stage).select(
        F.col("image_id").alias(key)
    )
    return inputs.join(done, key, "left_anti")


def stage_output(
    spark: SparkSession, root: str, stage: str, key: str = "image_id"
) -> DataFrame:
    """The stage's VISIBLE output: rows whose (unit, run_id) is recorded in
    the manifest.  Orphan rows from a crash between output append and
    manifest append carry an unrecorded run_id and are filtered out."""
    out = spark.read.parquet(f"{root.rstrip('/')}/{stage}")
    done = completed_units(spark, root, stage).select(
        F.col("image_id").alias(key), F.col("run_id").alias("_run_id")
    )
    return out.join(done, [key, "_run_id"], "left_semi").drop("_run_id")


def clear_stage(spark: SparkSession, root: str, stage: str) -> None:
    """Forget a stage entirely: drop its manifest rows, THEN its output
    directory.  The fresh-run ('overwrite') path of
    :func:`run_resumable`-based drivers — leaving stale 'done' rows behind
    an overwritten output dir would make a later --resume silently skip
    units whose data no longer exists.

    Scale + crash safety: the manifest is partitioned by ``stage``, so the
    rows are forgotten by deleting the single ``manifest/stage=<name>/``
    subdirectory — a metadata-only filesystem op, no manifest row ever
    reaches the driver.  A pre-partitioning (legacy) manifest — parquet
    files at the manifest root with ``stage`` as a data column — is first
    normalized by :func:`_migrate_legacy` (as at every other entry point;
    a mixed layout is NOT safe to leave behind — partition discovery would
    silently drop the legacy rows).  Order matters: manifest first, output
    second.  A crash between the two leaves output rows with NO manifest
    entry — the units read as pending and are simply re-run (their stale
    rows stay invisible because :func:`stage_output` only shows rows whose
    (unit, run_id) is recorded).  The reverse order would leave 'done'
    manifest rows pointing at deleted data: permanently missing output."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _path(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    _migrate_legacy(spark, root)
    mp = _path(manifest_path(root) + f"/stage={stage}")
    mp.getFileSystem(hconf).delete(mp, True)
    p = _path(f"{root.rstrip('/')}/{stage}")
    p.getFileSystem(hconf).delete(p, True)


def run_resumable(
    inputs: DataFrame,
    stage_fn,
    stage: str,
    root: str,
    key: str = "image_id",
    checksum_cols: list[str] | None = None,
) -> DataFrame:
    """Execute ``stage_fn(pending_inputs)`` for not-yet-done units, append
    their output (stamped with this attempt's run_id) and their lineage, and
    return the stage's FULL visible output (all completed units, old + new,
    orphans from interrupted attempts excluded)."""
    spark = inputs.sparkSession
    run_id = uuid.uuid4().hex
    pending = resume_filter(inputs, spark, root, stage, key=key)
    out = stage_fn(pending).withColumn("_run_id", F.lit(run_id))
    out_path = f"{root.rstrip('/')}/{stage}"
    t0 = time.time()
    out.write.mode("append").parquet(out_path)
    wall = time.time() - t0
    fresh = (
        spark.read.parquet(out_path)
        .filter(F.col("_run_id") == run_id)
        .drop("_run_id")
    )
    record_stage(
        fresh,
        stage,
        root,
        key=key,
        checksum_cols=checksum_cols,
        units=pending.select(key).distinct(),
        run_id=run_id,
        wall_sec=wall,
    )
    return stage_output(spark, root, stage, key=key).drop("_run_id")
