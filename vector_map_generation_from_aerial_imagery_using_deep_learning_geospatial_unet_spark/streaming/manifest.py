"""Checkpoint manifest: per-stage, per-partition lineage + metrics, and
mid-job resume (north_rule; the Spark upgrade of the reference's
``Timing.json`` stage->seconds dict, /root/reference/src/io.py:168-171,
/root/reference/test.py:87,253,300,387).

Layout: a parquet table at ``<root>/manifest`` with one row per
(stage, image_id) unit of completed work:

    stage: string, image_id: string, rows: long, checksum: long,
    partition_id: int, status: string, wall_sec: double, ts: timestamp

Resume = ``left_anti`` join of the input against completed units, so a
restarted job re-processes only unfinished images — "resumes mid-tile-grid"
because tile grids are enumerated per image.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_path(root: str) -> str:
    return root.rstrip("/") + "/manifest"


def record_stage(
    result: DataFrame,
    stage: str,
    root: str,
    key: str = "image_id",
    checksum_cols: list[str] | None = None,
) -> None:
    """Aggregate the stage's output per key and append to the manifest.

    ``checksum`` is an order-insensitive xxhash64-xor over the selected
    columns — cheap, associative, and stable under shuffle, so reruns can be
    compared unit-by-unit."""
    cols = checksum_cols or [c for c in result.columns if c != key]
    t0 = time.time()
    per_key = (
        result.withColumn("_pid", F.spark_partition_id())
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            _xor_agg(F.xxhash64(*[F.col(c) for c in cols])).alias("checksum"),
            F.min("_pid").alias("partition_id"),
        )
    )
    wall = time.time() - t0
    (
        per_key.select(
            F.lit(stage).alias("stage"),
            F.col(key).alias("image_id"),
            "rows",
            "checksum",
            "partition_id",
            F.lit("done").alias("status"),
            F.lit(wall).alias("wall_sec"),
            F.current_timestamp().alias("ts"),
        )
        .write.mode("append")
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


def completed_units(spark: SparkSession, root: str, stage: str) -> DataFrame:
    """Distinct image_ids already finished for ``stage`` (empty DF if the
    manifest doesn't exist yet)."""
    try:
        m = spark.read.parquet(manifest_path(root))
    except Exception:
        return spark.createDataFrame([], "image_id string")
    return (
        m.filter((F.col("stage") == stage) & (F.col("status") == "done"))
        .select("image_id")
        .distinct()
    )


def resume_filter(inputs: DataFrame, spark: SparkSession, root: str, stage: str) -> DataFrame:
    """inputs minus already-completed units — the restart path."""
    done = completed_units(spark, root, stage)
    return inputs.join(done, "image_id", "left_anti")


def run_resumable(
    inputs: DataFrame,
    stage_fn,
    stage: str,
    root: str,
    key: str = "image_id",
    checksum_cols: list[str] | None = None,
) -> DataFrame:
    """Execute ``stage_fn(pending_inputs)`` for not-yet-done units, append
    their lineage, and return the new results.  Callers union with any
    previously persisted stage output if they need the full set."""
    spark = inputs.sparkSession
    pending = resume_filter(inputs, spark, root, stage)
    out = stage_fn(pending)
    out_path = f"{root.rstrip('/')}/{stage}"
    out.write.mode("append").parquet(out_path)
    persisted = spark.read.parquet(out_path).join(
        pending.select(key).distinct(), key, "semi"
    )
    record_stage(persisted, stage, root, key=key, checksum_cols=checksum_cols)
    return spark.read.parquet(out_path)
