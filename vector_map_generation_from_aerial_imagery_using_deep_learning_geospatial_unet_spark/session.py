"""SparkSession factory with the engine's physical-execution policy baked in.

Scale posture (SURVEY.md §4): AQE on (runtime coalesce + skew-join splitting),
Arrow on (every kernel crosses JVM<->Python as Arrow batches, never per-row),
shuffle partitions sized for the sandbox but overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geospatial-unet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Master precedence: explicit arg > SPARK_GRAFT_MASTER env > whatever
    # spark-submit / spark-defaults configured > local[*] fallback.  Never
    # unconditionally call .master(): that would override spark-submit's
    # --master and silently run cluster submissions single-node local.
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        from pyspark import SparkConf

        if not SparkConf().contains("spark.master"):
            master = "local[*]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b
        # Adaptive execution: runtime shuffle coalescing + skew-join splitting
        # (engine policy for densely built-up cells, SURVEY.md §4.2).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow is the only JVM<->Python channel we use.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Pixel payloads cross the pipe compressed (png-1, ~100x for masks),
        # so 256-row input batches stay well under executor memory while
        # keeping per-batch Python overhead amortized for small-row joins;
        # maxBytesPerBatch caps the Python->JVM direction by bytes
        # regardless of row width.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "134217728")
        # Pixel payloads are wide; keep scan splits moderate.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
