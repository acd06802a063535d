"""Measure the kNN explode-side optimization at an inflated probe scale.

Round 3 flipped knn_join's per-round k-ring explode onto the genuinely
smaller join side (replicate ~n_centers centers over the ring instead of
the point table).  The cluster-scale claim — at 10^9 probe points the
old plan replicates the POINT table (2r+1)^2-fold through round one's
shuffle — was argued, not measured.  This harness measures it: the same
kNN job over a probe side inflated REPS-fold (union with shifted ids),
run once with explode_side='probe' (the pre-round-3 plan) and once with
'auto' (explode the smaller side), each in a FRESH SparkSession; total
shuffle write bytes are read from the Spark UI REST API (sum over all
stages) along with wall time.  Results are recorded in BENCH.md.

Usage:  python tools/bench_knn_scale.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def _total_shuffle_bytes(spark) -> int:
    """Sum shuffle WRITE bytes over every stage of this app (UI REST)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def run_variant(explode_side: str) -> dict:
    from pyspark.sql import functions as F

    import vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark as vm
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions.cellindex import WORLD_GRID
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.joins import knn_join
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import derived

    spark = vm.get_spark(
        master=f"local[{CPUS}]",
        app_name=f"knn_scale_{explode_side}",
        extra_conf={
            # the UI REST API is the shuffle-bytes source for this harness
            "spark.ui.enabled": "true",
            # model the true-scale regime this optimization targets: at
            # 10^9 probe rows NEITHER join side fits the broadcast
            # threshold, so the candidate join is a shuffle join and the
            # exploded side's volume is what crosses the wire.  (At bench
            # scale AQE would broadcast the small exploded-center side and
            # hide the difference entirely — which is itself evidence that
            # the flip costs nothing when broadcasting is available.)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    pts = derived.points_meta(spark, SF_DIR)
    # inflate the probe side REPS-fold with shifted ids and jittered
    # coordinates (same spatial density, disjoint ids)
    parts = [
        pts.select(
            (F.col("pt_id") + F.lit(i * 100_000_000)).alias("pt_id"),
            (F.col("px") + i * 0.001).alias("px"),
            (F.col("py") + i * 0.001).alias("py"),
        )
        for i in range(REPS)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(CPUS * 4).persist()
    n_pts = big.count()
    cents = derived.footprints_meta(spark, SF_DIR).select("fp_id", "cx", "cy")
    n_cents = cents.count()

    setup_shuffle = _total_shuffle_bytes(spark)  # the inflate repartition
    t0 = time.time()
    out = knn_join(big, cents, WORLD_GRID, k=5, explode_side=explode_side)
    n_out = out.count()
    wall = time.time() - t0
    shuffle = _total_shuffle_bytes(spark) - setup_shuffle
    spark.stop()
    return {
        "explode_side": explode_side,
        "n_points": n_pts,
        "n_centers": n_cents,
        "rows_out": n_out,
        "wall_sec": round(wall, 2),
        "shuffle_write_bytes": shuffle,
        "shuffle_write_mib": round(shuffle / 2**20, 1),
    }


def main() -> None:
    results = [run_variant("probe"), run_variant("auto")]
    for r in results:
        print(json.dumps(r))
    probe, auto = results
    if auto["shuffle_write_bytes"]:
        print(
            f"shuffle-bytes ratio probe/auto: "
            f"{probe['shuffle_write_bytes'] / auto['shuffle_write_bytes']:.2f}x; "
            f"wall ratio: {probe['wall_sec'] / auto['wall_sec']:.2f}x"
        )


if __name__ == "__main__":
    main()
