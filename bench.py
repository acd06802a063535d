"""Benchmark harness (driver contract: prints ONE JSON line on stdout).

Headline metric (BASELINE.json): tiles+joined-rows/sec for the
gen_tiles -> cell PIP join -> point-tile assignment job, plus the two-
parallelism scaling study (local[N] vs local[4N]) standing in for the
N -> 4N executor requirement — no real cluster exists in this sandbox.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_SCALING=0 to skip the scaling study.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"


def make_spark(cores: int):
    import vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark as vm

    return vm.get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
    )


def headline_rows(spark, sf_dir: str) -> int:
    """The north-star job: full tile enumeration + cell-indexed PIP join +
    point->tile assignment; returns total emitted rows (one action)."""
    import __spark_entry__ as E

    tiles = E.q_gen_tiles(spark, sf_dir)
    pip = E.q_pip_join(spark, sf_dir)
    assign = E.q_point_tile_assign(spark, sf_dir)
    return tiles.count() + pip.count() + assign.count()


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    return out, time.time() - t0


def main() -> None:
    import __spark_entry__ as E

    results: dict[str, float] = {}
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = [
        "gen_tiles",
        "point_tile_assign",
        "pip_join",
        "pip_join_arrow",
        "bbox_join",
        "knn_join",
        "pipeline_polygons",
        "pipeline_watershed",
        "dice_jaccard",
    ]
    qs = E.queries()
    rows: dict[str, int] = {}
    for name in bench_queries:
        n, dt = timed(lambda: qs[name](spark, SF_DIR).count())
        results[name] = round(dt, 3)
        rows[name] = n

    # headline throughput at full parallelism
    total_rows, t_head = timed(headline_rows, spark, SF_DIR)
    throughput = total_rows / t_head
    spark.stop()

    scaling = {}
    if RUN_SCALING:
        lo, hi = max(CPUS // 4, 2), CPUS
        for cores in (lo, hi):
            s = make_spark(cores)
            s.sparkContext.setLogLevel("ERROR")
            n, dt = timed(headline_rows, s, SF_DIR)
            scaling[f"local[{cores}]"] = {
                "sec": round(dt, 3),
                "rows_per_sec": round(n / dt, 1),
            }
            s.stop()
        thr_lo = scaling[f"local[{lo}]"]["rows_per_sec"]
        thr_hi = scaling[f"local[{hi}]"]["rows_per_sec"]
        scaling["efficiency_n_to_4n"] = round((thr_hi / thr_lo) / (hi / lo), 3)

    out = {
        "metric": "tiles+joined-rows/sec (gen_tiles + cell PIP join + point-tile assign)",
        "value": round(t_head, 3),
        "unit": "sec",
        "queries": results,
        "rows": rows,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "headline_rows": total_rows,
        "rows_per_sec": round(throughput, 1),
        "cores": CPUS,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
