"""sf1 scale-proof: the headline job at 10x the bench input.

The per-round artifact of record is measured at sf0.1; this harness
evidences that nothing cliffs one order of magnitude up — no broadcast
blow-up, no driver materialization that grows with input, no shuffle
partition that stops fitting in memory.  It synthesizes an sf1 input
deterministically (10x key-shifted replicas of the three base tables the
headline consumes: part -> images, customer -> footprints, events ->
points; every derived value is a pure function of the shifted key, so
the data model stays valid and ids stay globally distinct), then runs
bench.py's exact headline protocol (materialize images untimed, warm
up, min-of-3 timed runs with /proc/stat steal telemetry) and prints one
JSON line for BENCH.md.  JVM peak RSS (VmHWM) is read from /proc so a
memory cliff would be visible, not argued about.

Usage:  python tools/bench_sf1.py [reps] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else int(
    os.environ.get("SPARK_GRAFT_CPUS", "32")
)
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join("/tmp", f"sf1_scaleproof_x{REPS}")

# key shift per replica: large enough that shifted keys never collide,
# small enough that lpad(key, 8) image/footprint ids keep their width
SHIFT = 10_000_000


def build_input() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, key in (("part", "p_partkey"), ("customer", "c_custkey"),
                       ("events", "event_id")):
        out = os.path.join(DST, f"{table}.parquet")
        if os.path.exists(out):
            continue
        con.execute(
            f"COPY (SELECT {key} + r.i * {SHIFT} AS {key}, "
            f"* EXCLUDE ({key}) "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({REPS})) AS i) r) "
            f"TO '{out}' (FORMAT parquet)"
        )


def _jvm_peak_rss_mib() -> int:
    """Max VmHWM over all live java processes (local mode: one JVM)."""
    peak = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if "java" not in f.read():
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        peak = max(peak, int(line.split()[1]) // 1024)
        except OSError:
            continue
    return peak


def main() -> None:
    build_input()
    os.environ["SPARK_GRAFT_SF_DIR"] = DST
    import bench  # reads SPARK_GRAFT_SF_DIR at import

    bench.SF_DIR = DST
    spark = bench.make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    images_path = os.path.join("/tmp", f"bench_images_sf1_x{REPS}.parquet")
    bench.materialize_images(spark, DST, images_path)
    bench.warmup(spark, images_path)
    total_rows, t_best, st_best = bench.timed(
        bench.headline_rows, spark, DST, images_path
    )
    walls = [round(t_best, 3)]
    for _ in range(2):
        _, t, st = bench.timed(bench.headline_rows, spark, DST, images_path)
        walls.append(round(t, 3))
        if t < t_best:
            t_best, st_best = t, st
    peak = _jvm_peak_rss_mib()
    spark.stop()
    print(json.dumps({
        "job": "headline @ sf1 (10x key-shifted sf0.1 input)",
        "cores": CPUS,
        "reps": REPS,
        "headline_rows": total_rows,
        "wall_sec_min_of_3": round(t_best, 3),
        "walls": walls,
        "rows_per_sec": round(total_rows / t_best, 1),
        "steal_frac": st_best,
        "jvm_peak_rss_mib": peak,
    }))


if __name__ == "__main__":
    main()
