"""Scale evidence for imagehash.hamming_near_dup: banded multi-index
vs brute-force cross join, identical results.

Builds the planted 64-bit hash table (the phash_near_dup gate's plant)
at sf0.1 (~20k rows) and at an inflated 10x (~200k rows via id-disjoint
union), then measures:

* banded: the operator's plan — 4x16-bit band equi-join over DISTINCT
  hashes + bit_count verify (candidate rows O(n * bands)),
* brute: JVM-side cross join with the same bit_count predicate
  (n^2/2 compared pairs) — run at base scale only; at 10x it would
  compare 2e10 pairs, which is the point.

Usage:  python tools/bench_phash_scale.py [sf_dir]
Writes one JSON line; paste the figures into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    import vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark as vm
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import imagehash as IH

    spark = vm.get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": SF_DIR}

    base = E._planted_phash(spark, SF_DIR)
    # replica masks: 8-bit codewords (pairwise Hamming >= 4) replicated
    # into 5 byte lanes -> pairwise mask distance >= 20, so replicas can
    # never near-dup each other (group masks add <= 2, 20 - 4 > 3) and
    # the 10x corpus carries exactly 10x the pairs
    codes = [0x00, 0x0F, 0x33, 0x3C, 0x55, 0x5A, 0x66, 0x69, 0x96, 0xFF]
    rep = 0x0101010101 << 16  # byte lanes 2..6, keeps the sign bit clear
    big = base
    for i in range(1, 10):
        big = big.unionByName(
            base.select(
                F.concat(F.lit(f"r{i}_"), "image_id").alias("image_id"),
                F.col("phash").bitwiseXOR(F.lit(codes[i] * rep)).alias("phash"),
            )
        )

    def brute(df):
        a = df.select(F.col("image_id").alias("id_a"), F.col("phash").alias("h_a"))
        b = df.select(F.col("image_id").alias("id_b"), F.col("phash").alias("h_b"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= 3)
        )

    for label, df in (("base", base), ("10x", big)):
        n = df.count()
        t0 = time.time()
        banded = IH.hamming_near_dup(df, max_hamming=3).count()
        t_band = time.time() - t0
        rec = {"rows": n, "pairs": banded, "banded_sec": round(t_band, 2)}
        if label == "base":
            t0 = time.time()
            bf = brute(df).count()
            rec["brute_sec"] = round(time.time() - t0, 2)
            rec["brute_pairs"] = bf
            assert bf == banded, (bf, banded)
        out[label] = rec
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
