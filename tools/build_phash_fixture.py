"""Freeze the pHash expectations for the DuckDB oracle.

``fixtures/phash_sf0_01.parquet`` — (image_id, phash): the expected
64-bit DCT perceptual hash of q_phash_compute's rgb renders.  The DCT +
median threshold has no closed SQL form, so — as for the IVF centroids,
skeleton counts, and JPEG sums — the oracle reads a SINGLE-PROCESS
numpy run of the same public kernel (operators/imagehash.phash_kernel):
no executors, no Arrow batching, no mapInPandas, so a
distributed-plumbing bug cannot cancel out.  Kernel-level correctness
(luma/resize/DCT/threshold) is pinned separately by
tests/test_imagehash.py.

Usage:  python tools/build_phash_fixture.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators.imagehash import phash_kernel
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import render_rgb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
PK_CAP = 60  # q_phash_compute's images_table limit (_PHASH_PK_CAP)


def main() -> None:
    part = pd.read_parquet(f"{SF_DIR}/part.parquet", columns=["p_partkey"])
    rows = []
    for pk in sorted(int(x) for x in part["p_partkey"]):
        if pk > PK_CAP:
            continue
        w = 200 + (pk * 37) % 1801
        h = 200 + (pk * 53) % 1801
        rows.append((f"img_{pk:08d}", phash_kernel(render_rgb(pk, w, h))))
    out = os.path.join(FIX_DIR, "phash_sf0_01.parquet")
    pd.DataFrame(rows, columns=["image_id", "phash"]).astype(
        {"phash": "int64"}
    ).to_parquet(out, index=False)
    print(f"wrote {out}: {len(rows)} rows")


if __name__ == "__main__":
    main()
