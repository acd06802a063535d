"""Freeze the reproject_extents expectations for the DuckDB oracle.

``fixtures/reproject_extents_sf0_01.parquet`` — the complete expected
q_reproject_extents output: per-pk mixed-UTM-zone extents inverted to
WGS84 lon/lat nanodegree bounds through the from-scratch Karney-series
transverse Mercator (functions/geodesy.py).  The series itself is
independently verified by tests/test_geodesy.py (round-trip, numerical
Newton inversion of the forward map, WGS84 meridian-quarter constant,
k0 on the central meridian); this fixture pins the full distributed
chain bit-for-bit.

This run is SINGLE-PROCESS numpy — no executors, no Arrow batching, no
mapInPandas — so a distributed-plumbing bug in the gated query cannot
cancel out.  The placement spec mirrors q_reproject_extents's docstring
exactly, and the border-ring construction duplicates
operators/reproject.extents_to_wgs84's expressions term-for-term
(``x0 + (x1-x0)*t`` with t = linspace(0,1,17)) so the doubles are
bit-identical before the nanodegree rint.

Usage:  python tools/build_reproject_fixture.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import geodesy as G

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
DENSIFY = 16


def main() -> None:
    part = pd.read_parquet(
        os.path.join(SF_DIR, "part.parquet"), columns=["p_partkey"]
    )
    pk = part["p_partkey"].values.astype(np.int64)
    image_id = np.array([f"img_{k:08d}" for k in pk])

    # images_meta's closed forms (sources/derived.py:36-48)
    w = 200 + (pk * 37) % 1801
    h = 200 + (pk * 53) % 1801

    # q_reproject_extents's placement spec
    south = pk % 2 == 1
    zone = 1 + pk % 60
    e0 = 300000.0 + (pk % 97) * 2000.0
    n0 = np.where(
        south,
        6500000.0 + (pk % 89) * 10000.0,
        500000.0 + (pk % 89) * 40000.0,
    )
    epsg = np.where(south, 32700 + zone, 32600 + zone)
    x0, y0 = e0, n0
    x1 = e0 + w * 0.1
    y1 = n0 + h * 0.1

    # border ring, expression-identical to extents_to_wgs84
    t = np.linspace(0.0, 1.0, DENSIFY + 1)
    ex = x0[:, None] + (x1 - x0)[:, None] * t
    ey = y0[:, None] + (y1 - y0)[:, None] * t
    ones = np.ones_like(t)
    px = np.concatenate([ex, ex, x0[:, None] * ones, x1[:, None] * ones], axis=1)
    py = np.concatenate([y0[:, None] * ones, y1[:, None] * ones, ey, ey], axis=1)

    n, p = px.shape
    lat, lon = G.utm_inverse(
        px.ravel(), py.ravel(), np.repeat(zone, p), np.repeat(south, p)
    )
    lat = lat.reshape(n, p)
    lon = lon.reshape(n, p)

    def nd(v: np.ndarray) -> np.ndarray:
        return np.rint(v * 1e9).astype(np.int64)

    out = pd.DataFrame({
        "image_id": image_id,
        "epsg": epsg.astype(np.int32),
        "lon_min_nd": nd(lon.min(axis=1)),
        "lat_min_nd": nd(lat.min(axis=1)),
        "lon_max_nd": nd(lon.max(axis=1)),
        "lat_max_nd": nd(lat.max(axis=1)),
    }).sort_values("image_id").reset_index(drop=True)

    os.makedirs(FIX_DIR, exist_ok=True)
    dst = os.path.join(FIX_DIR, "reproject_extents_sf0_01.parquet")
    out.to_parquet(dst, index=False)
    print(f"wrote {dst}: {len(out)} rows, zones {zone.min()}..{zone.max()}")


if __name__ == "__main__":
    main()
