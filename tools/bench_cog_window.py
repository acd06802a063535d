"""Measure the COG windowed-read win: decode_tiff_window vs full decode.

At 100 TB a mosaic corpus is scenes of 10^8-10^9 px each; a per-task
training-chip / tile extraction that full-decodes the scene does
O(raster) entropy work for an O(tile) answer.  decode_tiff_window
(sources/codec_tiff.py) entropy-decodes only the internal tiles the
requested window intersects.  This harness quantifies that on one
realistic scene: an 8192x8192 uint8 mosaic, 256x256 internal tiles,
deflate-compressed, from which a 512x512 chip is read (a) via full
decode + numpy slice and (b) via the windowed path, best-of-N each,
asserting bit-identical output.  Expected ratio ~ raster/window area
(256x) minus fixed header-walk cost.

Usage:  python tools/bench_cog_window.py [scene_px] [chip_px] [reps]
Prints one JSON line; record the figures in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_tiff as T

SCENE = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
CHIP = int(sys.argv[2]) if len(sys.argv) > 2 else 512
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5


def main() -> None:
    rng = np.random.default_rng(11)
    # piecewise-smooth synthetic orthophoto plane: compressible like real
    # imagery (pure noise would make deflate a passthrough and understate
    # the full-decode cost)
    yy, xx = np.mgrid[0:SCENE, 0:SCENE]
    arr = ((yy // 64 * 13 + xx // 64 * 29) % 181).astype(np.uint8)
    arr[::97] += 11  # break strict tiling periodicity
    blob = T.encode_tiff(arr, compression="deflate", tiling=(256, 256))

    x0 = y0 = (SCENE - CHIP) // 2 + 37  # straddle tile boundaries

    t_full = min(
        _time(lambda: T.decode_tiff(blob)) for _ in range(REPS)
    )
    t_win = min(
        _time(lambda: T.decode_tiff_window(blob, x0, y0, CHIP, CHIP))
        for _ in range(REPS)
    )
    full = T.decode_tiff(blob)
    win = T.decode_tiff_window(blob, x0, y0, CHIP, CHIP)
    assert np.array_equal(win, full[y0 : y0 + CHIP, x0 : x0 + CHIP])

    print(
        json.dumps(
            {
                "scene_px": SCENE,
                "chip_px": CHIP,
                "tiff_bytes": len(blob),
                "full_decode_sec": round(t_full, 4),
                "window_decode_sec": round(t_win, 4),
                "speedup": round(t_full / t_win, 1),
                "area_ratio": round((SCENE * SCENE) / (CHIP * CHIP), 1),
            }
        )
    )


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
