"""Resampling kernels: nearest + bilinear resize (pure NumPy).

Stand-ins for the reference's cv2.resize calls (write path
/root/reference/src/io.py:86, read path /root/reference/src/dataGenerator.py:67,77)
and gdal NEAREST warps (pyramid /root/reference/src/bf_gridding.py:1046,
multi-res /root/reference/generateMutilRes.py:46-56).

Bilinear follows cv2.INTER_LINEAR semantics: source coordinate
``sx = (dx + 0.5) * scale - 0.5`` (half-pixel centers), edge-clamped.
Nearest follows GDAL NEAREST: ``sx = floor(dx * scale)``.
"""

from __future__ import annotations

import numpy as np


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    xs = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    ys = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    return arr[np.ix_(ys, xs)]  # np.ix_ handles both 2-D and 3-D


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    src = arr.astype(np.float64)
    sx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    sy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)
    fy = np.clip(sy - y0, 0.0, 1.0)
    if arr.ndim == 3:
        fx = fx[None, :, None]
        fy = fy[:, None, None]
    else:
        fx = fx[None, :]
        fy = fy[:, None]
    tl = src[np.ix_(y0, x0)]
    tr = src[np.ix_(y0, x1)]
    bl = src[np.ix_(y1, x0)]
    br = src[np.ix_(y1, x1)]
    top = tl + (tr - tl) * fx
    bot = bl + (br - bl) * fx
    out = top + (bot - top) * fy
    if np.issubdtype(arr.dtype, np.integer):
        return np.clip(np.round(out), np.iinfo(arr.dtype).min, np.iinfo(arr.dtype).max).astype(arr.dtype)
    return out.astype(arr.dtype)


def downsample2x_nearest(arr: np.ndarray) -> np.ndarray:
    """Stride-2 slice — the pyramid level step (scale x2, NEAREST)."""
    return arr[::2, ::2]
