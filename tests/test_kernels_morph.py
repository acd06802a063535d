"""Morphology kernels vs brute-force oracles (no Spark)."""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import (
    kernels_morph as km,
)

rng = np.random.RandomState(42)


def brute_minmax(arr, n, op):
    h, w = arr.shape
    r = n // 2
    out = np.empty_like(arr, dtype=np.float64)
    for y in range(h):
        for x in range(w):
            ys, ye = max(0, y - r), min(h, y + r + 1)
            xs, xe = max(0, x - r), min(w, x + r + 1)
            out[y, x] = op(arr[ys:ye, xs:xe])
    return out


@pytest.mark.parametrize("n", [3, 5])
def test_erode_dilate_vs_bruteforce(n):
    arr = rng.randint(0, 256, size=(20, 17)).astype(np.float64)
    np.testing.assert_array_equal(km.erode(arr, n), brute_minmax(arr, n, np.min))
    np.testing.assert_array_equal(km.dilate(arr, n), brute_minmax(arr, n, np.max))


def test_open_preserves_big_rect_removes_speck():
    m = np.zeros((30, 30))
    m[5:15, 5:20] = 255  # 10x15 rect
    m[25, 25] = 255      # 1px speck
    out = km.binary_open(m, 3)
    exp = np.zeros_like(m)
    exp[5:15, 5:20] = 255
    np.testing.assert_array_equal(out, exp)


def test_remove_small_objects_int_semantics():
    """int input: values ARE labels (skimage contract the reference hits)."""
    a = np.zeros((10, 10), dtype=np.int64)
    a[0:2, 0:2] = 255   # 4 px of value 255
    a[5, 5] = 7          # 1 px of value 7
    out = km.remove_small_objects(a, min_size=3, connectivity=2)
    assert out[0, 0] == 255 and out[5, 5] == 0


def test_remove_small_objects_bool_semantics():
    a = np.zeros((10, 10), dtype=bool)
    a[0:3, 0:3] = True   # 9 px
    a[8, 8] = True       # 1 px
    a[7, 7] = True       # diagonal -> same object under connectivity=2
    out = km.remove_small_objects(a, min_size=2, connectivity=2)
    assert out[8, 8] and out[7, 7]
    out1 = km.remove_small_objects(a, min_size=2, connectivity=1)
    assert not out1[8, 8] and not out1[7, 7]


def brute_label(mask, conn):
    """BFS labeling in raster order (ndi.label contract)."""
    h, w = mask.shape
    out = np.zeros((h, w), dtype=int)
    nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if conn == 2:
        nbrs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    nxt = 0
    for y in range(h):
        for x in range(w):
            if mask[y, x] and out[y, x] == 0:
                nxt += 1
                stack = [(y, x)]
                out[y, x] = nxt
                while stack:
                    cy, cx = stack.pop()
                    for dy, dx in nbrs:
                        ny, nx_ = cy + dy, cx + dx
                        if 0 <= ny < h and 0 <= nx_ < w and mask[ny, nx_] and out[ny, nx_] == 0:
                            out[ny, nx_] = nxt
                            stack.append((ny, nx_))
    return out


@pytest.mark.parametrize("conn", [1, 2])
@pytest.mark.parametrize("p", [0.2, 0.45, 0.7])
def test_label_vs_bruteforce(conn, p):
    for seed in range(3):
        m = np.random.RandomState(seed).rand(25, 31) < p
        np.testing.assert_array_equal(
            km.label(m, connectivity=conn), brute_label(m, conn)
        )


def brute_edt(mask):
    fg = mask != 0
    h, w = fg.shape
    zy, zx = np.nonzero(~fg)
    out = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            if fg[y, x]:
                out[y, x] = np.sqrt(((zy - y) ** 2 + (zx - x) ** 2).min())
    return out


def test_edt_vs_bruteforce():
    for seed in range(4):
        m = np.random.RandomState(seed).rand(20, 26) < 0.6
        m[0, 0] = False  # guarantee a zero exists
        np.testing.assert_allclose(km.distance_transform_edt(m), brute_edt(m))


def test_edt_rect_center():
    m = np.zeros((50, 50))
    m[10:20, 10:30] = 1
    d = km.distance_transform_edt(m)
    assert d[14, 20] == 5.0  # center row of 10-tall rect: min(5 up, 5 down)
    assert d[10, 10] == 1.0  # corner pixel
    assert d.max() == 5.0


def test_peak_local_max_rect():
    m = np.zeros((40, 40))
    m[5:15, 5:35] = 1
    d = km.distance_transform_edt(m)
    peaks = km.peak_local_max(d, min_distance=3, labels=m)
    ys, xs = np.nonzero(peaks)
    assert (d[ys, xs] == d.max()).all() and len(ys) > 0


def test_watershed_separates_two_blobs():
    m = np.zeros((40, 80))
    m[10:20, 10:25] = 1
    m[10:20, 50:70] = 1
    labels = km.watershed_segmentation(m, cell_size=1.0, min_distance_m=7.5)
    vals = set(np.unique(labels)) - {0}
    assert len(vals) == 2
    assert (labels != 0).sum() == (m != 0).sum()  # covers exactly the mask
    assert len(set(np.unique(labels[10:20, 10:25])) - {0}) == 1
    assert len(set(np.unique(labels[10:20, 50:70])) - {0}) == 1


def test_watershed_splits_touching_blobs():
    """Two 'buildings' fused by a thin bridge split into 2 instances —
    the whole point of the watershed stage (postprocess.py:221-270)."""
    m = np.zeros((40, 100))
    m[5:35, 5:35] = 1
    m[5:35, 55:95] = 1
    m[18:22, 35:55] = 1  # bridge
    labels = km.watershed_segmentation(m, cell_size=1.0, min_distance_m=7.5)
    # the two cores split into distinct instances (the bridge may form its
    # own shallow third instance — skimage peak_local_max would mark it too)
    assert labels[20, 20] != 0 and labels[20, 75] != 0
    assert labels[20, 20] != labels[20, 75]
    assert (labels != 0).sum() == (m != 0).sum()


def test_skeletonize_thins_bar():
    m = np.zeros((20, 30))
    m[8:13, 3:27] = 1
    sk = km.skeletonize(m)
    assert sk.sum() < m.sum() / 2
    assert sk[10, 5:25].any()
    # 1px thin: no 2x2 block fully set
    blocks = sk[:-1, :-1] & sk[1:, :-1] & sk[:-1, 1:] & sk[1:, 1:]
    assert not blocks.any()


def test_windowed_watershed_equals_full_plane():
    """The component-cluster windowing is an optimization, not a semantics
    change: a concave merged group's bounding window can contain a foreign
    component (regression: its values were clobbered with clipped ones)."""

    def full_plane(arr, distance_px=7):
        d = km.distance_transform_edt(arr)
        lm = km.peak_local_max(d, min_distance=distance_px, labels=arr)
        markers = km.label(lm, connectivity=1)
        return km.watershed(-d, markers, mask=arr)

    # L-shaped group whose pad-merged window contains an unrelated blob
    m = np.zeros((120, 160), np.uint8)
    m[100:103, 0:141] = 255   # bottom bar
    m[10:91, 137:140] = 255   # right bar (merges with bottom via padding)
    m[1:21, 50:70] = 255      # foreign blob inside the L's bounding window
    np.testing.assert_array_equal(
        km.watershed_segmentation(m, 1.0), full_plane(m)
    )

    rng = np.random.default_rng(11)
    for _ in range(25):
        h, w = rng.integers(60, 160, 2)
        m = np.zeros((h, w), np.uint8)
        for _ in range(rng.integers(1, 6)):
            y, x = rng.integers(0, h - 12), rng.integers(0, w - 12)
            rh = rng.integers(3, min(40, h - y))
            rw = rng.integers(3, min(40, w - x))
            if rng.integers(0, 2):
                m[y:y + rh, x:x + rw] = 255
            else:
                m[y:y + rh, x:x + 3] = 255
                m[y + rh - 3:y + rh, x:x + rw] = 255
        np.testing.assert_array_equal(
            km.watershed_segmentation(m, 1.0), full_plane(m)
        )
