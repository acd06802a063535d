"""Vector kernels: polygonize round-trips, DP bound, MBR/area properties."""

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import (
    kernels_vector as kv,
)


def rasterize_evenodd(ring, holes, h, w):
    """Independent even-odd fill on pixel centers (corner-coord rings)."""
    out = np.zeros((h, w), dtype=bool)
    loops = [ring] + list(holes)
    for y in range(h):
        for x in range(w):
            px, py = x + 0.5, y + 0.5
            inside = False
            for loop in loops:
                for (x1, y1), (x2, y2) in zip(loop, loop[1:]):
                    if (y1 > py) != (y2 > py):
                        if px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                            inside = not inside
            out[y, x] = inside
    return out


def test_polygonize_rect():
    m = np.zeros((20, 30), dtype=np.int32)
    m[5:15, 10:22] = 3
    polys = kv.polygonize(m, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
    assert len(polys) == 1
    p = polys[0]
    assert p["value"] == 3 and p["holes"] == []
    assert len(p["ring"]) == 5  # 4 corners + closure
    assert sorted(map(tuple, p["ring"][:-1])) == [
        (10.0, 5.0), (10.0, 15.0), (22.0, 5.0), (22.0, 15.0),
    ]


@pytest.mark.parametrize("seed", range(5))
def test_polygonize_rasterize_roundtrip(seed):
    rng = np.random.RandomState(seed)
    m = (rng.rand(18, 22) < 0.4).astype(np.int32)
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions.kernels_morph import label

    labels = label(m, connectivity=1)
    recon = np.zeros(m.shape, dtype=np.int32)
    for v, ext, holes in kv.trace_regions(labels):
        fill = rasterize_evenodd(ext, holes, *m.shape)
        assert (recon[fill] == 0).all(), "regions overlap"
        recon[fill] = v
    np.testing.assert_array_equal(recon, labels)


def test_polygonize_donut_has_hole():
    m = np.zeros((12, 12), dtype=np.int32)
    m[2:10, 2:10] = 1
    m[5:7, 5:7] = 0
    polys = kv.polygonize(m, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
    assert len(polys) == 1 and len(polys[0]["holes"]) == 1


def test_polygonize_geo_transform_and_orientation():
    m = np.zeros((10, 10), dtype=np.int32)
    m[2:5, 3:8] = 1
    gt = (100.0, 0.1, 0.0, 500.0, 0.0, -0.1)
    p = kv.polygonize(m, gt)[0]
    ring = np.array(p["ring"])
    assert ring[:, 0].min() == pytest.approx(100.3)
    assert ring[:, 0].max() == pytest.approx(100.8)
    assert ring[:, 1].max() == pytest.approx(499.8)
    assert ring[:, 1].min() == pytest.approx(499.5)
    # exterior CW in geo coords (negative signed area) = shapefile convention
    # for exterior rings, which is what the reference writes
    x, y = ring[:, 0], ring[:, 1]
    signed = 0.5 * (np.dot(x[:-1], y[1:]) - np.dot(y[:-1], x[1:]))
    assert signed < 0


def test_douglas_peucker_bound_and_endpoints():
    rng = np.random.RandomState(1)
    t = np.linspace(0, 2 * np.pi, 200)
    pts = np.stack([t, np.sin(t) + rng.normal(0, 0.01, len(t))], axis=1)
    for eps in [0.05, 0.2, 1.0]:
        simp = kv.douglas_peucker(pts, eps)
        assert (simp[0] == pts[0]).all() and (simp[-1] == pts[-1]).all()
        # every dropped point within eps of the simplified polyline
        for p in pts:
            dmin = np.inf
            for a, b in zip(simp, simp[1:]):
                seg = b - a
                L2 = seg @ seg
                tt = 0 if L2 == 0 else np.clip((p - a) @ seg / L2, 0, 1)
                dmin = min(dmin, np.hypot(*(a + tt * seg - p)))
            assert dmin <= eps + 1e-9


def test_simplify_ring_rect_noop():
    ring = [[0, 0], [10, 0], [10, 5], [0, 5], [0, 0]]
    out = kv.simplify_ring(ring, 0.7)
    assert len(out) == 5
    assert set(map(tuple, out[:-1])) == set(map(tuple, np.array(ring[:-1], float)))


def test_convex_hull_and_mbr_properties():
    rng = np.random.RandomState(9)
    for _ in range(10):
        pts = rng.normal(size=(30, 2)) * [3, 1] @ np.array(
            [[np.cos(0.7), -np.sin(0.7)], [np.sin(0.7), np.cos(0.7)]]
        )
        hull = kv.convex_hull(pts)
        mbr = kv.minimum_bounding_rectangle(pts)
        # rotated rect area <= axis-aligned bbox area
        aabb = (pts[:, 0].ptp()) * (pts[:, 1].ptp())
        e1 = np.hypot(*(mbr[1] - mbr[0]))
        e2 = np.hypot(*(mbr[2] - mbr[1]))
        assert e1 * e2 <= aabb + 1e-9
        # all points inside MBR (within tolerance)
        c = mbr.mean(axis=0)
        u = (mbr[1] - mbr[0]) / e1
        v = (mbr[2] - mbr[1]) / e2
        rel = pts - c
        assert (np.abs(rel @ u) <= e1 / 2 + 1e-9).all()
        assert (np.abs(rel @ v) <= e2 / 2 + 1e-9).all()
        assert len(hull) >= 3


def test_polygon_area_known():
    assert kv.polygon_area([0, 4, 4, 0], [0, 0, 3, 3]) == 12.0
    assert kv.polygon_area([0, 2, 1], [0, 0, 2]) == 2.0
    # rounding to 2dp (reference round(,2))
    assert kv.polygon_area([0, 1.111, 1.111, 0], [0, 0, 1.111, 1.111]) == 1.23
