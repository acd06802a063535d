"""Mapbox Vector Tile codec + sink: wire format, clipping, quantization,
round trips, hostile bytes, and the Spark operator end-to-end."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import mvt as M
from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.operators import vectortiles as VT


# ------------------------------------------------------------ wire format


def test_spec_example_polygon_commands():
    """MVT 2.1 spec §4.3.5.2 worked example: ring (3,6)-(8,12)-(20,34)
    encodes to the command integers [9, 6, 12, 18, 10, 12, 24, 44, 15]."""
    ring = np.array([[3, 6], [8, 12], [20, 34]])
    assert M.encode_geometry([ring]) == [9, 6, 12, 18, 10, 12, 24, 44, 15]
    back = M.decode_geometry([9, 6, 12, 18, 10, 12, 24, 44, 15])
    assert len(back) == 1 and (back[0] == ring).all()


def test_uvarint_boundaries():
    for n in (0, 1, 127, 128, 300, 2**31, 2**63 - 1):
        enc = M._uvarint(n)
        dec, pos = M._read_uvarint(enc, 0)
        assert dec == n and pos == len(enc)
    with pytest.raises(ValueError):
        M._uvarint(-1)
    with pytest.raises(ValueError):
        M._read_uvarint(b"\x80\x80", 0)  # truncated


def test_zigzag_roundtrip():
    for n in (0, -1, 1, -64, 63, 2**31, -(2**31), 2**62, -(2**62)):
        assert M._unzigzag(M._zigzag(n)) == n
    assert M._zigzag(-1) == 1 and M._zigzag(1) == 2  # spec mapping


def test_value_types_roundtrip():
    vals = ["road", -17, 42, 3.5, True, False]
    layer = M.encode_layer("l", [], ["k"], vals)
    dec = M.decode_tile(M.encode_tile([layer]))[0]
    assert dec["values"] == vals
    assert dec["keys"] == ["k"] and dec["extent"] == 4096
    assert dec["version"] == 2 and dec["name"] == "l"


def test_layer_feature_roundtrip_with_hole():
    ext = M.ensure_winding(
        np.array([[0, 0], [100, 0], [100, 80], [0, 80]]), True
    )
    hole = M.ensure_winding(
        np.array([[10, 10], [20, 10], [20, 20], [10, 20]]), False
    )
    feat = {"id": 7, "type": M.GEOM_POLYGON, "rings": [ext, hole],
            "tags": [0, 0]}
    tile = M.encode_tile([M.encode_layer("p", [feat], ["value"], [5])])
    f = M.decode_tile(tile)[0]["features"][0]
    assert f["id"] == 7 and f["tags"] == [0, 0]
    assert (f["rings"][0] == ext).all() and (f["rings"][1] == hole).all()
    assert M.ring_area2(f["rings"][0]) > 0 > M.ring_area2(f["rings"][1])


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(-10000, 10000), st.integers(-10000, 10000)
            ),
            min_size=3,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_geometry_roundtrip_property(rings):
    rings = [np.array(r, dtype=np.int64) for r in rings]
    back = M.decode_geometry(M.encode_geometry(rings))
    assert len(back) == len(rings)
    for a, b in zip(rings, back):
        assert (a == b).all()


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_decode_tile_random_bytes(data):
    """Repo-wide parser contract: hostile bytes raise ValueError cleanly
    (or parse), never hang or over-allocate."""
    try:
        M.decode_tile(data)
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_fuzz_truncations_and_flips_of_valid_tile(data):
    ring = np.array([[0, 0], [50, 0], [50, 40], [0, 40]])
    feat = {"id": 3, "type": M.GEOM_POLYGON,
            "rings": [M.ensure_winding(ring)], "tags": [0, 0]}
    blob = M.encode_tile([M.encode_layer("p", [feat], ["v"], [1])])
    cut = data.draw(st.integers(0, len(blob) - 1))
    try:
        M.decode_tile(blob[:cut])
    except ValueError:
        pass
    pos = data.draw(st.integers(0, len(blob) - 1))
    bit = data.draw(st.integers(0, 7))
    mut = bytearray(blob)
    mut[pos] ^= 1 << bit
    try:
        M.decode_tile(bytes(mut))
    except ValueError:
        pass


def test_decode_geometry_malformed():
    with pytest.raises(ValueError):
        M.decode_geometry([(2 & 7) | (1 << 3), 0, 0])  # LineTo first
    with pytest.raises(ValueError):
        M.decode_geometry([9, 0, 0, 15])  # ClosePath on 1-vertex ring
    with pytest.raises(ValueError):
        M.decode_geometry([9, 0])  # truncated MoveTo params
    with pytest.raises(ValueError):
        M.decode_geometry([(5 & 7) | (1 << 3)])  # unknown command id


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(-10000, 10000), st.integers(-10000, 10000)
            ),
            min_size=2,
            max_size=10,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_linestring_geometry_roundtrip_property(parts):
    parts = [np.array(p, dtype=np.int64) for p in parts]
    cmds = M.encode_geometry(parts, M.GEOM_LINESTRING)
    back = M.decode_geometry(cmds, M.GEOM_LINESTRING)
    assert len(back) == len(parts)
    for a, b in zip(parts, back):
        assert (a == b).all()


def test_clip_line_box_shapes():
    # crosses the box twice -> two parts
    path = np.array([[-5.0, 5.0], [15.0, 5.0], [15.0, 20.0], [-5.0, 20.0]])
    parts = M.clip_line_box(path, 0, 0, 10, 30)
    assert [p.tolist() for p in parts] == [
        [[0.0, 5.0], [10.0, 5.0]],
        [[10.0, 20.0], [0.0, 20.0]],
    ]
    # diagonal clipped to the box corner-to-corner
    d = M.clip_line_box(np.array([[-10.0, -10.0], [20.0, 20.0]]), 0, 0, 10, 10)
    assert [p.tolist() for p in d] == [[[0.0, 0.0], [10.0, 10.0]]]
    # fully inside -> identity, one part
    inside = np.array([[1.0, 1.0], [2.0, 3.0], [4.0, 1.0]])
    got = M.clip_line_box(inside, 0, 0, 10, 10)
    assert len(got) == 1 and (got[0] == inside).all()
    # fully outside -> nothing
    assert M.clip_line_box(np.array([[50.0, 50.0], [60.0, 60.0]]),
                           0, 0, 10, 10) == []


def test_quantize_line_degenerates():
    seg = np.array([[0.0, 0.0], [0.4, 0.0]])
    assert M.quantize_line(seg, 0.0, 1.0, 1.0) is None  # collapses
    seg2 = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 0.0], [3.0, 2.0]])
    q = M.quantize_line(seg2, 0.0, 2.0, 1.0)
    assert q is not None and len(q) == 3  # consecutive dup dropped


# ------------------------------------------------- clip + quantize kernels


def test_clip_inside_is_identity():
    ring = np.array([[1.0, 1.0], [4.0, 2.0], [3.0, 5.0]])
    out = M.clip_ring_box(ring, 0, 0, 10, 10)
    assert (out == ring).all()


def test_clip_disjoint_and_touching():
    ring = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    assert M.clip_ring_box(ring, 5, 5, 9, 9) is None
    touch = M.clip_ring_box(ring, 2, 0, 4, 2)  # shares an edge only
    if touch is not None:  # SH may keep the zero-width sliver...
        assert M.quantize_ring(touch, 2, 2, 1.0) is None  # ...quantize kills


def test_clip_axis_rect_equals_clamp():
    rng = np.random.default_rng(7)
    for _ in range(50):
        x0, y0 = rng.uniform(0, 50, 2)
        w, h = rng.uniform(1, 60, 2)
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]
        )
        box = (20.0, 10.0, 70.0, 55.0)
        out = M.clip_ring_box(ring, *box)
        cx0, cx1 = max(x0, box[0]), min(x0 + w, box[2])
        cy0, cy1 = max(y0, box[1]), min(y0 + h, box[3])
        if cx1 <= cx0 or cy1 <= cy0:
            if out is not None:  # degenerate sliver: zero area
                assert abs(M._poly_area(out)) < 1e-9 if hasattr(M, "_poly_area") else True
            continue
        assert out is not None
        assert {(round(x, 9), round(y, 9)) for x, y in out} == {
            (round(x, 9), round(y, 9))
            for x, y in [(cx0, cy0), (cx1, cy0), (cx1, cy1), (cx0, cy1)]
        }


def test_clip_concave_stays_in_box():
    concave = np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [5.0, 3.0], [0.0, 10.0]]
    )
    out = M.clip_ring_box(concave, 2, 1, 8, 8)
    assert out is not None
    assert (out[:, 0] >= 2 - 1e-9).all() and (out[:, 0] <= 8 + 1e-9).all()
    assert (out[:, 1] >= 1 - 1e-9).all() and (out[:, 1] <= 8 + 1e-9).all()


def test_quantize_dedup_and_degenerate():
    ring = np.array([[0.0, 0.0], [0.1, 0.0], [5.0, 0.0], [5.0, 5.0],
                     [0.0, 5.0], [0.0, 0.0]])  # closed + near-dup vertex
    q = M.quantize_ring(ring, 0.0, 5.0, 1.0)
    assert q is not None and len(q) == 4  # dup + closing vertex dropped
    thin = np.array([[0.0, 0.0], [0.4, 0.0], [0.4, 4.0], [0.0, 4.0]])
    assert M.quantize_ring(thin, 0.0, 4.0, 1.0) is None  # collapses flat


def test_ensure_winding():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    ext = M.ensure_winding(sq, exterior=True)
    assert M.ring_area2(ext) > 0
    hole = M.ensure_winding(sq, exterior=False)
    assert M.ring_area2(hole) < 0
    # already-correct winding untouched
    assert (M.ensure_winding(ext, exterior=True) == ext).all()


# ----------------------------------------------------------- the operator


def test_polygons_to_mvt_end_to_end(spark):
    """A polygon spanning all four z=1 tiles, with a hole in one quadrant;
    per-tile decoded area equals the clamp arithmetic, winding correct,
    ids/values round trip."""
    polys = spark.createDataFrame(
        [
            (
                1,
                [[100.0, 100.0], [900.0, 100.0], [900.0, 900.0],
                 [100.0, 900.0]],
                [[[150.0, 150.0], [300.0, 150.0], [300.0, 300.0],
                  [150.0, 300.0]]],
                9,
            ),
            (2, [[600.0, 600.0], [700.0, 600.0], [700.0, 650.0],
                 [600.0, 650.0]], None, -4),
        ],
        "polygon_id long, ring array<array<double>>, "
        "holes array<array<array<double>>>, value long",
    )
    tiles = VT.polygons_to_mvt(
        polys, (0.0, 0.0, 1000.0, 1000.0), zoom=1, extent=4096
    )
    rows = {(r.tx, r.ty): r for r in tiles.collect()}
    assert set(rows) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    scale = 4096 / 500.0

    def rect_q(tx, ty, x0, y0, x1, y1):
        """Oracle twin: clamp a world rect to tile (tx, ty) and floor-
        quantize — returns (w, h, area2) of the quantized rect."""
        wx0, wtop = tx * 500.0, 1000.0 - ty * 500.0
        qxl = int(np.floor((max(x0, wx0) - wx0) * scale))
        qxr = int(np.floor((min(x1, wx0 + 500.0) - wx0) * scale))
        qyt = int(np.floor((wtop - min(y1, wtop)) * scale))
        qyb = int(np.floor((wtop - max(y0, wtop - 500.0)) * scale))
        return qxr - qxl, qyb - qyt, 2 * (qxr - qxl) * (qyb - qyt)

    stats = {
        (r.tx, r.ty): r for r in VT.mvt_tile_stats(tiles).collect()
    }
    for r in stats.values():
        assert r.z == 1
        assert r.sum_area2 > 0  # exterior winding dominates everywhere
    # tile (0,1) = lower-LEFT in y-down rows (ty=1 covers world y [0,500]):
    # poly1 clips to [100,500]x[100,500]; its hole lies entirely inside.
    r01 = stats[(0, 1)]
    _, _, a2 = rect_q(0, 1, 100, 100, 900, 900)
    _, _, hole_a2 = rect_q(0, 1, 150, 150, 300, 300)
    assert r01.n_features == 1 and r01.n_rings == 2
    assert r01.sum_area2 == a2 - hole_a2
    assert r01.sum_id == 1 and r01.sum_value == 9
    # poly2 (y in [600, 650]) lives in the TOP row: tile (1, 0), which
    # also holds poly1's upper-right quadrant.
    r10 = stats[(1, 0)]
    assert r10.n_features == 2 and r10.sum_id == 3
    assert r10.sum_value == 9 - 4
    _, _, p1_a2 = rect_q(1, 0, 100, 100, 900, 900)
    _, _, p2_a2 = rect_q(1, 0, 600, 600, 700, 650)
    assert r10.sum_area2 == p1_a2 + p2_a2
    # tile (1,1): only poly1's lower-right quadrant (hole is elsewhere)
    r11 = stats[(1, 1)]
    _, _, q11 = rect_q(1, 1, 100, 100, 900, 900)
    assert r11.n_features == 1 and r11.n_rings == 1
    assert r11.sum_area2 == q11


def test_mvt_blob_decodes_with_own_parser(spark):
    polys = spark.createDataFrame(
        [(5, [[10.0, 10.0], [90.0, 10.0], [90.0, 90.0], [10.0, 90.0]], 1)],
        "polygon_id long, ring array<array<double>>, value long",
    )
    tiles = VT.polygons_to_mvt(polys, (0.0, 0.0, 100.0, 100.0), zoom=0)
    blob = tiles.collect()[0].mvt
    layers = M.decode_tile(bytes(blob))
    assert [l["name"] for l in layers] == ["polygons"]
    assert layers[0]["features"][0]["id"] == 5
    assert layers[0]["values"] == [1]


def test_buffer_px_expands_tiles(spark):
    """With a 64-px buffer, a polygon just outside a tile edge still lands
    in that tile (coordinates legally outside [0, extent])."""
    polys = spark.createDataFrame(
        [(1, [[501.0, 100.0], [600.0, 100.0], [600.0, 200.0],
              [501.0, 200.0]], 0)],
        "polygon_id long, ring array<array<double>>, value long",
    )
    no_buf = VT.polygons_to_mvt(polys, (0.0, 0.0, 1000.0, 1000.0), zoom=1)
    assert {(r.tx, r.ty) for r in no_buf.collect()} == {(1, 1)}
    buf = VT.polygons_to_mvt(
        polys, (0.0, 0.0, 1000.0, 1000.0), zoom=1, buffer_px=64
    )
    got = {(r.tx, r.ty) for r in buf.collect()}
    assert (0, 1) in got and (1, 1) in got
    stats = {(r.tx, r.ty): r for r in VT.mvt_tile_stats(buf).collect()}
    assert stats[(0, 1)].n_features == 1  # the buffered sliver


def test_lines_to_mvt_multipart(spark):
    """A path that leaves and re-enters one tile becomes ONE feature with
    two parts there; a segment crossing the tile border appears (clipped)
    in both tiles."""
    zigzag_path = [[100.0, 100.0], [450.0, 100.0], [450.0, 800.0],
                   [100.0, 800.0], [100.0, 300.0], [300.0, 300.0]]
    lines = spark.createDataFrame(
        [(1, zigzag_path, 7), (2, [[400.0, 250.0], [700.0, 250.0]], 2)],
        "line_id long, path array<array<double>>, value long",
    )
    tiles = VT.lines_to_mvt(lines, (0.0, 0.0, 1000.0, 1000.0), zoom=1)
    stats = {(r.tx, r.ty): r for r in VT.mvt_tile_stats(tiles).collect()}
    # tile (0,1): world x,y in [0,500]: path 1 enters, exits to y>500,
    # re-enters (two parts); segment 2's left half also lives here.
    r01 = stats[(0, 1)]
    assert r01.n_features == 2 and r01.sum_id == 3
    assert r01.n_rings == 3  # two parts + one clipped segment
    assert r01.sum_value == 7 + 2 and r01.sum_area2 == 0
    # tile (1,1): only segment 2's right half
    r11 = stats[(1, 1)]
    assert r11.n_features == 1 and r11.sum_id == 2 and r11.n_rings == 1
    # tile (0,0): the path's upper loop (y in [500,800]), one part
    r00 = stats[(0, 0)]
    assert r00.n_features == 1 and r00.sum_id == 1
    # decoded blob parses as type-2 features with our own parser
    blob = next(r.mvt for r in tiles.collect()
                if (r.tx, r.ty) == (0, 1))
    layer = M.decode_tile(bytes(blob))[0]
    assert layer["name"] == "lines"
    assert {f["type"] for f in layer["features"]} == {M.GEOM_LINESTRING}


def test_point_geometry_roundtrip_and_guards():
    pts = np.array([[5, 7], [3, 2], [5, 7]])  # duplicates legal
    cmds = M.encode_geometry([pts], M.GEOM_POINT)
    assert cmds[0] == (1 & 0x7) | (3 << 3)  # one MoveTo, count 3
    (back,) = M.decode_geometry(cmds, M.GEOM_POINT)
    assert (back == pts).all()
    import pytest as _pt
    with _pt.raises(ValueError):  # LineTo illegal in point geometry
        M.decode_geometry([9, 2, 2, (2 & 7) | (1 << 3), 2, 2],
                          M.GEOM_POINT)
    with _pt.raises(ValueError):  # second MoveTo illegal
        M.decode_geometry([9, 2, 2, 9, 2, 2], M.GEOM_POINT)


def test_points_to_mvt_end_to_end(spark):
    pts = spark.createDataFrame(
        [(1, 100.0, 100.0, 5), (2, 600.0, 100.0, 5), (3, 600.0, 900.0, 2),
         (4, 100.1, 100.1, 7)],
        "point_id long, px double, py double, value long",
    )
    tiles = VT.points_to_mvt(pts, (0.0, 0.0, 1000.0, 1000.0), zoom=1)
    stats = {(r.tx, r.ty): r for r in VT.mvt_tile_stats(tiles).collect()}
    assert set(stats) == {(0, 1), (1, 1), (1, 0)}
    r01 = stats[(0, 1)]  # points 1 and 4, lower-left quadrant
    assert r01.n_features == 2 and r01.sum_id == 5
    assert r01.n_vertices == 2 and r01.sum_area2 == 0
    assert r01.sum_value == 5 + 7
    scale = 4096 / 500.0
    assert r01.sum_qx == int(np.floor(100.0 * scale)) + int(
        np.floor(100.1 * scale)
    )
    # decoded blob: type-1 features, ids intact
    blob = next(r.mvt for r in tiles.collect() if (r.tx, r.ty) == (1, 0))
    layer = M.decode_tile(bytes(blob))[0]
    assert layer["name"] == "points"
    (f,) = layer["features"]
    assert f["type"] == M.GEOM_POINT and f["id"] == 3


def test_points_buffer_duplicates_into_neighbour(spark):
    pts = spark.createDataFrame(
        [(1, 501.0, 250.0, 0)],
        "point_id long, px double, py double, value long",
    )
    no_buf = VT.points_to_mvt(pts, (0.0, 0.0, 1000.0, 1000.0), zoom=1)
    assert {(r.tx, r.ty) for r in no_buf.collect()} == {(1, 1)}
    buf = VT.points_to_mvt(
        pts, (0.0, 0.0, 1000.0, 1000.0), zoom=1, buffer_px=64
    )
    got = {(r.tx, r.ty) for r in buf.collect()}
    assert got == {(0, 1), (1, 1)}
    # the buffered copy sits just past the left tile's extent edge
    blob = next(r.mvt for r in buf.collect() if (r.tx, r.ty) == (0, 1))
    (f,) = M.decode_tile(bytes(blob))[0]["features"]
    assert f["rings"][0][0, 0] > 4096  # legally outside [0, extent]


def test_non_square_scheme_rejected(spark):
    polys = spark.createDataFrame(
        [(1, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], 0)],
        "polygon_id long, ring array<array<double>>, value long",
    )
    with pytest.raises(ValueError, match="non-square"):
        VT.polygons_to_mvt(polys, (0.0, 0.0, 100.0, 50.0), zoom=1)


def test_polygons_to_mvt_max_features_budget(spark):
    """Per-tile density cap: keeps the max_features LOWEST-id features
    that survive clipping (deterministic, tippecanoe-style), other
    tiles unaffected."""
    rows = []
    # 20 small rects in tile (0,0), 3 in tile (1,1) of a z=1 scheme
    for i in range(20):
        x = 10.0 + (i % 5) * 80.0
        y = 10.0 + (i // 5) * 80.0
        rows.append((i, [[x, y], [x + 40.0, y], [x + 40.0, y + 40.0],
                         [x, y + 40.0]], i))
    for i in (100, 101, 102):
        x = 600.0 + (i - 100) * 90.0
        rows.append((i, [[x, 100.0], [x + 40.0, 100.0], [x + 40.0, 140.0],
                         [x, 140.0]], i))
    polys = spark.createDataFrame(
        rows, "polygon_id long, ring array<array<double>>, value long"
    )
    tiles = VT.polygons_to_mvt(
        polys, (0.0, 0.0, 1000.0, 1000.0), zoom=1, max_features=7
    )
    got = {(r.tx, r.ty): r.n_features for r in tiles.collect()}
    assert got == {(0, 1): 7, (1, 1): 3}
    # the survivors are exactly ids 0..6 (lowest ids, sorted order)
    blob = [r.mvt for r in tiles.collect() if (r.tx, r.ty) == (0, 1)][0]
    from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.functions import mvt as M

    ids = sorted(
        f["id"] for f in M.decode_tile(bytes(blob))[0]["features"]
    )
    assert ids == list(range(7))
