"""Mapbox Vector Tile (MVT 2.1) wire format — from-scratch, numpy + stdlib.

The reference ships its vector map as shapefile/GeoJSON
(/root/reference/src/postprocess.py:147-155,333-342); the modern delivery
format for exactly that product — polygon layers served per slippy-map
tile — is the Mapbox Vector Tile.  This module implements the public MVT
2.1 specification (a protobuf message: Tile > Layer > Feature with
command-encoded zigzag-delta geometry) with no protobuf library:

* protobuf wire primitives — unsigned varints, zigzag, length-delimited
  fields (the three wire types MVT uses: 0 varint, 2 bytes, and fixed64
  for double Values);
* ``encode_layer`` / ``decode_tile`` — Layer {version=2, name, features,
  keys, values, extent}; Feature {id, packed tags, type, packed geometry};
* geometry command stream — MoveTo(1)/LineTo(2)/ClosePath(7) command
  integers ``(id & 0x7) | (count << 3)`` with zigzag-encoded coordinate
  deltas relative to a per-feature cursor;
* ring utilities — tile-local floor quantization, winding enforcement
  (MVT 2.1: exterior rings positive signed area by the surveyor's formula
  in tile coords, interior negative), and Sutherland–Hodgman clipping of
  a ring to an axis-aligned box (the tile + buffer).

Everything is deterministic integer/IEEE-double arithmetic so the driver
gate closes against a pure-SQL oracle (axis-aligned zones: clip == clamp,
quantize == floor — see __spark_entry__.q_mvt_tiles).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_geometry",
    "decode_geometry",
    "encode_layer",
    "encode_tile",
    "decode_tile",
    "quantize_ring",
    "quantize_line",
    "ensure_winding",
    "ring_area2",
    "clip_ring_box",
    "clip_line_box",
]

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3
_MOVE_TO, _LINE_TO, _CLOSE_PATH = 1, 2, 7


# --------------------------------------------------------------- varints

def _uvarint(n: int) -> bytes:
    if n < 0:
        raise ValueError(f"uvarint: negative {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        if pos >= len(data):
            raise ValueError("mvt: truncated varint")
        if shift > 63:
            raise ValueError("mvt: varint overflow")
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return _uvarint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _uvarint(len(payload)) + payload


def _vint(field: int, n: int) -> bytes:
    return _key(field, 0) + _uvarint(n)


def _fields(data: bytes):
    """Iterate (field_no, wire_type, value) over a protobuf message.
    wire 0 -> int, wire 2 -> bytes, wire 5 -> 4 raw bytes, wire 1 -> 8."""
    pos = 0
    while pos < len(data):
        tag, pos = _read_uvarint(data, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            val, pos = _read_uvarint(data, pos)
        elif wire == 2:
            ln, pos = _read_uvarint(data, pos)
            if pos + ln > len(data):
                raise ValueError("mvt: truncated length-delimited field")
            val, pos = data[pos : pos + ln], pos + ln
        elif wire == 1:
            if pos + 8 > len(data):
                raise ValueError("mvt: truncated fixed64")
            val, pos = data[pos : pos + 8], pos + 8
        elif wire == 5:
            if pos + 4 > len(data):
                raise ValueError("mvt: truncated fixed32")
            val, pos = data[pos : pos + 4], pos + 4
        else:
            raise ValueError(f"mvt: unsupported wire type {wire}")
        yield field, wire, val


# -------------------------------------------------------------- geometry

def encode_geometry(
    rings: list[np.ndarray], geom_type: int = GEOM_POLYGON
) -> list[int]:
    """Command-integer stream for a feature's parts.  POLYGON: each part
    is an open ring (>= 3 vertices) terminated by ClosePath.  LINESTRING:
    each part is a path (>= 2 vertices), no ClosePath.  Cursor persists
    across parts within one feature, per spec."""
    if geom_type == GEOM_POINT:
        # multipoint: ONE MoveTo command carrying every point, per spec
        pts = np.asarray(
            rings[0] if len(rings) == 1 else np.vstack(rings), np.int64
        )
        if len(pts) < 1:
            raise ValueError("mvt: empty point geometry")
        cmds = [(_MOVE_TO & 0x7) | (len(pts) << 3)]
        cx = cy = 0
        for x, y in pts:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        return cmds
    closed = geom_type == GEOM_POLYGON
    min_n = 3 if closed else 2
    cmds: list[int] = []
    cx = cy = 0
    for ring in rings:
        r = np.asarray(ring, dtype=np.int64)
        if len(r) < min_n:
            raise ValueError(
                f"mvt: part with {len(r)} < {min_n} vertices"
            )
        cmds.append((_MOVE_TO & 0x7) | (1 << 3))
        cmds.append(_zigzag(int(r[0, 0]) - cx))
        cmds.append(_zigzag(int(r[0, 1]) - cy))
        cx, cy = int(r[0, 0]), int(r[0, 1])
        cmds.append((_LINE_TO & 0x7) | ((len(r) - 1) << 3))
        for x, y in r[1:]:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if closed:
            cmds.append((_CLOSE_PATH & 0x7) | (1 << 3))
    return cmds


def decode_geometry(cmds: list[int], geom_type: int = GEOM_POLYGON):
    """Inverse of :func:`encode_geometry`: list of (n,2) int64 arrays (open
    rings).  Validates command structure; raises ValueError on malformed
    streams (the fuzz contract every parser in this repo follows)."""
    rings: list[np.ndarray] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    n = len(cmds)
    while i < n:
        cmd = cmds[i]
        i += 1
        op, count = cmd & 0x7, cmd >> 3
        if op == _MOVE_TO:
            if cur:
                if geom_type == GEOM_POLYGON:
                    raise ValueError("mvt: MoveTo inside open ring")
                if geom_type == GEOM_POINT:
                    raise ValueError("mvt: second MoveTo in point geometry")
                if len(cur) < 2:
                    raise ValueError("mvt: linestring part with 1 vertex")
                rings.append(np.array(cur, dtype=np.int64))
                cur = []
            if count != 1 and geom_type == GEOM_POLYGON:
                raise ValueError(f"mvt: polygon MoveTo count {count} != 1")
            for _ in range(count):
                if i + 2 > n:
                    raise ValueError("mvt: truncated MoveTo params")
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif op == _LINE_TO:
            if geom_type == GEOM_POINT:
                raise ValueError("mvt: LineTo in point geometry")
            if not cur:
                raise ValueError("mvt: LineTo before MoveTo")
            if count < 1:
                raise ValueError("mvt: LineTo count 0")
            if i + 2 * count > n:
                raise ValueError("mvt: truncated LineTo params")
            for _ in range(count):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif op == _CLOSE_PATH:
            if geom_type == GEOM_POINT:
                raise ValueError("mvt: ClosePath in point geometry")
            if count != 1:
                raise ValueError(f"mvt: ClosePath count {count} != 1")
            if len(cur) < 3:
                raise ValueError("mvt: ClosePath on ring with < 3 vertices")
            rings.append(np.array(cur, dtype=np.int64))
            cur = []
        else:
            raise ValueError(f"mvt: unknown command id {op}")
    if cur:
        if geom_type == GEOM_POLYGON:
            raise ValueError("mvt: unclosed polygon ring")
        if geom_type != GEOM_POINT and len(cur) < 2:
            raise ValueError("mvt: linestring part with 1 vertex")
        rings.append(np.array(cur, dtype=np.int64))
    return rings


# ----------------------------------------------------------------- Value

def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _vint(7, int(v))
    if isinstance(v, (int, np.integer)):
        return _vint(6, _zigzag(int(v)))  # sint64
    if isinstance(v, (float, np.floating)):
        return _key(3, 1) + struct.pack("<d", float(v))
    if isinstance(v, str):
        return _ld(1, v.encode("utf-8"))
    if isinstance(v, bytes):
        return _ld(1, v)
    raise ValueError(f"mvt: unsupported value type {type(v).__name__}")


def _want(wire: int, expected: int, what: str) -> None:
    if wire != expected:
        raise ValueError(f"mvt: {what} has wire type {wire}, want {expected}")


def _utf8(val: bytes, what: str) -> str:
    try:
        return val.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"mvt: invalid UTF-8 in {what}") from e


def _decode_value(data: bytes):
    for field, wire, val in _fields(data):
        if field == 1:
            _want(wire, 2, "string Value")
            return _utf8(val, "string Value")
        if field == 3:
            _want(wire, 1, "double Value")
            return struct.unpack("<d", val)[0]
        if field == 2:
            _want(wire, 5, "float Value")
            return struct.unpack("<f", val)[0]
        if field in (4, 5):
            _want(wire, 0, "int Value")
            return int(val)
        if field == 6:
            _want(wire, 0, "sint Value")
            return _unzigzag(int(val))
        if field == 7:
            _want(wire, 0, "bool Value")
            return bool(val)
    raise ValueError("mvt: empty Value message")


# ------------------------------------------------------------ layer/tile

def encode_layer(
    name: str,
    features: list[dict],
    keys: list[str],
    values: list,
    extent: int = 4096,
) -> bytes:
    """One Layer message.  ``features``: dicts with ``id`` (int), ``type``
    (GEOM_*), ``rings`` (list of open int rings), ``tags`` (flat list of
    alternating key-index/value-index ints)."""
    out = bytearray()
    out += _vint(15, 2)  # version — spec: encoders MUST write it first-class
    out += _ld(1, name.encode("utf-8"))
    for f in features:
        msg = bytearray()
        if f.get("id") is not None:
            msg += _vint(1, int(f["id"]))
        tags = f.get("tags") or []
        if tags:
            packed = b"".join(_uvarint(int(t)) for t in tags)
            msg += _ld(2, packed)
        ftype = int(f.get("type", GEOM_POLYGON))
        msg += _vint(3, ftype)
        geom = b"".join(
            _uvarint(c) for c in encode_geometry(f["rings"], ftype)
        )
        msg += _ld(4, geom)
        out += _ld(2, bytes(msg))
    for k in keys:
        out += _ld(3, k.encode("utf-8"))
    for v in values:
        out += _ld(4, _encode_value(v))
    out += _vint(5, int(extent))
    return bytes(out)


def encode_tile(layers: list[bytes]) -> bytes:
    return b"".join(_ld(3, layer) for layer in layers)


def _decode_packed(data: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(data):
        v, pos = _read_uvarint(data, pos)
        out.append(v)
    return out


def _decode_feature(data: bytes) -> dict:
    f = {"id": None, "tags": [], "type": 0, "rings": []}
    geom: list[int] = []
    for field, wire, val in _fields(data):
        if field == 1:
            _want(wire, 0, "feature id")
            f["id"] = int(val)
        elif field == 2:
            if wire == 2:
                f["tags"] += _decode_packed(val)
            elif wire == 0:
                f["tags"].append(int(val))
            else:
                _want(wire, 2, "feature tags")
        elif field == 3:
            _want(wire, 0, "feature type")
            f["type"] = int(val)
        elif field == 4:
            if wire == 2:
                geom += _decode_packed(val)
            elif wire == 0:
                geom.append(int(val))
            else:
                _want(wire, 2, "feature geometry")
    f["rings"] = decode_geometry(geom, f["type"] or GEOM_POLYGON)
    return f


def decode_tile(data: bytes) -> list[dict]:
    """Parse a Tile message: list of layer dicts {name, extent, version,
    keys, values, features:[{id, tags, type, rings}]}."""
    layers = []
    for field, wire, val in _fields(bytes(data)):
        if field != 3:
            continue
        if wire != 2:
            raise ValueError("mvt: layer field must be length-delimited")
        layer = {
            "name": "", "extent": 4096, "version": 1,
            "keys": [], "values": [], "features": [],
        }
        for lf, lw, lv in _fields(val):
            if lf == 15:
                _want(lw, 0, "layer version")
                layer["version"] = int(lv)
            elif lf == 1:
                _want(lw, 2, "layer name")
                layer["name"] = _utf8(lv, "layer name")
            elif lf == 2:
                _want(lw, 2, "layer feature")
                layer["features"].append(_decode_feature(lv))
            elif lf == 3:
                _want(lw, 2, "layer key")
                layer["keys"].append(_utf8(lv, "layer key"))
            elif lf == 4:
                _want(lw, 2, "layer value")
                layer["values"].append(_decode_value(lv))
            elif lf == 5:
                _want(lw, 0, "layer extent")
                layer["extent"] = int(lv)
        layers.append(layer)
    return layers


# -------------------------------------------------------- ring utilities

def ring_area2(ring: np.ndarray) -> int:
    """Twice the signed surveyor's-formula area of an open integer ring,
    exact int64 arithmetic (the MVT 2.1 winding test)."""
    r = np.asarray(ring, dtype=np.int64)
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    return int(np.sum(x * yn - xn * y))


def ensure_winding(ring: np.ndarray, exterior: bool = True) -> np.ndarray:
    """MVT 2.1: exterior rings positive signed area (surveyor's formula in
    y-down tile coords), interior rings negative.  Reverses if needed."""
    a2 = ring_area2(ring)
    if (a2 < 0) if exterior else (a2 > 0):
        return np.asarray(ring)[::-1].copy()
    return np.asarray(ring)


def quantize_ring(
    ring_world: np.ndarray,
    tile_x0: float,
    tile_y_top: float,
    scale: float,
) -> np.ndarray | None:
    """World ring -> tile-local integer coords: ``qx = floor((x - x0) *
    scale)``, ``qy = floor((y_top - y) * scale)`` (y flips — MVT tile
    coords grow downward).  Collapses consecutive duplicates and an
    explicit closing vertex; returns None if fewer than 3 distinct
    vertices survive (degenerate at this zoom)."""
    r = np.asarray(ring_world, dtype=np.float64)
    qx = np.floor((r[:, 0] - tile_x0) * scale).astype(np.int64)
    qy = np.floor((tile_y_top - r[:, 1]) * scale).astype(np.int64)
    q = np.stack([qx, qy], axis=1)
    if len(q) > 1 and (q[0] == q[-1]).all():
        q = q[:-1]
    if len(q) > 1:
        keep = np.ones(len(q), dtype=bool)
        keep[1:] = (q[1:] != q[:-1]).any(axis=1)
        q = q[keep]
    if len(q) < 3 or ring_area2(q) == 0:
        return None
    return q


def quantize_line(
    path_world: np.ndarray,
    tile_x0: float,
    tile_y_top: float,
    scale: float,
) -> np.ndarray | None:
    """World polyline -> tile-local integer coords (same floor/flip as
    :func:`quantize_ring`, but open: no closing-vertex collapse, minimum
    2 distinct vertices).  Returns None when the part degenerates to a
    point at this zoom."""
    p = np.asarray(path_world, dtype=np.float64)
    qx = np.floor((p[:, 0] - tile_x0) * scale).astype(np.int64)
    qy = np.floor((tile_y_top - p[:, 1]) * scale).astype(np.int64)
    q = np.stack([qx, qy], axis=1)
    if len(q) > 1:
        keep = np.ones(len(q), dtype=bool)
        keep[1:] = (q[1:] != q[:-1]).any(axis=1)
        q = q[keep]
    return q if len(q) >= 2 else None


def clip_line_box(
    path: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> list[np.ndarray]:
    """Clip an open polyline to the axis-aligned box: Liang-Barsky per
    segment, with consecutive in-box segments stitched into maximal
    parts.  Returns a list of (n,2) float parts (possibly empty)."""
    p = np.asarray(path, dtype=np.float64)
    parts: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(p) - 1):
        a, b = p[i], p[i + 1]
        d = b - a
        t0, t1 = 0.0, 1.0
        ok = True
        for axis, lo, hi in ((0, x0, x1), (1, y0, y1)):
            if d[axis] == 0.0:
                if a[axis] < lo or a[axis] > hi:
                    ok = False
                    break
            else:
                ta = (lo - a[axis]) / d[axis]
                tb = (hi - a[axis]) / d[axis]
                if ta > tb:
                    ta, tb = tb, ta
                t0, t1 = max(t0, ta), min(t1, tb)
                if t0 > t1:
                    ok = False
                    break
        if not ok:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        ca = a if t0 == 0.0 else np.clip(a + t0 * d, [x0, y0], [x1, y1])
        cb = b if t1 == 1.0 else np.clip(a + t1 * d, [x0, y0], [x1, y1])
        if cur and np.array_equal(cur[-1], ca):
            cur.append(cb)
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [ca, cb]
        if t1 < 1.0:  # exits the box: close this part
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
    if len(cur) >= 2:
        parts.append(cur)
    return [np.array(part) for part in parts]


def clip_ring_box(
    ring: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> np.ndarray | None:
    """Sutherland–Hodgman clip of an open ring to the axis-aligned box
    [x0,x1]x[y0,y1].  Exact for convex rings; for concave rings it can
    emit zero-width bridges along the box edge (the standard, spec-legal
    behaviour — degenerate slivers quantize away or carry zero area).
    Returns None when nothing remains."""
    pts = np.asarray(ring, dtype=np.float64)
    for axis, bound, keep_ge in (
        (0, x0, True), (0, x1, False), (1, y0, True), (1, y1, False),
    ):
        if len(pts) == 0:
            return None
        inside = pts[:, axis] >= bound if keep_ge else pts[:, axis] <= bound
        out: list[np.ndarray] = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin, nin = inside[i], inside[(i + 1) % n]
            if cin:
                out.append(cur)
            if cin != nin:
                t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
                p = cur + t * (nxt - cur)
                p[axis] = bound  # exact on the clip edge
                out.append(p)
        if not out:
            return None
        pts = np.array(out)
    return pts if len(pts) >= 3 else None
