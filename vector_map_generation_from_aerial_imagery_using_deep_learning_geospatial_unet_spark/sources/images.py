"""Synthetic ``images`` table (BASELINE.json input_hint shape) + analytic
ground truth.

Builds the full input contract —
``(image_id, bytes, w, h, fmt, caption, phash)`` plus georeference sidecars
``(ulx, uly, gt, crs)`` — entirely from integer arithmetic on the driver's
``part`` table, so the *content* of every image (rectangular "building"
blobs, mimicking the binary masks the reference post-processes,
/root/reference/src/postprocess.py:159-270) has a closed-form description
that both the NumPy oracle and the DuckDB oracle SQL can reproduce without
ever decoding a pixel.

Blob layout: image key ``pk`` gets ``k = 1 + pk % 4`` rectangles, one per
quadrant slot, each >=4x4 px, >=2 px clear of its slot border — so blobs are
8-connectivity-separated, survive the 3x3 open (P1) unchanged, and the
connected-component / polygonize / area ground truth is pure arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec
from .derived import images_meta

CRS_TOKEN = "SYNTH:METRIC"  # opaque, carried like the WKT string (io.py:62,80)
MAX_RECT = 117


def rect_params(pk: int, w: int, h: int) -> list[tuple[int, int, int, int]]:
    """Ground-truth rectangles for image ``pk``: list of (x0, y0, rw, rh).

    All int arithmetic — mirrored 1:1 by :func:`rects_sql`.
    """
    k = 1 + pk % 4
    qw, qh = w // 2, h // 2
    out = []
    for j in range(k):
        qx, qy = (j % 2) * qw, (j // 2) * qh
        rw = 4 + (pk * 7 + j * 13) % min(MAX_RECT, qw - 8)
        rh = 4 + (pk * 11 + j * 17) % min(MAX_RECT, qh - 8)
        x0 = qx + 2 + (pk * 19 + j * 23) % (qw - rw - 4)
        y0 = qy + 2 + (pk * 29 + j * 31) % (qh - rh - 4)
        out.append((x0, y0, rw, rh))
    return out


def rects_sql(src: str = "images_meta_pk") -> str:
    """DuckDB CTE ``rects(image_id, pk, w, h, ulx, uly, j, x0, y0, rw, rh)``
    — the exact integer arithmetic of :func:`rect_params`, unrolled over
    ``j = 0..k-1`` via generate_series.  ``src`` must provide
    ``(image_id, pk, w, h, ulx, uly)``; see IMAGES_META_PK_SQL."""
    return f"""
rect_j AS (
  SELECT *, unnest(generate_series(0, CAST(pk % 4 AS INT))) AS j
  FROM {src}
),
rects AS (
  SELECT image_id, pk, w, h, ulx, uly, j,
    ((j % 2) * (w // 2)) + 2
      + (pk * 19 + j * 23) % ((w // 2) - (4 + (pk * 7 + j * 13) % least({MAX_RECT}, (w // 2) - 8)) - 4) AS x0,
    ((j // 2) * (h // 2)) + 2
      + (pk * 29 + j * 31) % ((h // 2) - (4 + (pk * 11 + j * 17) % least({MAX_RECT}, (h // 2) - 8)) - 4) AS y0,
    4 + (pk * 7 + j * 13) % least({MAX_RECT}, (w // 2) - 8)  AS rw,
    4 + (pk * 11 + j * 17) % least({MAX_RECT}, (h // 2) - 8) AS rh
  FROM rect_j
)"""


IMAGES_META_PK_SQL = """
images_meta_pk AS (
  SELECT
    concat('img_', lpad(CAST(p_partkey AS VARCHAR), 8, '0')) AS image_id,
    p_partkey                                                AS pk,
    CAST(200 + (p_partkey * 37) % 1801 AS INT)               AS w,
    CAST(200 + (p_partkey * 53) % 1801 AS INT)               AS h,
    (p_partkey % 50) * 210e0                                 AS ulx,
    (CAST(FLOOR(p_partkey / 50) AS BIGINT) % 50) * 210e0 + 200e0 AS uly
  FROM part
)"""


def render_mask(pk: int, w: int, h: int) -> np.ndarray:
    """uint8 (h, w) label plane: 255 inside blobs, 0 outside — the value
    convention of the reference's labels (arr[arr==255]=1 remap downstream,
    /root/reference/src/dataGenerator.py:76)."""
    m = np.zeros((h, w), dtype=np.uint8)
    for x0, y0, rw, rh in rect_params(pk, w, h):
        m[y0 : y0 + rh, x0 : x0 + rw] = 255
    return m


def sparse_params(pk: int, w: int, h: int) -> list[tuple[int, int, int, int]]:
    """Rectangles for the watershed-gated ``mask_sparse`` fixture: one rect
    per 200x200 slot, confined to the slot's central [38, 162) band, so any
    two rects are >= 76 px apart (Chebyshev) — strictly beyond the engine's
    (2*75+1) peak max-filter window at 0.1 m cells.  Each isolated rect's
    EDT ridge plateau is then one 4-connected marker (no cross-rect peak
    suppression), watershed labels each rect as exactly one region of
    rw*rh px, and the whole P3 pipeline output is closed-form.

    All int arithmetic — mirrored 1:1 by :func:`sparse_sql`.
    """
    nx, ny = w // 200, h // 200
    k = min(1 + pk % 4, nx * ny)
    out = []
    for j in range(k):
        sx, sy = (j % nx) * 200, (j // nx) * 200
        rw = 4 + (pk * 7 + j * 13) % 113
        rh = 4 + (pk * 11 + j * 17) % 113
        x0 = sx + 38 + (pk * 19 + j * 23) % (125 - rw)
        y0 = sy + 38 + (pk * 29 + j * 31) % (125 - rh)
        out.append((x0, y0, rw, rh))
    return out


def render_mask_sparse(pk: int, w: int, h: int) -> np.ndarray:
    m = np.zeros((h, w), dtype=np.uint8)
    for x0, y0, rw, rh in sparse_params(pk, w, h):
        m[y0 : y0 + rh, x0 : x0 + rw] = 255
    return m


def sparse_sql(src: str = "images_meta_pk") -> str:
    """DuckDB CTE ``sparse(image_id, pk, w, h, ulx, uly, j, x0, y0, rw, rh)``
    mirroring :func:`sparse_params` exactly."""
    return f"""
sparse_j AS (
  SELECT *,
    least(CAST(1 + pk % 4 AS INT), CAST((w // 200) * (h // 200) AS INT)) AS kk
  FROM {src}
),
sparse_j2 AS (
  SELECT *, unnest(generate_series(0, kk - 1)) AS j FROM sparse_j
),
sparse AS (
  SELECT image_id, pk, w, h, ulx, uly, j,
    (j % (w // 200)) * 200 + 38
      + (pk * 19 + j * 23) % (125 - (4 + (pk * 7 + j * 13) % 113))  AS x0,
    (j // (w // 200)) * 200 + 38
      + (pk * 29 + j * 31) % (125 - (4 + (pk * 11 + j * 17) % 113)) AS y0,
    4 + (pk * 7 + j * 13) % 113  AS rw,
    4 + (pk * 11 + j * 17) % 113 AS rh
  FROM sparse_j2
)"""


def dumbbell_params(pk: int) -> tuple[int, int, int, int, int]:
    """Deterministic dumbbell geometry (x0, y0, s, blen, bh): two s x s
    squares joined by a blen x bh bridge — the watershed-separation fixture.

    Bounds chosen so the watershed outcome is ANALYTIC for the engine's
    peak-local-max (Chebyshev (2*75+1) max-filter at 0.1 m cells):
      * centers s + blen >= 92 > 75 apart  -> two markers survive
      * mid-bridge depth blen/2 + s/2 <= 64 <= 75 -> bridge plateau is
        inside a square-peak window, never a third marker
      * bridge EDT <= bh/2 = 7 < s/2 >= 18 -> bridge never outranks centers
      * total extent <= 188 x 64 px -> fits every synthetic image (>=200^2)
      * all strokes >= 3 px -> the 3x3 open (P1) is the identity on it
    """
    s = 36 + (pk % 3) * 4
    blen = 56 + (pk % 5) * 7
    bh = 14
    x0 = 10 + (pk % 7)
    y0 = 10 + (pk % 11)
    return x0, y0, s, blen, bh


def render_dumbbell(pk: int, w: int, h: int) -> np.ndarray:
    """uint8 (h, w) mask: two squares + connecting bridge (one 8-connected
    component that watershed must split into exactly two instances)."""
    x0, y0, s, blen, bh = dumbbell_params(pk)
    m = np.zeros((h, w), dtype=np.uint8)
    m[y0 : y0 + s, x0 : x0 + s] = 255
    m[y0 : y0 + s, x0 + s + blen : x0 + 2 * s + blen] = 255
    yb = y0 + s // 2 - bh // 2
    m[yb : yb + bh, x0 + s : x0 + s + blen] = 255
    return m


def dumbbell_fg_sql() -> str:
    """DuckDB CTE ``dumbbell(image_id, pk, fg_px)`` — the exact foreground
    pixel count 2*s^2 + bh*blen of :func:`dumbbell_params`."""
    return """
dumbbell AS (
  SELECT image_id, pk,
    2 * (36 + (pk % 3) * 4) * (36 + (pk % 3) * 4)
      + 14 * (56 + (pk % 5) * 7) AS fg_px
  FROM images_meta_pk
)"""


def bar_params(pk: int) -> list[tuple[int, int, int, int]]:
    """Deterministic horizontal bars (x0, y0, bw, bh) for the skeletonize
    oracle: Zhang-Suen thinning of an axis-aligned bar yields a centerline
    of exactly max(|bw - bh|, 1) pixels, and the 5x5 pre-dilation (P2,
    /root/reference/src/postprocess.py:193-217) grows both dims by 4 —
    difference invariant.  Bars are >=14 px apart vertically (>=10 after
    dilation) so components never merge, and >=6 px from every border."""
    k = 1 + pk % 3
    out = []
    for j in range(k):
        bh = 3 + (pk * 5 + j * 3) % 8            # 3..10
        bw = bh + 4 + (pk * 7 + j * 11) % 40     # diff 4..43
        x0 = 8 + (pk + j) % 9
        y0 = 8 + j * 24
        out.append((x0, y0, bw, bh))
    return out


def render_bars(pk: int, w: int, h: int) -> np.ndarray:
    m = np.zeros((h, w), dtype=np.uint8)
    for x0, y0, bw, bh in bar_params(pk):
        m[y0 : y0 + bh, x0 : x0 + bw] = 255
    return m


def bars_sql() -> str:
    """DuckDB CTE ``bars(image_id, pk, j, bw, bh)`` mirroring
    :func:`bar_params`."""
    return """
bar_j AS (
  SELECT image_id, pk, unnest(generate_series(0, CAST(pk % 3 AS INT))) AS j
  FROM images_meta_pk
),
bars AS (
  SELECT image_id, pk, j,
    (3 + (pk * 5 + j * 3) % 8) + 4 + (pk * 7 + j * 11) % 40 AS bw,
    3 + (pk * 5 + j * 3) % 8 AS bh
  FROM bar_j
)"""


def render_rgb(pk: int, w: int, h: int) -> np.ndarray:
    """uint8 (h, w, 3) pseudo-ortho: deterministic gradient background +
    bright blobs (alpha-free; the reference drops alpha with arr[:,:,:3],
    /root/reference/src/dataGenerator.py:66)."""
    yy = (np.arange(h, dtype=np.uint32)[:, None] * 7 + pk) % 97
    xx = (np.arange(w, dtype=np.uint32)[None, :] * 13 + pk) % 89
    base = (40 + yy + xx).astype(np.uint8)
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = base
    img[:, :, 1] = base + 17
    img[:, :, 2] = base + 31
    # per-blob rectangular writes instead of a full-plane boolean gather
    for x0, y0, rw, rh in rect_params(pk, w, h):
        img[y0 : y0 + rh, x0 : x0 + rw] = (220, 210, 200)
    return img


def render_dem16(pk: int, w: int, h: int) -> np.ndarray:
    """uint16 (h, w) pseudo-DEM: separable gradient scaled past the 8-bit
    range (max 52176), the elevation-raster layout GDAL hands the
    reference's ``read_tif``.  elev[y][x] = 512*((y*7+pk)%97)
    + 23*((x*13+pk)%89) + 1000 — closed-form sum and axis-weighted
    moments (see DEM16_SUMS_SQL)."""
    yy = 512 * ((np.arange(h, dtype=np.uint32) * 7 + pk) % 97)
    xx = 23 * ((np.arange(w, dtype=np.uint32) * 13 + pk) % 89)
    return (yy[:, None] + xx[None, :] + 1000).astype(np.uint16)


def dem16_sums_ctes(limit: int) -> str:
    """WITH-chain deriving render_dem16's closed-form stats.  Separable:
      sum_elev = 512*w*Syy + 23*h*Sxx + 1000*w*h
      sum_wy   = 512*w*SyY + (23*Sxx + 1000*w) * h*(h-1)/2
      sum_wx   = 23*h*SxX + (512*Syy + 1000*h) * w*(w-1)/2
    with Syy/Sxx the axis mod-sequence sums and SyY/SxX their
    index-weighted twins.  Ends with ``imgs/rowsums/colsums`` for the
    caller's SELECT."""
    return (
        "WITH "
        + IMAGES_META_PK_SQL
        + f""",
imgs AS (SELECT image_id, pk, w, h FROM images_meta_pk WHERE pk <= {limit}),
ys AS (
  SELECT image_id, pk, unnest(generate_series(0, h - 1)) AS y FROM imgs
),
rowsums AS (
  SELECT image_id,
    CAST(sum((y * 7 + pk) % 97) AS BIGINT)     AS syy,
    CAST(sum(y * ((y * 7 + pk) % 97)) AS BIGINT) AS syy_w
  FROM ys GROUP BY image_id
),
xs AS (
  SELECT image_id, pk, unnest(generate_series(0, w - 1)) AS x FROM imgs
),
colsums AS (
  SELECT image_id,
    CAST(sum((x * 13 + pk) % 89) AS BIGINT)     AS sxx,
    CAST(sum(x * ((x * 13 + pk) % 89)) AS BIGINT) AS sxx_w
  FROM xs GROUP BY image_id
)"""
    )


def caption_for(pk: int, n_blobs: int) -> str:
    lat = (pk * 89 % 10500) / 100.0
    lon = (pk * 97 % 10500) / 100.0
    return f"{n_blobs} bâtiments near ({lat:.4f},{lon:.4f}) #{pk}"


def phash_for(pk: int) -> int:
    """Deterministic 64-bit payload (splitmix64 finalizer), signed int64."""
    z = (pk + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 31
    return z - (1 << 64) if z >= (1 << 63) else z


def images_table(
    spark: SparkSession,
    sf_dir: str,
    fmt: str = "png",
    kind: str = "mask",
    limit: int | None = None,
    size: tuple[int, int] | None = None,
) -> DataFrame:
    """Materialize the input_hint table.  ``kind='mask'`` renders the binary
    label plane (1 channel); ``kind='rgb'`` the 3-channel pseudo-ortho;
    ``kind='mask_sparse'`` the watershed-gated sparse-rect plane.
    ``size=(w, h)`` overrides the per-pk dims (e.g. tile-sized 200x200
    labels, for which the training resize is the identity and the tensor
    oracle closes analytically).

    Pixel synthesis runs distributed in ``mapInPandas`` (Arrow batches) —
    the driver never holds pixels.
    """
    meta = images_meta(spark, sf_dir).withColumn(
        "pk", F.substring("image_id", 5, 18).cast("long")
    )
    if limit is not None:
        meta = meta.filter(F.col("pk") <= limit)
    if size is not None:
        meta = meta.withColumn("w", F.lit(int(size[0]))).withColumn(
            "h", F.lit(int(size[1]))
        )
    # the tiny parquet arrives as ONE split; pixel synthesis is CPU-bound, so
    # spread images across the cluster before entering Python (at real scale
    # the scan has many splits and this is a cheap metadata-only shuffle)
    meta = meta.repartition(
        spark.sparkContext.defaultParallelism * 2, "image_id"
    )

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, ulx double, uly double, crs string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pk, w, h = int(r.pk), int(r.w), int(r.h)
                if kind == "mask":
                    arr = render_mask(pk, w, h)
                elif kind == "mask_sparse":
                    arr = render_mask_sparse(pk, w, h)
                elif kind == "dumbbell":
                    arr = render_dumbbell(pk, w, h)
                elif kind == "bars":
                    arr = render_bars(pk, w, h)
                elif kind == "dem16":
                    arr = render_dem16(pk, w, h)
                else:
                    arr = render_rgb(pk, w, h)
                if kind == "dem16":
                    # 16-bit is PNG-only here; alternate straight/Adam7
                    # so one gate drives BOTH reassembly paths
                    if fmt != "png":
                        raise ValueError("dem16 images are png-only")
                    payload = codec.encode_png(arr, interlace=pk % 2 == 0)
                else:
                    payload = codec.encode(arr, fmt)
                rows.append(
                    (
                        r.image_id,
                        payload,
                        w,
                        h,
                        fmt,
                        caption_for(pk, 1 + pk % 4),
                        phash_for(pk),
                        float(r.ulx),
                        float(r.uly),
                        CRS_TOKEN,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt",
                    "caption", "phash", "ulx", "uly", "crs",
                ],
            )

    return meta.mapInPandas(gen, schema=schema)
