"""Distributed spatial joins (SURVEY.md §2.5 + §4.2).

The reference's only spatial query is the in-memory rect filter
``SetSpatialFilterRect`` + per-feature window intersection
(/root/reference/src/bf_gridding.py:181-276).  At cluster scale that becomes
three operators, all built on the cell equi-join prefilter from
``functions.cellindex`` (the distributed analogue of an STRtree):

* :func:`bbox_range_join` — O5 semantics: bbox-overlap pairs.
* :func:`pip_join`        — point-in-polygon, cell prefilter + ray-casting
  refinement.  Two refine strategies: ``'expr'`` (higher-order column
  functions — fully JVM-side, whole-stage codegen, zero Python) and
  ``'arrow'`` (vectorized numpy ray-cast in ``mapInPandas``); they are
  result-identical and tests pin that.
* :func:`knn_join`        — exact k-nearest-neighbours via k-ring expansion
  with doubling radius; the per-round guarantee is the standard grid bound
  (kth-distance < ring_radius * cell_side ⇒ no closer candidate outside).

Skew policy (densely built-up cells): AQE skew-join splitting is on at the
session level; ``pip_join(salt=...)`` additionally spreads a hot build cell
over ``salt`` buckets by replicating the polygon side (broadcast-style
salting), which keeps the equi-join key uniform without a second shuffle of
the probe side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.cellindex import CellGrid, explode_cover, with_cell

__all__ = ["bbox_range_join", "pip_join", "knn_join", "ray_cast_inside"]


# --------------------------------------------------------------------------- #
# bbox range join
# --------------------------------------------------------------------------- #

def bbox_range_join(
    left: DataFrame,
    right: DataFrame,
    grid: CellGrid,
    lprefix: str = "l_",
    rprefix: str = "r_",
    broadcast: str | None = None,
) -> DataFrame:
    """All (left, right) pairs whose bboxes strictly overlap.

    Both inputs need ``minx, miny, maxx, maxy``.  Each side is exploded to
    its covering cells, equi-joined on ``cell_id`` (AQE handles residual
    skew), the bbox predicate refines, and the pair is emitted exactly once
    — in the top-left cell of the bbox intersection (the classic
    partition-based spatial-join dedup, no ``distinct`` shuffle needed).

    ``broadcast='left'|'right'`` hints that side's exploded cover as a
    broadcast build side: the other side then streams with NO shuffle at
    all (single stage).  Use when one side fits executor memory (the small
    dim — mirrors the reference's in-memory tile index, bf_gridding.py:
    576-610); the default shuffle join is the 10^12-row scale path.
    """

    def prep(df: DataFrame, p: str) -> DataFrame:
        out = df.select([F.col(c).alias(p + c) for c in df.columns])
        out = out.withColumns(
            {
                p + "ix0": grid.ix_of(F.col(p + "minx")),
                p + "iy0": grid.iy_of(F.col(p + "miny")),
            }
        )
        return out.withColumn(
            "cell_id",
            F.explode(
                grid.polyfill_bbox(
                    F.col(p + "minx"), F.col(p + "miny"),
                    F.col(p + "maxx"), F.col(p + "maxy"),
                )
            ),
        )

    lc, rc = prep(left, lprefix), prep(right, rprefix)
    if broadcast == "left":
        lc = F.broadcast(lc)
    elif broadcast == "right":
        rc = F.broadcast(rc)
    joined = lc.join(rc, "cell_id")
    overlap = (
        (F.col(lprefix + "minx") < F.col(rprefix + "maxx"))
        & (F.col(lprefix + "maxx") > F.col(rprefix + "minx"))
        & (F.col(lprefix + "miny") < F.col(rprefix + "maxy"))
        & (F.col(lprefix + "maxy") > F.col(rprefix + "miny"))
    )
    dedup_cell = grid.pack(
        F.greatest(F.col(lprefix + "ix0"), F.col(rprefix + "ix0")),
        F.greatest(F.col(lprefix + "iy0"), F.col(rprefix + "iy0")),
    )
    return joined.filter(overlap & (F.col("cell_id") == dedup_cell)).drop(
        "cell_id", lprefix + "ix0", lprefix + "iy0", rprefix + "ix0", rprefix + "iy0"
    )


# --------------------------------------------------------------------------- #
# point-in-polygon join
# --------------------------------------------------------------------------- #

def ray_cast_inside(px: Column, py: Column, ring: Column) -> Column:
    """Even-odd ray-cast as a pure column expression (higher-order fns).

    PNPOLY crossing test per edge; stays inside whole-stage codegen — no
    Python, no extra shuffle.  Ring is a closed array<array<double>>.
    """
    def cross(acc: Column, i: Column) -> Column:
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[i + 1][0], ring[i + 1][1]
        hit = ((y1 > py) != (y2 > py)) & (
            px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        )
        return acc + F.when(hit, 1).otherwise(0)

    n_edges = F.size(ring) - 2  # closed ring: edges = len-1, last idx len-2
    crossings = F.aggregate(
        F.sequence(F.lit(0), n_edges), F.lit(0), cross
    )
    return crossings % 2 == 1


def _ray_cast_numpy(px: np.ndarray, py: np.ndarray, rings: list) -> np.ndarray:
    """Vectorized even-odd ray-cast over variable-length rings.

    Flattens all candidate rings into edge arrays once per Arrow batch;
    per-pair crossing counts via np.add.reduceat — no per-row Python in the
    hot loop.
    """
    if len(px) == 0:
        return np.zeros(0, dtype=bool)
    counts = np.fromiter((len(r) - 1 for r in rings), dtype=np.int64, count=len(rings))
    flat = np.concatenate(
        [np.stack([np.asarray(v, dtype=np.float64) for v in r]) for r in rings]
    )
    starts = np.concatenate([[0], np.cumsum(counts + 1)[:-1]])
    # edge endpoints: for ring j, vertices starts[j] .. starts[j]+counts[j]
    edge_mask = np.ones(len(flat), dtype=bool)
    edge_mask[starts + counts] = False  # drop last vertex of each ring as edge start
    x1, y1 = flat[edge_mask, 0], flat[edge_mask, 1]
    nxt = np.where(edge_mask)[0] + 1
    x2, y2 = flat[nxt, 0], flat[nxt, 1]
    pair_idx = np.repeat(np.arange(len(rings)), counts)
    ppx, ppy = px[pair_idx], py[pair_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        hit = ((y1 > ppy) != (y2 > ppy)) & (
            ppx < (x2 - x1) * (ppy - y1) / (y2 - y1) + x1
        )
    crossings = np.bincount(pair_idx, weights=hit.astype(np.float64), minlength=len(rings))
    return (crossings.astype(np.int64) % 2) == 1


def _ray_cast_grouped(
    px: np.ndarray, py: np.ndarray, codes: np.ndarray, uniq_rings: list
) -> np.ndarray:
    """Even-odd ray-cast where candidate i tests ring ``uniq_rings[codes[i]]``.

    Candidates repeat the same polygons many times (one row per matching
    cell pair), so each distinct ring is flattened to edge arrays exactly
    once; the per-(candidate, edge) crossing test is then pure vectorized
    gather — no per-candidate Python at all."""
    if len(px) == 0:
        return np.zeros(0, dtype=bool)
    # rings arrive either pre-shaped (n, 2) float64 or as sequences of
    # per-vertex pairs (object arrays need stack, not asarray)
    edges = [
        r if isinstance(r, np.ndarray) and r.ndim == 2
        else np.stack(r).astype(np.float64)
        for r in uniq_rings
    ]
    counts = np.array([len(e) - 1 for e in edges], dtype=np.int64)
    flat = np.concatenate(edges)
    # vertex index of each ring's first edge start inside `flat`
    starts = np.concatenate([[0], np.cumsum(counts + 1)[:-1]])
    ecnt = counts[codes]                       # edges per candidate
    offs = starts[codes]
    total = int(ecnt.sum())
    base = np.cumsum(ecnt) - ecnt
    pos = np.arange(total) - np.repeat(base, ecnt) + np.repeat(offs, ecnt)
    cand_idx = np.repeat(np.arange(len(codes)), ecnt)
    x1, y1 = flat[pos, 0], flat[pos, 1]
    x2, y2 = flat[pos + 1, 0], flat[pos + 1, 1]
    ppx, ppy = px[cand_idx], py[cand_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        hit = ((y1 > ppy) != (y2 > ppy)) & (
            ppx < (x2 - x1) * (ppy - y1) / (y2 - y1) + x1
        )
    crossings = np.bincount(
        cand_idx, weights=hit.astype(np.float64), minlength=len(codes)
    )
    return (crossings.astype(np.int64) % 2) == 1


def _auto_salt(pts_with_cell: DataFrame, cap: int = 64) -> int:
    """Derive the salt factor from the probe side's cell histogram instead
    of operator tuning: the join key serializes when ONE cell exceeds a
    task-sized share of the probe rows, so
    ``salt = ceil(max_cell / target)`` with
    ``target = max(total / (2 x parallelism), 1000)``, clamped to [1, cap].

    Capacity-based, not mean-relative: a mean-relative rule ("hottest cell
    / 8x mean") reads a SINGLE nonempty cell holding every row as perfectly
    uniform — exactly the densely-built-up worst case the north_rule calls
    out.  The 1000-row floor keeps tiny datasets from salting (one task
    handles them regardless).  One bounded pre-pass (groupBy(cell).count ->
    2-value agg) whose partial aggregation is map-side — at any scale it
    streams the scan once and reduces to one row."""
    row = (
        pts_with_cell.groupBy("cell_id")
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("total"))
        .collect()[0]
    )
    if not row["mx"]:
        return 1
    par = pts_with_cell.sparkSession.sparkContext.defaultParallelism
    target = max(float(row["total"]) / (2.0 * par), 1000.0)
    salt = int(-(-float(row["mx"]) // target))  # ceil
    return min(max(salt, 1), cap)


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    grid: CellGrid,
    pt_cols: tuple[str, str, str] = ("pt_id", "px", "py"),
    poly_id: str = "fp_id",
    ring_col: str = "ring",
    strategy: str = "expr",
    salt: int | str | None = None,
    broadcast_polygons: bool = False,
) -> DataFrame:
    """(point, polygon) containment pairs.

    ``polygons`` needs ``poly_id, ring_col, minx, miny, maxx, maxy``.
    Prefilter: polygon side exploded to covering cells, points hashed to
    their single cell, equi-join (each true pair meets in exactly one cell —
    the point's — so no dedup pass is needed).  Refine: ray-cast.
    """
    pid, pxc, pyc = pt_cols
    pts = with_cell(points, grid, pxc, pyc)
    cover = explode_cover(
        polygons.select(poly_id, ring_col, "minx", "miny", "maxx", "maxy"), grid
    ).drop("minx", "miny", "maxx", "maxy")

    if salt == "auto":
        # statistics-driven: measure the cell histogram, no manual tuning
        salt = _auto_salt(pts)
        if salt <= 1:
            salt = None
    if salt:
        # replicate the (small) polygon side over salt buckets; points pick a
        # deterministic bucket -> hot cells fan out without a probe-side shuffle
        cover = cover.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(F.col(pid)), salt))
        keys = ["cell_id", "salt"]
    else:
        keys = ["cell_id"]

    if broadcast_polygons:
        cover = F.broadcast(cover)

    cand = pts.join(cover, keys).drop(*keys)

    if strategy == "expr":
        inside = ray_cast_inside(F.col(pxc), F.col(pyc), F.col(ring_col))
        return cand.filter(inside).drop(ring_col)

    if strategy == "arrow":
        # spread before the Python refine: AQE byte-coalescing (shuffle
        # path) or a single scan split (broadcast path over a small points
        # file) would otherwise starve it of parallelism
        cand = cand.repartition(
            points.sparkSession.sparkContext.defaultParallelism * 2
        )
        # flatten JVM-side: Arrow->pandas of array<double> lands as one
        # numpy array per row; nested array<array<double>> would cost a
        # Python object per vertex
        cand = cand.withColumn("__ring", F.flatten(F.col(ring_col))).drop(ring_col)
        out_fields = [f for f in cand.schema.fields if f.name != "__ring"]
        schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        out_cols = [f.name for f in out_fields]

        def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                # candidates repeat each polygon ~cells x points times:
                # factorize so every distinct ring is flattened once
                codes, _ = pd.factorize(pdf[poly_id])
                first_idx = np.unique(codes, return_index=True)[1]
                uniq_rings = [
                    np.asarray(r, dtype=np.float64).reshape(-1, 2)
                    for r in pdf["__ring"].to_numpy()[first_idx]
                ]
                mask = _ray_cast_grouped(
                    pdf[pxc].to_numpy(np.float64),
                    pdf[pyc].to_numpy(np.float64),
                    codes,
                    uniq_rings,
                )
                yield pdf.loc[mask, out_cols]

        return cand.mapInPandas(refine, schema=schema)

    raise ValueError(f"unknown strategy {strategy!r}")


# --------------------------------------------------------------------------- #
# kNN join
# --------------------------------------------------------------------------- #

def knn_join(
    points: DataFrame,
    centers: DataFrame,
    grid: CellGrid,
    k: int,
    pt_cols: tuple[str, str, str] = ("pt_id", "px", "py"),
    center_cols: tuple[str, str, str] = ("fp_id", "cx", "cy"),
    r0: int | None = None,
    broadcast_centers: bool = False,
    materialize: bool = True,
    explode_side: str = "auto",
) -> DataFrame:
    """Exact kNN: for each point the k nearest centers, ranked.

    Output: (pt_id, px, py, fp_id, dist2, rank).  Deterministic tie-break on
    center id.  Distributed k-ring expansion with doubling radius: each round
    is one equi-join; points whose kth candidate is provably inside the ring
    bound retire, the (shrinking) remainder goes another round.  Round count
    is <= log2(grid.n) — a bounded driver loop, never a per-row loop.
    Each round's top-k is persisted so the loop-carried lineage (probe,
    anti-join, final union) never recomputes a candidate join.

    ``broadcast_centers=True``: build-side broadcast of the center table
    (use when centers fit executor memory; the default shuffle join is the
    scale path).

    ``explode_side``: which side of the round's equi-join carries the
    (2r+1)^2 k-ring explode — ``'auto'`` (default: the smaller side per
    round), ``'build'`` (always the center side), ``'probe'`` (always the
    point side — the pre-round-3 plan, kept as a measurement baseline for
    the shuffle-volume evidence in BENCH.md).  The candidate SET and the
    result are identical for every setting.
    """
    if explode_side not in ("auto", "build", "probe"):
        raise ValueError(f"explode_side {explode_side!r}")
    pid, pxc, pyc = pt_cols
    cid, cxc, cyc = center_cols
    n_centers = centers.count()
    k_eff = min(k, n_centers)
    if r0 is None:
        # density-based initial radius: the ring (2r+1)^2 cells should hold
        # ~2k centers in expectation so most points retire in round one
        density = max(n_centers / float(grid.n * grid.n), 1e-9)
        r0 = max(1, int(np.ceil(((2.0 * k_eff / density) ** 0.5 - 1.0) / 2.0)))

    cts = with_cell(centers, grid, cxc, cyc, out="c_cell").select(
        cid, cxc, cyc, "c_cell"
    )
    remaining = with_cell(points, grid, pxc, pyc, out="p_cell").select(
        pid, pxc, pyc, "p_cell"
    )
    results: list[DataFrame] = []
    cached: list[DataFrame] = []
    r = r0
    # One up-front count of the probe side (a single cheap job — at scale
    # it is a parquet-footer sum next to the candidate joins below) lets
    # every round put the (2r+1)^2 ring explode on the genuinely smaller
    # side; a round-number heuristic would invert the optimization for
    # centers-heavy inputs.
    n_remaining = points.count()
    while True:
        full_cover = r >= grid.n  # ring covers the whole domain -> exact
        # The cell k-ring is symmetric (Chebyshev on the lattice), so the
        # explode can go on EITHER side of the equi-join; put it on the
        # smaller one.  Round one in the canonical kNN-join shape: points
        # outnumber centers, so replicate each center over its ring —
        # 15k x ring instead of 10^5..10^9 x ring rows.  Later rounds the
        # un-retired remainder has usually shrunk below the center count
        # and the explode flips to the point side.  Candidate SET is
        # identical either way, and each (point, center) pair still
        # matches exactly once (a point has one cell; the center's ring
        # cells are distinct).
        # broadcast_centers pins the explode to the PROBE side: the
        # broadcast relation must stay n_centers rows — exploding before
        # the broadcast would ship n_centers*(2r+1)^2 rows to every
        # executor, quadratic in r as rounds double the radius.
        explode_build = (
            (n_remaining > n_centers)
            if explode_side == "auto"
            else explode_side == "build"
        )
        if explode_build and not broadcast_centers:
            build = cts.withColumn(
                "cell_id", F.explode(grid.k_ring(F.col("c_cell"), r))
            ).drop("c_cell")
            cand = remaining.join(
                build, F.col("p_cell") == F.col("cell_id")
            ).drop("cell_id")
        else:
            build = cts.withColumnRenamed("c_cell", "cell_id")
            if broadcast_centers:
                build = F.broadcast(build)
            cand = (
                remaining.withColumn(
                    "cell_id", F.explode(grid.k_ring(F.col("p_cell"), r))
                )
                .join(build, "cell_id")
                .drop("cell_id")
            )
        dx, dy = F.col(pxc) - F.col(cxc), F.col(pyc) - F.col(cyc)
        cand = cand.withColumn("dist2", dx * dx + dy * dy).drop(cxc, cyc)
        # candidates meet a point once per shared ring cell is impossible:
        # each center lives in exactly one cell, ring cells are distinct.
        w = Window.partitionBy(pid).orderBy("dist2", cid)
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_eff)
            .persist()
        )
        cached.append(topk)
        bound = (r * grid.side) ** 2
        per_pt = topk.groupBy(pid).agg(
            F.count("*").alias("_cnt"), F.max("dist2").alias("_kth")
        )
        done_pred = (F.col("_cnt") == k_eff) & (
            F.lit(full_cover) | (F.col("_kth") < bound)
        )
        done_pts = per_pt.filter(done_pred).select(pid)
        results.append(topk.join(done_pts, pid, "semi"))
        remaining = remaining.join(done_pts, pid, "anti")
        if full_cover:
            break
        # the probe also warms topk's cache, so the anti-join and the final
        # union read cached rows instead of re-running the candidate join
        # (the count doubles as next round's explode-side input)
        n_remaining = remaining.count()
        if n_remaining == 0:
            break
        r *= 2
    out = results[0]
    for df in results[1:]:
        out = out.unionByName(df)
    out = out.drop("p_cell")
    if not materialize:
        # PLAN-INSPECTION path: the round caches stay registered (they have
        # never been computed, so nothing is pinned until an action runs).
        # Executing this plan is NOT the intended use — the loop-carried
        # lineage references each round's topk along multiple branches, so
        # an uncached execution re-runs candidate joins up to exponentially
        # in the round count.  Callers who execute it own the caches.
        return out
    # localCheckpoint (eager) materializes the (small) result AND truncates
    # the loop-carried lineage, so caller actions re-read blocks instead of
    # re-running the candidate joins.  Unlike a bare persist() handed to the
    # caller, checkpoint blocks are released when the DataFrame is dropped —
    # no session-lifetime executor-storage pin per knn_join call.
    out = out.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()  # release every round's candidate cache
    return out
