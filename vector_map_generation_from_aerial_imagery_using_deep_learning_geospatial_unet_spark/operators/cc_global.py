"""Distributed cross-tile connected components — the 100 TB labeling path.

The in-memory pipeline (SURVEY.md §4.3) stitches each image's tiles inside
one grouped UDF because the input_hint bounds an image to one row.  This
module is the path for when that bound breaks (mosaics of unbounded size):
CC labeling WITHOUT ever materializing the image —

1. per-tile local labels (``kernels_morph.label``, 4-connectivity) in one
   Arrow pass over the tile rows; each tile also emits
   (a) its foreground pixels on the SHARED anchor lines — the first
       overlap column/row of every adjacent pair exists in both tiles, and
       any 4- or 8-connected path crossing the seam must step on it — and
   (b) per-label pixel counts over the pixels the tile OWNS (the
       later-tile-wins stitch rule: a tile owns its left/top overlap strip
       only when it is the later tile), so every global pixel is counted
       exactly once;
2. seam equivalences = an equi-join of the anchor pixels on
   (image_id, gy, gx) across tile keys — two local labels sharing a
   foreground pixel are the same region;
3. global components by iterative min-id propagation over the equivalence
   graph — a bounded driver loop of hash joins, O(log(max region diameter
   in tiles)) rounds, each round persisted and the previous released;
4. region areas = sum of owned counts per component.

The reference has no analogue (it mosaics first, /root/reference/test.py:
260-294); the exact gate comes from the synthetic blob ground truth: the
distributed path must reproduce every region's pixel count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions import kernels_morph as km
from ..sources import codec


def _tile_parts(tiles: DataFrame, cfg: EngineConfig) -> DataFrame:
    """One pass over tile rows -> tall table of per-label owned-pixel
    counts (kind='c') and shared-anchor foreground pixels (kind='b')."""
    t, ov = cfg.tile_size, cfg.overlap_px
    step = t - ov
    schema = (
        "image_id string, tkey long, label int, kind string, "
        "gy long, gx long, npx long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(bytes(r.bytes), r.fmt, int(r.tw), int(r.th))
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                fg = (arr >= 128).astype(np.uint8)
                lab = km.label(fg, connectivity=1)
                tkey = int(r.tiy) * 1_000_000 + int(r.tix)
                oy, ox = int(r.off_y), int(r.off_x)
                # owned region: drop the left/top overlap strip unless this
                # tile is the first in that axis (later-tile-wins ownership)
                y0 = ov if r.tiy > 1 else 0
                x0 = ov if r.tix > 1 else 0
                owned = lab[y0:, x0:]
                vals, counts = np.unique(owned[owned > 0], return_counts=True)
                for v, c in zip(vals, counts):
                    rows.append((r.image_id, tkey, int(v), "c", 0, 0, int(c)))
                # shared-strip emission: the FULL ov-wide overlap band of
                # every adjacent pair exists in both tiles, and a region
                # split across the ownership cut — or living entirely
                # inside the band — always has foreground there.  (A single
                # anchor line is NOT enough: a blob starting mid-band
                # never touches the band's first column.)  On a borderless
                # last tile the trailing strip simply finds no join
                # partner (harmless).
                tw_, th_ = int(r.tw), int(r.th)
                strips = []
                if r.tix > 1:
                    strips.append((slice(0, th_), slice(0, min(ov, tw_))))
                if tw_ > step:
                    strips.append((slice(0, th_), slice(step, tw_)))
                if r.tiy > 1:
                    strips.append((slice(0, min(ov, th_)), slice(0, tw_)))
                if th_ > step:
                    strips.append((slice(step, th_), slice(0, tw_)))
                for sy, sx in strips:
                    sub = lab[sy, sx]
                    ys, xs = np.nonzero(sub)
                    labs = sub[ys, xs]
                    gys = ys + oy + sy.start
                    gxs = xs + ox + sx.start
                    for y, x, lv in zip(gys, gxs, labs):
                        rows.append(
                            (r.image_id, tkey, int(lv), "b", int(y), int(x), 0)
                        )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "tkey", "label", "kind", "gy", "gx", "npx"],
            )

    return tiles.mapInPandas(run, schema=schema)


def distributed_cc_areas(
    tiles: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    max_rounds: int = 16,
) -> DataFrame:
    """Tile rows -> (image_id, region_px) — one row per global connected
    region, pixel count exact, no per-image materialization anywhere.

    ``max_rounds`` bounds the min-propagation loop; min-id spreads one
    graph hop per round, so the bound is the largest region's diameter in
    TILES (a building spanning 16 190-px tile steps is a ~3 km footprint).
    Raises if not converged by then (a real deployment resumes with a
    higher bound, or switches to pointer-doubling) — silent truncation
    would undercount regions."""
    parts = _tile_parts(tiles, cfg).persist()

    nid = F.xxhash64("image_id", "tkey", "label")
    counts = (
        parts.filter(F.col("kind") == "c")
        .select("image_id", nid.alias("nid"), "npx")
    )
    border = parts.filter(F.col("kind") == "b").select(
        "image_id", "gy", "gx", nid.alias("nid")
    )
    a, b = [border.alias(s) for s in ("a", "b")]
    edges = (
        a.join(b, ["image_id", "gy", "gx"])
        .filter(F.col("a.nid") != F.col("b.nid"))
        .select(F.col("a.nid").alias("src"), F.col("b.nid").alias("dst"))
        .distinct()
        .persist()
    )

    # counts holds exactly one row per (tile, label) by construction (the
    # per-tile np.unique) -> nid is already distinct; no dedup shuffle
    comp = counts.select("nid").withColumn("comp", F.col("nid"))
    comp = comp.persist()
    comp.count()
    for _ in range(max_rounds):
        neigh = (
            edges.join(comp, edges.src == comp.nid)
            .select(F.col("dst").alias("nid"), "comp")
        )
        new_comp = (
            comp.unionByName(neigh)
            .groupBy("nid")
            .agg(F.min("comp").alias("comp"))
            .persist()
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "nid")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        comp.unpersist()
        comp = new_comp
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"component propagation did not converge in {max_rounds} rounds"
        )

    out = (
        counts.join(comp, "nid")
        .groupBy("image_id", "comp")
        .agg(F.sum("npx").alias("region_px"))
        .select("image_id", "region_px")
    )
    # materialize before releasing the loop-carried caches
    out = out.localCheckpoint(eager=True)
    parts.unpersist()
    edges.unpersist()
    comp.unpersist()
    return out
