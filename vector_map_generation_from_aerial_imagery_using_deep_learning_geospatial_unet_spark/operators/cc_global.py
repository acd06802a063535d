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
   (b) per-label pixel counts over the pixels the tile OWNS — an
       earlier-tile-wins disjoint cover: each non-first tile drops its
       left/top overlap strip, so the EARLIER tile keeps the shared band
       and every global pixel is counted exactly once.  (This deliberately
       differs from the later-tile-wins seam rule used by
       ``stitch_tiles``; any disjoint exact cover gives the same counts.)
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


# collision-free per-image node id: nid = tiy << 37 | tix << 16 | label.
# NOT a hash — a hash key silently merges unrelated regions on collision,
# which at the module's target scale is certain; the packed id is exact and
# the bounds below are checked loudly.  image_id stays a separate key
# column everywhere (nids repeat across images by design).
_LABEL_BITS, _TIX_BITS = 16, 21


def _pack_nid(tiy: int, tix: int, label_max: int) -> int:
    if label_max >= (1 << _LABEL_BITS) or tix >= (1 << _TIX_BITS) or tiy >= (
        1 << (63 - _LABEL_BITS - _TIX_BITS)
    ):
        raise ValueError(
            f"nid packing bounds exceeded (tiy={tiy}, tix={tix}, "
            f"labels={label_max}) — widen the packing"
        )
    return (tiy << (_LABEL_BITS + _TIX_BITS)) | (tix << _LABEL_BITS)


def _tile_parts(tiles: DataFrame, cfg: EngineConfig) -> DataFrame:
    """One pass over tile rows -> tall table of per-label owned-pixel
    counts (kind='c') and shared-anchor foreground pixels (kind='b');
    ``nid`` is the packed exact node id."""
    t, ov = cfg.tile_size, cfg.overlap_px
    step = t - ov
    schema = "image_id string, nid long, kind string, gy long, gx long, npx long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(bytes(r.bytes), r.fmt, int(r.tw), int(r.th))
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                fg = (arr >= 128).astype(np.uint8)
                lab = km.label(fg, connectivity=1)
                base = _pack_nid(int(r.tiy), int(r.tix), int(lab.max()))
                oy, ox = int(r.off_y), int(r.off_x)
                # owned region (earlier-tile-wins): every non-first tile
                # drops its left/top overlap strip, so the earlier tile
                # keeps the shared band — a disjoint exact cover
                y0 = ov if r.tiy > 1 else 0
                x0 = ov if r.tix > 1 else 0
                owned = lab[y0:, x0:]
                vals, counts = np.unique(owned[owned > 0], return_counts=True)
                frames.append(
                    pd.DataFrame(
                        {
                            "image_id": r.image_id,
                            "nid": base + vals.astype(np.int64),
                            "kind": "c",
                            "gy": np.int64(0),
                            "gx": np.int64(0),
                            "npx": counts.astype(np.int64),
                        }
                    )
                )
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
                    if len(ys) == 0:
                        continue
                    frames.append(
                        pd.DataFrame(
                            {
                                "image_id": r.image_id,
                                "nid": base + sub[ys, xs].astype(np.int64),
                                "kind": "b",
                                "gy": (ys + oy + sy.start).astype(np.int64),
                                "gx": (xs + ox + sx.start).astype(np.int64),
                                "npx": np.int64(0),
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

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
    if cfg.overlap_px < 1:
        raise ValueError(
            "distributed_cc_areas requires overlap_px >= 1: the seam-anchor "
            "scheme joins tiles on shared overlap pixels, and with no "
            "overlap no seam rows are emitted — cross-tile components "
            f"would silently stay split (got overlap_px={cfg.overlap_px})"
        )
    parts = _tile_parts(tiles, cfg).persist()

    counts = parts.filter(F.col("kind") == "c").select("image_id", "nid", "npx")
    border = parts.filter(F.col("kind") == "b").select(
        "image_id", "gy", "gx", "nid"
    )
    a, b = [border.alias(s) for s in ("a", "b")]
    edges = (
        a.join(b, ["image_id", "gy", "gx"])
        .filter(F.col("a.nid") != F.col("b.nid"))
        .select("image_id", F.col("a.nid").alias("src"), F.col("b.nid").alias("dst"))
        .distinct()
        .persist()
    )

    # counts holds exactly one row per (tile, label) by construction (the
    # per-tile np.unique) -> (image_id, nid) is already distinct
    comp = counts.select("image_id", "nid").withColumn("comp", F.col("nid"))
    comp = comp.persist()
    comp.count()
    for _ in range(max_rounds):
        neigh = (
            edges.alias("e")
            .join(
                comp.alias("c"),
                (F.col("e.image_id") == F.col("c.image_id"))
                & (F.col("e.src") == F.col("c.nid")),
            )
            .select(
                F.col("e.image_id").alias("image_id"),
                F.col("e.dst").alias("nid"),
                "comp",
            )
        )
        new_comp = (
            comp.unionByName(neigh)
            .groupBy("image_id", "nid")
            .agg(F.min("comp").alias("comp"))
            .persist()
        )
        # a row counts as changed when its exact (nid, comp) pair is NOT in
        # the previous state — this also catches nids appearing for the
        # first time this round (labels with zero owned pixels, reachable
        # only via seam strips), which an inner join on nid would miss and
        # could end the loop one propagation hop early
        changed = (
            new_comp.join(comp, ["image_id", "nid", "comp"], "left_anti")
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
        counts.join(comp, ["image_id", "nid"])
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
