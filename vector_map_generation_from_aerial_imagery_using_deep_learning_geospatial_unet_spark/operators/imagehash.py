"""Perceptual-hash image dedup: DCT pHash from pixels + Hamming near-dup.

The north-star input table carries a ``phash:int64`` column per image
(BASELINE.json input_hint); the reference pipeline itself never dedups
its ortho corpus — at 10^12 images, near-duplicate scenes (re-flights,
overlapping strips, format re-encodes) are certain, and training on
them skews the model.  Two operators close that gap:

* :func:`phash64` computes the column from decoded pixels — the classic
  DCT perceptual hash (gray -> 32x32 resize -> 2D DCT-II -> 8x8
  low-frequency block -> median threshold -> 64 bits), the same
  construction as the public imagehash library's ``phash``.  A re-encode
  (PNG -> JPEG) or mild noise perturbs few bits; unrelated images differ
  in ~32.

* :func:`hamming_near_dup` finds all pairs within ``max_hamming`` bits
  at corpus scale via the pigeonhole multi-index (Manku et al., WWW'07,
  the SimHash dedup paper): split 64 bits into ``max_hamming + 1``
  bands — any pair at distance <= max_hamming agrees exactly on at
  least one band — equi-join per band, then verify with
  ``bit_count(a ^ b)``.  All JVM-side (shift/mask/xor/bit_count inside
  whole-stage codegen); no Python in the join path.

Scale design (10^12 rows): banding runs over DISTINCT hashes, not rows —
exact duplicates (the overwhelmingly common case in web corpora) never
enter the quadratic-risk self-join; they rejoin as hash-equality groups
afterwards.  Shuffle is O(distinct_hashes * bands) for the candidate
join plus two hash-equi-joins to re-attach ids.  Skewed bands (e.g. the
all-zero band of flat images) are bounded by distinct-hash collapse and
split further by AQE skew-join; candidate verification is a single
codegen'd filter, so a hot band costs compare throughput, not memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._policy import ROW_ERRORS, check_on_error, guarded_rows, rows_frame
from ..sources import codec

HASH_BITS = 64


# ------------------------------------------------------------- pure kernel


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, 'ortho' norm): D @ x transforms
    a length-n signal; 2-D transform is D @ A @ D.T."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi / n * (i + 0.5) * k) * np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d


_D32 = _dct_matrix(32)


def phash_kernel(arr: np.ndarray, block: int = 8) -> int:
    """64-bit DCT perceptual hash of a (h, w[, c]) uint8 array.

    gray = integer-weight luma (299/587/114); resize = bilinear to 32x32
    (functions/kernels_resample.py); DCT-II 2-D; top-left ``block`` x
    ``block`` coefficients; bit k (row-major, bit 63 = coefficient
    [0,0]) set iff the coefficient exceeds the median of all 64 — the
    imagehash-library convention.  Returns a SIGNED int64 (matches the
    input_hint column type).  Pure numpy: the Spark operator, the
    fixture builder, and the tests all call this one function.
    """
    from ..functions.kernels_resample import resize_bilinear

    if arr.ndim == 3:
        a = arr.astype(np.float64)
        gray = (a[:, :, 0] * 299.0 + a[:, :, 1] * 587.0 + a[:, :, 2] * 114.0) / 1000.0
    else:
        gray = arr.astype(np.float64)
    small = resize_bilinear(gray, 32, 32)
    coef = (_D32 @ small @ _D32.T)[:block, :block]
    flat = coef.reshape(-1)
    med = float(np.median(flat))
    bits = flat > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


# --------------------------------------------------------------- operators


def phash64(
    images: DataFrame, hash_col: str = "phash", on_error: str = "fail"
) -> DataFrame:
    """Compute the input_hint ``phash`` column from decoded pixels:
    (image_id, <hash_col> long).  Arrow-batched ``mapInPandas`` — one
    decode + one 32x32 DCT per image, no pixel ever reaches the driver.
    ``on_error``: see operators/_policy.py."""
    check_on_error(on_error)
    schema = f"image_id string, {hash_col} long"
    if on_error == "quarantine":
        schema += ", error string"

    def one(r):
        arr = codec.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
        return (r.image_id, phash_kernel(arr))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = guarded_rows(pdf, one, "image_id", 1, on_error)
            # rows_frame keeps the hash column object-dtyped under
            # quarantine: a single None row would otherwise coerce the
            # whole batch to float64 and round away low bits of good
            # rows' 64-bit hashes.
            yield rows_frame(rows, ["image_id", hash_col], on_error)

    return images.mapInPandas(run, schema=schema)


def _band_specs(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) of each pigeonhole band: ``max_hamming + 1`` bands
    covering all 64 bits as evenly as possible."""
    n_bands = max_hamming + 1
    if not 1 <= n_bands <= HASH_BITS:
        raise ValueError(f"max_hamming {max_hamming} out of range")
    base, extra = divmod(HASH_BITS, n_bands)
    specs, shift = [], 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        specs.append((shift, width))
        shift += width
    return specs


def hamming_near_dup(
    df: DataFrame,
    id_col: str = "image_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """All pairs of rows whose hashes differ in <= ``max_hamming`` bits:
    (id_a, id_b, hamming) with ``id_a < id_b``, one row per pair.

    Pigeonhole-complete: with ``max_hamming + 1`` disjoint bands, any
    pair at distance <= max_hamming matches exactly on at least one
    band, so the band equi-join misses nothing (Manku et al., WWW'07).
    Runs over DISTINCT hashes; identical-hash groups (hamming 0) rejoin
    as plain hash-equality pairs — see the module docstring for the
    shuffle budget.  NULL hashes are ignored.  ``id_col`` must be unique
    per row (it is the dedup key)."""
    specs = _band_specs(max_hamming)
    P = df.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    ).filter(F.col("_h").isNotNull())

    def band_val(shift: int, width: int):
        v = F.shiftrightunsigned(F.col("_h"), shift)
        if width >= HASH_BITS:  # max_hamming=0: the single band IS the hash
            return v
        return v.bitwiseAND(F.lit((1 << width) - 1))

    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                band_val(shift, width).alias("val"),
            )
            for b, (shift, width) in enumerate(specs)
        ]
    )
    D = (
        P.select("_h").distinct()
        .select("_h", F.explode(bands).alias("bv"))
        .select("_h", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    )
    cand = (
        D.alias("a")
        .join(
            D.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._h") < F.col("b._h")),
        )
        .select(F.col("a._h").alias("h_a"), F.col("b._h").alias("h_b"))
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    near = (
        cand.join(P.select(F.col("_id").alias("ia"), F.col("_h").alias("h_a")), "h_a")
        .join(P.select(F.col("_id").alias("ib"), F.col("_h").alias("h_b")), "h_b")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
    )
    eq = (
        P.alias("a")
        .join(
            P.alias("b"),
            (F.col("a._h") == F.col("b._h")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return near.unionByName(eq)
