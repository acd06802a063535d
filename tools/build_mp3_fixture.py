"""Freeze the mp3_audio expectations for the DuckDB oracle.

``fixtures/mp3_audio_sf0_01.parquet`` — the complete expected
q_mp3_audio output: per-pk deterministic multisine PCM, encoded through
the from-scratch MPEG-1 Layer I encoder, decoded back by the same
codec, reduced to the audio_features integer columns.  Layer I is
lossy (scalefactor + midtread quantization through a near-PR
filterbank), so the decoded samples have no closed SQL form; the
fixture pins the whole chain bit-for-bit.  The codec itself is
additionally gated by the SNR rate/distortion contract in
tests/test_mp3.py (the audio analogue of the JPEG PSNR>=40 contract).

This run is SINGLE-PROCESS numpy — no executors, no Arrow batching, no
mapInPandas — so a distributed-plumbing bug in the gated query cannot
cancel out.  The signal spec mirrors q_mp3_audio's docstring exactly:

    rate = [32000, 44100, 48000][pk % 3];  bitrate_idx = 6 + pk % 8
    n = 2000 + (pk % 7) * 400
    x[i] = 0.3 sin(2 pi f1 i / rate) + 0.25 sin(2 pi f2 i / rate + 1)
         + 0.2 sin(2 pi f3 i / rate + 2)
    f1 = 200 + 17 (pk % 13); f2 = 1100 + 37 (pk % 11); f3 = 3800 + 53 (pk % 7)
    ch0 = rint(32767 x); odd pk adds ch1 = reversed(ch0) // 2

``fixtures/mp3_audio_l2_sf0_01.parquet`` — the Layer II twin
(q_mp3_audio_l2): same feature columns over a distinct multisine family
encoded/decoded through the table-driven Layer II codec (allocation
Tables B.2a/B.2b); signal spec in ``mp3_l2_signal``.

Usage:  python tools/build_mp3_fixture.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_mp3

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
PK_CAP = 60  # _capped_media_meta's shared bound


def mp3_signal(pk: int) -> tuple[np.ndarray, int, int]:
    """(pcm int16 (n,) or (n,2), sample_rate, bitrate_idx) for one pk."""
    rate = [32000, 44100, 48000][pk % 3]
    n = 2000 + (pk % 7) * 400
    i = np.arange(n, dtype=np.float64)
    f1 = 200 + 17 * (pk % 13)
    f2 = 1100 + 37 * (pk % 11)
    f3 = 3800 + 53 * (pk % 7)
    x = (
        0.3 * np.sin(2 * np.pi * f1 / rate * i)
        + 0.25 * np.sin(2 * np.pi * f2 / rate * i + 1.0)
        + 0.2 * np.sin(2 * np.pi * f3 / rate * i + 2.0)
    )
    ch0 = np.rint(32767 * x).astype(np.int16)
    if pk % 2:
        sig = np.stack([ch0, ch0[::-1] // 2], axis=1)
    else:
        sig = ch0
    return sig, rate, 6 + pk % 8


def mp3_l2_signal(pk: int) -> tuple[np.ndarray, int, int]:
    """Layer II twin of mp3_signal (q_mp3_audio_l2's spec): a distinct
    multisine family, bitrate chosen inside the spec's per-mode Layer II
    range (mono idx 3..10, stereo 7..14 -> 56..192 kbps per channel), so
    48 kHz streams hit allocation Table B.2a and the >= 96 kbps/ch
    44.1/32 kHz streams hit B.2b."""
    rate = [32000, 44100, 48000][pk % 3]
    n = 3000 + (pk % 5) * 600
    i = np.arange(n, dtype=np.float64)
    f1 = 180 + 19 * (pk % 13)
    f2 = 950 + 41 * (pk % 11)
    f3 = 3400 + 59 * (pk % 7)
    x = (
        0.3 * np.sin(2 * np.pi * f1 / rate * i)
        + 0.25 * np.sin(2 * np.pi * f2 / rate * i + 1.0)
        + 0.2 * np.sin(2 * np.pi * f3 / rate * i + 2.0)
    )
    ch0 = np.rint(32767 * x).astype(np.int16)
    if pk % 2:
        return np.stack([ch0, ch0[::-1] // 2], axis=1), rate, 7 + pk % 8
    return ch0, rate, 3 + pk % 8


def mp3_l3_signal(pk: int) -> tuple[np.ndarray, int, int]:
    """Layer III twin (q_mp3_audio_l3's spec): a third multisine family
    through the restricted-profile codec (sources/codec_mp3_l3.py).
    High bitrates only (idx 13/14): the 1-bit-magnitude profile spends
    up to ~5 bits/line + scalefactors; the bit reservoir lets a bursty
    granule borrow earlier frames' unused slots, but the sustained
    rate must still fit the CBR budget."""
    rate = [32000, 44100, 48000][pk % 3]
    n = 2600 + (pk % 6) * 500
    i = np.arange(n, dtype=np.float64)
    f1 = 160 + 23 * (pk % 13)
    f2 = 870 + 43 * (pk % 11)
    f3 = 3100 + 61 * (pk % 7)
    x = (
        0.3 * np.sin(2 * np.pi * f1 / rate * i)
        + 0.25 * np.sin(2 * np.pi * f2 / rate * i + 1.0)
        + 0.2 * np.sin(2 * np.pi * f3 / rate * i + 2.0)
    )
    ch0 = np.rint(32767 * x).astype(np.int16)
    if pk % 2:
        return np.stack([ch0, ch0[::-1] // 2], axis=1), rate, 13 + pk % 2
    return ch0, rate, 13 + pk % 2


def _freeze(signal_fn, layer: int, out_name: str) -> None:
    part = pd.read_parquet(f"{SF_DIR}/part.parquet", columns=["p_partkey"])
    rows = []
    for pk in sorted(int(x) for x in part["p_partkey"]):
        if pk > PK_CAP:
            continue
        sig, rate, bi = signal_fn(pk)
        s, dec_rate = codec_mp3.decode_mp3(
            codec_mp3.encode_mp3(sig, rate, bi, layer=layer)
        )
        assert dec_rate == rate
        c0 = s[:, 0].astype(np.int64)
        rows.append(
            (
                f"img_{pk:08d}",
                int(s.shape[0]),
                int(s.shape[1]),
                int(rate),
                int(s.shape[0]) * 1000 // int(rate),
                int(np.abs(s.astype(np.int64)).sum()),
                int(((c0[:-1] * c0[1:]) < 0).sum()),
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "audio_id", "n_samples", "n_channels", "sample_rate",
            "duration_ms", "sum_abs", "zero_crossings",
        ],
    )
    out = os.path.join(FIX_DIR, out_name)
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows")


def main() -> None:
    _freeze(mp3_signal, 1, "mp3_audio_sf0_01.parquet")
    _freeze(mp3_l2_signal, 2, "mp3_audio_l2_sf0_01.parquet")
    _freeze(mp3_l3_signal, 3, "mp3_audio_l3_sf0_01.parquet")


if __name__ == "__main__":
    main()
