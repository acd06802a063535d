"""Freeze the audio_adpcm expectations for the DuckDB oracle.

``fixtures/audio_adpcm_sf0_01.parquet`` — the complete expected
q_audio_adpcm output: per-pk deterministic two-tone PCM, encoded through
the from-scratch IMA/DVI ADPCM quantizer (audio_format 0x11), decoded
back by the same codec, reduced to the audio_features integer columns.
IMA ADPCM is lossy (4-bit staircase quantizer), so the decoded samples
have no closed SQL form; the fixture pins the whole chain bit-for-bit.
The codec itself is additionally gated by the bit-exact comparison
against an independently-written scalar reference decoder in
tests/test_codec_wav_g711.py.

This run is SINGLE-PROCESS numpy — no executors, no Arrow batching, no
mapInPandas — so a distributed-plumbing bug in the gated query cannot
cancel out.  The signal spec mirrors q_audio_adpcm's docstring exactly:

    rate = [8000, 22050, 44100][pk % 3];  n = 2500 + (pk % 6) * 500
    x = 0.55 sin(2 pi f1 i / rate) + 0.3 sin(2 pi f2 i / rate + 0.7)
    f1 = 150 + 29 (pk % 11);  f2 = 900 + 41 (pk % 9)
    ch0 = rint(30000 x); odd pk adds ch1 = -ch0 // 3

Usage:  python tools/build_adpcm_fixture.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_wav

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
PK_CAP = 60  # _capped_media_meta's shared bound


def adpcm_signal(pk: int) -> tuple[np.ndarray, int]:
    rate = [8000, 22050, 44100][pk % 3]
    n = 2500 + (pk % 6) * 500
    i = np.arange(n, dtype=np.float64)
    f1 = 150 + 29 * (pk % 11)
    f2 = 900 + 41 * (pk % 9)
    x = 0.55 * np.sin(2 * np.pi * f1 / rate * i) + 0.3 * np.sin(
        2 * np.pi * f2 / rate * i + 0.7
    )
    ch0 = np.rint(30000 * x).astype(np.int16)
    if pk % 2:
        return np.stack([ch0, (-ch0 // 3).astype(np.int16)], axis=1), rate
    return ch0, rate


def features(audio_id: str, s: np.ndarray, rate: int) -> tuple:
    c0 = s[:, 0].astype(np.int64)
    zc = int(((c0[:-1] * c0[1:]) < 0).sum())
    return (
        audio_id, int(s.shape[0]), int(s.shape[1]), int(rate),
        int(s.shape[0]) * 1000 // int(rate),
        int(np.abs(s.astype(np.int64)).sum()), zc,
    )


def main() -> None:
    meta = pd.read_parquet(os.path.join(SF_DIR, "part.parquet"))[["p_partkey"]]
    pks = sorted(int(pk) for pk in meta["p_partkey"] if pk <= PK_CAP)
    rows = []
    for pk in pks:
        sig, rate = adpcm_signal(pk)
        blob = codec_wav.encode_wav_adpcm(sig, rate)
        dec, drate = codec_wav.decode_wav(blob)
        rows.append(features(f"img_{pk:08d}", dec, drate))
    out = pd.DataFrame(
        rows,
        columns=[
            "audio_id", "n_samples", "n_channels", "sample_rate",
            "duration_ms", "sum_abs", "zero_crossings",
        ],
    )
    path = os.path.join(FIX_DIR, "audio_adpcm_sf0_01.parquet")
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows")


if __name__ == "__main__":
    main()
