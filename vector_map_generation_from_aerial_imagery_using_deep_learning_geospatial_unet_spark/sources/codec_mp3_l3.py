"""MPEG-1 Layer III payload codec (restricted profile), from scratch.

Closes the last MPEG-1 audio boundary (Layers I and II decode for real
in codec_mp3.py): a working Layer III encoder + decoder implementing
the full public ISO/IEC 11172-3 decode chain —

  header / 17-or-32-byte side-info bit layout -> part2 scalefactor
  decode (slen table 2.4.2.7, long-block scalefactor bands Table
  3-B.8) -> Huffman big-values pairs + count1 quadruples with sign
  bits -> x^(4/3) requantization with global gain and per-band
  2^(-scalefac/2) -> alias-reduction butterflies (the spec's eight
  c_i coefficients) -> 36-point IMDCT with the long sine window and
  50% overlap-add -> frequency inversion -> the same computed 32-band
  polyphase synthesis filterbank as Layers I/II.

RESTRICTED PROFILE — the honest boundary, checked and raised on
decode with the specific limit named, chosen so every branch the
decoder owns is real:

* long blocks only (window_switching_flag = 0; short/mixed block
  reorder + 12-point IMDCT not implemented);
* Huffman tables 0 (rzero), 1 (2x2 big-values) and count1 table B
  (the fixed 4-bit complement table) — the table registry
  (_BV_TABLES) takes the remaining Annex B tables as pure data, they
  are simply not transcribed; equal table_select in all three regions
  (so the region boundaries never influence decoding);
* preflag = 0, scalefac_scale = 0, modes mono / stereo-LR.

The BIT RESERVOIR (main_data_begin, 2.4.2.7) and scfsi scalefactor
sharing ARE implemented on both sides: the encoder packs each frame's
byte-aligned main_data into the running CBR slot stream (borrowing up
to 511 bytes from earlier frames' unused slots, stuffing to keep the
pointer in range) and elides granule-1 scalefactor groups equal to
granule 0's; the decoder keeps a 511-byte reservoir of prior slot
bytes and resolves each frame's main_data through main_data_begin.

The encoder quantizes each granule-channel to |is| <= 1 (which is
exactly what tables {0, 1, count1B} can carry) and spends its bits on
per-band scalefactors instead — a 1-bit-magnitude, 1.5 dB-stepped
band-exponent codec.  The multisine rate/distortion contract is pinned
by tests/test_mp3.py; wideband noise is NOT this profile's regime.
Reference analogue: GDAL/ffmpeg decode-anything ingest
(/root/reference/src/io.py:41-63).

Encoder and decoder share NO state — the decoder consumes only the
wire bytes, so the round-trip gate (mp3_audio_l3) proves the bit
layout, not a lookup table of itself.
"""

from __future__ import annotations

import numpy as np

from .codec_mp3 import (
    _SR_IDX_V1,
    _BITRATES_V1,
    _BitWriter,
    _FrameBits,
    _analyze,
    _filterbank,
    _synth_raw,
    Mp3Frame,
)

# ---------------------------------------------------------------- tables

# Alias-reduction coefficients (11172-3 2.4.3.4.10.1): the eight c_i,
# csi = 1/sqrt(1+ci^2), cai = ci/sqrt(1+ci^2).
_ALIAS_C = np.array(
    [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
)
_CS = 1.0 / np.sqrt(1.0 + _ALIAS_C**2)
_CA = _ALIAS_C / np.sqrt(1.0 + _ALIAS_C**2)

# Annex B.7 big-values Huffman tables as (x, y) -> codeword bit string.
# Table 1 is transcribed; the registry takes further tables as data.
_BV_TABLES: dict[int, dict[tuple[int, int], str]] = {
    1: {(0, 0): "1", (1, 0): "01", (0, 1): "001", (1, 1): "000"},
}
# decode tries: prefix string -> (x, y)
_BV_DECODE: dict[int, dict[str, tuple[int, int]]] = {
    t: {code: xy for xy, code in tab.items()} for t, tab in _BV_TABLES.items()
}
_BV_MAXLEN = {t: max(len(c) for c in d) for t, d in _BV_DECODE.items()}

# count1 table B: every (v, w, x, y) quadruple coded in 4 bits as the
# one's complement of its nibble.
_COUNT1B_LEN = 4

# scalefac_compress -> (slen1, slen2) (11172-3 2.4.2.7)
_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

# Long-block scalefactor-band boundaries per MPEG-1 sample rate
# (11172-3 Table 3-B.8): 22 bands; scalefactors transmitted for bands
# 0..20 (slen1 for 0..10, slen2 for 11..20), band 21 has none.
_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}

# The profile's fixed scalefac_compress: 15 -> slen1 = 4, slen2 = 3
# (finest low-band resolution the field offers).
_SFC = 15

# scfsi band groups (11172-3 2.4.2.7): scalefactor bands 0-5, 6-10,
# 11-15, 16-20; a set bit means granule 1 reuses granule 0's
# scalefactors for that group and does not retransmit them.
_SCFSI_BANDS = ((0, 6), (6, 11), (11, 16), (16, 21))


def _mdct36(z: np.ndarray) -> np.ndarray:
    """Forward 36-point MDCT, long sine window, scaled so the spec
    IMDCT below (no scale factor) + overlap-add reconstructs exactly
    (Princen-Bradley: w windowed on both sides, factor 2/18)."""
    n = np.arange(36.0)
    w = np.sin(np.pi / 36.0 * (n + 0.5))
    k = np.arange(18.0)
    cosm = np.cos(np.pi / 72.0 * (2 * n[:, None] + 19) * (2 * k[None, :] + 1))
    return (2.0 / 18.0) * ((z * w) @ cosm)


def _imdct36(X: np.ndarray) -> np.ndarray:
    """Spec IMDCT (2.4.3.4.10.3): x_i = sum_k X_k cos(pi/72 (2i+1+18)
    (2k+1)), then the long sine window — 36 samples, caller overlap-adds
    halves."""
    n = np.arange(36.0)
    w = np.sin(np.pi / 36.0 * (n + 0.5))
    k = np.arange(18.0)
    cosm = np.cos(np.pi / 72.0 * (2 * n[:, None] + 19) * (2 * k[None, :] + 1))
    return (cosm @ X) * w


def _alias_reduce(xr: np.ndarray) -> np.ndarray:
    """Decoder-side butterflies across the 31 subband seams (in place on
    a copy).  xr: (576,) granule spectrum, 18 lines per subband."""
    xa = xr.copy()
    i = np.arange(8)
    for sb in range(1, 32):
        lo = xr[18 * sb - 1 - i]
        hi = xr[18 * sb + i]
        xa[18 * sb - 1 - i] = lo * _CS - hi * _CA
        xa[18 * sb + i] = hi * _CS + lo * _CA
    return xa


def _alias_unreduce(xa: np.ndarray) -> np.ndarray:
    """Encoder-side inverse (the rotation transpose)."""
    xr = xa.copy()
    i = np.arange(8)
    for sb in range(1, 32):
        lo = xa[18 * sb - 1 - i]
        hi = xa[18 * sb + i]
        xr[18 * sb - 1 - i] = lo * _CS + hi * _CA
        xr[18 * sb + i] = hi * _CS - lo * _CA
    return xr


_FREQ_INV = np.ones((32, 18))
_FREQ_INV[1::2, 1::2] = -1.0  # odd subband, odd time sample


# ---------------------------------------------------------------- encoder

def _quantize_granule(
    xa: np.ndarray, sfb: list[int]
) -> tuple[np.ndarray, int, np.ndarray]:
    """Pick global_gain so q = 2^((gg-210)/4) >= max|x|, then per
    scalefactor band the largest transmittable attenuation that keeps
    the band level >= the band max (floor keeps |is| <= 1, which is all
    tables {0, 1, count1B} can carry): level_b = q * 2^(-sf_b / 2),
    is = round((|x|/level)^(3/4)) in {0, 1}.  Returns (signed is,
    gg, sf[21])."""
    s = float(np.abs(xa).max())
    sf = np.zeros(21, np.int64)
    if s == 0.0:
        return np.zeros(576, np.int64), 0, sf
    gg = int(np.clip(210 + np.ceil(4 * np.log2(s)), 0, 255))
    q = 2.0 ** ((gg - 210) / 4.0)
    slen1, slen2 = _SLEN[_SFC]
    for b in range(21):
        m = float(np.abs(xa[sfb[b] : sfb[b + 1]]).max())
        cap = (1 << (slen1 if b < 11 else slen2)) - 1
        if m > 0.0:
            # nearest step: level/m stays within 2^(+-1/4), so the
            # magnitude estimate (m/level)^(3/4) <= 2^(3/16) < 1.5
            # still rounds to 1 — |is| <= 1 is preserved
            sf[b] = int(np.clip(np.rint(2 * np.log2(q / m)), 0, cap))
    level = np.full(576, q)
    for b in range(21):
        level[sfb[b] : sfb[b + 1]] *= 2.0 ** (-sf[b] / 2.0)
    isv = ((np.abs(xa) / level) ** 0.75 >= 0.5).astype(np.int64)
    return isv * np.sign(xa).astype(np.int64), gg, sf


def _huffman_bits(isv: np.ndarray) -> tuple[str, int]:
    """Encode the 576 quantized lines: big-values pairs (table 1) up to
    16 lines before the last nonzero, count1 quadruples (table B) over
    the remainder.  Returns (bitstring, big_values)."""
    nz = np.flatnonzero(isv)
    L = int(nz[-1]) + 1 if nz.size else 0
    bv = max(0, -(-(L - 16) // 2))  # ceil((L-16)/2), >= 0
    n_quads = -(-(L - 2 * bv) // 4) if L > 2 * bv else 0
    if 2 * bv + 4 * n_quads > 576:
        n_quads = (576 - 2 * bv) // 4
    bits = []
    tab = _BV_TABLES[1]
    for i in range(bv):
        x, y = int(isv[2 * i]), int(isv[2 * i + 1])
        bits.append(tab[(abs(x), abs(y))])
        if x:
            bits.append("1" if x < 0 else "0")
        if y:
            bits.append("1" if y < 0 else "0")
    for j in range(n_quads):
        quad = isv[2 * bv + 4 * j : 2 * bv + 4 * j + 4]
        nib = 0
        for v in quad:
            nib = (nib << 1) | (1 if v else 0)
        bits.append(format((~nib) & 0xF, "04b"))
        for v in quad:
            if v:
                bits.append("1" if v < 0 else "0")
    return "".join(bits), bv


def _bits_to_bytes(bits: str) -> bytes:
    """MSB-first bitstring (multiple of 8) -> bytes."""
    if not bits:
        return b""
    arr = np.frombuffer(bits.encode(), dtype=np.uint8) - 48
    return np.packbits(arr).tobytes()


def encode_mp3_l3(
    sig: np.ndarray, sample_rate: int, bitrate_idx: int = 14
) -> bytes:
    """Long-block-profile MPEG-1 Layer III CBR encoder: int16 PCM (n,)
    or (n, ch<=2) -> spec-framed stream (1152 samples/frame, 2 granules,
    17/32-byte side info).  Uses the BIT RESERVOIR: each frame's
    main_data is byte-aligned and packed into the running CBR slot
    stream, main_data_begin pointing back up to 511 bytes into earlier
    frames' slots, so a bursty granule may borrow space from quieter
    neighbours — stuffing bytes keep the pointer in range exactly as
    real encoders do.  scfsi retransmission elision: when granule 1's
    scalefactors equal granule 0's over an scfsi band group, the bit is
    set and the bits saved join the reservoir.  Appends two silent
    flush frames so the filterbank + MDCT delay drains."""
    sig = np.asarray(sig)
    if sig.ndim == 1:
        sig = sig[:, None]
    n, ch = sig.shape
    if ch not in (1, 2):
        raise ValueError("mp3: 1 or 2 channels only")
    if sample_rate not in _SR_IDX_V1:
        raise ValueError("mp3: MPEG1 sample rate must be 32000/44100/48000")
    if not 1 <= bitrate_idx <= 14:
        raise ValueError("bitrate_idx in 1..14")
    sr_idx = _SR_IDX_V1[sample_rate]
    bitrate = _BITRATES_V1[3][bitrate_idx]
    frame_len = 144 * bitrate * 1000 // sample_rate  # padding bit 0
    side_len = 17 if ch == 1 else 32

    nframes = -(-n // 1152) + 2
    x = np.zeros((1152 * nframes, ch))
    x[:n] = sig.astype(np.float64) / 32768.0
    A, _G, _d = _filterbank()
    S = np.stack([_analyze(x[:, c], A) for c in range(ch)], axis=2)

    hdr = bytes(
        [
            0xFF,
            0xFB,  # MPEG1, Layer III, no CRC
            (bitrate_idx << 4) | (sr_idx << 2),
            0xC0 if ch == 1 else 0x00,
        ]
    )
    sfb = _SFB_LONG[sample_rate]
    slen1, slen2 = _SLEN[_SFC]
    prev = np.zeros((32, 18, ch))  # MDCT overlap state per subband

    # ---- pass 1: quantize every granule-channel, decide scfsi per
    # channel (a group bit is set only when BOTH granules carry data
    # and their scalefactors agree over the group), assemble each
    # frame's byte-aligned main_data
    frame_md: list[bytearray] = []
    frame_scfsi: list[list[int]] = []
    frame_sides: list[list[tuple[int, int, int, int]]] = []
    for f in range(nframes):
        gq: dict[tuple[int, int], tuple[bool, int, np.ndarray, str, int]] = {}
        for g in range(2):
            t0 = 36 * f + 18 * g
            for c in range(ch):
                sb18 = S[t0 : t0 + 18, :, c].T  # (32, 18)
                xa = np.empty(576)
                for sb in range(32):
                    z = np.concatenate([prev[sb, :, c], sb18[sb] * _FREQ_INV[sb]])
                    xa[18 * sb : 18 * sb + 18] = _mdct36(z)
                prev[:, :, c] = sb18 * _FREQ_INV
                xr = _alias_unreduce(xa)
                isv, gg, sf = _quantize_granule(xr, sfb)
                hbits, bv = _huffman_bits(isv)
                gq[(g, c)] = (bool(np.any(isv)), gg, sf, hbits, bv)
        scfsi_ch: list[int] = []
        for c in range(ch):
            live0, _, sf0, _, _ = gq[(0, c)]
            live1, _, sf1, _, _ = gq[(1, c)]
            bitsv = 0
            if live0 and live1:
                for gi, (lo, hi) in enumerate(_SCFSI_BANDS):
                    if np.array_equal(sf0[lo:hi], sf1[lo:hi]):
                        bitsv |= 1 << (3 - gi)
            scfsi_ch.append(bitsv)
        sides: list[tuple[int, int, int, int]] = []
        md_bits: list[str] = []
        for g in range(2):
            for c in range(ch):
                live, gg, sf, hbits, bv = gq[(g, c)]
                if not live:
                    # silent granule: part2_3_length = 0 carries neither
                    # scalefactors nor Huffman bits
                    sides.append((0, 0, gg, 0))
                    continue
                bands = list(range(21))
                if g == 1:
                    for gi, (lo, hi) in enumerate(_SCFSI_BANDS):
                        if (scfsi_ch[c] >> (3 - gi)) & 1:
                            bands = [b for b in bands if not lo <= b < hi]
                sfbits = "".join(
                    format(int(sf[b]), f"0{slen1 if b < 11 else slen2}b")
                    for b in bands
                )
                p23 = len(sfbits) + len(hbits)
                if p23 > 4095:
                    raise ValueError("mp3: granule exceeds part2_3_length")
                md_bits.append(sfbits + hbits)
                sides.append((p23, bv, gg, _SFC))
        allbits = "".join(md_bits)
        if len(allbits) % 8:
            # byte-align so the next frame's 9-bit byte pointer can
            # name this frame's end exactly (the padding bits are
            # spec "ancillary" bits)
            allbits += "0" * (8 - len(allbits) % 8)
        frame_md.append(bytearray(_bits_to_bytes(allbits)))
        frame_scfsi.append(scfsi_ch)
        frame_sides.append(sides)

    # ---- pass 2: reservoir packing — frame f's main_data starts
    # ``reservoir`` bytes back into earlier frames' unused slots;
    # stuffing bytes cap the carry at the field's 511-byte reach
    slots = frame_len - 4 - side_len
    md_begin: list[int] = []
    reservoir = 0
    for f in range(nframes):
        md_begin.append(reservoir)
        need = len(frame_md[f])
        if need > reservoir + slots:
            raise ValueError(
                "mp3: granule bits exceed the CBR slot budget plus "
                "reservoir — raise bitrate_idx"
            )
        reservoir += slots - need
        stuff = max(0, reservoir - 511)
        if stuff:
            frame_md[f] += b"\x00" * stuff
            reservoir -= stuff

    # ---- pass 3: emit — side info per frame, main_data distributed
    # over the continuous slot stream
    md_stream = b"".join(frame_md)
    out = bytearray()
    o = 0
    for f in range(nframes):
        w = _BitWriter()
        w.write(md_begin[f], 9)            # main_data_begin
        w.write(0, 5 if ch == 1 else 3)    # private_bits
        for c in range(ch):
            w.write(frame_scfsi[f][c], 4)  # scfsi
        for (p23, bv, gg, sfc) in frame_sides[f]:
            w.write(p23, 12)
            w.write(bv, 9)
            w.write(gg, 8)
            w.write(sfc, 4)                # scalefac_compress
            w.write(0, 1)                  # window_switching_flag = 0
            tsel = 1 if bv else 0
            for _r in range(3):
                w.write(tsel, 5)           # table_select
            w.write(0, 4)                  # region0_count
            w.write(0, 3)                  # region1_count
            w.write(0, 1)                  # preflag
            w.write(0, 1)                  # scalefac_scale
            w.write(1, 1)                  # count1table_select = B
        side = w.padded_to(side_len)
        chunk = md_stream[o : o + slots]
        o += slots
        out += hdr + side + chunk + b"\x00" * (slots - len(chunk))
    return bytes(out)


# ---------------------------------------------------------------- decoder

def _read_side_info(
    bits: _FrameBits, ch: int
) -> tuple[int, list[int], list[dict]]:
    """Side info -> (main_data_begin, scfsi per channel, per-granule
    field dicts in (granule, channel) order)."""
    md_begin = bits.read(9)
    bits.read(5 if ch == 1 else 3)
    scfsi = [bits.read(4) for _c in range(ch)]
    sides = []
    for _g in range(2):
        for _c in range(ch):
            s: dict = {}
            s["part2_3"] = bits.read(12)
            s["big_values"] = bits.read(9)
            if s["big_values"] > 288:
                raise ValueError("mp3 L3: big_values > 288")
            s["global_gain"] = bits.read(8)
            s["sfc"] = bits.read(4)
            if bits.read(1) != 0:
                raise NotImplementedError(
                    "mp3 L3: window switching (short/mixed blocks) not "
                    "supported"
                )
            s["tsel"] = [bits.read(5) for _r in range(3)]
            bits.read(4)  # region0_count (irrelevant: equal selects)
            bits.read(3)  # region1_count
            if len(set(s["tsel"])) != 1:
                raise NotImplementedError(
                    "mp3 L3: per-region table switching not supported"
                )
            if bits.read(1) != 0:
                raise NotImplementedError("mp3 L3: preflag not supported")
            if bits.read(1) != 0:
                raise NotImplementedError(
                    "mp3 L3: scalefac_scale not supported"
                )
            s["count1_b"] = bits.read(1)
            sides.append(s)
    return md_begin, scfsi, sides


def _decode_granule(
    bits: _FrameBits,
    s: dict,
    sfb: list[int],
    reuse: tuple[int, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Scalefactor (part2) + Huffman (part3) sections of one granule-
    channel -> (576 requantized lines, decoded scalefactors).  For
    granule 1, ``reuse = (scfsi_bits, granule0_sf)``: bands in a set
    scfsi group are copied from granule 0 and consume no bits."""
    isv = np.zeros(576, np.int64)
    end = bits.pos + s["part2_3"]
    sf = np.zeros(21, np.int64)
    if s["part2_3"]:
        slen1, slen2 = _SLEN[s["sfc"]]
        skip = [False] * 21
        if reuse is not None:
            scfsi_bits, sf_prev = reuse
            for gi, (lo, hi) in enumerate(_SCFSI_BANDS):
                if (scfsi_bits >> (3 - gi)) & 1:
                    for b in range(lo, hi):
                        skip[b] = True
        need = sum(
            (slen1 if b < 11 else slen2) for b in range(21) if not skip[b]
        )
        if need > s["part2_3"]:
            raise ValueError("mp3 L3: part2_3_length below scalefactor bits")
        for b in range(21):
            n = slen1 if b < 11 else slen2
            if skip[b]:
                sf[b] = sf_prev[b]
            else:
                sf[b] = bits.read(n) if n else 0
    tsel = s["tsel"][0]
    if s["big_values"] and tsel == 0:
        raise ValueError("mp3 L3: big_values with table 0")
    if s["big_values"]:
        if tsel not in _BV_DECODE:
            raise NotImplementedError(
                f"mp3 L3: Huffman table {tsel} not transcribed "
                "(tables 0/1 + count1B are the implemented profile)"
            )
        dec, maxlen = _BV_DECODE[tsel], _BV_MAXLEN[tsel]
        for i in range(s["big_values"]):
            code = ""
            while code not in dec:
                if len(code) > maxlen or bits.pos >= end:
                    raise ValueError("mp3 L3: bad big-values code")
                code += "1" if bits.read(1) else "0"
            x, y = dec[code]
            if x and bits.read(1):
                x = -x
            if y and bits.read(1):
                y = -y
            isv[2 * i], isv[2 * i + 1] = x, y
    if not s["count1_b"]:
        if bits.pos < end:
            raise NotImplementedError(
                "mp3 L3: count1 table A not transcribed"
            )
    idx = 2 * s["big_values"]
    while bits.pos < end and idx + 4 <= 576:
        nib = (~bits.read(4)) & 0xF
        for j in range(4):
            v = (nib >> (3 - j)) & 1
            if v:
                if bits.pos >= end:
                    raise ValueError("mp3 L3: count1 sign bit truncated")
                if bits.read(1):
                    v = -v
            isv[idx + j] = v
        idx += 4
    if bits.pos != end:
        raise ValueError("mp3 L3: part2_3_length mismatch")
    # requantize: x^(4/3) * 2^((gg-210)/4) * 2^(-scalefac/2)
    # (scalefac_scale = 0, preflag = 0 in this profile; band 21 carries
    # no scalefactor)
    level = np.full(576, 2.0 ** ((s["global_gain"] - 210) / 4.0))
    for b in range(21):
        level[sfb[b] : sfb[b + 1]] *= 2.0 ** (-float(sf[b]) / 2.0)
    return (
        np.sign(isv) * (np.abs(isv).astype(np.float64) ** (4.0 / 3.0)) * level,
        sf,
    )


def decode_layer3(data: bytes, frames: list[Mp3Frame], ch: int) -> np.ndarray:
    """All frames -> (18 * 2 * nframes, 32, ch) synthesis-filterbank
    input (requantize -> alias reduce -> IMDCT + overlap-add ->
    frequency inversion).  Maintains the 511-byte bit reservoir: each
    frame's main_data is located ``main_data_begin`` bytes back into
    the running slot stream of earlier frames."""
    sfb = _SFB_LONG[frames[0].sample_rate]
    S = np.zeros((36 * len(frames), 32, ch))
    overlap = np.zeros((32, 18, ch))
    side_len = 17 if ch == 1 else 32
    md_buf = bytearray()  # tail of prior frames' main_data slots
    for fi, fr in enumerate(frames):
        pos = fr.offset + 4 + (2 if fr.protection == 0 else 0)
        side = data[pos : pos + side_len]
        if len(side) < side_len:
            raise ValueError("mp3 L3: side info truncated")
        md_begin, scfsi, sides = _read_side_info(_FrameBits(side), ch)
        cur = data[pos + side_len : fr.offset + fr.length]
        if md_begin > len(md_buf):
            raise ValueError(
                "mp3 L3: main_data_begin reaches before the available "
                "reservoir"
            )
        bits = _FrameBits(
            (bytes(md_buf[len(md_buf) - md_begin :]) if md_begin else b"")
            + cur
        )
        sf0: list[np.ndarray | None] = [None] * ch
        for g in range(2):
            for c in range(ch):
                s = sides[g * ch + c]
                reuse = (scfsi[c], sf0[c]) if g == 1 else None
                xr, sf = _decode_granule(bits, s, sfb, reuse)
                if g == 0:
                    sf0[c] = sf
                xa = _alias_reduce(xr)
                t0 = 36 * fi + 18 * g
                for sb in range(32):
                    y = _imdct36(xa[18 * sb : 18 * sb + 18])
                    block = y[:18] + overlap[sb, :, c]
                    overlap[sb, :, c] = y[18:]
                    S[t0 : t0 + 18, sb, c] = block * _FREQ_INV[sb]
        md_buf += cur
        if len(md_buf) > 511:
            del md_buf[: len(md_buf) - 511]
    return S


def decode_mp3_l3(data: bytes, frames: list[Mp3Frame], ch: int) -> tuple[np.ndarray, int]:
    """Full restricted-profile decode: wire bytes -> (int16 PCM (n, ch),
    rate), sharing the Layer I/II synthesis filterbank."""
    S = decode_layer3(data, frames, ch)
    _A, G, _d = _filterbank()
    n_out = S.shape[0] * 32
    pcm = np.stack(
        [_synth_raw(S[:, :, c], G)[:n_out] for c in range(ch)], axis=1
    )
    return (
        np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16),
        frames[0].sample_rate,
    )
