"""WebP-lossless (VP8L) codec tests.

Round-trips cover the encoder's literal dialect; the handcrafted-stream
tests drive the decoder's general spec paths the fixture encoder never
emits — transforms (subtract-green, color-indexing with sub-byte bundling,
predictor), LZ77 backward references, the color cache, and simple-code
symbol ordering — by assembling bitstreams with the module's own writer
primitives and checking the decode against an independently computed
expectation.
"""

from __future__ import annotations

import numpy as np
import pytest

from vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark.sources import codec_webp as W


def _rt(arr: np.ndarray) -> np.ndarray:
    return W.decode_webp(W.encode_webp(arr))


# --------------------------------------------------------------------------- #
# round-trips (encoder dialect: literal-only)
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (3, 5, 3), (17, 23, 3), (64, 64, 3), (7, 33, 4)]
)
def test_roundtrip_random(shape):
    rng = np.random.RandomState(sum(shape))
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = _rt(arr)
    exp = arr
    if exp.shape[-1] == 4 and (exp[..., 3] == 255).all():
        exp = exp[..., :3]
    assert out.shape == exp.shape
    assert (out == exp).all()


def test_roundtrip_grayscale_promotes():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(19, 11), dtype=np.uint8)
    out = _rt(arr)
    assert out.shape == (19, 11, 3)
    assert (out == np.stack([arr] * 3, axis=-1)).all()


def test_roundtrip_constant_channels():
    # constant channels ship as 0-bit single-symbol codes
    arr = np.zeros((30, 20, 3), dtype=np.uint8)
    arr[:, :, 1] = np.random.RandomState(1).randint(0, 256, (30, 20))
    assert (_rt(arr) == arr).all()
    assert (_rt(np.full((9, 9, 3), 42, dtype=np.uint8)) == np.full((9, 9, 3), 42)).all()


def test_roundtrip_alpha_preserved():
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, size=(12, 8, 4), dtype=np.uint8)
    arr[0, 0, 3] = 7  # force non-constant, non-255 alpha
    out = _rt(arr)
    assert out.shape == (12, 8, 4)
    assert (out == arr).all()


def test_container_errors():
    with pytest.raises(ValueError, match="RIFF"):
        W.decode_webp(b"nope")
    data = bytearray(W.encode_webp(np.zeros((2, 2, 3), dtype=np.uint8)))
    data[12:16] = b"VP8 "  # masquerade as lossy
    with pytest.raises(NotImplementedError, match="lossy"):
        W.decode_webp(bytes(data))


# --------------------------------------------------------------------------- #
# handcrafted streams: general decoder paths
# --------------------------------------------------------------------------- #

def _vp8l_header(bwr: W._BitWriter, w: int, h: int, alpha: int = 0) -> None:
    bwr.write(w - 1, 14)
    bwr.write(h - 1, 14)
    bwr.write(alpha, 1)
    bwr.write(0, 3)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, len) with the decoder's canonical assignment."""
    max_len = max(lengths.values())
    counts = [0] * (max_len + 1)
    for ln in lengths.values():
        counts[ln] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + counts[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for ln, sym in sorted((ln, s) for s, ln in lengths.items()):
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _emit_normal_code(bwr: W._BitWriter, lengths: dict[int, int], alphabet: int):
    """Emit an arbitrary normal prefix code (lengths: symbol -> bits) and
    return the symbol -> writer for its codewords.  Uses a flat cl-code
    (every needed code-length symbol at equal width) and literal per-symbol
    emission — wasteful but general."""
    used_cl = sorted(set(lengths.values()) | {0})
    m = max(1, (len(used_cl) - 1).bit_length())
    bwr.write(0, 1)  # normal
    bwr.write(15, 4)  # num_code_lengths = 19 (cover everything)
    cl_lengths = {s: m for s in used_cl}
    for sym in W.CODE_LENGTH_ORDER:
        bwr.write(cl_lengths.get(sym, 0), 3)
    bwr.write(0, 1)  # no max-symbol shortcut
    cl_codes = _canonical_codes(cl_lengths)
    max_sym = max(lengths)
    for s in range(max_sym + 1):
        c, ln = cl_codes[lengths.get(s, 0)]
        bwr.write(W._bit_reverse(c, ln), ln)
    # remaining symbols: emit zeros until alphabet exhausted
    for _ in range(max_sym + 1, alphabet):
        c, ln = cl_codes[0]
        bwr.write(W._bit_reverse(c, ln), ln)
    codes = _canonical_codes(lengths)

    def write_sym(sym: int) -> None:
        c, ln = codes[sym]
        bwr.write(W._bit_reverse(c, ln), ln)

    return write_sym


def _emit_single(bwr: W._BitWriter, symbol: int) -> None:
    W._write_single_symbol_code(bwr, symbol)


def _inverse_prefix(value: int):
    """(code, extra_bits, n_extra) such that _prefix_value(code) == value."""
    for code in range(40):
        if code < 4:
            if code + 1 == value:
                return code, 0, 0
            continue
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return code, value - offset - 1, extra
    raise AssertionError(value)


def test_subtract_green_transform():
    rng = np.random.RandomState(3)
    h, w = 9, 13
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    r = (img[:, :, 0].astype(int) - img[:, :, 1]) % 256
    b = (img[:, :, 2].astype(int) - img[:, :, 1]) % 256
    g = img[:, :, 1].astype(int)

    bwr = W._BitWriter()
    _vp8l_header(bwr, w, h)
    bwr.write(1, 1)  # transform present
    bwr.write(2, 2)  # SUBTRACT_GREEN
    bwr.write(0, 1)  # end transforms
    bwr.write(0, 1)  # no cache
    bwr.write(0, 1)  # no meta codes
    wg = _emit_normal_code(bwr, {s: 8 for s in range(256)}, 256 + 24)
    wr = _emit_normal_code(bwr, {s: 8 for s in range(256)}, 256)
    wb = _emit_normal_code(bwr, {s: 8 for s in range(256)}, 256)
    _emit_single(bwr, 255)  # alpha
    _emit_single(bwr, 0)  # distance
    for y in range(h):
        for x in range(w):
            wg(int(g[y, x]))
            wr(int(r[y, x]))
            wb(int(b[y, x]))
    out = W.decode_vp8l(b"\x2f" + bwr.bytes())
    assert (out == img).all()


def test_color_indexing_bundled():
    # 4-colour palette -> 2-bit indices, 4 per green byte (width_bits=2)
    palette = np.array(
        [[10, 20, 30], [200, 100, 50], [0, 0, 0], [255, 255, 255]], dtype=np.uint8
    )
    h, w = 5, 11
    rng = np.random.RandomState(4)
    idx = rng.randint(0, 4, size=(h, w))
    img = palette[idx]

    # palette entries are delta-coded vs the previous entry, per component
    deltas = []
    prev = np.zeros(4, dtype=int)  # a, r, g, b
    for p in palette:
        cur = np.array([255, p[0], p[1], p[2]])
        deltas.append((cur - prev) % 256)
        prev = cur

    bwr = W._BitWriter()
    _vp8l_header(bwr, w, h)
    bwr.write(1, 1)
    bwr.write(3, 2)  # COLOR_INDEXING
    bwr.write(3, 8)  # n_colors - 1
    # the palette itself is an entropy-coded image (4x1): cache bit + codes
    bwr.write(0, 1)  # palette image: no cache
    wg = _emit_normal_code(
        bwr, {int(d[2]): 8 for d in deltas} | {0: 8, 1: 8}, 256 + 24
    )
    wr = _emit_normal_code(bwr, {int(d[1]): 8 for d in deltas} | {0: 8, 1: 8}, 256)
    wb = _emit_normal_code(bwr, {int(d[3]): 8 for d in deltas} | {0: 8, 1: 8}, 256)
    wa = _emit_normal_code(bwr, {int(d[0]): 8 for d in deltas} | {0: 8, 1: 8}, 256)
    _emit_single(bwr, 0)  # distance tree
    for d in deltas:  # stream order per pixel is G, R, B, A
        wg(int(d[2]))
        wr(int(d[1]))
        wb(int(d[3]))
        wa(int(d[0]))
    bwr.write(0, 1)  # end transforms
    # main image: packed width = ceil(11 / 4) = 3, indices in green channel
    bwr.write(0, 1)  # no cache
    bwr.write(0, 1)  # no meta
    packed_w = (w + 3) // 4
    packed = np.zeros((h, packed_w), dtype=int)
    for y in range(h):
        for x in range(w):
            packed[y, x // 4] |= idx[y, x] << (2 * (x % 4))
    wg2 = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256 + 24)
    _emit_single(bwr, 0)  # red
    _emit_single(bwr, 0)  # blue
    _emit_single(bwr, 255)  # alpha
    _emit_single(bwr, 0)  # distance
    for y in range(h):
        for x in range(packed_w):
            wg2(int(packed[y, x]))
    out = W.decode_vp8l(b"\x2f" + bwr.bytes())
    assert out.shape == (h, w, 3)
    assert (out == img).all()


def test_lz77_and_color_cache():
    # 1x8 image: A B <backref len 2 dist 2 -> A B> <cache hit B> A B A
    A = 0xFF102030
    B = 0xFF405060

    def chans(px):
        return (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF

    cache_bits = 4
    idx_B = ((0x1E35A7BD * B) & 0xFFFFFFFF) >> (32 - cache_bits)
    w, h = 8, 1
    bwr = W._BitWriter()
    _vp8l_header(bwr, w, h)
    bwr.write(0, 1)  # no transforms
    bwr.write(1, 1)  # cache present
    bwr.write(cache_bits, 4)
    bwr.write(0, 1)  # no meta
    n_cache = 1 << cache_bits
    ga, gb = chans(A)[1], chans(B)[1]
    lcode0, _, _ = _inverse_prefix(2)  # length-2 prefix symbol (== 1)
    g_lengths = {ga: 2, gb: 2, 256 + lcode0: 2, 280 + idx_B: 2}
    assert len(g_lengths) == 4  # no collisions with these constants
    wg = _emit_normal_code(bwr, g_lengths, 256 + 24 + n_cache)
    wr = _emit_normal_code(bwr, {chans(A)[0]: 1, chans(B)[0]: 1}, 256)
    wb = _emit_normal_code(bwr, {chans(A)[2]: 1, chans(B)[2]: 1}, 256)
    _emit_single(bwr, 255)  # alpha
    # distance tree must encode dist 2: scanline distance 2 -> code 2 + 120;
    # single-symbol tree decodes with 0 bits, so nothing is written for the
    # symbol itself — only its extra bits
    dcode, extra_val, n_extra = _inverse_prefix(2 + 120)
    _emit_single(bwr, dcode)
    # length 2 -> length prefix symbol: _prefix_value inverse for 2
    lcode, lextra, ln_extra = _inverse_prefix(2)

    def lit(px):
        r, g, b = chans(px)
        wg(g)
        wr(r)
        wb(b)

    lit(A)
    lit(B)
    wg(256 + lcode)
    if ln_extra:
        bwr.write(lextra, ln_extra)
    if n_extra:  # distance symbol itself is 0-bit (single-symbol tree)
        bwr.write(extra_val, n_extra)
    wg(280 + idx_B)  # cache hit for B
    lit(A)
    lit(B)
    lit(A)
    out = W.decode_vp8l(b"\x2f" + bwr.bytes())
    flat = (
        out[..., 0].astype(np.uint32) << 16
        | out[..., 1].astype(np.uint32) << 8
        | out[..., 2].astype(np.uint32)
    ).reshape(-1)
    expect = [A, B, A, B, B, A, B, A]
    assert [int(v) | 0xFF000000 for v in flat] == expect


def test_lz77_2d_distance_map():
    # 4x4 image, backref with distance code 1 -> offset (0, 1) = one row up
    rng = np.random.RandomState(5)
    w = h = 4
    top = rng.randint(0, 256, size=(2, w, 3), dtype=np.uint8)
    img = np.concatenate([top, top], axis=0)  # rows 2-3 copy rows 0-1

    bwr = W._BitWriter()
    _vp8l_header(bwr, w, h)
    bwr.write(0, 1)
    bwr.write(0, 1)
    bwr.write(0, 1)
    # length: 8 pixels -> prefix value 8; 257 used symbols cannot all be
    # 8 bits (Kraft), so use a 9-bit uniform code
    lcode, lextra, lnex = _inverse_prefix(8)
    wg = _emit_normal_code(
        bwr, {v: 9 for v in range(256)} | {256 + lcode: 9}, 256 + 24
    )
    wr = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256)
    wb = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256)
    _emit_single(bwr, 255)
    dcode, dex, dnex = _inverse_prefix(1)  # distance CODE 1 -> 2D map entry 0
    _emit_single(bwr, dcode)  # 0-bit single-symbol distance tree
    for y in range(2):
        for x in range(w):
            wg(int(img[y, x, 1]))
            wr(int(img[y, x, 0]))
            wb(int(img[y, x, 2]))
    wg(256 + lcode)
    if lnex:
        bwr.write(lextra, lnex)
    if dnex:  # distance symbol itself is 0-bit
        bwr.write(dex, dnex)
    out = W.decode_vp8l(b"\x2f" + bwr.bytes())
    # distance code 1 maps to (dx=0, dy=1) -> dist w: NOT a full 8-px-back
    # run; rows 2-3 replicate the row immediately above each pixel => both
    # equal row 1
    expect = np.concatenate([top, top[1:2], top[1:2]], axis=0)
    assert (out == expect).all()


def test_predictor_transform_mode_left():
    rng = np.random.RandomState(6)
    h, w = 6, 10
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    size_bits = 4  # one block covers the image
    # residuals under spec edge rules: (0,0) vs black, row 0 vs L, col 0
    # vs T, else block mode (1 = L)
    res = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0])
            elif y == 0:
                pred = img[y, x - 1]
            elif x == 0:
                pred = img[y - 1, x]
            else:
                pred = img[y, x - 1]  # mode 1
            res[y, x] = (img[y, x].astype(int) - pred) % 256

    bwr = W._BitWriter()
    _vp8l_header(bwr, w, h)
    bwr.write(1, 1)
    bwr.write(0, 2)  # PREDICTOR
    bwr.write(size_bits - 2, 3)
    # 1x1 predictor image, mode 1 in green: constant channels all-single
    bwr.write(0, 1)  # sub-image: no cache
    _emit_single(bwr, 1)  # green = mode 1
    _emit_single(bwr, 0)
    _emit_single(bwr, 0)
    _emit_single(bwr, 255)
    _emit_single(bwr, 0)
    bwr.write(0, 1)  # end transforms
    bwr.write(0, 1)  # no cache
    bwr.write(0, 1)  # no meta
    wg = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256 + 24)
    wr = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256)
    wb = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256)
    _emit_single(bwr, 0)  # alpha residual: all zero (alpha pred stays 255)
    _emit_single(bwr, 0)
    for y in range(h):
        for x in range(w):
            wg(int(res[y, x, 1]))
            wr(int(res[y, x, 0]))
            wb(int(res[y, x, 2]))
    out = W.decode_vp8l(b"\x2f" + bwr.bytes())
    assert (out == img).all()


def test_simple_two_symbol_code_read_order():
    # first-read symbol takes bit 0 even when numerically larger
    w, h = 4, 1
    bwr = W._BitWriter()
    _vp8l_header(bwr, w, h)
    bwr.write(0, 1)
    bwr.write(0, 1)
    bwr.write(0, 1)
    # green: simple code, two symbols, first = 200, second = 100
    bwr.write(1, 1)
    bwr.write(1, 1)  # two symbols
    bwr.write(1, 1)  # 8-bit first symbol
    bwr.write(200, 8)
    bwr.write(100, 8)
    _emit_single(bwr, 0)  # red
    _emit_single(bwr, 0)  # blue
    _emit_single(bwr, 255)  # alpha
    _emit_single(bwr, 0)  # dist
    for bit in (0, 1, 1, 0):
        bwr.write(bit, 1)
    out = W.decode_vp8l(b"\x2f" + bwr.bytes())
    assert list(out[0, :, 1]) == [200, 100, 100, 200]


def test_meta_prefix_codes_single_group():
    # meta-huffman plumbing with a constant-zero huffman image
    rng = np.random.RandomState(8)
    h, w = 5, 7
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    bwr = W._BitWriter()
    _vp8l_header(bwr, w, h)
    bwr.write(0, 1)  # no transforms
    bwr.write(0, 1)  # no color cache (read BEFORE the meta-prefix bit)
    bwr.write(1, 1)  # meta prefix codes present
    bwr.write(1, 3)  # huffman_bits = 3 -> 1x1 huffman image
    # huffman image (1x1): all-constant => all single-symbol codes
    bwr.write(0, 1)  # sub-image: no cache
    _emit_single(bwr, 0)  # green (meta low byte)
    _emit_single(bwr, 0)  # red (meta high byte)
    _emit_single(bwr, 0)
    _emit_single(bwr, 255)
    _emit_single(bwr, 0)
    wg = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256 + 24)
    wr = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256)
    wb = _emit_normal_code(bwr, {v: 8 for v in range(256)}, 256)
    _emit_single(bwr, 255)
    _emit_single(bwr, 0)
    for y in range(h):
        for x in range(w):
            wg(int(img[y, x, 1]))
            wr(int(img[y, x, 0]))
            wb(int(img[y, x, 2]))
    out = W.decode_vp8l(b"\x2f" + bwr.bytes())
    assert (out == img).all()


def test_fast_path_with_whole_pending_bytes():
    """The reader can enter the literal fast path holding >= 8 pending bits
    (a table decode refills up to max_len+7); those whole bytes are raw
    payload and must be drained first, not crammed into uint8 shifts."""
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)  # r, g, b rows
    # trees: g/r/b fixed-8, alpha + distance single-symbol
    tw = W._BitWriter()
    W._write_fixed8_code(tw, 256 + 24)
    W._write_fixed8_code(tw, 256)
    W._write_fixed8_code(tw, 256)
    _emit_single(tw, 255)
    _emit_single(tw, 0)
    tb = W._BitReader(tw.bytes())
    group = (
        W._read_prefix_code(tb, 256 + 24),
        W._read_prefix_code(tb, 256),
        W._read_prefix_code(tb, 256),
        W._read_prefix_code(tb, 256),
        W._read_prefix_code(tb, 40),
    )
    payload = bytes(
        int(W._REV8[v]) for r, g, b in px for v in (g, r, b)
    )
    for npend in (1, 2):  # 8 and 16 pending bits
        br = W._BitReader(payload[npend:])
        br.acc = int.from_bytes(payload[:npend], "little")
        br.nbits = 8 * npend
        out = W._literal_fast_path(br, 4, group)
        assert out is not None
        got = np.stack(
            [(out >> np.uint32(16)) & 0xFF, (out >> np.uint32(8)) & 0xFF, out & 0xFF],
            axis=-1,
        ).astype(np.uint8)
        assert (got == px).all(), npend


def test_fast_path_matches_general_loop():
    # the vectorized literal fast path and the scalar loop must agree; force
    # the scalar loop by appending an unused cache (cache disables the fast
    # path but changes no decoded bytes for a literal stream... it DOES
    # change insertions only) -> instead compare via a non-uniform alpha
    # tree which disables the fast path
    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, size=(23, 17, 4), dtype=np.uint8)
    arr[..., 3] = np.where(arr[..., 3] > 128, 255, 7)  # 2-symbol alpha
    data = W.encode_webp(arr)  # alpha non-constant -> fixed8 alpha: fast ok
    out_fast = W.decode_webp(data)
    assert (out_fast == arr).all()
