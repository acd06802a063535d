"""Pure-python GIF87a/89a codec (LZW) — real animation frame decode.

Upgrades ``frame_sample`` from stub to real for animated GIFs: header +
logical screen descriptor, global/local color tables, graphic control
extensions (delay, transparency, disposal 0-3), interlace, and the full
variable-width LZW stream with dictionary reset.  The encoder is
index-based (caller supplies palette indices, no quantization) — enough to
round-trip fixtures and write synthetic animations; photographic GIF
encoding stays out of scope.
"""

from __future__ import annotations

import struct

import numpy as np

from ._hardening import malformed_guard


# --------------------------------------------------------------------------- #
# LZW
# --------------------------------------------------------------------------- #

def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    # bit reader, LSB-first per GIF spec
    acc = nbits = pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream: treat as end
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    # dictionary: store (prefix_code, last_byte); roots are implicit
    prefix = np.zeros(4096, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    stack = bytearray()

    def emit(code: int) -> int:
        """Append code's expansion to out; return its first byte."""
        nonlocal n_out
        stack.clear()
        while code >= clear + 2:
            stack.append(suffix[code])
            code = prefix[code]
        first = code
        stack.append(code)
        k = len(stack)
        if n_out + k > len(out):
            raise ValueError("LZW output exceeds frame size")
        out[n_out : n_out + k] = np.frombuffer(bytes(stack[::-1]), dtype=np.uint8)
        n_out += k
        return first

    width = min_code_size + 1
    next_code = clear + 2
    prev = -1
    while n_out < n_expected:
        code = read(width)
        if code == clear:
            width = min_code_size + 1
            next_code = clear + 2
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            emit(code)
            prev = code
            continue
        if code < next_code:
            first = emit(code)
        elif code == next_code:
            # KwKwK case: expansion = prev's expansion + its first byte
            stack.clear()
            c = prev
            while c >= clear + 2:
                stack.append(suffix[c])
                c = prefix[c]
            first = c
            emit(prev)
            if n_out < len(out):
                out[n_out] = first
                n_out += 1
            else:
                raise ValueError("LZW output exceeds frame size")
        else:
            raise ValueError("corrupt LZW stream (code beyond dictionary)")
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out[:n_out]


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    codes.append((clear, width))
    buf = b""
    for b in indices.tobytes():
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # deferred widen: the decoder's dict additions lag the encoder
            # by one code, so the encoder widens one emission later than
            # "slot count reached 1<<width" — at next_code-1 == 1<<width
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        codes.append((table[buf], width))
    codes.append((eoi, width))
    # pack LSB-first
    acc = nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------- #
# container
# --------------------------------------------------------------------------- #

_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


@malformed_guard("gif")
def decode_gif(data: bytes):
    """-> (frames, delays_cs): frames are (h, w, 4) uint8 RGBA canvases
    after disposal compositing; delays in centiseconds (0 if absent)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    delays: list[int] = []
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    transparent = None
    disposal = 0
    delay = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + n])
            p += n

    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9:  # graphic control
                blk, pos = read_subblocks(pos + 2)
                gflags, delay = blk[0], struct.unpack("<H", blk[1:3])[0]
                transparent = blk[3] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            else:  # application / comment / plain text: skip
                _, pos = read_subblocks(pos + 2)
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02X}")
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        lzw, pos = read_subblocks(pos + 1)
        idx = _lzw_decode(min_code, lzw, fw * fh)
        if len(idx) < fw * fh:
            idx = np.pad(idx, (0, fw * fh - len(idx)))
        idx = idx.reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            de = np.empty_like(idx)
            src = 0
            for start, stepn in _DEINTERLACE_PASSES:
                rows = range(start, fh, stepn)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de

        prev_canvas = canvas.copy()
        rgba = np.dstack([ct[idx], np.full((fh, fw), 255, dtype=np.uint8)])
        if transparent is not None:
            mask = idx == transparent
            region = canvas[fy : fy + fh, fx : fx + fw]
            rgba[mask] = region[mask]
        canvas[fy : fy + fh, fx : fx + fw] = rgba
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore to background = clear the region
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif disposal == 3:  # restore to previous
            canvas = prev_canvas
        transparent = None
        disposal = 0
        delay = 0
    return frames, delays


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays: list[int] | None = None,
) -> bytes:
    """Index frames ((h, w) uint8) + (n, 3) palette -> animated GIF89a."""
    h, w = frames[0].shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size_field = max(bits - 1, 0)
    table = np.zeros((2 << size_field, 3), dtype=np.uint8)
    table[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | size_field, 0, 0)
    out += table.tobytes()
    min_code = max(bits, 2)
    for i, fr in enumerate(frames):
        if fr.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        delay = delays[i] if delays else 0
        out += bytes([0x21, 0xF9, 4, 0x00]) + struct.pack("<H", delay) + b"\x00\x00"
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, fr.astype(np.uint8).ravel())
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
