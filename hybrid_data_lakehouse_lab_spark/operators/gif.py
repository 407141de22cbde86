"""GIF87a/89a codec in pure numpy + stdlib — the LZW member of the
codec family (deflate rides zlib, JPEG is DCT/Huffman, μ-law/ADPCM are
companders; GIF's variable-width LSB-first LZW is the one dictionary
coder, implemented from the spec on both sides).

Scope (same honest-slot contract as operators/multimodal.py):
- ENCODER: single-frame GIF89a, global color table (≤256 colors,
  lexicographically sorted so the palette is deterministic), real LZW
  compression (dictionary growth to 12 bits with clear-code resets),
  optional 4-pass interlacing, 255-byte data sub-blocks.
- DECODER: single- or multi-frame streams (first frame returned),
  global and local color tables, interlaced or sequential, graphic
  control / comment / application extensions skipped, full LZW with
  deferred-clear tolerance. Transparency and frame composition are out
  of scope (first-frame pixels only); LZW code overflow and truncated
  streams raise ValueError.

GIF is LOSSLESS for ≤256-color rasters, so the driver-visible lane row
('gif' in multimodal_image_decode) hash-matches the same independent
text-path oracle as BMP/PNG/PPM — the dictionary coder gets the exact
pairing, not a verdict.
"""

from __future__ import annotations

import struct

import numpy as np


class _LsbBitWriter:
    """LSB-first bit packer (GIF's LZW bit order — opposite of JPEG)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= (code & ((1 << width) - 1)) << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.buf)


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream exhausted mid-code")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    clear/EOI codes, dictionary reset at 4096 entries. The code width is
    driven by a MODEL OF THE DECODER's table: the decoder adds one entry
    per code received after the first since a clear — including the
    final data code before EOI — and bumps width when its table reaches
    2^width (GIF does NOT use TIFF's early-change). Tying the width to
    the encoder's own add count instead desyncs exactly when the last
    data code crosses a width boundary (the decoder would then expect
    EOI one bit wider) — hypothesis found that case."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = _LsbBitWriter()
    table: dict = {}
    next_code = 0
    width = min_code_size + 1
    dec_len = 0
    first_since_clear = True

    def reset():
        nonlocal table, next_code, width, dec_len, first_since_clear
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        width = min_code_size + 1
        dec_len = eoi + 1
        first_since_clear = True

    def emit(code: int) -> None:
        nonlocal dec_len, width, first_since_clear
        out.write(code, width)
        if first_since_clear:
            first_since_clear = False
            return
        dec_len += 1  # the decoder grows its table on this code
        if dec_len == (1 << width) and width < 12:
            width += 1

    reset()
    out.write(clear, width)
    w: tuple = ()
    for c in map(int, indices):
        wc = w + (c,)
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code > 4095:
            # the decoder resets on CLEAR instead of adding an entry,
            # so write it directly (no dec_len growth)
            out.write(clear, width)
            reset()
        w = (c,)
    if w:
        emit(table[w])
    out.write(eoi, width)
    return out.flush()


def lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`lzw_compress`; returns uint8 indices. Accepts
    any conforming stream (deferred clears, the KwKwK case)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LsbBitReader(data)
    out = np.empty(n_expected, dtype=np.uint8)
    n = 0
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = reader.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("LZW data before any clear code")
        if code < len(table):
            entry = table[code]
            if code < clear:
                pass
            elif not entry:
                raise ValueError(f"LZW code {code} refers to a control slot")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range")
        if n + len(entry) > n_expected:
            raise ValueError("LZW output exceeds declared pixel count")
        out[n : n + len(entry)] = np.frombuffer(entry, np.uint8)
        n += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n != n_expected:
        raise ValueError(f"LZW yielded {n} pixels, {n_expected} declared")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


def encode_gif(pixels, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (≤256 distinct colors) as a
    single-frame GIF89a with a global color table and real LZW."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    colors, inverse = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF holds at most 256 colors, image has {len(colors)}")
    idx = inverse.reshape(h, w).astype(np.uint8)
    if interlace:
        idx = idx[_interlace_order(h)]
    # color table size: power of two ≥ max(2, n colors)
    ct_bits = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << ct_bits, 3), np.uint8)
    table[: len(colors)] = colors
    min_code = max(2, ct_bits)  # LZW minimum code size (spec floor 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    lzw = lzw_compress(idx.reshape(-1), min_code)
    for at in range(0, len(lzw), 255):
        block = lzw[at : at + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode the first frame of a GIF87a/89a stream → (h, w, 3) RGB
    uint8 (frame composited onto the logical screen at its offset;
    extensions skipped; interlaced rasters de-interlaced)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_ct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        x, y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = global_ct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame has no color table")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = lzw_decompress(bytes(lzw), min_code, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced
            order = _interlace_order(h)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index out of color-table range")
        frame = ct[idx]
        screen = np.zeros((sh, sw, 3), np.uint8)
        screen[y : y + h, x : x + w] = frame
        return screen
    raise ValueError("truncated GIF")
