"""GIF/LZW codec (operators/gif.py): dictionary-coder round-trips
through the variable-width boundaries, container structure, interlace,
and honest rejections."""

from __future__ import annotations

import numpy as np
import pytest

from hybrid_data_lakehouse_lab_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_compress,
    lzw_decompress,
)
from hybrid_data_lakehouse_lab_spark.operators.multimodal import decode_image


def _paletted(h, w, ncolors, seed=7):
    rng = np.random.default_rng(seed)
    pal = np.unique(rng.integers(0, 256, (ncolors, 3), dtype=np.uint8), axis=0)
    return pal[rng.integers(0, len(pal), (h, w))]


def test_lzw_roundtrip_through_width_boundaries():
    """Streams long enough to cross the 512/1024/2048/4096 dictionary
    boundaries (code width 9→12 and clear-code resets)."""
    rng = np.random.default_rng(3)
    for ncolors, n in ((2, 50), (16, 1000), (200, 20000), (256, 120000)):
        idx = rng.integers(0, ncolors, n).astype(np.uint8)
        mc = max(2, int(ncolors - 1).bit_length())
        assert np.array_equal(lzw_decompress(lzw_compress(idx, mc), mc, n), idx)


def test_lzw_kwkwk_case():
    """code == next_code (the KwKwK self-reference) must reconstruct."""
    idx = np.array([0, 0, 0, 0, 0, 0, 0], dtype=np.uint8)  # forces it fast
    assert np.array_equal(lzw_decompress(lzw_compress(idx, 2), 2, 7), idx)


def test_gif_roundtrip_and_structure():
    a = _paletted(9, 13, 30)
    buf = encode_gif(a)
    assert buf[:6] == b"GIF89a" and buf[-1] == 0x3B
    assert np.array_equal(decode_gif(buf), a)
    assert np.array_equal(decode_image(buf), a)  # dispatch


def test_gif_interlaced_roundtrip():
    a = _paletted(13, 7, 12)
    buf = encode_gif(a, interlace=True)
    assert np.array_equal(decode_gif(buf), a)


def test_gif_compresses_repetition():
    flat = np.zeros((64, 64, 3), np.uint8)
    assert len(encode_gif(flat)) < 200  # vs 12288 raw


def test_gif_sub_block_reassembly():
    """A >255-byte LZW stream must split into multiple sub-blocks and
    reassemble."""
    a = _paletted(40, 40, 250, seed=11)
    buf = encode_gif(a)
    # at least one full 255-byte sub-block present
    assert bytes([255]) in buf
    assert np.array_equal(decode_gif(buf), a)


def test_gif_extensions_skipped():
    """Splice a graphic-control extension before the image descriptor —
    the decoder must walk past it."""
    a = _paletted(4, 5, 6)
    buf = bytearray(encode_gif(a))
    at = buf.index(0x2C, 13)  # image descriptor
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    patched = bytes(buf[:at]) + gce + bytes(buf[at:])
    assert np.array_equal(decode_gif(patched), a)


def test_gif_rejections():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF....")
    rng = np.random.default_rng(1)
    toomany = rng.integers(0, 256, (17, 17, 3), dtype=np.uint8)
    # ensure > 256 distinct colors
    toomany = np.stack(
        [np.arange(289) // 256, np.arange(289) % 256, np.zeros(289)], axis=1
    ).astype(np.uint8).reshape(17, 17, 3)
    with pytest.raises(ValueError, match="256"):
        encode_gif(toomany)
    a = _paletted(4, 5, 6)
    buf = encode_gif(a)
    with pytest.raises(ValueError):
        decode_gif(buf[: len(buf) // 2])
