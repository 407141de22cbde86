"""Baseline JPEG codec (operators/jpeg.py): round-trip quality bounds,
marker structure, spec-valid custom DHT handling, and honest rejection
of the out-of-envelope variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hybrid_data_lakehouse_lab_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _noise(h, w, ch=3, seed=3):
    rng = np.random.default_rng(seed)
    shape = (h, w, ch) if ch else (h, w)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_zigzag_is_the_standard_scan():
    # T.81 Figure 5 first and last entries (public constants)
    zz = list(ZIGZAG)
    assert zz[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert zz[-4:] == [53, 60, 61, 54] or zz[-1] == 63
    assert sorted(zz) == list(range(64))
    assert zz[-1] == 63


def test_flat_image_roundtrips_exactly():
    """A constant block is pure DC: quantization cannot lose it."""
    for v in (0, 1, 127, 128, 200, 255):
        a = np.full((16, 8, 3), v, dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(a, quality=90))
        assert d.shape == a.shape
        assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 1, v


def test_gradient_low_error():
    g = np.linspace(0, 255, 24 * 24 * 3).astype(np.uint8).reshape(24, 24, 3)
    d = decode_jpeg(encode_jpeg(g, quality=90))
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 4


def test_noise_bounded_error_and_quality_monotone():
    a = _noise(8, 8)
    errs = []
    for q in (50, 75, 95):
        d = decode_jpeg(encode_jpeg(a, quality=q))
        errs.append(int(np.abs(d.astype(int) - a.astype(int)).max()))
    assert errs[0] >= errs[-1]  # higher quality, lower worst error
    assert errs[-1] <= 48


def test_corpus_shaped_payloads_within_lane_tolerance():
    """The lane promises max err ≤ JPEG_TOLERANCE at quality 95 on
    cycled ASCII bytes; pin the TIGHTER empirical bound (≤32) here so
    the lane's 48 keeps honest headroom."""
    from hybrid_data_lakehouse_lab_spark.operators.multimodal import JPEG_TOLERANCE

    rng = np.random.default_rng(11)
    worst = 0
    for _ in range(200):
        src = rng.integers(32, 127, rng.integers(5, 200), dtype=np.uint8)
        px = np.resize(src, 60).reshape(4, 5, 3)
        d = decode_jpeg(encode_jpeg(px, quality=95))
        worst = max(worst, int(np.abs(d.astype(int) - px.astype(int)).max()))
    assert worst <= 32 < JPEG_TOLERANCE


def test_grayscale_and_odd_dimensions():
    a = _noise(5, 11, ch=0)
    d = decode_jpeg(encode_jpeg(a, quality=95))
    assert d.shape == (5, 11)
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 16
    c = _noise(4, 5)
    assert decode_jpeg(encode_jpeg(c)).shape == (4, 5, 3)


def test_marker_structure():
    buf = encode_jpeg(_noise(4, 5), quality=90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in buf
    assert buf.count(b"\xff\xc4") >= 4  # 4 DHT segments (DC/AC × Y/C)
    assert buf.count(b"\xff\xdb") >= 2  # 2 DQT segments
    assert b"\xff\xc0" in buf and b"\xff\xda" in buf


def test_byte_stuffing_roundtrip():
    """Force entropy bytes that hit 0xFF (hunt over seeds), prove the
    stuffed stream still decodes."""
    for seed in range(40):
        a = _noise(8, 8, seed=seed)
        buf = encode_jpeg(a, quality=95)
        sos_at = buf.index(b"\xff\xda")
        body = buf[sos_at + 14 : -2]
        if b"\xff\x00" in body:
            d = decode_jpeg(buf)
            assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 48
            return
    pytest.fail("no seed produced a stuffed byte — widen the hunt")


def test_baseline_with_point_transform_rejected():
    """A BASELINE stream claiming a nonzero Ah/Al is malformed (the
    point transform belongs to progressive scans)."""
    buf = bytearray(encode_jpeg(_noise(4, 5)))
    at = buf.index(b"\xff\xda") + 4  # SOS body
    ns = buf[at]
    buf[at + 1 + 2 * ns + 2] = 0x01  # Al = 1
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(buf))


def test_lossless_sof_rejected():
    buf = bytearray(encode_jpeg(_noise(4, 5)))
    at = buf.index(b"\xff\xc0")
    buf[at + 1] = 0xC3  # SOF3 lossless
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(buf))


def test_unsupported_sampling_factor_rejected():
    buf = bytearray(encode_jpeg(_noise(8, 8)))
    at = buf.index(b"\xff\xc0") + 4  # marker + length
    # component 0 h/v sampling byte sits at SOF body offset 7
    buf[at + 7] = 0x31  # 3x1: legal in the spec's grammar, out of envelope
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(bytes(buf))


def test_truncated_and_garbage_rejected():
    buf = encode_jpeg(_noise(4, 5))
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(buf[: len(buf) // 2])
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_decode_image_dispatches_jpeg():
    from hybrid_data_lakehouse_lab_spark.operators.multimodal import decode_image

    a = np.full((8, 8, 3), 99, dtype=np.uint8)
    d = decode_image(encode_jpeg(a, quality=90))
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 1


def test_jpeg_roundtrip_stats_lane(spark):
    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        jpeg_roundtrip_stats,
    )

    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, text.encode(), "text/plain", len(text))],
        "media_id long, payload binary, media_type string, n_bytes int",
    )
    r = jpeg_roundtrip_stats(df, width=5, height=4, quality=95).collect()[0]
    assert (r["width"], r["height"], r["quality"], r["within_tol"]) == (
        5,
        4,
        95,
        True,
    )


def test_chroma_subsampling_roundtrips():
    """4:2:0 and 4:2:2: box-mean chroma downsample + MCU interleave +
    replication upsample. Near-exact on smooth content (the codec's
    regime), exact on flat color, structurally correct SOF factors."""
    g = np.linspace(0, 255, 24 * 28 * 3).astype(np.uint8).reshape(24, 28, 3)
    flat = np.full((20, 21, 3), 130, np.uint8)
    for ss, hv in (("420", 0x22), ("422", 0x21)):
        buf = encode_jpeg(g, quality=95, subsampling=ss)
        at = buf.index(b"\xff\xc0") + 4
        assert buf[at + 7] == hv  # luma sampling factors in SOF
        assert buf[at + 10] == 0x11  # chroma stays 1x1
        d = decode_jpeg(buf)
        assert d.shape == g.shape
        assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 4, ss
        df = decode_jpeg(encode_jpeg(flat, quality=90, subsampling=ss))
        assert int(np.abs(df.astype(int) - flat.astype(int)).max()) <= 1, ss


def test_chroma_subsampling_luma_stays_sharp():
    """Subsampling loses CHROMA only: a grayscale-content RGB image
    (R=G=B, so Cb=Cr=128 everywhere) must round-trip through 4:2:0 as
    tightly as through 4:4:4."""
    base = _noise(16, 16, ch=0)
    a = np.dstack([base, base, base])
    d444 = decode_jpeg(encode_jpeg(a, quality=95))
    d420 = decode_jpeg(encode_jpeg(a, quality=95, subsampling="420"))
    e444 = int(np.abs(d444.astype(int) - a.astype(int)).max())
    e420 = int(np.abs(d420.astype(int) - a.astype(int)).max())
    assert e420 <= e444 + 2, (e420, e444)


def test_subsampling_odd_dimensions():
    for ss in ("420", "422"):
        a = _noise(5, 4)
        assert decode_jpeg(encode_jpeg(a, subsampling=ss)).shape == (5, 4, 3)
        b = _noise(17, 19)
        assert decode_jpeg(encode_jpeg(b, subsampling=ss)).shape == (17, 19, 3)


def test_unknown_subsampling_rejected():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_noise(8, 8), subsampling="411")


def test_restart_intervals_roundtrip():
    """DRI/RSTn: the restarted stream must decode to EXACTLY the same
    pixels as the unrestarted one (restarts change framing, not data),
    with cycling RST0..7 markers and a DRI segment present."""
    a = _noise(24, 40)  # 15 MCUs at 4:4:4
    base = decode_jpeg(encode_jpeg(a, quality=95))
    for ri in (1, 2, 4, 7):
        buf = encode_jpeg(a, quality=95, restart_interval=ri)
        assert b"\xff\xdd" in buf
        assert np.array_equal(decode_jpeg(buf), base), ri
    buf = encode_jpeg(a, quality=95, restart_interval=4)
    rst_counts = [buf.count(bytes([0xFF, 0xD0 + k])) for k in range(8)]
    assert sum(rst_counts) == 3  # 15 MCUs / 4 per segment → 3 boundaries
    assert rst_counts[0] == rst_counts[1] == rst_counts[2] == 1  # cycling


def test_restart_with_subsampling():
    a = _noise(24, 40)
    want = decode_jpeg(encode_jpeg(a, quality=95, subsampling="420"))
    got = decode_jpeg(
        encode_jpeg(a, quality=95, subsampling="420", restart_interval=2)
    )
    assert np.array_equal(got, want)


def test_restart_interval_mismatch_detected():
    """Lying DRI (wrong interval) must fail loudly, not desync."""
    buf = bytearray(encode_jpeg(_noise(24, 40), quality=95, restart_interval=4))
    at = buf.index(b"\xff\xdd") + 4
    struct.pack_into(">H", buf, at, 3)  # claim 3 while markers sit at 4
    with pytest.raises(ValueError, match="RST|marker"):
        decode_jpeg(bytes(buf))


def test_progressive_spectral_selection_roundtrip():
    """SOF2 spectral selection: one interleaved DC scan + per-component
    AC band scans. Same quantized coefficients as baseline, different
    framing — so the decoded pixels must be IDENTICAL to the baseline
    stream's, color and gray, across shapes."""
    for shape in ((20, 29, 3), (8, 8, 3), (5, 4, 3), (9, 7, 0)):
        a = _noise(*shape[:2]) if shape[2] else _noise(*shape[:2], ch=0)
        buf = encode_jpeg(a, quality=95, progressive=True)
        assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf[2:4]
        n_scans = buf.count(b"\xff\xda")
        assert n_scans == (4 if shape[2] else 2)  # DC + AC per component
        assert np.array_equal(
            decode_jpeg(buf), decode_jpeg(encode_jpeg(a, quality=95))
        ), shape


def test_progressive_eobrun_engages():
    """A mostly-flat image makes nearly every AC band all-zero: the AC
    scans collapse into EOBn run codes (stream much smaller than the
    baseline equivalent), and still decode exactly."""
    a = np.full((40, 48, 3), 128, np.uint8)
    a[0, 0] = 255  # one impulse so the stream isn't degenerate
    prog = encode_jpeg(a, quality=75, progressive=True)
    base = encode_jpeg(a, quality=75)
    # EOBn collapses whole runs of blocks into one code; even with the
    # extra SOS headers the progressive stream comes out smaller
    assert len(prog) < len(base)
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_progressive_encode_guards():
    with pytest.raises(NotImplementedError, match="4:4:4"):
        encode_jpeg(_noise(8, 8), progressive=True, subsampling="420")
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(_noise(8, 8), progressive=True, restart_interval=2)


def test_successive_approximation_roundtrip():
    """Full successive approximation (the script real progressive web
    JPEGs use): DC/AC first passes at Al=1, refinement passes at
    Ah=1/Al=0 with correction bits buffered through EOB runs. SA is a
    lossless re-framing of the same quantized coefficients, so decoded
    pixels must be IDENTICAL to the baseline stream's — any desync in
    the refinement bit flow breaks this immediately."""
    for seed in range(6):
        a = _noise(20, 29, seed=seed)
        base = decode_jpeg(encode_jpeg(a, quality=95))
        sa = decode_jpeg(
            encode_jpeg(a, quality=95, progressive=True, successive=True)
        )
        assert np.array_equal(sa, base), seed
    g = _noise(9, 7, ch=0)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=95, progressive=True, successive=True)),
        decode_jpeg(encode_jpeg(g, quality=95)),
    )
    # EOBRUN-heavy: correction bits must flow through long EOB runs
    flat = np.full((40, 40, 3), 128, np.uint8)
    flat[3, 3] = 200
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, quality=60, progressive=True, successive=True)),
        decode_jpeg(encode_jpeg(flat, quality=60)),
    )


def test_sa_scan_structure():
    buf = encode_jpeg(_noise(16, 16), quality=90, progressive=True, successive=True)
    assert buf.count(b"\xff\xda") == 8  # (DC + 3×AC) first + refine
    with pytest.raises(ValueError, match="progressive"):
        encode_jpeg(_noise(8, 8), successive=True)

def test_sa_refine_zrl_correction_bit_order():
    """Round-7 regression (ADVICE r6, jpeg.py ac_refine): pending ZRLs
    must be emitted — and buffered correction bits flushed — at EVERY
    nonzero coefficient before the already-significant branch, exactly
    as jcphuff.c does, not only at newly-significant (t==1) ones.
    Otherwise a correction bit for a coefficient beyond a ZRL's 16-zero
    span lands before the next Huffman code and the decoder consumes it
    as code bits (~2% of random grayscale images failed). A 120-image
    grayscale fuzz at the failing shape regime must round-trip
    bit-identically to the non-SA progressive stream."""
    rng = np.random.default_rng(99)
    for _ in range(120):
        h, w = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        sa = decode_jpeg(encode_jpeg(img, progressive=True, successive=True))
        base = decode_jpeg(encode_jpeg(img, progressive=True, successive=False))
        assert np.array_equal(sa, base)
