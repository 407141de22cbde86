"""Property-based hardening (hypothesis) for the pure-numpy codec
family: lossless codecs must round-trip EXACTLY on arbitrary inputs and
shapes; lossy codecs must respect their published bounds and fixed
points; the Avro container must round-trip arbitrary values of its
supported types. These complement the example-based tests — the codecs
parse adversarial byte layouts at 100 TB corpus scale, so 'works on the
three shapes I tried' is not enough."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    decode_video_frames,
    encode_avi,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
    mulaw_compress,
    mulaw_expand,
)

# Deterministic-per-example pixel content derived from hypothesis ints —
# cheaper shrinking than full array strategies at equal coverage.


def _pixels(h, w, ch, seed):
    n = h * w * (ch or 1)
    vals = (np.arange(n, dtype=np.int64) * (2 * seed + 1) + seed * 7) % 256
    a = vals.astype(np.uint8)
    return a.reshape(h, w) if ch == 0 else a.reshape(h, w, ch)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    ch=st.sampled_from([0, 2, 3, 4]),  # gray, gray+alpha, RGB, RGBA
    seed=st.integers(0, 10_000),
    filters=st.lists(st.integers(0, 4), min_size=9, max_size=9),
)
def test_png_roundtrip_exact(h, w, ch, seed, filters):
    a = _pixels(h, w, ch, seed)
    dec = decode_image(encode_png(a, filters=filters[:h]))
    assert dec.shape == a.shape
    assert np.array_equal(dec, a)


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 9), w=st.integers(1, 9), seed=st.integers(0, 10_000))
def test_png_palette_roundtrip_exact(h, w, seed):
    # quantize to 4 levels/channel → ≤ 64 distinct colors, palette always fits
    a = (_pixels(h, w, 3, seed) // 64 * 64).astype(np.uint8)
    dec = decode_image(encode_png(a, palette=True))
    assert np.array_equal(dec, a)


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 9), w=st.integers(1, 9), seed=st.integers(0, 10_000))
def test_bmp_ppm_roundtrip_exact(h, w, seed):
    a = _pixels(h, w, 3, seed)
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    assert np.array_equal(decode_image(encode_ppm(a)), a)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    seed=st.integers(0, 10_000),
    fps=st.integers(1, 60),
)
def test_avi_raw_roundtrip_exact(n, h, w, seed, fps):
    a = np.stack([_pixels(h, w, 3, seed + i) for i in range(n)])
    dec, got_fps = decode_video_frames(encode_avi(a, fps=fps))
    assert got_fps == fps
    assert np.array_equal(dec, a)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 64),
    ch=st.sampled_from([1, 2]),
    seed=st.integers(0, 10_000),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_pcm16_roundtrip_exact(n, ch, seed, rate):
    vals = ((np.arange(n * ch, dtype=np.int64) * (seed * 2 + 1)) % 65536) - 32768
    a = vals.astype(np.int16).reshape(n, ch)
    dec, got_rate = decode_audio(encode_wav(a, sample_rate=rate))
    assert got_rate == rate
    assert np.array_equal(dec, a)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64))
def test_mulaw_fixed_point_and_order(vals):
    s = np.array(vals, dtype=np.int16)
    d = mulaw_expand(mulaw_compress(s))
    # codec fixed point: re-encoding decoded output is stable
    assert np.array_equal(mulaw_expand(mulaw_compress(d)), d)
    # error bounded by the top segment's half step
    assert int(np.abs(d.astype(np.int32) - s.astype(np.int32)).max()) <= 1024
    # order preservation (companding is monotone)
    ds = mulaw_expand(mulaw_compress(np.sort(s)))
    assert (np.diff(ds.astype(np.int32)) >= 0).all()


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 3), w=st.integers(1, 3), seed=st.integers(0, 10_000),
    quality=st.sampled_from([75, 90, 95]),
)
def test_jpeg_bounded_error(h, w, seed, quality):
    a = _pixels(8 * h, 8 * w, 3, seed)
    from hybrid_data_lakehouse_lab_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    dec = decode_jpeg(encode_jpeg(a, quality=quality))
    assert dec.shape == a.shape
    err = int(np.abs(dec.astype(int) - a.astype(int)).max())
    assert err <= (64 if quality >= 90 else 128)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "a": st.integers(-(2**62), 2**62),
                "b": st.one_of(st.none(), st.text(max_size=20)),
                "d": st.lists(st.integers(-(2**40), 2**40), max_size=8),
                "e": st.booleans(),
                "g": st.binary(max_size=16),
            }
        ),
        min_size=0,
        max_size=10,
    ),
    st.sampled_from(["null", "deflate"]),
)
def test_avro_roundtrip_arbitrary_values(tmp_path_factory, recs, codec):
    from hybrid_data_lakehouse_lab_spark.operators.avro_io import (
        read_avro,
        write_avro,
    )

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "d", "type": {"type": "array", "items": "long"}},
            {"name": "e", "type": "boolean"},
            {"name": "g", "type": "bytes"},
        ],
    }
    p = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_avro(p, schema, recs, codec=codec)
    _, back = read_avro(p)
    assert back == recs


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 7),
    w=st.integers(1, 7),
    ch=st.sampled_from([0, 2, 3, 4]),
    seed=st.integers(0, 10_000),
    filters=st.lists(st.integers(0, 4), min_size=7, max_size=7),
)
def test_png_16bit_roundtrip_exact(h, w, ch, seed, filters):
    n = h * w * (ch or 1)
    vals = (np.arange(n, dtype=np.int64) * (2 * seed + 1) + seed) % 65536
    a = vals.astype(np.uint16).reshape((h, w) if ch == 0 else (h, w, ch))
    dec = decode_image(encode_png(a, filters=filters[:h]))
    assert dec.dtype == np.uint16 and dec.shape == a.shape
    assert np.array_equal(dec, a)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    ch=st.sampled_from([0, 2, 3, 4]),
    seed=st.integers(0, 10_000),
)
def test_png_adam7_roundtrip_exact(h, w, ch, seed):
    a = _pixels(h, w, ch, seed)
    dec = decode_image(encode_png(a, interlace=True))
    assert dec.shape == a.shape
    assert np.array_equal(dec, a)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    nlevels=st.sampled_from([2, 4, 16, 64]),
    seed=st.integers(0, 10_000),
    interlace=st.booleans(),
)
def test_gif_roundtrip_exact(h, w, nlevels, seed, interlace):
    from hybrid_data_lakehouse_lab_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )

    a = (_pixels(h, w, 3, seed) // (256 // nlevels) * (256 // nlevels)).astype(
        np.uint8
    )
    dec = decode_gif(encode_gif(a, interlace=interlace))
    assert dec.shape == a.shape
    assert np.array_equal(dec, a)
