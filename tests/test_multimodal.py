"""Multimodal plumbing: binary columns, Arrow-batched feature extraction,
stubbed decode contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    as_media_table,
    decode_image,
    extract_features,
)
from hybrid_data_lakehouse_lab_spark.sources import load_table


def test_media_table_schema(spark, sf_dir):
    media = as_media_table(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint",
        "binary",
        "string",
        "int",
    ]
    r = media.limit(1).collect()[0]
    assert isinstance(r["payload"], (bytes, bytearray))
    assert r["n_bytes"] == len(r["payload"])


def test_feature_extraction_deterministic(spark, sf_dir):
    media = as_media_table(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in
           load_table(spark, sf_dir, "documents").collect()}
    sample = list(src)[:5]
    for i in sample:
        raw = src[i].encode()
        assert rows[i]["byte_sum"] == sum(raw)
        assert rows[i]["n_bytes"] == len(raw)
        assert rows[i]["byte_histogram_head"] == [raw.count(b) for b in range(8)]


def test_decode_stub_contract():
    # unknown magic stays an honest NotImplementedError (JPEG/PNG/GIF
    # are real as of r6); a JPEG-looking but malformed payload is a
    # ValueError from the real decoder, not a missing feature
    with pytest.raises(NotImplementedError):
        decode_image(b"II*\x00tiff-ish")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0jpeg-ish")


# ---------------------------------------------------------------------------
# Real raster decode: BMP / PPM / PGM round-trips through pure numpy
# ---------------------------------------------------------------------------


def _arr(h, w, seed=7):
    import numpy as np

    return (
        (np.arange(h * w * 3, dtype=np.int64) * 31 + seed) % 251
    ).astype("uint8").reshape(h, w, 3)


def test_bmp_roundtrip_with_padding():
    """w=5 -> 15-byte rows padded to 16; decode must strip the pad and
    undo the bottom-up + BGR storage."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_bmp

    a = _arr(4, 5)
    assert np.array_equal(decode_image(encode_bmp(a)), a)


def test_bmp_roundtrip_aligned_width():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_bmp

    a = _arr(3, 8)  # 24-byte rows, no padding
    assert np.array_equal(decode_image(encode_bmp(a)), a)


def test_bmp_top_down_variant():
    """Negative height = top-down row order; the decoder must not flip."""
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_bmp

    a = _arr(4, 5)
    buf = bytearray(encode_bmp(a))
    h = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -h)  # declare top-down
    decoded = decode_image(bytes(buf))
    # payload rows were written bottom-up; read top-down they come back
    # reversed — proving the decoder honors the sign, not a cancel-out
    assert np.array_equal(decoded, a[::-1])


def test_bmp_rejects_unsupported_bpp():
    import struct

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_bmp

    buf = bytearray(encode_bmp(_arr(2, 2)))
    struct.pack_into("<H", buf, 28, 8)  # claim 8-bit palette
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_image(bytes(buf))


def test_ppm_roundtrip_and_comments():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_ppm

    a = _arr(4, 5)
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    # header comments are legal PNM and must be skipped
    with_comment = b"P6\n# made by a test\n5 4\n255\n" + a.tobytes()
    assert np.array_equal(decode_image(with_comment), a)


def test_pgm_grayscale():
    import numpy as np

    a = (_arr(3, 4)[:, :, 0]).copy()
    payload = b"P5\n4 3\n255\n" + a.tobytes()
    assert np.array_equal(decode_image(payload), a)


# ---------------------------------------------------------------------------
# Real PNG decode: stdlib-zlib inflate + CRC chunk walk + all 5 unfilters
# ---------------------------------------------------------------------------


def test_png_roundtrip_each_filter_type():
    """One image per filter type, every row forced to that filter —
    each of the five unfilter paths must reconstruct exactly."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    a = _arr(6, 5)
    for f in range(5):
        buf = encode_png(a, filters=[f] * 6)
        assert np.array_equal(decode_image(buf), a), f"filter {f}"


def test_png_roundtrip_mixed_filters_default_cycle():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    a = _arr(7, 4)  # default cycle (y+4)%5 hits all five types
    assert np.array_equal(decode_image(encode_png(a)), a)


def test_png_grayscale_roundtrip():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    a = (_arr(5, 6)[:, :, 1]).copy()
    dec = decode_image(encode_png(a))
    assert dec.shape == (5, 6)
    assert np.array_equal(dec, a)


def test_png_multi_idat_and_ancillary_chunks():
    """The encoder splits IDAT in two and plants a tEXt chunk before
    them; prove the payload really has that shape so the decoder's
    reassembly/skip paths are the ones being tested."""
    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    buf = encode_png(_arr(4, 5))
    assert buf.count(b"IDAT") == 2
    assert b"tEXt" in buf


def test_png_crc_corruption_detected():
    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    buf = bytearray(encode_png(_arr(4, 5)))
    i = buf.index(b"IDAT") + 8  # corrupt a byte inside IDAT data
    buf[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(buf))


def test_png_rejects_unsupported_variants():
    import struct

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    def with_ihdr_byte(offset_in_ihdr: int, value: int) -> bytes:
        import zlib

        buf = bytearray(encode_png(_arr(2, 2)))
        ihdr_at = buf.index(b"IHDR")
        data_at = ihdr_at + 4
        buf[data_at + offset_in_ihdr] = value
        crc = zlib.crc32(bytes(buf[ihdr_at : data_at + 13])) & 0xFFFFFFFF
        struct.pack_into(">I", buf, data_at + 13, crc)
        return bytes(buf)

    with pytest.raises(NotImplementedError, match="bit"):
        decode_image(with_ihdr_byte(8, 4))  # sub-byte depth
    with pytest.raises(NotImplementedError, match="color_type"):
        decode_image(with_ihdr_byte(9, 7))  # invalid color type
    with pytest.raises(ValueError, match="PLTE"):
        # claiming palette without a PLTE chunk is a hard error, not a
        # missing feature — color type 3 itself is supported
        decode_image(with_ihdr_byte(9, 3))
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_image(with_ihdr_byte(12, 2))  # invalid interlace method
        # (Adam7 itself, value 1, is supported as of this round)


def test_png_palette_roundtrip_each_filter_type():
    """Indexed-color round-trip through every filter type: the filter
    pipeline runs on the 1-byte index plane (bpp=1), the PLTE lookup
    restores the exact RGB raster."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    a = _arr(6, 5)
    for f in range(5):
        buf = encode_png(a, filters=[f] * 6, palette=True)
        assert b"PLTE" in buf
        assert np.array_equal(decode_image(buf), a), f"filter {f}"


def test_png_palette_deduplicates_colors():
    """A 2-color image yields a 2-entry PLTE regardless of pixel count."""
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    a = np.zeros((8, 8, 3), dtype=np.uint8)
    a[::2] = [200, 10, 30]
    buf = encode_png(a, palette=True)
    at = buf.index(b"PLTE")
    (ln,) = struct.unpack_from(">I", buf, at - 4)
    assert ln == 2 * 3
    assert np.array_equal(decode_image(buf), a)


def test_png_palette_too_many_colors_rejected():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    idx = np.arange(17 * 17)  # 289 distinct (r, g, b) triples
    a = np.stack([idx // 256, idx % 256, np.zeros_like(idx)], axis=1).astype(
        np.uint8
    ).reshape(17, 17, 3)
    with pytest.raises(ValueError, match="256"):
        encode_png(a, palette=True)


def test_png_palette_out_of_range_index_rejected():
    """Corrupt the palette: shrink PLTE below the max index used (fix
    the CRC so the chunk walk passes) — decode must fail on the index
    bound, per spec, not silently wrap."""
    import struct
    import zlib

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    a = _arr(4, 5)
    buf = bytearray(encode_png(a, palette=True))
    at = buf.index(b"PLTE")
    (ln,) = struct.unpack_from(">I", buf, at - 4)
    assert ln > 3
    new_ln = 3  # keep one palette entry
    data = bytes(buf[at + 4 : at + 4 + new_ln])
    crc = zlib.crc32(b"PLTE" + data) & 0xFFFFFFFF
    patched = (
        bytes(buf[: at - 4])
        + struct.pack(">I", new_ln)
        + b"PLTE"
        + data
        + struct.pack(">I", crc)
        + bytes(buf[at + 4 + ln + 4 :])
    )
    with pytest.raises(ValueError, match="out of range"):
        decode_image(patched)


def test_png_truncated_payload_rejected():
    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    buf = encode_png(_arr(3, 3))
    with pytest.raises(ValueError):
        decode_image(buf[: len(buf) - 20])


def test_image_decode_stats_lane(spark):
    """The Spark-side kernel over real encode->decode: stats must match
    a direct numpy derivation from the payload bytes."""
    import hashlib

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        image_decode_stats,
    )

    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, text.encode(), "text/plain", len(text))],
        "media_id long, payload binary, media_type string, n_bytes int",
    )
    rows = {r["fmt"]: r for r in image_decode_stats(df).collect()}
    assert set(rows) == {"bmp", "gif", "png", "png_pal", "ppm"}
    px = np.resize(np.frombuffer(text.encode(), dtype=np.uint8), 60)
    for fmt in ("bmp", "gif", "png", "png_pal", "ppm"):
        r = rows[fmt]
        assert (r["width"], r["height"]) == (5, 4)
        assert r["pix_md5"] == hashlib.md5(px.tobytes()).hexdigest()
        assert r["row0_sum"] == int(px[:15].sum())
        assert r["r_sum"] == int(px[0::3].sum())
        assert r["g_sum"] == int(px[1::3].sum())
        assert r["b_sum"] == int(px[2::3].sum())


def test_null_payload_handled(spark):
    df = spark.createDataFrame(
        [(1, None, "image/png", None)],
        "media_id long, payload binary, media_type string, n_bytes int",
    )
    r = extract_features(df).collect()[0]
    assert r["byte_sum"] == 0 and r["n_bytes"] == 0


# ---------------------------------------------------------------------------
# Real WAV/PCM16 decode: chunk-walking RIFF parser
# ---------------------------------------------------------------------------


def test_wav_roundtrip_stereo():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    a = ((np.arange(48, dtype=np.int32) * 977 - 23000) % 65536 - 32768).astype(
        "int16"
    ).reshape(-1, 2)
    dec, rate = decode_audio(encode_wav(a, sample_rate=22050))
    assert rate == 22050
    assert dec.shape == a.shape
    assert np.array_equal(dec, a)


def test_wav_roundtrip_mono():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    a = np.array([0, 1, -1, 32767, -32768, 100], dtype="int16")
    dec, rate = decode_audio(encode_wav(a))
    assert dec.shape == (6, 1)
    assert np.array_equal(dec[:, 0], a)


def test_wav_chunk_walker_required():
    """The encoder plants a LIST chunk before data; a byte-44 decoder
    would read garbage. Verify data really sits past the junk."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_wav

    a = np.array([[1000, -1000]], dtype="int16")
    buf = encode_wav(a)
    assert buf[36:40] != b"data"  # naive offset assumption is wrong here
    assert b"LIST" in buf


def test_wav_rejects_non_pcm():
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    buf = bytearray(encode_wav(np.array([1, 2], dtype="int16")))
    # fmt chunk body starts right after 'fmt '+size at offset 12+8=20
    struct.pack_into("<H", buf, 20, 3)  # IEEE float format tag
    with pytest.raises(NotImplementedError, match="PCM16"):
        decode_audio(bytes(buf))
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish")


# ---------------------------------------------------------------------------
# Real AVI decode: word-aligned RIFF walk + uncompressed DIB frames
# ---------------------------------------------------------------------------


def test_avi_roundtrip():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi,
    )

    a = np.stack([_arr(4, 5), _arr(4, 5)[::-1], _arr(4, 5)[:, ::-1]])
    dec, fps = decode_video_frames(encode_avi(a, fps=24))
    assert fps == 24
    assert dec.shape == a.shape
    assert np.array_equal(dec, a)


def test_avi_junk_chunk_and_alignment():
    """The encoder plants an ODD-sized JUNK chunk between hdrl and movi:
    prove it's there (so the decoder's skip + word-alignment paths are
    the ones under test), and that stride padding engages at w=5."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi,
    )

    a = _arr(4, 5).reshape(1, 4, 5, 3)
    buf = encode_avi(a)
    at = buf.index(b"JUNK")
    import struct

    (ln,) = struct.unpack_from("<I", buf, at + 4)
    assert ln % 2 == 1  # odd payload ⇒ pad byte exercised
    assert b"idx1" in buf
    dec, _ = decode_video_frames(buf)
    assert np.array_equal(dec[0], a[0])


def test_avi_frame_count_mismatch_rejected():
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi,
    )

    a = np.stack([_arr(4, 5), _arr(4, 5)])
    buf = bytearray(encode_avi(a))
    at = buf.index(b"avih") + 8
    struct.pack_into("<I", buf, at + 16, 5)  # declare 5 frames, movi has 2
    with pytest.raises(ValueError, match="declares 5"):
        decode_video_frames(bytes(buf))


def test_avi_compressed_stream_rejected():
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi,
    )

    buf = bytearray(encode_avi(_arr(4, 5).reshape(1, 4, 5, 3)))
    at = buf.index(b"strf") + 8
    # 'MJPG' is a SUPPORTED codec now — claiming it over raw DIB frames
    # is a malformed stream (frames aren't JPEGs), not a missing feature
    struct.pack_into("<I", buf, at + 16, 1196444237)
    with pytest.raises(ValueError, match="SOI"):
        decode_video_frames(bytes(buf))
    buf2 = bytearray(encode_avi(_arr(4, 5).reshape(1, 4, 5, 3)))
    at2 = buf2.index(b"strf") + 8
    struct.pack_into("<H", buf2, at2 + 14, 8)  # 8-bit depth
    with pytest.raises(NotImplementedError, match="bpp=8"):
        decode_video_frames(bytes(buf2))


def test_avi_truncation_rejected():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi,
    )

    buf = encode_avi(np.stack([_arr(4, 5)]))
    with pytest.raises(ValueError):
        decode_video_frames(buf[:-10])
    with pytest.raises(ValueError, match="RIFF"):
        decode_video_frames(b"nonsense")


def test_video_decode_stats_lane(spark):
    """The Spark-side kernel over real AVI encode->decode: stats must
    match a direct numpy derivation from the payload bytes."""
    import hashlib

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        video_decode_stats,
    )

    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, text.encode(), "text/plain", len(text))],
        "media_id long, payload binary, media_type string, n_bytes int",
    )
    r = video_decode_stats(df, n_frames=2, width=5, height=4, fps=10).collect()[0]
    px = np.resize(np.frombuffer(text.encode(), dtype=np.uint8), 120)
    assert (r["n_frames"], r["width"], r["height"], r["fps"]) == (2, 5, 4, 10)
    assert r["frames_md5"] == hashlib.md5(px.tobytes()).hexdigest()
    assert r["frame0_sum"] == int(px[:60].sum())
    assert r["row0_sum"] == int(px[:15].sum())
    assert r["r_sum"] == int(px[0::3].sum())
    assert r["g_sum"] == int(px[1::3].sum())
    assert r["b_sum"] == int(px[2::3].sum())


# ---------------------------------------------------------------------------
# G.711 mu-law: a real compressed audio codec, integer-exact
# ---------------------------------------------------------------------------


def test_mulaw_matches_cpython_audioop():
    """Bit-identical to the stdlib's C implementation (g711.c lineage)
    over the ENTIRE int16 domain, both directions. audioop is deprecated
    (removed in 3.13) so the cross-check gates on availability; the
    SQL-oracle lane keeps the independent verification either way."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        mulaw_compress,
        mulaw_expand,
    )

    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
    except ImportError:
        pytest.skip("stdlib audioop not available")
    s = np.arange(-32768, 32768, dtype=np.int16)
    u = mulaw_compress(s)
    assert np.array_equal(
        u, np.frombuffer(audioop.lin2ulaw(s.tobytes(), 2), np.uint8)
    )
    assert np.array_equal(
        mulaw_expand(u), np.frombuffer(audioop.ulaw2lin(u.tobytes(), 2), "<i2")
    )


def test_mulaw_codec_fixed_point_and_error_bound():
    """expand∘compress is idempotent on its own output (codec fixed
    point) and the quantization error is bounded by the top segment's
    half-step."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        mulaw_compress,
        mulaw_expand,
    )

    s = np.arange(-32768, 32768, dtype=np.int16)
    d = mulaw_expand(mulaw_compress(s))
    assert np.array_equal(mulaw_expand(mulaw_compress(d)), d)
    assert int(np.abs(d.astype(np.int32) - s.astype(np.int32)).max()) <= 1024
    # monotone non-decreasing: companding preserves order
    assert (np.diff(d.astype(np.int32)) >= 0).all()


def test_wav_mulaw_roundtrip():
    """Format tag 7 WAV: half the bytes of PCM16, decoded samples equal
    the companded values, channels de-interleaved."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        mulaw_compress,
        mulaw_expand,
    )

    a = ((np.arange(48, dtype=np.int32) * 977 - 23000) % 65536 - 32768).astype(
        "int16"
    ).reshape(-1, 2)
    buf = encode_wav(a, sample_rate=8000, codec="mulaw")
    pcm_buf = encode_wav(a, sample_rate=8000)
    assert len(buf) == len(pcm_buf) - 48  # one byte/sample vs two
    dec, rate = decode_audio(buf)
    assert rate == 8000
    assert np.array_equal(dec, mulaw_expand(mulaw_compress(a)))


def test_wav_other_codecs_still_rejected():
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    buf = bytearray(encode_wav(np.zeros(4, dtype="int16")))
    at = buf.index(b"fmt ") + 8  # past fourcc + size: wFormatTag
    struct.pack_into("<H", buf, at, 2)  # MS-ADPCM tag with bits=16
    with pytest.raises(NotImplementedError, match="fmt=2"):
        decode_audio(bytes(buf))


# ---------------------------------------------------------------------------
# Motion-JPEG AVI: the two codecs composed (compressed video)
# ---------------------------------------------------------------------------


def test_mjpeg_avi_roundtrip_bounded():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        JPEG_TOLERANCE,
        decode_video_frames,
        encode_avi,
    )

    a = np.stack([_arr(8, 8), _arr(8, 8)[::-1], _arr(8, 8, seed=13)])
    buf = encode_avi(a, fps=24, codec="mjpeg", quality=95)
    assert b"MJPG" in buf and b"00dc" in buf and b"00db" not in buf
    dec, fps = decode_video_frames(buf)
    assert fps == 24 and dec.shape == a.shape
    assert int(np.abs(dec.astype(int) - a.astype(int)).max()) <= JPEG_TOLERANCE


def test_mjpeg_frames_are_standalone_jpegs():
    """Every '00dc' chunk must start with SOI and end with EOI — the
    MJPEG contract (each frame independently decodable)."""
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_avi

    buf = encode_avi(np.stack([_arr(4, 5), _arr(4, 5)[::-1]]), codec="mjpeg")
    at = buf.index(b"movi") + 4
    seen = 0
    while buf[at : at + 4] == b"00dc":
        (size,) = struct.unpack_from("<I", buf, at + 4)
        frame = buf[at + 8 : at + 8 + size]
        assert frame[:2] == b"\xff\xd8" and frame[-2:] == b"\xff\xd9"
        seen += 1
        at += 8 + size + (size & 1)
    assert seen == 2


def test_mjpeg_dim_mismatch_rejected():
    """A frame whose JPEG dims disagree with the AVI header is a hard
    error, not a silent crop."""
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi,
    )

    buf = bytearray(encode_avi(np.stack([_arr(4, 5)]), codec="mjpeg"))
    at = buf.index(b"avih") + 8
    struct.pack_into("<I", buf, at + 32, 7)  # lie: width = 7
    with pytest.raises(ValueError, match="dims"):
        decode_video_frames(bytes(buf))


def test_unknown_video_codec_still_rejected():
    import struct

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi,
    )

    buf = bytearray(encode_avi(np.stack([_arr(4, 5)])))
    at = buf.index(b"strf") + 8
    struct.pack_into("<I", buf, at + 16, 0x64697663)  # 'cvid'
    with pytest.raises(NotImplementedError, match="compression"):
        decode_video_frames(bytes(buf))


def test_mjpeg_stats_lane(spark):
    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        mjpeg_roundtrip_stats,
    )

    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, text.encode(), "text/plain", len(text))],
        "media_id long, payload binary, media_type string, n_bytes int",
    )
    r = mjpeg_roundtrip_stats(df).collect()[0]
    assert (
        r["n_frames"], r["width"], r["height"], r["fps"], r["within_tol"]
    ) == (2, 5, 4, 10, True)


def test_png_rgba_and_gray_alpha_roundtrip():
    """Color types 6 and 4: the filter pipeline is bpp-generic, so
    alpha round-trips exactly through every filter type."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    rgba = np.dstack([_arr(6, 5), (_arr(6, 5, seed=21)[:, :, 0])])
    assert rgba.shape == (6, 5, 4)
    for f in range(5):
        dec = decode_image(encode_png(rgba, filters=[f] * 6))
        assert dec.shape == (6, 5, 4)
        assert np.array_equal(dec, rgba), f"filter {f}"
    ga = rgba[:, :, :2].copy()
    dec = decode_image(encode_png(ga))
    assert dec.shape == (6, 5, 2)
    assert np.array_equal(dec, ga)


def test_png_16bit_roundtrip_all_color_types():
    """Depth 16: big-endian sample pairs, filters on the byte plane
    (bpp doubles) — exact round-trip for gray/GA/RGB/RGBA through every
    filter type; palette at 16 bits is invalid per spec and rejected."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    base = (np.arange(6 * 5, dtype=np.int64) * 9973 % 65536).astype(np.uint16)
    for nch in (0, 2, 3, 4):
        a = (
            base.reshape(6, 5)
            if nch == 0
            else np.stack([(base + i * 31) % 65536 for i in range(nch)], axis=-1)
            .reshape(6, 5, nch)
            .astype(np.uint16)
        )
        for f in range(5):
            dec = decode_image(encode_png(a, filters=[f] * 6))
            assert dec.dtype == np.uint16 and dec.shape == a.shape
            assert np.array_equal(dec, a), (nch, f)
    with pytest.raises(ValueError, match="8-bit"):
        encode_png(base.reshape(6, 5, 1).repeat(3, -1), palette=True)


def test_png_adam7_interlaced_roundtrip():
    """Adam7: seven independently-filtered passes, scattered back —
    exact for every color type, both depths, palette included, and for
    dims small enough that some passes are EMPTY (1×1 has six empty
    passes)."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    a = _arr(13, 11)
    buf = encode_png(a, interlace=True)
    assert buf[8 + 4 + 4 + 12] == 1  # IHDR interlace byte
    assert np.array_equal(decode_image(buf), a)
    one = _arr(1, 1)
    assert np.array_equal(decode_image(encode_png(one, interlace=True)), one)
    pal = (_arr(9, 7) // 64 * 64).astype(np.uint8)
    assert np.array_equal(
        decode_image(encode_png(pal, palette=True, interlace=True)), pal
    )
    hi = (np.arange(9 * 7 * 3, dtype=np.int64) * 9973 % 65536).astype(
        np.uint16
    ).reshape(9, 7, 3)
    dec = decode_image(encode_png(hi, interlace=True))
    assert dec.dtype == np.uint16 and np.array_equal(dec, hi)


def test_png_sub_byte_palette_and_gray():
    """Depths 1/2/4: MSB-first bit packing with per-row byte padding,
    filters over the packed bytes with bpp=1 — exact round-trips for
    palette and raw-valued grayscale, sequential and Adam7."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    for d in (1, 2, 4):
        idx = (np.arange(5 * 13).reshape(5, 13) * 7) % (1 << d)
        pal = (np.arange(1 << d)[:, None] * np.array([3, 7, 11]) * 19 % 256).astype(
            np.uint8
        )
        a = pal[idx]
        for il in (False, True):
            buf = encode_png(a, palette=True, bit_depth=d, interlace=il)
            assert buf[8 + 4 + 4 + 8] == d  # IHDR depth byte
            assert np.array_equal(decode_image(buf), a), (d, il)
        g = idx.astype(np.uint8)
        for il in (False, True):
            dec = decode_image(encode_png(g, bit_depth=d, interlace=il))
            assert np.array_equal(dec, g), (d, il)
    with pytest.raises(ValueError, match="fit"):
        encode_png(_arr(4, 4), palette=True, bit_depth=1)  # too many colors
    with pytest.raises(ValueError, match="grayscale"):
        encode_png(_arr(4, 4), bit_depth=4)  # sub-byte RGB is spec-invalid


def test_png_trns_palette_alpha_decodes_rgba():
    """tRNS over a palette image: per-entry alpha for the prefix, the
    rest opaque — output becomes RGBA. The splice uses a real chunk
    with a valid CRC before the IDATs."""
    import struct
    import zlib

    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import encode_png

    pal_colors = np.array([[10, 20, 30], [200, 100, 50], [1, 2, 3]], np.uint8)
    idx = (np.arange(4 * 5).reshape(4, 5)) % 3
    a = pal_colors[idx]
    buf = bytearray(encode_png(a, palette=True))
    at = buf.index(b"tEXt") - 4
    data = bytes([255, 128])  # alpha for palette entries 0 and 1
    trns = (
        struct.pack(">I", len(data))
        + b"tRNS"
        + data
        + struct.pack(">I", zlib.crc32(b"tRNS" + data) & 0xFFFFFFFF)
    )
    dec = decode_image(bytes(buf[:at]) + trns + bytes(buf[at:]))
    assert dec.shape == (4, 5, 4)
    assert np.array_equal(dec[:, :, :3], a)
    # palette is lexicographically re-sorted by the encoder: entry order
    # is sorted(pal_colors) = [[1,2,3],[10,20,30],[200,100,50]]
    alpha_by_color = {(1, 2, 3): 255, (10, 20, 30): 128, (200, 100, 50): 255}
    for y in range(4):
        for x in range(5):
            assert dec[y, x, 3] == alpha_by_color[tuple(a[y, x])], (y, x)
    # tRNS on a truecolor stream stays honest
    buf2 = bytearray(encode_png(_arr(3, 3)))
    at2 = buf2.index(b"tEXt") - 4
    with pytest.raises(NotImplementedError, match="palette"):
        decode_image(bytes(buf2[:at2]) + trns + bytes(buf2[at2:]))


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM: stateful 4-bit compressed audio
# ---------------------------------------------------------------------------


def test_adpcm_core_matches_cpython_audioop():
    """The compand recurrence must be bit-identical to the stdlib's C
    implementation over a long mixed signal (import-gated: audioop is
    removed in 3.13; the recursive-CTE lane oracle keeps independent
    verification either way)."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import _ima_step

    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
    except ImportError:
        pytest.skip("stdlib audioop not available")
    s = ((np.arange(4000, dtype=np.int64) * 977 - 23000) % 65536 - 32768).astype(
        np.int16
    )
    enc, _state = audioop.lin2adpcm(s.tobytes(), 2, None)
    ref = np.frombuffer(enc, np.uint8)
    ref_nibs = np.empty(len(ref) * 2, np.uint8)
    ref_nibs[0::2] = ref >> 4  # audioop packs the earlier sample HIGH
    ref_nibs[1::2] = ref & 0xF
    pred = idx = 0
    mine = []
    for v in s:
        nib, pred, idx = _ima_step(int(v), pred, idx)
        mine.append(nib)
    assert list(ref_nibs[: len(mine)]) == mine


def test_adpcm_wav_roundtrip_multiblock():
    """Container path across multiple 505-sample blocks: the decoded
    stream equals the core recurrence output sample-for-sample, the
    first sample of each block verbatim, 4×-ish compression."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        adpcm_compress,
        adpcm_expand,
        decode_audio,
        encode_wav,
    )

    s = ((np.arange(1200, dtype=np.int64) * 433 - 9000) % 65536 - 32768).astype(
        np.int16
    )
    buf = encode_wav(s, sample_rate=8000, codec="adpcm")
    dec, rate = decode_audio(buf)
    assert rate == 8000 and dec.shape == (1200, 1)
    want = np.concatenate(
        [
            adpcm_expand(b, min(505, 1200 - i * 505))
            for i, b in enumerate(adpcm_compress(s, 505))
        ]
    )
    assert np.array_equal(dec[:, 0], want)
    assert dec[0, 0] == s[0]  # header seed is verbatim
    assert len(buf) < len(encode_wav(s, codec="pcm16")) // 2


def test_adpcm_tracks_smooth_signals():
    """On a smooth signal (the codec's design regime) the reconstruction
    error stays small; wild per-sample jumps slope-overload by design
    and are NOT asserted tight."""
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    t = np.arange(800)
    s = (3000 * np.sin(t / 20) + 500 * np.sin(t / 3)).astype(np.int16)
    dec, _ = decode_audio(encode_wav(s, codec="adpcm"))
    err = np.abs(dec[:, 0].astype(int) - s.astype(int))
    assert int(err[8:].max()) <= 400  # after the attack ramp
    assert float(err.mean()) < 100


def test_adpcm_guards():
    import numpy as np

    from hybrid_data_lakehouse_lab_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    with pytest.raises(ValueError, match="mono"):
        encode_wav(np.zeros((4, 2), dtype=np.int16), codec="adpcm")
    buf = bytearray(encode_wav(np.zeros(8, dtype=np.int16), codec="adpcm"))
    at = buf.index(b"fact")
    # strip the fact chunk (overwrite its id): decoder must refuse
    buf[at : at + 4] = b"junk"
    with pytest.raises(ValueError, match="fact"):
        decode_audio(bytes(buf))
