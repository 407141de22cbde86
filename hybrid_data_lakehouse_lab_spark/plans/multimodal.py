"""Multimodal extension lane — binary payload columns + typed metadata.

`multimodal_metadata` is fully oracle-checked (binary plumbing is
JVM-side builtins). `multimodal_feature_extract` runs the Arrow/Pandas
kernel path; its byte-sum output is still SQL-expressible on ASCII test
payloads, so it gets a real oracle too — on real media it would be
rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    as_media_table,
    audio_decode_stats,
    extract_features,
    image_decode_stats,
    jpeg_roundtrip_stats,
    mjpeg_roundtrip_stats,
    resize_media,
    sample_frames,
    video_decode_stats,
)
from ..sources import load_table
from .registry import register

# ASCII guard for every lane whose Arrow kernel walks the UTF-8 BYTES of
# the payload while its oracle derives the expectation from the VARCHAR
# (repeat/substr/ascii are CHAR-based in DuckDB). On any non-ASCII
# document the byte and char streams diverge, so those lanes scope
# themselves to ASCII documents ON BOTH SIDES — the pairing then holds on
# any corpus by construction, not because the gate corpora happen to be
# ASCII-only (they are; this is latent-bug insurance, a no-op today).
_ASCII_SQL = "length(text) = octet_length(encode(text))"


def _ascii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.length("text") == F.octet_length("text"))


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           lower(hex(encode(substr(text, 1, 8)))) AS payload_head_hex
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = as_media_table(d, "doc_id", "text")
    head = d.select(
        F.col("doc_id").alias("media_id"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias(
            "payload_head_hex"
        ),
    )
    return media.select("media_id", "media_type", "n_bytes").join(head, "media_id")


@register(
    "multimodal_feature_extract",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(list_sum(list_transform(string_split_regex(text, ''), c -> ascii(c))) AS BIGINT)
             AS byte_sum
    FROM documents
    WHERE {_ASCII_SQL}
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads.

    ASCII-scoped lane (see _ASCII_SQL): byte_sum == sum of codepoints
    exactly when bytes and chars coincide, so the DuckDB oracle verifies
    the kernel output on any corpus.
    """
    media = as_media_table(_ascii_docs(spark, sf_dir), "doc_id", "text")
    return extract_features(media).select("media_id", "n_bytes", "byte_sum")


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(i AS INT) AS frame_index,
           CAST(octet_length(encode(substr(text, 1 + i * 32, 32))) AS INT) AS frame_bytes,
           md5(substr(text, 1 + i * 32, 32)) AS frame_md5
    FROM documents,
         UNNEST(range(0, CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT), 4)) AS t(i)
    WHERE {_ASCII_SQL}
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame expansion via mapInPandas (every 4th 32-byte frame).
    ASCII-scoped (see _ASCII_SQL): byte frames == char frames, so the
    Arrow kernel's output is fully oracle-verified; on real video this
    is rows-only."""
    media = as_media_table(_ascii_docs(spark, sf_dir), "doc_id", "text")
    return sample_frames(media, frame_size=32, every_k=4)


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id AS media_id,
           'text/plain' AS media_type,
           CAST(len(sel) AS INT) AS n_bytes,
           md5(array_to_string(sel, '')) AS resized_md5
    FROM (
      SELECT doc_id,
             list_select(string_split_regex(text, ''),
                         range(1, len(string_split_regex(text, '')) + 1, 2)) AS sel
      FROM documents
      WHERE {_ASCII_SQL}
    )
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample kernel (every 2nd byte) through the same Arrow path a
    real image-resize would use; content hash proves byte-exactness.
    ASCII-scoped (see _ASCII_SQL): every-2nd-byte == every-2nd-char."""
    media = as_media_table(_ascii_docs(spark, sf_dir), "doc_id", "text")
    return resize_media(media, factor=2)


@register(
    "multimodal_image_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substr(repeat(text, CAST(ceil(60.0 / octet_length(encode(text))) AS INT)),
                    1, 60) AS pix
      FROM documents
      WHERE octet_length(encode(text)) > 0 AND {_ASCII_SQL}
    ),
    px AS (
      SELECT doc_id, i, ascii(substr(pix, CAST(i + 1 AS INT), 1)) AS b
      FROM d, UNNEST(range(0, 60)) AS t(i)
    ),
    stats AS (
      SELECT doc_id,
             sum(CASE WHEN i < 15 THEN b ELSE 0 END) AS row0_sum,
             sum(CASE WHEN i % 3 = 0 THEN b ELSE 0 END) AS r_sum,
             sum(CASE WHEN i % 3 = 1 THEN b ELSE 0 END) AS g_sum,
             sum(CASE WHEN i % 3 = 2 THEN b ELSE 0 END) AS b_sum
      FROM px GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id, f.fmt,
           CAST(5 AS INT) AS width, CAST(4 AS INT) AS height,
           md5(d.pix) AS pix_md5,
           CAST(s.row0_sum AS BIGINT) AS row0_sum,
           CAST(s.r_sum AS BIGINT) AS r_sum,
           CAST(s.g_sum AS BIGINT) AS g_sum,
           CAST(s.b_sum AS BIGINT) AS b_sum
    FROM d JOIN stats s USING (doc_id),
         (VALUES ('bmp'), ('gif'), ('png'), ('png_pal'), ('ppm')) AS f(fmt)
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-verified end-to-end: each document's
    bytes (cycled to a 5x4 RGB raster) are encoded as an actual 24-bit
    BMP, a GIF89a (real variable-width LZW over palette indices — the
    dictionary-coder decode path engages on every blob), an 8-bit
    truecolor PNG (stdlib-zlib deflate, per-row filter cycle over all
    five types), a PALETTIZED PNG (color type 3), and a binary PPM,
    decoded back through
    ``decode_image``'s pure-numpy header/stride/BGR/bottom-up/unfilter
    parsing, and the DECODED array's stats are compared against DuckDB's
    independent derivation from the text construction. The oracle never
    sees the image bytes, so an encoder bug cannot cancel a decoder bug:
    md5 pins content, row0_sum pins row direction, channel sums pin the
    BGR swap, and the PNG lane additionally pins the inflate + unfilter
    reconstruction.

    100 TB: partition-local mapInPandas over Arrow batches — the same
    no-shuffle dataflow as the other media kernels; decode cost is
    per-blob CPU with zero data movement. ASCII-scoped (see _ASCII_SQL):
    the kernel cycles payload BYTES while the oracle cycles VARCHAR
    chars, coincident exactly on ASCII text."""
    d = _ascii_docs(spark, sf_dir).filter(F.octet_length("text") > 0)
    media = as_media_table(d, "doc_id", "text")
    return image_decode_stats(media, width=5, height=4)


@register(
    "multimodal_audio_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substr(repeat(text, CAST(ceil(48.0 / octet_length(encode(text))) AS INT)),
                    1, 48) AS pix
      FROM documents
      WHERE octet_length(encode(text)) > 0 AND {_ASCII_SQL}
    ),
    px AS (
      SELECT doc_id, i,
             (ascii(substr(pix, CAST(i + 1 AS INT), 1)) - 128) * 256 AS s
      FROM d, UNNEST(range(0, 48)) AS t(i)
    )
    SELECT doc_id AS media_id,
           CAST(24 AS INT) AS n_frames,
           CAST(2 AS INT) AS n_channels,
           CAST(16000 AS INT) AS sample_rate,
           CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE 0 END) AS BIGINT) AS l_sum,
           CAST(sum(CASE WHEN i % 2 = 1 THEN s ELSE 0 END) AS BIGINT) AS r_sum,
           md5(string_agg(s::VARCHAR, ',' ORDER BY i)) AS samples_md5
    FROM px GROUP BY doc_id
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-verified end-to-end (the WAV twin of
    multimodal_image_decode): each document's bytes become 48 interleaved
    stereo PCM16 samples, encoded as an actual RIFF/WAVE file (with a
    junk LIST chunk so only a genuine chunk walker finds the data),
    decoded back through ``decode_audio``, and the DECODED array's stats
    are checked against DuckDB's independent derivation from the text
    construction: per-channel sums pin the de-interleave, the ordered
    sample md5 pins content, the frame/rate columns pin the header
    parse. Compressed codecs stay an honest NotImplementedError.

    100 TB: partition-local mapInPandas over Arrow batches — no shuffle,
    per-blob CPU only. ASCII-scoped (see _ASCII_SQL): kernel bytes vs
    oracle chars coincide exactly on ASCII text."""
    d = _ascii_docs(spark, sf_dir).filter(F.octet_length("text") > 0)
    media = as_media_table(d, "doc_id", "text")
    return audio_decode_stats(media, n_samples=48)


@register(
    "multimodal_video_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substr(repeat(text, CAST(ceil(120.0 / octet_length(encode(text))) AS INT)),
                    1, 120) AS pix
      FROM documents
      WHERE octet_length(encode(text)) > 0 AND {_ASCII_SQL}
    ),
    px AS (
      SELECT doc_id, i, ascii(substr(pix, CAST(i + 1 AS INT), 1)) AS b
      FROM d, UNNEST(range(0, 120)) AS t(i)
    )
    SELECT d.doc_id AS media_id,
           CAST(2 AS INT) AS n_frames,
           CAST(5 AS INT) AS width,
           CAST(4 AS INT) AS height,
           CAST(10 AS INT) AS fps,
           md5(d.pix) AS frames_md5,
           CAST(sum(CASE WHEN i < 60 THEN b ELSE 0 END) AS BIGINT) AS frame0_sum,
           CAST(sum(CASE WHEN i < 15 THEN b ELSE 0 END) AS BIGINT) AS row0_sum,
           CAST(sum(CASE WHEN i % 3 = 0 THEN b ELSE 0 END) AS BIGINT) AS r_sum,
           CAST(sum(CASE WHEN i % 3 = 1 THEN b ELSE 0 END) AS BIGINT) AS g_sum,
           CAST(sum(CASE WHEN i % 3 = 2 THEN b ELSE 0 END) AS BIGINT) AS b_sum
    FROM d JOIN px USING (doc_id)
    GROUP BY d.doc_id, d.pix
    """,
)
def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, oracle-verified end-to-end (the AVI member of
    the image/audio decode family): each document's bytes become a
    2-frame 5x4 RGB clip, encoded as an actual uncompressed 24-bit AVI
    (RIFF chunk tree with a planted odd-sized JUNK chunk, per-frame DIB
    rasters in bottom-up/BGR/stride-padded layout), decoded back through
    ``decode_video_frames``'s word-aligned RIFF walk, and the DECODED
    stack's stats compared against DuckDB's independent text-path
    derivation. The oracle never sees the container bytes, so an encoder
    bug cannot cancel a decoder bug: frames_md5 pins content order,
    frame0_sum pins frame reassembly, row0_sum pins the per-frame
    vertical flip, channel sums pin the BGR swap, fps pins the avih
    timebase. Compressed codecs (MJPEG/cvid) stay honest
    NotImplementedError slots.

    100 TB: partition-local mapInPandas over Arrow batches — no shuffle,
    per-blob CPU only. ASCII-scoped (see _ASCII_SQL): kernel bytes vs
    oracle chars coincide exactly on ASCII text."""
    d = _ascii_docs(spark, sf_dir).filter(F.octet_length("text") > 0)
    media = as_media_table(d, "doc_id", "text")
    return video_decode_stats(media, n_frames=2, width=5, height=4, fps=10)


@register(
    "multimodal_audio_mulaw",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substr(repeat(text, CAST(ceil(48.0 / octet_length(encode(text))) AS INT)),
                    1, 48) AS pix
      FROM documents
      WHERE octet_length(encode(text)) > 0 AND {_ASCII_SQL}
    ),
    px AS (
      SELECT doc_id, i,
             (ascii(substr(pix, CAST(i + 1 AS INT), 1)) - 128) * 256 AS s
      FROM d, UNNEST(range(0, 48)) AS t(i)
    ),
    c14 AS (  -- G.711: arithmetic >>2 into the 14-bit domain (floor)
      SELECT doc_id, i,
             CASE WHEN s >= 0 THEN s // 4 ELSE -((-s + 3) // 4) END AS x
      FROM px
    ),
    seg AS (
      SELECT doc_id, i,
             CASE WHEN x < 0 THEN 128 ELSE 0 END AS sgn,
             LEAST(abs(x), 8158) + 33 AS m
      FROM c14
    ),
    enc AS (
      SELECT doc_id, i, sgn, m,
             CASE WHEN m >= 4096 THEN 7 WHEN m >= 2048 THEN 6
                  WHEN m >= 1024 THEN 5 WHEN m >= 512 THEN 4
                  WHEN m >= 256 THEN 3 WHEN m >= 128 THEN 2
                  WHEN m >= 64 THEN 1 ELSE 0 END AS ex
      FROM seg
    ),
    u AS (
      SELECT doc_id, i,
             255 - (sgn + ex * 16 + ((m // (1 << (ex + 1))) % 16)) AS u8
      FROM enc
    ),
    dec AS (
      SELECT doc_id, i,
             CASE WHEN (255 - u8) >= 128 THEN
               -((((255 - u8) % 16) * 8 + 132) * (1 << (((255 - u8) // 16) % 8)) - 132)
             ELSE
               ((((255 - u8) % 16) * 8 + 132) * (1 << (((255 - u8) // 16) % 8)) - 132)
             END AS s2
      FROM u
    )
    SELECT doc_id AS media_id,
           CAST(24 AS INT) AS n_frames,
           CAST(2 AS INT) AS n_channels,
           CAST(16000 AS INT) AS sample_rate,
           CAST(sum(CASE WHEN i % 2 = 0 THEN s2 ELSE 0 END) AS BIGINT) AS l_sum,
           CAST(sum(CASE WHEN i % 2 = 1 THEN s2 ELSE 0 END) AS BIGINT) AS r_sum,
           md5(string_agg(s2::VARCHAR, ',' ORDER BY i)) AS samples_md5
    FROM dec GROUP BY doc_id
    """,
)
def multimodal_audio_mulaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio codec, oracle-verified end-to-end: the same
    48 interleaved stereo samples as multimodal_audio_decode, but
    encoded through G.711 μ-law (format tag 7 — one byte per sample, 2×
    compression, THE telephony codec) into a RIFF/WAVE container and
    decoded back via ``mulaw_expand``. μ-law is lossy toward PCM16, yet
    expand∘compress is an exact integer function of the input sample —
    so the oracle re-states the complete compand chain in SQL (>>2 into
    the ITU 14-bit domain, clip+bias, segment by thresholds, mantissa,
    ones-complement, then the inverse) and the match is EXACT, unlike
    any float-DSP codec. The Spark kernel is additionally pinned
    bit-for-bit to CPython's audioop/g711.c in unit tests. Per-channel
    sums pin the de-interleave of the 1-byte samples; the ordered md5
    pins every companded value.

    100 TB: partition-local mapInPandas over Arrow batches — no
    shuffle, per-blob CPU only. ASCII-scoped (see _ASCII_SQL)."""
    d = _ascii_docs(spark, sf_dir).filter(F.octet_length("text") > 0)
    media = as_media_table(d, "doc_id", "text")
    return audio_decode_stats(media, n_samples=48, codec="mulaw")


@register(
    "multimodal_image_jpeg",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(5 AS INT) AS width,
           CAST(4 AS INT) AS height,
           CAST(95 AS INT) AS quality,
           TRUE AS within_tol
    FROM documents
    WHERE octet_length(encode(text)) > 0 AND {_ASCII_SQL}
    """,
)
def multimodal_image_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG round-trip (operators/jpeg.py — the full
    T.81 pipeline in pure numpy: JFIF markers, Annex-K quantization at
    quality 95, 8×8 float64 DCT, zigzag, DC prediction, canonical
    Huffman + byte stuffing, then the complete inverse). JPEG is LOSSY,
    so this lane pairs on dimensions + a bounded-reconstruction verdict
    (max |decoded−source| ≤ JPEG_TOLERANCE = 48, ≥2× the worst error
    ever observed on the gate corpora) instead of exact stats — the
    honest pairing for a lossy codec; the exact-stats design lives in
    the lossless lanes (bmp/png/ppm/avi/μ-law). tests/test_jpeg.py pins
    flat-image exactness, the empirical corpus bound, marker structure,
    and the unsupported-variant rejections.

    100 TB: partition-local mapInPandas over Arrow batches — no
    shuffle, per-blob CPU only. ASCII-scoped (see _ASCII_SQL)."""
    d = _ascii_docs(spark, sf_dir).filter(F.octet_length("text") > 0)
    media = as_media_table(d, "doc_id", "text")
    return jpeg_roundtrip_stats(media, width=5, height=4, quality=95)


@register(
    "multimodal_video_mjpeg",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(2 AS INT) AS n_frames,
           CAST(5 AS INT) AS width,
           CAST(4 AS INT) AS height,
           CAST(10 AS INT) AS fps,
           CAST(95 AS INT) AS quality,
           TRUE AS within_tol
    FROM documents
    WHERE octet_length(encode(text)) > 0 AND {_ASCII_SQL}
    """,
)
def multimodal_video_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed video, oracle-verified: each document's cycled
    raster becomes a 2-frame Motion-JPEG AVI — the package's baseline
    JPEG codec (operators/jpeg.py) composed inside its RIFF/AVI
    container ('MJPG' fourcc, one independently-decodable JPEG per
    '00dc' chunk) — and is decoded back through the word-aligned
    container walk plus the full per-frame JPEG inverse. Lossy, so the
    pairing is dims/fps + the bounded-reconstruction verdict (same
    JPEG_TOLERANCE contract as multimodal_image_jpeg; the exact-content
    design lives in the lossless multimodal_video_decode lane).

    100 TB: partition-local mapInPandas over Arrow batches — no
    shuffle, per-blob CPU only. ASCII-scoped (see _ASCII_SQL)."""
    d = _ascii_docs(spark, sf_dir).filter(F.octet_length("text") > 0)
    media = as_media_table(d, "doc_id", "text")
    return mjpeg_roundtrip_stats(
        media, n_frames=2, width=5, height=4, fps=10, quality=95
    )


def _adpcm_oracle_sql() -> str:
    """Recursive-CTE restatement of the IMA-ADPCM encode∘decode chain
    (operators/multimodal.py `_ima_step`): the decoded sample i IS the
    encoder's predictor after step i (sample 0 rides the block header
    verbatim), so one recurrence over (predictor, step_index) yields
    the exact companded stream — a STATEFUL lossy codec paired exactly,
    one step beyond μ-law's stateless compand. The 89-entry step table
    is generated from the same public IMA constant both sides use."""
    from ..operators.multimodal import _IMA_STEP

    steps = ", ".join(f"({i}, {v})" for i, v in enumerate(_IMA_STEP))
    return f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             substr(repeat(text, CAST(ceil(48.0 / octet_length(encode(text))) AS INT)),
                    1, 48) AS pix
      FROM documents
      WHERE octet_length(encode(text)) > 0 AND {_ASCII_SQL}
    ),
    px AS (
      SELECT doc_id, i,
             (ascii(substr(pix, CAST(i + 1 AS INT), 1)) - 128) * 256 AS s
      FROM d, UNNEST(range(0, 48)) AS t(i)
    ),
    steps(si, step) AS (VALUES {steps}),
    rec AS (
      SELECT doc_id, 0 AS i, s AS pred, 0 AS idx
      FROM px WHERE i = 0
      UNION ALL
      SELECT doc_id, i,
             GREATEST(-32768, LEAST(32767,
               pred + CASE WHEN sgn THEN -vpdiff ELSE vpdiff END)) AS pred,
             GREATEST(0, LEAST(88, idx + CASE nib3
               WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 WHEN 7 THEN 8
               ELSE -1 END)) AS idx
      FROM (
        SELECT doc_id, i, pred, idx, sgn,
               (step // 8)
                 + CASE WHEN d4 THEN step ELSE 0 END
                 + CASE WHEN d2 THEN step // 2 ELSE 0 END
                 + CASE WHEN d1 THEN step // 4 ELSE 0 END AS vpdiff,
               CAST(d4 AS INT) * 4 + CAST(d2 AS INT) * 2 + CAST(d1 AS INT)
                 AS nib3
        FROM (
          SELECT *, (rem1 >= step // 4) AS d1
          FROM (
            SELECT *,
                   (rem2 >= step // 2) AS d2,
                   rem2 - CASE WHEN rem2 >= step // 2
                               THEN step // 2 ELSE 0 END AS rem1
            FROM (
              SELECT *, (adiff >= step) AS d4,
                     adiff - CASE WHEN adiff >= step
                                  THEN step ELSE 0 END AS rem2
              FROM (
                SELECT r.doc_id, p.i, r.pred, r.idx, st.step,
                       (p.s < r.pred) AS sgn, abs(p.s - r.pred) AS adiff
                FROM rec r
                JOIN px p ON p.doc_id = r.doc_id AND p.i = r.i + 1
                JOIN steps st ON st.si = r.idx
              )
            )
          )
        )
      )
    )
    SELECT doc_id AS media_id,
           CAST(48 AS INT) AS n_frames,
           CAST(1 AS INT) AS n_channels,
           CAST(16000 AS INT) AS sample_rate,
           CAST(sum(pred) AS BIGINT) AS l_sum,
           CAST(0 AS BIGINT) AS r_sum,
           md5(string_agg(pred::VARCHAR, ',' ORDER BY i)) AS samples_md5
    FROM rec GROUP BY doc_id
    """


@register("multimodal_audio_adpcm", oracle=_adpcm_oracle_sql())
def multimodal_audio_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stateful compressed-audio codec, oracle-verified EXACTLY:
    the document's 48 mono samples are IMA/DVI-ADPCM encoded (4
    bits/sample, ~4× compression) into an MS-IMA WAV block (format tag
    0x11, fact chunk, header-seeded predictor) and decoded back. ADPCM
    is lossy AND stateful — each step's quantization depends on the
    running (predictor, step-index) state — yet encode∘decode is a pure
    integer recurrence of the input, which the oracle re-states as a
    RECURSIVE CTE over the same public step tables, so the pairing is a
    hash-exact match like μ-law's, one difficulty class up. The Spark
    kernel's core recurrence is additionally pinned bit-for-bit against
    CPython's audioop in unit tests.

    100 TB: partition-local mapInPandas over Arrow batches — no
    shuffle, per-blob CPU only. ASCII-scoped (see _ASCII_SQL)."""
    d = _ascii_docs(spark, sf_dir).filter(F.octet_length("text") > 0)
    media = as_media_table(d, "doc_id", "text")
    return audio_decode_stats(media, n_samples=48, codec="adpcm")
