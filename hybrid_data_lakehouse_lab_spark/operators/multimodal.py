"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs over
mapInPandas.

The container has no image/audio codecs, so the decode kernels are
STUBBED: `decode_image` raises NotImplementedError by design, and
`fake_feature_extract` is a deterministic stand-in used by tests to prove
the Spark-side plumbing (schema, batching, partitioning) is real. Swapping
the kernel body for PIL/librosa is a one-function change — the dataflow
does not move.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("byte_sum", T.LongType(), True),
        T.StructField("byte_histogram_head", T.ArrayType(T.IntegerType()), True),
    ]
)


def as_media_table(df: DataFrame, id_col: str, payload_text_col: str) -> DataFrame:
    """Wrap any table into the canonical media schema (binary + metadata).

    Testdata has no real blobs, so the text column is encoded to bytes —
    the schema and every downstream operator are identical for real media.
    """
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(payload_text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.col(payload_text_col)).alias("n_bytes"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder slot. No codec libs in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this environment; "
        "fake_feature_extract provides the deterministic test path"
    )


def fake_feature_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in kernel: per-blob byte statistics.

    Shape matches a real extractor: binary in → fixed-width features out,
    one output row per input row, vectorized per Arrow batch.
    """
    for pdf in batches:
        feats = []
        for _, row in pdf.iterrows():
            b = row["payload"] or b""
            feats.append(
                {
                    "media_id": row["media_id"],
                    "media_type": row["media_type"],
                    "n_bytes": len(b),
                    "byte_sum": int(sum(b)),
                    "byte_histogram_head": [b.count(i) for i in range(8)],
                }
            )
        yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas pipeline: partition-parallel, Arrow-batched, no shuffle."""
    return media.mapInPandas(fake_feature_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_bytes", T.IntegerType(), True),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("resized_md5", T.StringType(), True),
    ]
)


def decode_video_frames(payload: bytes) -> object:
    """Real video decoder slot. No codec libs in this container."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav — not available in this environment; "
        "sample_frames provides the deterministic chunk-based test path"
    )


def sample_frames(
    media: DataFrame, frame_size: int = 32, every_k: int = 4
) -> DataFrame:
    """Frame sampling: one media row → N frame rows (every k-th frame).

    The deterministic stand-in treats the payload as fixed-size byte
    frames (a real kernel would call decode_video_frames and sample
    decoded frames — the 1→N row expansion, Arrow batching, and schema
    are identical). No shuffle: expansion is partition-local.
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_bytes": [], "frame_md5": []}
            for _, row in pdf.iterrows():
                b = row["payload"] or b""
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_k):
                    frame = b[i * frame_size : (i + 1) * frame_size]
                    out["media_id"].append(row["media_id"])
                    out["frame_index"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """Resize/downsample: binary in → smaller binary out (1:1 rows).

    Deterministic stand-in keeps every `factor`-th byte (a real image
    kernel would decode, `PIL.Image.resize`, re-encode — same signature,
    same Arrow dataflow). Output carries the new size + content hash.
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "n_bytes": [], "resized_md5": []}
            for _, row in pdf.iterrows():
                b = row["payload"] or b""
                small = b[::factor]
                out["media_id"].append(row["media_id"])
                out["media_type"].append(row["media_type"])
                out["n_bytes"].append(len(small))
                out["resized_md5"].append(hashlib.md5(small).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=RESIZE_SCHEMA)
