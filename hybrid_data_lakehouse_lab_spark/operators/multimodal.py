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
    one output row per input row, vectorized per Arrow batch. The hot
    dimension (bytes within a blob) is numpy — `frombuffer` is a zero-copy
    view, the sum/histogram are C loops; only the cheap per-blob dispatch
    is Python. No `iterrows` (it constructs a Series per row and is the
    pattern real kernels must not copy).
    """
    import numpy as np

    def view(b: bytes | None) -> np.ndarray:
        return np.frombuffer(b or b"", dtype=np.uint8)

    for pdf in batches:
        arrs = pdf["payload"].map(view)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].to_numpy(),
                "media_type": pdf["media_type"].to_numpy(),
                "n_bytes": arrs.map(len).to_numpy(dtype="int32"),
                "byte_sum": arrs.map(
                    lambda a: int(a.sum(dtype=np.int64))
                ).to_numpy(dtype="int64"),
                "byte_histogram_head": arrs.map(
                    lambda a: np.bincount(a, minlength=8)[:8]
                    .astype("int32")
                    .tolist()
                ),
            }
        )


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

    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idx_chunks, size_chunks, md5s = [], [], [], []
            payloads = pdf["payload"].to_numpy()
            media_ids = pdf["media_id"].to_numpy()
            for mid, b in zip(media_ids, payloads):
                b = b or b""
                n_frames = (len(b) + frame_size - 1) // frame_size
                take = np.arange(0, n_frames, every_k, dtype="int32")
                ids.append(np.full(len(take), mid, dtype="int64"))
                idx_chunks.append(take)
                # per-frame sizes vectorized: full frames except a ragged tail
                sizes = np.minimum(
                    frame_size, len(b) - take.astype("int64") * frame_size
                ).astype("int32")
                size_chunks.append(sizes)
                # md5 is inherently per-item (as real decode would be); the
                # frame slice is zero-copy via memoryview
                mv = memoryview(b)
                md5s.extend(
                    hashlib.md5(
                        mv[i * frame_size : (i + 1) * frame_size]
                    ).hexdigest()
                    for i in take
                )
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(ids) if ids else np.array([], "int64"),
                    "frame_index": np.concatenate(idx_chunks)
                    if idx_chunks
                    else np.array([], "int32"),
                    "frame_bytes": np.concatenate(size_chunks)
                    if size_chunks
                    else np.array([], "int32"),
                    "frame_md5": md5s,
                }
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_media(media: DataFrame, factor: int = 2) -> DataFrame:
    """Resize/downsample: binary in → smaller binary out (1:1 rows).

    Deterministic stand-in keeps every `factor`-th byte (a real image
    kernel would decode, `PIL.Image.resize`, re-encode — same signature,
    same Arrow dataflow). Output carries the new size + content hash.
    """
    import hashlib

    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Downsample each blob as a strided numpy view (no byte copy
            # until tobytes); columns built from Series ops, not iterrows.
            small = pdf["payload"].map(
                lambda b: np.frombuffer(b or b"", dtype=np.uint8)[::factor].tobytes()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": small.map(len).to_numpy(dtype="int32"),
                    "resized_md5": small.map(
                        lambda s: hashlib.md5(s).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(kernel, schema=RESIZE_SCHEMA)
