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
