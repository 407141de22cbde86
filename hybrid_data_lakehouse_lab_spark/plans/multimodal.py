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

from ..operators.multimodal import as_media_table, extract_features
from ..sources import load_table
from .registry import register


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
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(list_sum(list_transform(string_split_regex(text, ''), c -> ascii(c))) AS BIGINT)
             AS byte_sum
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads.

    Test payloads are ASCII, so byte_sum == sum of codepoints and the
    DuckDB oracle can verify the kernel output exactly.
    """
    d = load_table(spark, sf_dir, "documents")
    media = as_media_table(d, "doc_id", "text")
    return extract_features(media).select("media_id", "n_bytes", "byte_sum")
