"""Lateral Python-UDTF lane: the one registered query whose row
expansion runs through the Arrow-optimized UDTF surface
(functions/udtfs.py) instead of built-in generators — value-checked
against the same DuckDB oracle as everything else, so the Python path is
correctness-gated, not merely benchmarked (same policy as the
pandas_udf cosine twin)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udtfs import ChunkText
from ..sources import load_table
from .registry import register

CHUNK = 32  # tokens per chunk


@register(
    "text_chunk_udtf",
    oracle=f"""
    SELECT doc_id,
           CAST((s - 1) / {CHUNK} AS INT) AS chunk_id,
           md5(array_to_string(words[s:s+{CHUNK - 1}], ' ')) AS chunk_hash,
           CAST(least({CHUNK}, len(words) - s + 1) AS INT) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         UNNEST(range(1, len(words) + 1, {CHUNK})) AS t(s)
    """,
)
def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking via LATERAL Python UDTF (chunk text emitted
    as md5 so the oracle compares exact chunk content compactly).

    100 TB: the UDTF is Arrow-batched and stateless — pure map-side row
    expansion, no shuffle; partition-parallel like any generator. Use
    the built-in corpus_pack_sequences lane when the chunk logic fits
    SQL; this lane exists for chunkers that genuinely need Python.
    """
    spark.udtf.register("chunk_text", ChunkText)
    d = load_table(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        SELECT d.doc_id, t.chunk_id, md5(t.chunk) AS chunk_hash,
               t.n_tokens
        FROM {{d}} d, LATERAL chunk_text(d.text, {CHUNK}) t
        """,
        d=d,
    )
