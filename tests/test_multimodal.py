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
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_null_payload_handled(spark):
    df = spark.createDataFrame(
        [(1, None, "image/png", None)],
        "media_id long, payload binary, media_type string, n_bytes int",
    )
    r = extract_features(df).collect()[0]
    assert r["byte_sum"] == 0 and r["n_bytes"] == 0
