"""Executor-side deletion-vector construction — shared by the Delta
and Iceberg fv3 exporters.

Both formats frame per-file delete bitmaps around the SAME body bytes
(`D1 D3 39 64` magic + portable 64-bit RoaringBitmapArray — Delta's
deletion-vector payload and Iceberg v3's `deletion-vector-v1` blob
were designed byte-compatible), so one kernel serves both: the
per-commit (file_path, pos) delete diff is folded into cumulative
per-file bitmaps ON the executors, and the driver receives only
(file_path, blob, cardinality) rows — bounded by compressed-bitmap
bytes, never row positions. A GDPR-scale purge deleting 1% of a
100 TB table would otherwise materialize billions of Row objects on
the driver (`tests/test_distributed_dv.py`,
`tests/test_fv3_distributed_dv.py` guard this with a patched
`DataFrame.collect`).

The cumulative state handled here is `dv_state: dict[abs file path ->
(body bytes, cardinality)]`; each exporter owns the format-specific
outer framing (Delta: `.bin` file with BE length+crc frames; Iceberg:
Puffin blobs via `puffin.frame_dv_v1`).
"""

from __future__ import annotations


def dv_state_positions(spark, dv_state: dict):
    """Expand the cumulative DV state ({abs path: (body bytes,
    cardinality)}) back into a (file_path, pos) DataFrame — decoded
    EXECUTOR-side in an Arrow-batched kernel, so the driver ships only
    the roaring-compressed blobs and never holds row positions."""

    def _explode(batches):
        import pandas as pd

        from hybrid_data_lakehouse_lab_spark.operators.roaring import (
            decode_dv_blob,
        )

        for pdf in batches:
            for f, b in zip(pdf["file_path"], pdf["blob"]):
                yield pd.DataFrame(
                    {"file_path": f, "pos": decode_dv_blob(bytes(b))}
                )

    blob_df = spark.createDataFrame(
        [(p, bytearray(b)) for p, (b, _c) in sorted(dv_state.items())],
        "file_path string, blob binary",
    )
    return blob_df.mapInPandas(_explode, "file_path string, pos bigint")


def dv_blobs_by_file(spark, deleted, dv_state: dict) -> list:
    """Fold this commit's (file_path, pos) delete diff into per-file
    CUMULATIVE deletion-vector blobs, aggregated EXECUTOR-side: a
    cogrouped Arrow kernel per touched file sorts its new positions,
    merges them with the file's prior blob (decoded in the kernel) and
    serializes the roaring bitmap there. The driver receives only
    (file_path, blob, cardinality) rows — one per touched file, bounded
    by compressed-bitmap bytes — never the positions themselves."""

    def kernel(new_pdf, blob_pdf):
        import pandas as pd

        from hybrid_data_lakehouse_lab_spark.operators.roaring import (
            decode_dv_blob,
            dv_blob,
        )

        if new_pdf.empty:
            # prior-state file untouched by this commit: no new blob
            return pd.DataFrame(
                {"file_path": [], "blob": [], "cardinality": []}
            )
        f = str(new_pdf["file_path"].iloc[0])
        cum = set(int(x) for x in new_pdf["pos"])
        if not blob_pdf.empty:
            cum.update(decode_dv_blob(bytes(blob_pdf["blob"].iloc[0])))
        cum = sorted(cum)
        return pd.DataFrame(
            {
                "file_path": [f],
                "blob": [dv_blob(cum)],
                "cardinality": [len(cum)],
            }
        )

    blob_df = spark.createDataFrame(
        [(p, bytearray(b)) for p, (b, _c) in sorted(dv_state.items())],
        "file_path string, blob binary",
    )
    return (
        deleted.groupBy("file_path")
        .cogroup(blob_df.groupBy("file_path"))
        .applyInPandas(
            kernel, "file_path string, blob binary, cardinality long"
        )
        .collect()
    )
