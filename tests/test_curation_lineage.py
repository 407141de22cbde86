"""The lineage lane must agree with the pipeline it explains: its
'kept' verdicts are exactly the pipeline's survivor set, and every
document receives exactly one verdict."""

from __future__ import annotations

from hybrid_data_lakehouse_lab_spark.plans import QUERIES


def test_lineage_kept_equals_pipeline_survivors(spark, sf_dir):
    lineage = QUERIES["corpus_curation_lineage"](spark, sf_dir).toPandas()
    kept = set(lineage[lineage.verdict == "kept"].doc_id)
    survivors = {
        r.doc_id for r in QUERIES["corpus_curation_pipeline"](spark, sf_dir).collect()
    }
    assert kept == survivors


def test_lineage_covers_every_document(spark, sf_dir):
    from hybrid_data_lakehouse_lab_spark.sources import load_table

    lineage = QUERIES["corpus_curation_lineage"](spark, sf_dir).toPandas()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(lineage) == n_docs
    assert lineage.doc_id.is_unique
    allowed = {"drop_length", "drop_lang", "drop_exact_dup", "drop_near_dup", "kept"}
    assert set(lineage.verdict) <= allowed
