"""`migrate_parquet_dir` — the Iceberg `add_files` / snapshot-table
migration path: existing parquet registered in place (zero rewrite),
Hive partition dirs becoming an identity spec, name-mapping emitted so
the id-less originals survive later renames."""

import json
import os

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    migrate_parquet_dir,
    read_iceberg_table,
)


def _plain_dir(spark, tmp_path, partitioned=True):
    src = str(tmp_path / "lake")
    df = spark.range(90).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    w = df.write
    if partitioned:
        w = w.partitionBy("g")
    w.parquet(src)
    return src, df


def test_migrate_partitioned_dir_reads_in_place(spark, tmp_path):
    src, _df = _plain_dir(spark, tmp_path)
    root = str(tmp_path / "iceberg")
    migrate_parquet_dir(spark, root, src, timestamp_ms=5)
    got = read_iceberg_table(spark, root)
    assert sorted(got.columns) == ["g", "k", "v"]
    # contract: value-identical to Spark's own read of the source dir
    # (partition dirs type-infer: g comes back int)
    want = spark.read.parquet(src)
    assert sorted((r["k"], r["g"], r["v"]) for r in got.collect()) == sorted(
        (r["k"], r["g"], r["v"]) for r in want.collect()
    )
    # zero rewrite: every referenced file lives under the SOURCE dir
    md = json.load(
        open(os.path.join(root, "metadata", "v1.metadata.json"))
    )
    from hybrid_data_lakehouse_lab_spark.operators.avro_io import read_avro

    (row,) = read_avro(md["snapshots"][0]["manifest-list"])[1]
    files = [
        e["data_file"]["file_path"]
        for e in read_avro(row["manifest_path"])[1]
    ]
    assert files and all(
        p.startswith(os.path.abspath(src) + os.sep) for p in files
    )
    # identity partition spec + typed partition values
    assert md["partition-specs"][0]["fields"][0]["name"] == "g"
    assert all(
        e["data_file"]["partition"]["g"] in (0, 1, 2)
        for e in read_avro(row["manifest_path"])[1]
    )


def test_migrate_partition_prune_skips_files(spark, tmp_path):
    src, _ = _plain_dir(spark, tmp_path)
    root = str(tmp_path / "iceberg")
    migrate_parquet_dir(spark, root, src)
    pruned = read_iceberg_table(spark, root, prune=[("g", "=", "1")])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    full = read_iceberg_table(spark, root)
    full_plan = full._jdf.queryExecution().executedPlan().toString()
    # the prune path feeds fewer files into the scan than the full read
    assert pruned.count() < full.count()
    assert pruned.filter(F.col("g") == "1").count() == 30
    assert len(plan) <= len(full_plan)


def test_migrate_stats_prune_on_data_column(spark, tmp_path):
    """Footer min/max bounds land in the manifests: a k-range prune
    must drop files whose bounds exclude the predicate."""
    src = str(tmp_path / "lake")
    df = spark.range(100).select(F.col("id").alias("k"))
    df.repartitionByRange(4, "k").write.parquet(src)
    root = str(tmp_path / "iceberg")
    migrate_parquet_dir(spark, root, src)
    from hybrid_data_lakehouse_lab_spark.operators.avro_io import read_avro

    md = json.load(
        open(os.path.join(root, "metadata", "v1.metadata.json"))
    )
    (row,) = read_avro(md["snapshots"][0]["manifest-list"])[1]
    n_files = len(read_avro(row["manifest_path"])[1])
    assert n_files == 4
    pruned = read_iceberg_table(spark, root, prune=[("k", "<", 10)])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.filter(F.col("k") < 10).count() == 10
    # only the file(s) whose bounds include [0, 10) survive the prune
    assert plan.count(".parquet") < n_files


def test_migrated_idless_files_survive_rename(spark, tmp_path):
    """The point of the emitted name-mapping: an engine later renames a
    column (metadata-only ALTER — simulated by hand-editing the tree
    the way any catalog would), and the id-less migrated files keep
    serving values through the mapping."""
    src, _ = _plain_dir(spark, tmp_path, partitioned=False)
    root = str(tmp_path / "iceberg")
    meta_dir = migrate_parquet_dir(spark, root, src)
    meta_path = os.path.join(meta_dir, "v1.metadata.json")
    md = json.load(open(meta_path))
    v_id = next(
        f["id"] for f in md["schema"]["fields"] if f["name"] == "v"
    )
    new_fields = [
        dict(f, name="value" if f["name"] == "v" else f["name"])
        for f in md["schema"]["fields"]
    ]
    new_schema = {"type": "struct", "schema-id": 1, "fields": new_fields}
    md["schemas"].append(new_schema)
    md["schema"] = new_schema
    md["current-schema-id"] = 1
    md["snapshots"][0]["schema-id"] = 1
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    for e in nm:
        if e["field-id"] == v_id:
            e["names"].append("value")
    md["properties"]["schema.name-mapping.default"] = json.dumps(nm)
    with open(meta_path, "w") as fh:
        json.dump(md, fh)
    got = read_iceberg_table(spark, root)
    assert "value" in got.columns
    assert got.filter(F.col("value") == 2 * F.col("k")).count() == 90


def test_migrate_rejects_inconsistent_layout_and_empty(spark, tmp_path):
    src = str(tmp_path / "lake")
    os.makedirs(os.path.join(src, "g=1"))
    spark.range(3).write.parquet(os.path.join(src, "g=1", "sub"))
    # a file at the root next to a partition dir: inconsistent
    import shutil

    for f in os.listdir(os.path.join(src, "g=1", "sub")):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(src, "g=1", "sub", f), os.path.join(src, f)
            )
    with pytest.raises(ValueError, match="inconsistent|unknown"):
        migrate_parquet_dir(spark, str(tmp_path / "t"), src)
    with pytest.raises(ValueError, match="no parquet files"):
        migrate_parquet_dir(
            spark, str(tmp_path / "t2"), str(tmp_path / "empty")
        )
