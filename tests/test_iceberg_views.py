"""Iceberg view spec surface (operators/iceberg_view.py + the catalog's
/views routes): metadata shape, commit semantics, rename/drop, error
envelopes, and dialect selection.
"""

from __future__ import annotations

import json

import pytest

from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    export_iceberg_metadata,
)
from hybrid_data_lakehouse_lab_spark.operators.iceberg_view import (
    apply_view_commit,
    create_view_metadata,
    create_view_via_catalog,
    read_iceberg_view,
    replace_view_via_catalog,
)
from hybrid_data_lakehouse_lab_spark.operators.rest_catalog import (
    IcebergRestCatalog,
    _rest_call,
    rest_get,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable


@pytest.fixture()
def catalog(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "numbers"))
    t.write(
        spark.range(100).selectExpr("id", "pmod(id, 4) AS g"),
        committed_at_ms=1,
    )
    export_iceberg_metadata(t, format_version=2)
    cat = IcebergRestCatalog(
        {("lake", "numbers"): t.root}, warehouse_dir=str(tmp_path)
    )
    uri = cat.start()
    yield uri
    cat.stop()


def test_view_metadata_shape(tmp_path):
    md = create_view_metadata(
        "SELECT 1 AS x",
        [{"name": "x", "type": "int", "required": False}],
        ["lake"],
        str(tmp_path / "v"),
    )
    assert md["format-version"] == 1
    assert md["current-version-id"] == 1
    (v,) = md["versions"]
    assert v["representations"][0] == {
        "type": "sql",
        "sql": "SELECT 1 AS x",
        "dialect": "spark",
    }
    assert v["default-namespace"] == ["lake"]
    assert md["schemas"][0]["fields"][0]["id"] == 1
    assert md["version-log"] == [{"timestamp-ms": 1, "version-id": 1}]


def test_apply_view_commit_rules(tmp_path):
    md = create_view_metadata(
        "SELECT 1 AS x",
        [{"name": "x", "type": "int", "required": False}],
        ["lake"],
        str(tmp_path / "v"),
    )
    # uuid guard: failed requirement is a 409
    err = apply_view_commit(
        md, {"requirements": [{"type": "assert-view-uuid", "uuid": "no"}]}
    )
    assert err[0] == 409 and "uuid" in err[1]
    # unsupported requirement types are 400s even when named like uuid
    err = apply_view_commit(
        md,
        {"requirements": [{"type": "assert-table-uuid", "uuid": "x"}]},
    )
    assert err[0] == 400 and "unsupported" in err[1]
    # -1 pointers without preceding adds
    err = apply_view_commit(
        md,
        {
            "updates": [
                {
                    "action": "add-view-version",
                    "view-version": {
                        "schema-id": -1,
                        "representations": [
                            {"type": "sql", "sql": "SELECT 2", "dialect": "spark"}
                        ],
                    },
                }
            ]
        },
    )
    assert err[0] == 400 and "without a preceding" in err[1]
    # happy path: add schema + version + move pointer
    err = apply_view_commit(
        md,
        {
            "requirements": [
                {"type": "assert-view-uuid", "uuid": md["view-uuid"]}
            ],
            "updates": [
                {
                    "action": "add-schema",
                    "schema": {
                        "type": "struct",
                        "fields": [
                            {"id": 1, "name": "y", "type": "long"}
                        ],
                    },
                },
                {
                    "action": "add-view-version",
                    "view-version": {
                        "schema-id": -1,
                        "representations": [
                            {
                                "type": "sql",
                                "sql": "SELECT 2 AS y",
                                "dialect": "spark",
                            }
                        ],
                    },
                },
                {
                    "action": "set-current-view-version",
                    "view-version-id": -1,
                },
            ],
        },
    )
    assert err is None
    assert md["current-version-id"] == 2
    assert md["versions"][1]["schema-id"] == 1
    assert [e["version-id"] for e in md["version-log"]] == [1, 2]


def test_view_crud_over_http(spark, catalog):
    uri = catalog
    create_view_via_catalog(
        spark, uri, ["lake"], "evens",
        "SELECT id FROM numbers WHERE id % 2 = 0",
    )
    vurl = f"{uri}/v1/namespaces/lake/views/evens"
    assert read_iceberg_view(spark, vurl).count() == 50
    # HEAD exists / GET unknown 404s with the view error type
    with pytest.raises(ValueError, match="NoSuchViewException"):
        rest_get(f"{uri}/v1/namespaces/lake/views/ghost")
    # rename, then the old name is gone
    _rest_call(
        f"{uri}/v1/views/rename",
        "POST",
        {
            "source": {"namespace": ["lake"], "name": "evens"},
            "destination": {"namespace": ["lake"], "name": "evens2"},
        },
    )
    with pytest.raises(ValueError, match="NoSuchViewException"):
        rest_get(vurl)
    vurl2 = f"{uri}/v1/namespaces/lake/views/evens2"
    assert read_iceberg_view(spark, vurl2).count() == 50
    # a view cannot shadow a table name
    with pytest.raises(ValueError, match="AlreadyExistsException"):
        create_view_via_catalog(
            spark, uri, ["lake"], "numbers", "SELECT 1 AS x"
        )
    # drop
    _rest_call(vurl2, "DELETE")
    assert rest_get(f"{uri}/v1/namespaces/lake/views") == {
        "identifiers": []
    }
    # namespace emptiness accounts for views
    create_view_via_catalog(
        spark, uri, ["lake"], "v3", "SELECT id FROM numbers"
    )
    with pytest.raises(ValueError, match="NamespaceNotEmptyException"):
        _rest_call(f"{uri}/v1/namespaces/lake", "DELETE")


def test_view_replace_keeps_history_and_schema(spark, catalog):
    uri = catalog
    create_view_via_catalog(
        spark, uri, ["lake"], "agg",
        "SELECT g, count(*) AS n FROM numbers GROUP BY g",
    )
    res = replace_view_via_catalog(
        spark, uri, ["lake"], "agg",
        "SELECT g, sum(id) AS s FROM numbers GROUP BY g",
    )
    md = res["metadata"]
    assert md["current-version-id"] == 2
    assert len(md["schemas"]) == 2
    # each version reads under its own definition
    vurl = f"{uri}/v1/namespaces/lake/views/agg"
    assert set(read_iceberg_view(spark, vurl).columns) == {"g", "s"}
    assert set(
        read_iceberg_view(spark, vurl, version=1).columns
    ) == {"g", "n"}
    with pytest.raises(ValueError, match="no version 9"):
        read_iceberg_view(spark, vurl, version=9)


def test_view_dialect_preference(spark, catalog):
    uri = catalog
    # a foreign-dialect rep rides along; spark rep is preferred
    _rest_call(
        f"{uri}/v1/namespaces/lake/views",
        "POST",
        {
            "name": "multi",
            "schema": {
                "type": "struct",
                "fields": [{"name": "id", "type": "long"}],
            },
            "view-version": {
                "representations": [
                    {
                        "type": "sql",
                        "sql": "SELECT id FROM numbers FETCH FIRST 3 ROWS ONLY",
                        "dialect": "trino",
                    },
                    {
                        "type": "sql",
                        "sql": "SELECT id FROM numbers LIMIT 3",
                        "dialect": "spark",
                    },
                ],
                "default-namespace": ["lake"],
            },
        },
    )
    vurl = f"{uri}/v1/namespaces/lake/views/multi"
    assert read_iceberg_view(spark, vurl).count() == 3
    md = rest_get(vurl)["metadata"]
    assert len(md["versions"][0]["representations"]) == 2


def test_view_commit_uuid_mismatch_409(spark, catalog):
    uri = catalog
    create_view_via_catalog(
        spark, uri, ["lake"], "guarded", "SELECT id FROM numbers"
    )
    vurl = f"{uri}/v1/namespaces/lake/views/guarded"
    before = rest_get(vurl)["metadata-location"]
    with pytest.raises(ValueError, match="CommitFailedException"):
        _rest_call(
            vurl,
            "POST",
            {
                "requirements": [
                    {"type": "assert-view-uuid", "uuid": "wrong"}
                ],
                "updates": [
                    {
                        "action": "set-properties",
                        "updates": {"x": "1"},
                    }
                ],
            },
        )
    assert rest_get(vurl)["metadata-location"] == before


def test_table_create_and_rename_cannot_shadow_view(spark, catalog):
    uri = catalog
    create_view_via_catalog(
        spark, uri, ["lake"], "shadow", "SELECT id FROM numbers"
    )
    # CREATE TABLE over the view name
    with pytest.raises(ValueError, match="AlreadyExistsException"):
        _rest_call(
            f"{uri}/v1/namespaces/lake/tables",
            "POST",
            {
                "name": "shadow",
                "schema": {
                    "type": "struct",
                    "fields": [{"name": "id", "type": "long"}],
                },
            },
        )
    # RENAME TABLE onto the view name
    with pytest.raises(ValueError, match="AlreadyExistsException"):
        _rest_call(
            f"{uri}/v1/tables/rename",
            "POST",
            {
                "source": {"namespace": ["lake"], "name": "numbers"},
                "destination": {"namespace": ["lake"], "name": "shadow"},
            },
        )


def test_rename_view_to_unknown_namespace_404(spark, catalog):
    uri = catalog
    create_view_via_catalog(
        spark, uri, ["lake"], "homeless", "SELECT id FROM numbers"
    )
    with pytest.raises(ValueError, match="NoSuchNamespaceException"):
        _rest_call(
            f"{uri}/v1/views/rename",
            "POST",
            {
                "source": {"namespace": ["lake"], "name": "homeless"},
                "destination": {"namespace": ["ghost"], "name": "x"},
            },
        )
    # still loadable at its original identity
    rest_get(f"{uri}/v1/namespaces/lake/views/homeless")


def test_replaced_view_schema_fields_carry_ids(spark, catalog):
    uri = catalog
    create_view_via_catalog(
        spark, uri, ["lake"], "ids",
        "SELECT g, count(*) AS n FROM numbers GROUP BY g",
    )
    res = replace_view_via_catalog(
        spark, uri, ["lake"], "ids",
        "SELECT g, sum(id) AS s FROM numbers GROUP BY g",
    )
    for schema in res["metadata"]["schemas"]:
        ids = [f.get("id") for f in schema["fields"]]
        assert all(ids), schema
        assert len(set(ids)) == len(ids)


def test_read_view_drops_its_temp_views(spark, catalog):
    uri = catalog
    create_view_via_catalog(
        spark, uri, ["lake"], "tidy", "SELECT id FROM numbers"
    )
    df = read_iceberg_view(
        spark, f"{uri}/v1/namespaces/lake/views/tidy"
    )
    # the helper's temp view is gone; the DataFrame still executes
    # (analysis resolved the relation eagerly)
    assert not any(
        t.name == "numbers" and t.tableType == "TEMPORARY"
        for t in spark.catalog.listTables()
    )
    assert df.count() == 100
