"""REST-catalog protocol conformance (round 11, VERDICT r10 item 5):
the spec's OAuth2 token endpoint, an error-envelope conformance table
(HTTP status <-> exception type per route, driven by one parameterized
test), and the pagination edges (empty namespace, pageSize=0, token
past the end).

Reference parity: the reference wires Spark through a Nessie REST
endpoint (libs/scd2_spark_processor.py:101-103); the public equivalent
is the Iceberg REST catalog OpenAPI spec, whose error envelopes and
token flow this file pins.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from hybrid_data_lakehouse_lab_spark.operators.rest_catalog import (
    IcebergRestCatalog,
    create_table_via_catalog,
    rest_create_namespace,
    rest_get,
)


def _post_form(url: str, form: dict) -> tuple[int, dict]:
    data = urllib.parse.urlencode(form).encode()
    req = urllib.request.Request(
        url,
        data=data,
        method="POST",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read().decode())


def _raw(url: str, method: str = "GET", body: dict | None = None):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as exc:
        return exc.code, exc.read()


# ---------------------------------------------------------------------------
# OAuth2 token endpoint
# ---------------------------------------------------------------------------


def test_oauth_client_credentials_flow(tmp_path):
    with IcebergRestCatalog({}, warehouse_dir=str(tmp_path)) as uri:
        code, tok = _post_form(
            f"{uri}/v1/oauth/tokens",
            {
                "grant_type": "client_credentials",
                "client_id": "spark",
                "client_secret": "s3cr3t",
                "scope": "catalog",
            },
        )
        assert code == 200
        assert tok["token_type"] == "bearer"
        assert tok["scope"] == "catalog"
        assert tok["expires_in"] == 3600
        assert tok["access_token"]
        # scope defaults to "catalog" when omitted (the spec default)
        code, tok2 = _post_form(
            f"{uri}/v1/oauth/tokens",
            {
                "grant_type": "client_credentials",
                "client_id": "spark",
                "client_secret": "s3cr3t",
            },
        )
        assert code == 200 and tok2["scope"] == "catalog"
        assert tok2["access_token"] != tok["access_token"]


def test_oauth_token_exchange_flow(tmp_path):
    with IcebergRestCatalog({}, warehouse_dir=str(tmp_path)) as uri:
        code, tok = _post_form(
            f"{uri}/v1/oauth/tokens",
            {
                "grant_type": "client_credentials",
                "client_id": "a",
                "client_secret": "b",
            },
        )
        assert code == 200
        code, swapped = _post_form(
            f"{uri}/v1/oauth/tokens",
            {
                "grant_type": (
                    "urn:ietf:params:oauth:grant-type:token-exchange"
                ),
                "subject_token": tok["access_token"],
                "subject_token_type": (
                    "urn:ietf:params:oauth:token-type:access_token"
                ),
            },
        )
        assert code == 200
        assert swapped["access_token"] != tok["access_token"]
        assert swapped["token_type"] == "bearer"


@pytest.mark.parametrize(
    "form, want_code, want_error",
    [
        # missing grant_type
        ({}, 400, "invalid_request"),
        # unknown grant
        ({"grant_type": "password"}, 400, "unsupported_grant_type"),
        # client_credentials without a secret
        (
            {"grant_type": "client_credentials", "client_id": "x"},
            401,
            "invalid_client",
        ),
        # token exchange without the subject token
        (
            {
                "grant_type": (
                    "urn:ietf:params:oauth:grant-type:token-exchange"
                )
            },
            400,
            "invalid_request",
        ),
    ],
)
def test_oauth_error_envelopes(tmp_path, form, want_code, want_error):
    """OAuth errors use the spec's OAuthErrorResponse — a FLAT
    {error, error_description} object with RFC 6749 codes, not the
    IcebergErrorResponse {"error": {...}} wrapper."""
    with IcebergRestCatalog({}, warehouse_dir=str(tmp_path)) as uri:
        code, body = _post_form(f"{uri}/v1/oauth/tokens", form)
        assert code == want_code
        assert body["error"] == want_error
        assert isinstance(body["error"], str)  # flat, not nested
        assert "error_description" in body


# ---------------------------------------------------------------------------
# Error-envelope conformance table (IcebergErrorResponse routes)
# ---------------------------------------------------------------------------

# (method, path-template, body, expected status, expected exception type)
# over a catalog seeded with namespace `ns` and empty table `ns.t`.
ENVELOPE_TABLE = [
    ("GET", "/v1/nope", None, 404, "NoSuchEndpointException"),
    ("GET", "/v1/namespaces/ghost", None, 404, "NoSuchNamespaceException"),
    (
        "GET",
        "/v1/namespaces/ghost/tables",
        None,
        404,
        "NoSuchNamespaceException",
    ),
    (
        "GET",
        "/v1/namespaces/ns/tables/ghost",
        None,
        404,
        "NoSuchTableException",
    ),
    (
        "GET",
        "/v1/namespaces/ns/views/ghost",
        None,
        404,
        "NoSuchViewException",
    ),
    (
        "POST",
        "/v1/namespaces",
        {"namespace": ["ns"]},
        409,
        "AlreadyExistsException",
    ),
    ("DELETE", "/v1/namespaces/ns", None, 409, "NamespaceNotEmptyException"),
    (
        "POST",
        "/v1/namespaces/ns/tables",
        {},  # create-table without a name
        400,
        "BadRequestException",
    ),
    (
        "POST",
        "/v1/tables/rename",
        {"source": {}, "destination": {}},
        400,
        "BadRequestException",
    ),
    (
        "POST",
        "/v1/namespaces/ns/tables/t",
        {
            "requirements": [
                {"type": "assert-ref-snapshot-id", "ref": "main",
                 "snapshot-id": 12345}
            ],
            "updates": [],
        },
        409,
        "CommitFailedException",
    ),
    (
        "POST",
        "/v1/namespaces/ns/tables/t",
        {
            "requirements": [],
            "updates": [{"action": "set-default-sort-order",
                         "sort-order-id": -1}],
        },
        400,
        "BadRequestException",
    ),
    # wrong verb on a data route
    ("DELETE", "/v1/namespaces", None, 405, "MethodNotAllowed"),
]


@pytest.mark.parametrize(
    "method, path, body, want_code, want_type",
    ENVELOPE_TABLE,
    ids=[f"{m} {p} -> {c} {t}" for m, p, _, c, t in ENVELOPE_TABLE],
)
def test_error_envelope_table(
    conformance_catalog, method, path, body, want_code, want_type
):
    uri = conformance_catalog
    code, raw = _raw(f"{uri}{path}", method, body)
    assert code == want_code, raw
    env = json.loads(raw)["error"]
    assert env["type"] == want_type
    assert env["code"] == want_code
    assert env["message"]


@pytest.fixture(scope="module")
def conformance_catalog(tmp_path_factory, request):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    cat = IcebergRestCatalog(
        {}, warehouse_dir=str(tmp_path_factory.mktemp("wh"))
    )
    uri = cat.__enter__()
    request.addfinalizer(lambda: cat.__exit__(None, None, None))
    rest_create_namespace(uri, ["ns"])
    create_table_via_catalog(uri, ["ns"], "t", schema)
    return uri


# ---------------------------------------------------------------------------
# Pagination edges
# ---------------------------------------------------------------------------


def test_pagination_edges(tmp_path):
    with IcebergRestCatalog({}, warehouse_dir=str(tmp_path)) as uri:
        rest_create_namespace(uri, ["empty"])
        # empty namespace: 200 with an empty identifiers list, not 404
        got = rest_get(f"{uri}/v1/namespaces/empty/tables")
        assert got == {"identifiers": []}
        # pageSize=0 violates the OpenAPI minimum(1): 400
        code, raw = _raw(f"{uri}/v1/namespaces/empty/tables?pageSize=0")
        assert code == 400
        assert json.loads(raw)["error"]["type"] == "BadRequestException"
        # pageSize=1 over the namespace listing pages deterministically
        rest_create_namespace(uri, ["zz"])
        page1 = rest_get(f"{uri}/v1/namespaces?pageSize=1")
        assert page1["namespaces"] == [["empty"]]
        tok = page1["next-page-token"]
        page2 = rest_get(f"{uri}/v1/namespaces?pageSize=1&pageToken={tok}")
        assert page2["namespaces"] == [["zz"]]
        assert "next-page-token" not in page2
        # a token past the end: empty page, no next token (stale-token
        # tolerance — listings shrink between pages)
        page3 = rest_get(f"{uri}/v1/namespaces?pageSize=1&pageToken=99")
        assert page3["namespaces"] == [] and "next-page-token" not in page3
        # corrupt token: 400
        code, raw = _raw(f"{uri}/v1/namespaces?pageToken=-3")
        assert code == 400


def test_namespace_parent_listing(tmp_path):
    """GET /v1/namespaces?parent=a lists the namespaces DIRECTLY under
    `a` (unit-separator-joined multi-part parents); unknown parent is
    404; the flat full listing stays the no-parent default."""
    with IcebergRestCatalog({}, warehouse_dir=str(tmp_path)) as uri:
        for ns in (["a"], ["a", "b"], ["a", "b", "c"], ["a", "d"], ["z"]):
            rest_create_namespace(uri, ns)
        got = rest_get(f"{uri}/v1/namespaces?parent=a")
        assert got["namespaces"] == [["a", "b"], ["a", "d"]]
        # grandchildren are not direct children
        deep = rest_get(f"{uri}/v1/namespaces?parent=a%1Fb")
        assert deep["namespaces"] == [["a", "b", "c"]]
        # leaf parent: empty listing, not an error
        leaf = rest_get(f"{uri}/v1/namespaces?parent=z")
        assert leaf["namespaces"] == []
        # unknown parent: 404 NoSuchNamespaceException
        code, raw = _raw(f"{uri}/v1/namespaces?parent=ghost")
        assert code == 404
        assert json.loads(raw)["error"]["type"] == "NoSuchNamespaceException"
        # no parent: the flat full listing (pre-existing contract)
        flat = rest_get(f"{uri}/v1/namespaces")
        assert [tuple(n) for n in flat["namespaces"]] == [
            ("a",), ("a", "b"), ("a", "b", "c"), ("a", "d"), ("z",),
        ]
        # parent composes with pagination
        page = rest_get(f"{uri}/v1/namespaces?parent=a&pageSize=1")
        assert page["namespaces"] == [["a", "b"]]
        assert page["next-page-token"]
