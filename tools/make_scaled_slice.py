"""Build a k×-replicated copy of an existing testdata slice for local
scale stress (VERDICT r4 item 5). NOT driver data — the driver's
/root/testdata is read-only and stays untouched; output goes to a
scratch directory.

Replication strategy: k copies of each fact with key shifts that keep
FK integrity (orders/lineitem share the orderkey shift; events shift
event_id and user_id; documents/embeddings shift doc_id/vec_id but keep
CONTENT identical). Identical content is the point — a 10× replicated
corpus has every document in a 10-member exact-duplicate class, so the
dedup caps (SHINGLE_DF_CAP, LSH max_bucket, SemDeDup cluster cap) that
are no-ops on the gate corpora actually ENGAGE, and the oracle pairing
can be proven in the engaged regime, not just the idle one.

Dimensions (region/nation/customer/supplier/part) are copied 1:1 so
per-dimension join fan-in grows k× — the realistic shape (facts grow,
dimensions don't).

Usage: python tools/make_scaled_slice.py /root/testdata/sf0.1 /tmp/sf1r 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]


def build(
    src: str,
    dst: str,
    k: int,
    doc_limit: int | None = None,
    skewed: bool = False,
) -> None:
    """doc_limit keeps only the first N base documents before
    replication — used by tests/test_engaged_caps.py to build a slice
    whose caps engage in seconds instead of minutes.

    skewed=True additionally redraws the three hottest join/agg keys —
    events.user_id, orders.o_custkey, lineitem.l_partkey — from a
    Zipf(≈1) distribution over their ORIGINAL FK domain (floor(N^u)
    with u uniform from a deterministic hash is log-uniform, i.e.
    frequency ∝ 1/key): the heaviest user/customer/part absorbs a
    constant fraction of all rows no matter the scale, which is the
    regime where a uniform-slice gate silently under-tests shuffles,
    windows, and AQE skew-join handling (VERDICT r6 item 3). FK
    integrity is preserved because draws stay inside [1, max(base key)]
    and dimensions are copied 1:1."""
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def zipf(seed_expr: str, n: int) -> str:
        """Deterministic Zipf(≈1) draw in [1, n]: hash → u ∈ [0,1) →
        floor(n^u) (log-uniform ⇒ P(key) ∝ 1/key)."""
        u = f"((hash({seed_expr}) % 1048576) / 1048576.0)"
        return f"LEAST({n}, GREATEST(1, CAST(floor(power({n}, {u})) AS BIGINT)))"

    def write(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    def p(table: str) -> str:
        return f"'{src}/{table}.parquet'"

    for t in COPY_AS_IS:
        write(t, f"SELECT * FROM {p(t)}")

    ok = con.sql(f"SELECT max(o_orderkey) + 1 FROM {p('orders')}").fetchone()[0]
    custkey = "o_custkey"
    partkey = "l_partkey"
    if skewed:
        maxcust = con.sql(f"SELECT max(c_custkey) FROM {p('customer')}").fetchone()[0]
        maxpart = con.sql(f"SELECT max(p_partkey) FROM {p('part')}").fetchone()[0]
        custkey = zipf(f"o_orderkey + r.k * {ok}", maxcust) + " AS o_custkey"
        partkey = (
            zipf(f"(l_orderkey + r.k * {ok}) * 16 + l_linenumber", maxpart)
            + " AS l_partkey"
        )
    write(
        "orders",
        f"""SELECT o_orderkey + r.k * {ok} AS o_orderkey, {custkey},
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {p('orders')}, range({k}) AS r(k)""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey + r.k * {ok} AS l_orderkey, {partkey}, l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {p('lineitem')}, range({k}) AS r(k)""",
    )

    ev = con.sql(f"SELECT max(event_id) + 1 FROM {p('events')}").fetchone()[0]
    uid = con.sql(f"SELECT max(user_id) + 1 FROM {p('events')}").fetchone()[0]
    userkey = (
        zipf(f"event_id + r.k * {ev}", uid - 1) + " AS user_id"
        if skewed
        else f"user_id + r.k * {uid} AS user_id"
    )
    write(
        "events",
        f"""SELECT event_id + r.k * {ev} AS event_id, ts,
                   {userkey}, event_type, value, props
            FROM {p('events')}, range({k}) AS r(k)""",
    )

    did = con.sql(f"SELECT max(doc_id) + 1 FROM {p('documents')}").fetchone()[0]
    doc_where = f"WHERE doc_id < {doc_limit}" if doc_limit is not None else ""
    write(
        "documents",
        f"""SELECT doc_id + r.k * {did} AS doc_id, text, lang, source, n_chars
            FROM (SELECT * FROM {p('documents')} {doc_where}), range({k}) AS r(k)""",
    )

    vid = con.sql(f"SELECT max(vec_id) + 1 FROM {p('embeddings')}").fetchone()[0]
    write(
        "embeddings",
        f"""SELECT vec_id + r.k * {vid} AS vec_id, embedding, label
            FROM {p('embeddings')}, range({k}) AS r(k)""",
    )


if __name__ == "__main__":
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    build(src, dst, k)
