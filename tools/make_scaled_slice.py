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


def build(src: str, dst: str, k: int, doc_limit: int | None = None) -> None:
    """doc_limit keeps only the first N base documents before
    replication — used by tests/test_engaged_caps.py to build a slice
    whose caps engage in seconds instead of minutes."""
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

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
    write(
        "orders",
        f"""SELECT o_orderkey + r.k * {ok} AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {p('orders')}, range({k}) AS r(k)""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey + r.k * {ok} AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {p('lineitem')}, range({k}) AS r(k)""",
    )

    ev = con.sql(f"SELECT max(event_id) + 1 FROM {p('events')}").fetchone()[0]
    uid = con.sql(f"SELECT max(user_id) + 1 FROM {p('events')}").fetchone()[0]
    write(
        "events",
        f"""SELECT event_id + r.k * {ev} AS event_id, ts,
                   user_id + r.k * {uid} AS user_id, event_type, value, props
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
