"""Command-line console for the engine — the interactive-query role the
reference delegates to Trino/DBeaver (reference README "query the
lakehouse" step), expressed as a thin CLI over the same public API the
tests and the driver use.

Usage (python -m hybrid_data_lakehouse_lab_spark <cmd>):
    list [substr]              registered query names (optionally filtered)
    run <query> [--sf-dir D] [-n N] [--explain]
                               run one registered query, print N rows
    sql "<statement>" [--sf-dir D] [-n N]
                               ANSI SQL over the registered table views
    oracle <query>             print the query's DuckDB oracle SQL
    tables [--sf-dir D]        table names with row counts and schemas

Everything is read-only over the testdata parquet; exit code is nonzero
on unknown names so shell scripts can gate on it.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _spark():
    from .session import get_spark

    return get_spark("lakehouse-cli")


def cmd_list(args: argparse.Namespace) -> int:
    from .plans import ORACLES, QUERIES

    names = [n for n in QUERIES if args.substr in n]
    for n in names:
        marker = "" if n in ORACLES else "  (rows-only)"
        print(f"{n}{marker}")
    print(f"-- {len(names)} queries", file=sys.stderr)
    return 0 if names else 1


def cmd_run(args: argparse.Namespace) -> int:
    from .plans import QUERIES

    if args.query not in QUERIES:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 1
    df = QUERIES[args.query](_spark(), args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.n, truncate=False)
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    from .sql import sql

    sql(_spark(), args.sf_dir, args.statement).show(args.n, truncate=False)
    return 0


def cmd_oracle(args: argparse.Namespace) -> int:
    from .plans import ORACLES

    if args.query not in ORACLES:
        print(f"no oracle for: {args.query}", file=sys.stderr)
        return 1
    print(ORACLES[args.query])
    return 0


def cmd_tables(args: argparse.Namespace) -> int:
    from . import TABLES
    from .sources import load_table

    spark = _spark()
    for name in TABLES:
        df = load_table(spark, args.sf_dir, name)
        print(f"{name}  rows={df.count()}  {df.schema.simpleString()}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hybrid_data_lakehouse_lab_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="list registered queries")
    sp.add_argument("substr", nargs="?", default="")
    sp.set_defaults(fn=cmd_list)

    sp = sub.add_parser("run", help="run a registered query")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sp.add_argument("-n", type=int, default=20)
    sp.add_argument("--explain", action="store_true")
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("sql", help="run ANSI SQL over the table views")
    sp.add_argument("statement")
    sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sp.add_argument("-n", type=int, default=20)
    sp.set_defaults(fn=cmd_sql)

    sp = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    sp.add_argument("query")
    sp.set_defaults(fn=cmd_oracle)

    sp = sub.add_parser("tables", help="table row counts and schemas")
    sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sp.set_defaults(fn=cmd_tables)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
