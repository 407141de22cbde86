"""CLI console coverage: list/oracle are Spark-free; run/sql/tables ride
the shared session fixture through main(argv)."""

from __future__ import annotations

import pytest

from hybrid_data_lakehouse_lab_spark.__main__ import build_parser, main


def test_list_all_and_filtered(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "dedup_exact" in out
    assert main(["list", "dedup_"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact" in out and "q1_pricing_summary" not in out
    assert main(["list", "no_such_query_zzz"]) == 1


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in capsys.readouterr().out
    assert main(["oracle", "nope"]) == 1


def test_run_unknown_query_fails():
    assert main(["run", "nope"]) == 1


def test_run_and_sql_and_tables(spark, sf_dir, capsys):
    # `spark` fixture already owns the session; _spark() getOrCreate()s it.
    assert main(["run", "revenue_rollup", "--sf-dir", sf_dir, "-n", "3"]) == 0
    assert "revenue" in capsys.readouterr().out
    assert (
        main(["sql", "SELECT count(*) AS n FROM region", "--sf-dir", sf_dir])
        == 0
    )
    assert "5" in capsys.readouterr().out


def test_parser_rejects_missing_command():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])
