"""Raw-SQL door: registered views answer ANSI SQL with full pushdown."""

from __future__ import annotations

from hybrid_data_lakehouse_lab_spark.sql import TABLES, register_views, sql


def test_views_register_and_answer_sql(spark, sf_dir):
    assert register_views(spark, sf_dir) == TABLES
    df = spark.sql(
        """
        SELECT n.n_name, round(sum(o.o_totalprice), 2) AS total
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY total DESC LIMIT 5
        """
    )
    rows = df.collect()
    assert len(rows) == 5 and rows[0]["total"] >= rows[-1]["total"]


def test_pushdown_reaches_scan_through_view(spark, sf_dir):
    df = sql(
        spark, sf_dir,
        "SELECT l_orderkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), pushed
