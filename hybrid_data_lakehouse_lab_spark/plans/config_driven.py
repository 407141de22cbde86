"""Config-driven queries — SQL *generated from the declarative table
spec* (ddl.TableSpec), proving the S10 layer end-to-end: one spec powers
both the Spark plan and the DuckDB oracle, the way the reference's YAML
powers Pinot's schema/table JSON (reference:
scripts/pinot_auto/generate_pinot_configs.py:33-141).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..ddl import TableSpec
from ..sources import load_table
from .registry import register

_CONF = os.path.join(os.path.dirname(__file__), "..", "conf", "tables.yaml")
with open(_CONF) as _f:
    SPECS = TableSpec.all_from_yaml(_f.read())

_CURRENT = SPECS["events_current"]
_HISTORY = SPECS["events_history"]

# One generated string serves both engines: ANSI row_number() window.
_CURRENT_SQL = _CURRENT.current_view_sql(source="events")


@register("config_current_state_view", oracle=_CURRENT_SQL)
def config_current_state_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins current state, compiled from conf/tables.yaml's upsert
    block (primary_key=user_id, comparisonColumn=ts). The Spark side runs
    the *same generated SQL* as the oracle — the spec is the single source
    of truth, as with the reference's YAML → Pinot upsertConfig."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_CURRENT_SQL)


@register(
    "config_defaults_applied",
    oracle="""
    SELECT doc_id, user_id, event_type, coalesce(value, 0.0) AS value
    FROM (
      SELECT e.event_id AS doc_id, e.user_id, e.event_type,
             CASE WHEN e.event_type = 'error' THEN NULL ELSE e.value END AS value
      FROM events e
    )
    """,
)
def config_defaults_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """defaultNullValue semantics (generate_pinot_configs.py:54-55) via
    the spec's fillna map: null out `value` on error events, then apply
    the spec default (0.0). The oracle inlines the identical coalesce."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("doc_id"),
        "user_id",
        "event_type",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    return _CURRENT.apply_defaults(ev)
