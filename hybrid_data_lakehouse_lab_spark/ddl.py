"""Declarative table-spec → Spark DDL compiler (SURVEY §2.1 S10 parity).

The reference ships a config generator (reference:
scripts/pinot_auto/generate_pinot_configs.py:33-141) that compiles YAML
table specs (scripts/pinot_auto/pinot_tables.yaml) — column roles
(dimension/metric/datetime), per-column ``default`` null values, upsert
config (``primary_key`` + ``comparison_column``), retention windows, and
segment-flush tuning — into Pinot schema/table JSON plus topic-creation
scripts. This module compiles the SAME declarative surface into Spark
artifacts:

| Reference output                       | Spark artifact here                       |
|----------------------------------------|-------------------------------------------|
| schema JSON (field specs + types)      | ``StructType`` (`struct_type`)             |
| table JSON (partitioning, retention,   | ``CREATE TABLE`` DDL + TBLPROPERTIES       |
|   flush thresholds)                    |   (`create_table_ddl`)                     |
| ``defaultNullValue`` per column        | fillna map (`defaults` / `apply_defaults`) |
| ``upsertConfig`` (PK + comparisonCol)  | latest-wins view SQL (`current_view_sql`)  |
| retention (30/90 days)                 | predicate SQL (`retention_predicate`)      |

Scale note: the spec's ``datetime`` role drives the partition column
(event-date), ``flush_threshold_rows`` maps to ``maxRecordsPerFile`` so
file sizes stay bounded on a 1000-executor write, and the generated
current-state view is the `row_number() = 1` pattern — one shuffle on the
primary key, map-side partial `max` unaffected.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional: specs may also be supplied as plain dicts
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

# Reference type names (pinot_tables.yaml) → Spark types.
_TYPE_MAP: dict[str, T.DataType] = {
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "BYTES": T.BinaryType(),
}


@dataclass
class ColumnSpec:
    name: str
    type: str
    role: str = "dimension"  # dimension | metric | datetime
    default: Any | None = None
    format: str = "1:MILLISECONDS:EPOCH"
    granularity: str = "1:MILLISECONDS"

    @property
    def spark_type(self) -> T.DataType:
        try:
            return _TYPE_MAP[self.type.upper()]
        except KeyError:
            raise ValueError(f"unsupported column type: {self.type!r}") from None


@dataclass
class TableSpec:
    name: str
    mode: str = "append"  # append | upsert
    columns: list[ColumnSpec] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    comparison_column: str | None = None
    tiebreak: list[str] = field(default_factory=list)
    time_column: str | None = None
    retention_value: int | None = None
    retention_unit: str = "DAYS"
    advanced: dict[str, Any] = field(default_factory=dict)
    description: str = ""

    # -- parsing -----------------------------------------------------------
    @classmethod
    def from_dict(cls, name: str, cfg: dict[str, Any]) -> TableSpec:
        cols = [
            ColumnSpec(
                name=c["name"],
                type=c["type"],
                role=c.get("field_type", "dimension"),
                default=c.get("default"),
                format=c.get("format", "1:MILLISECONDS:EPOCH"),
                granularity=c.get("granularity", "1:MILLISECONDS"),
            )
            for c in cfg.get("columns", [])
        ]
        upsert = cfg.get("upsert", {})
        retention = cfg.get("retention", {})
        return cls(
            name=name,
            mode=cfg.get("mode", "append"),
            columns=cols,
            primary_key=list(upsert.get("primary_key", [])),
            comparison_column=upsert.get("comparison_column"),
            tiebreak=list(upsert.get("tiebreak", [])),
            time_column=(cfg.get("time_column") or {}).get("name"),
            retention_value=retention.get("time_value"),
            retention_unit=retention.get("time_unit", "DAYS"),
            advanced=dict(cfg.get("advanced", {})),
            description=cfg.get("description", ""),
        )

    @classmethod
    def all_from_yaml(cls, text: str) -> dict[str, TableSpec]:
        if yaml is None:  # pragma: no cover
            raise ImportError("PyYAML unavailable; use TableSpec.from_dict")
        cfg = yaml.safe_load(text)
        return {n: cls.from_dict(n, c) for n, c in cfg.get("tables", {}).items()}

    # -- schema ------------------------------------------------------------
    def struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, True) for c in self.columns]
        )

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    # -- DDL ---------------------------------------------------------------
    def partition_column(self) -> str | None:
        """Event-date partition derived from the datetime-role column.

        The reference partitions bronze by a `dt` date string
        (scripts/cdc_to_parquet.py:158) and silver by
        `days(effective_start_ts)` (libs/scd2_spark_processor.py:151);
        both are day-granularity on the event-time column, which is what
        the spec's datetime role identifies.
        """
        dt_cols = [c for c in self.columns if c.role == "datetime"]
        return f"{dt_cols[0].name}_date" if dt_cols else None

    def create_table_ddl(self, location: str | None = None, using: str = "parquet") -> str:
        cols = ",\n  ".join(f"{c.name} {c.spark_type.simpleString().upper()}" for c in self.columns)
        part = self.partition_column()
        lines = [f"CREATE TABLE IF NOT EXISTS {self.name} (", f"  {cols}"]
        if part:
            lines[-1] += f",\n  {part} DATE"
        lines.append(f") USING {using}")
        if part:
            lines.append(f"PARTITIONED BY ({part})")
        if location:
            lines.append(f"LOCATION '{location}'")
        props = self.table_properties()
        if props:
            kv = ", ".join(f"'{k}' = '{v}'" for k, v in sorted(props.items()))
            lines.append(f"TBLPROPERTIES ({kv})")
        return "\n".join(lines)

    def table_properties(self) -> dict[str, str]:
        """Spec tuning → Spark/table properties (flush rows → bounded file
        size; retention recorded for the vacuum job; upsert keys recorded
        for the MERGE/current-view builders)."""
        props: dict[str, str] = {"spec.mode": self.mode}
        if self.description:
            props["comment"] = self.description
        if "flush_threshold_rows" in self.advanced:
            props["maxRecordsPerFile"] = str(self.advanced["flush_threshold_rows"])
        if self.retention_value is not None:
            props["spec.retention"] = f"{self.retention_value} {self.retention_unit}"
        if self.primary_key:
            props["spec.primaryKey"] = ",".join(self.primary_key)
        if self.comparison_column:
            props["spec.comparisonColumn"] = self.comparison_column
        return props

    # -- defaults (defaultNullValue → fillna) ------------------------------
    def defaults(self) -> dict[str, Any]:
        return {c.name: c.default for c in self.columns if c.default is not None}

    def apply_defaults(self, df: DataFrame) -> DataFrame:
        """Null-replace per the spec's ``default`` entries — the engine-side
        twin of Pinot's ``defaultNullValue``
        (generate_pinot_configs.py:54-55). Boolean fills use coalesce
        (fillna ignores bool columns)."""
        d = self.defaults()
        if not d:
            return df
        bools = {k: v for k, v in d.items() if isinstance(v, bool)}
        rest = {k: v for k, v in d.items() if not isinstance(v, bool)}
        if rest:
            df = df.fillna(rest)
        for name, v in bools.items():
            df = df.withColumn(name, F.coalesce(F.col(name), F.lit(v)))
        return df

    # -- upsert → current-state view (J3/W4 from config) -------------------
    def current_view_sql(self, source: str | None = None) -> str:
        """Latest-wins current-state SQL generated from the upsert config —
        the batch semantics of Pinot FULL upsert with comparisonColumn
        (pinot_tables.yaml:32-36): per primary key, the row with the
        greatest comparison value wins; ties broken by the full key order.
        ANSI row_number(), valid in Spark and DuckDB unchanged.
        """
        if self.mode != "upsert" or not self.primary_key or not self.comparison_column:
            raise ValueError(f"table {self.name} has no upsert config")
        src = source or self.name
        pk = ", ".join(self.primary_key)
        out = ", ".join(c.name for c in self.columns)
        order = ", ".join(f"{c} DESC" for c in [self.comparison_column, *self.tiebreak])
        return (
            f"SELECT {out} FROM ("
            f"SELECT *, row_number() OVER ("
            f"PARTITION BY {pk} ORDER BY {order}"
            f") AS rn FROM {src}) WHERE rn = 1"
        )

    # -- retention (T8) ----------------------------------------------------
    def retention_predicate(self, now_expr: str = "current_timestamp()") -> str:
        """Serving-retention filter over the datetime column (the engine
        twin of segment retention, pinot_tables.yaml:38-40)."""
        if self.retention_value is None or not self.time_column:
            return "true"
        unit = self.retention_unit.rstrip("S")  # DAYS → DAY
        col = self.time_column
        c = self.column(col)
        ts = f"to_timestamp({col} / 1000)" if c.type.upper() == "LONG" else col
        return f"{ts} >= {now_expr} - INTERVAL {self.retention_value} {unit}"
