"""Order-insensitive DataFrame comparison + DuckDB oracle helpers —
mirrors the driver's correctness gate (row count, column names, values)."""

from __future__ import annotations

import duckdb
import pandas as pd

from .. import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~((av.isna() & bv.isna()) | (abs(av - bv) <= 1e-9 + 1e-9 * abs(bv)))
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        if bad.any():
            i = bad.idxmax()
            return False, f"value mismatch col={c} row={i}: {a[c][i]!r} vs {b[c][i]!r}"
    return True, ""


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    return values_match(canon(a), canon(b))
