"""DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate: run a catalog query through
Spark AND its oracle SQL through DuckDB over the same parquet tables,
then compare row count, column names, and order-insensitive values.
Used by tests/test_oracle_parity.py so every catalog entry is verified
locally before the driver ever sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from csv_to_parquet_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    import datetime

    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            non_null = s.dropna()
            if len(non_null) and isinstance(non_null.iloc[0], datetime.date):
                # Spark DATE arrives as datetime.date objects; DuckDB
                # DATE as datetime64 — unify
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                # unify None representations for sorting
                df[c] = s.where(pd.notna(s), None)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
            drop=True
        )
    return df


def _values_equal(a: Any, b: Any) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b


def compare_frames(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, max_report: int = 5
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
    if problems:
        return problems
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    n_bad = 0
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not _values_equal(a, b):
                n_bad += 1
                if n_bad <= max_report:
                    problems.append(f"value [{col}][row {i}]: spark={a!r} duck={b!r}")
    if n_bad > max_report:
        problems.append(f"... {n_bad} mismatched values total")
    return problems
