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


def _dtype_class(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


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
    # Driver-hash tripwire: the driver's value hash renders 387 and
    # 387.0 differently, so an int column on one engine vs a float on
    # the other (DuckDB HUGEINT → float64 is the classic case — a
    # SUM(...) missing a CAST(... AS BIGINT)) is a red driver row even
    # when the values compare numerically equal. Only null-free columns
    # are checked: a nullable int legitimately arrives as float64+NaN.
    for col in sc:
        a_cls, b_cls = _dtype_class(spark_pdf[col]), _dtype_class(duck_pdf[col])
        if (
            {a_cls, b_cls} == {"int", "float"}
            and not spark_pdf[col].isna().any()
            and not duck_pdf[col].isna().any()
        ):
            problems.append(
                f"dtype class [{col}]: spark={spark_pdf[col].dtype} "
                f"duck={duck_pdf[col].dtype} — driver hash would mismatch; "
                f"add CAST(... AS BIGINT) to the oracle or align the Spark type"
            )
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
