"""Reusable column expressions — all JVM-side (no Python UDFs).

Staying inside ``pyspark.sql.functions`` keeps every expression in
whole-stage codegen; the LLM-pipeline operators build on these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal money double.

    ``sum(bigint)`` is associative/commutative exactly, so aggregates
    built on this are bit-identical in any partition merge order and in
    any engine — unlike double sums.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


#: DuckDB rendering of :func:`cents` — keep in sync.
def cents_sql(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization; DuckDB mirror:
    ``regexp_split_to_array(trim(x), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def dot_double(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns, accumulated in double,
    left-to-right — matches a sequential loop in any engine."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_sq(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = dot/(sqrt(|a|^2)*sqrt(|b|^2)), all double math."""
    return dot_double(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))
