"""Exact-semantics schema inference — the reference's type lattice on Spark.

The reference (converter/converter.go:185-303) samples the first
``sample_rows`` data rows and folds per-column types through a widening
lattice, starting optimistically at INT64:

- truly empty cells are skipped (never widen) — :231-233; a
  whitespace-only cell is NOT skipped: inferType trims it to "" and
  returns typeString, so it votes string and widens the column
- bool = case-insensitive literal true/false — :248-251
- int  = Go ``strconv.ParseInt`` (so ``+5`` ok, ``1e3`` not) — :254-256
- float = ``ParseFloat`` (so ``1e3``, ``NaN``, ``Inf``) — :259-261
- dates are *recognized* then deliberately demoted to string — :264-275
- lattice: string ⊤; int+float→float; bool+number→string — :282-303
- all-empty column stays INT64 (all NULL) — :214-217

Spark realization: read the sample all-string, run ONE aggregation pass
computing per-column try_cast success counts, then decide each column's
type from the counts. The count formulation is equivalent to the
pairwise fold because the lattice is a join-semilattice and inference
classes (bool / int / float-not-int / other) are disjoint:

  all bool            → BOOLEAN
  all int             → INT64   (also the empty-sample default)
  all float           → DOUBLE  (ints count as floats)
  anything else mixed → STRING  (covers bool+number, dates, text)

At scale this is O(sample) work: the converter stages the file's
first n+1 physical lines as a tiny local file (converter.py
``infer_file_schema`` — a ``limit(n)`` over the full scan would plan a
LocalLimit into EVERY split), so the single agg is one job over one
tiny partition regardless of input size.

Enhanced (non-parity) mode also probes the reference's six date/time
layouts (converter/converter.go:264-271) and, when every non-empty
value matches one layout, types the column DATE/TIMESTAMP instead of
demoting to string.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# the reference's six probed layouts, converter/converter.go:264-271
# (Go layout → Spark datetime pattern), probe order preserved: DD/MM
# before MM/DD, so 03/04/2025 is April 3rd.
DATE_PATTERNS = ["yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy"]
TIMESTAMP_PATTERNS = [
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ssXXX",  # RFC 3339
]


@dataclass
class InferredColumn:
    name: str  # cleaned name
    raw_name: str  # name as it appears in the CSV header
    kind: str  # int64 | float64 | bool | string | date | timestamp

    @property
    def spark_type(self) -> DataType:
        return {
            "int64": LongType(),
            "float64": DoubleType(),
            "bool": BooleanType(),
            "string": StringType(),
            "date": DateType(),
            "timestamp": TimestampNTZType(),
        }[self.kind]


def infer_column_kinds(
    sample: DataFrame, enhanced_dates: bool = False
) -> dict[str, str]:
    """One aggregation pass over an all-string sample → column kinds.

    The whole vote matrix is ONE SQL ``struct(...)`` expression built
    as a string: per-column Column construction (4-6 expressions × N
    columns, each a handful of py4j round trips) measured ~0.5 s of
    pure driver-side chatter per file at 16 columns — a single
    ``F.expr`` ships the same plan in one call. Semantics per cell,
    unchanged: the reference skips only truly EMPTY cells
    (converter.go:231-233); a whitespace-only cell trims to "" inside
    inferType and votes string — it counts toward n but matches no
    type class.
    """

    def cnt(cond: str, alias: str) -> str:
        return f"count(CASE WHEN {cond} THEN 1 END) AS {alias}"

    parts = []
    for idx, name in enumerate(sample.columns):
        raw = f"`{name}`"
        v = f"trim({raw})"
        ne = f"({raw} IS NOT NULL AND {raw} != '')"
        cls = f"({ne} AND {v} != '')"
        parts.append(cnt(ne, f"c{idx}_n"))
        parts.append(
            cnt(f"{cls} AND lower({v}) IN ('true', 'false')", f"c{idx}_b")
        )
        parts.append(
            cnt(f"{cls} AND try_cast({v} AS BIGINT) IS NOT NULL", f"c{idx}_i")
        )
        parts.append(
            cnt(f"{cls} AND try_cast({v} AS DOUBLE) IS NOT NULL", f"c{idx}_f")
        )
        if enhanced_dates:
            # the 6-layout probes are only consulted in enhanced mode;
            # in parity mode dates demote to string anyway
            # (converter.go:272-275)
            def q(p: str) -> str:  # SQL string literal, '' escaping
                return "'" + p.replace("'", "''") + "'"

            date_probe = "coalesce(" + ", ".join(
                f"try_to_timestamp({v}, {q(p)})" for p in DATE_PATTERNS
            ) + ") IS NOT NULL"
            ts_probe = "coalesce(" + ", ".join(
                f"try_to_timestamp({v}, {q(p)})" for p in TIMESTAMP_PATTERNS
            ) + ") IS NOT NULL"
            parts.append(cnt(f"{cls} AND {date_probe}", f"c{idx}_d"))
            parts.append(cnt(f"{cls} AND {ts_probe}", f"c{idx}_t"))
    row = (
        sample.agg(F.expr(f"struct({', '.join(parts)})").alias("s"))
        .collect()[0]["s"]
    )

    kinds: dict[str, str] = {}
    for idx, name in enumerate(sample.columns):
        n = row[f"c{idx}_n"]
        b = row[f"c{idx}_b"]
        i = row[f"c{idx}_i"]
        fl = row[f"c{idx}_f"]
        d = row[f"c{idx}_d"] if enhanced_dates else 0
        t = row[f"c{idx}_t"] if enhanced_dates else 0
        if n == 0:
            kinds[name] = "int64"  # optimistic default, converter.go:214-217
        elif b == n:
            kinds[name] = "bool"
        elif i == n:
            kinds[name] = "int64"
        elif fl == n:
            kinds[name] = "float64"
        elif enhanced_dates and d == n:
            kinds[name] = "date"
        elif enhanced_dates and t == n:
            kinds[name] = "timestamp"
        else:
            kinds[name] = "string"  # string is ⊤; dates demote here in parity
    return kinds


def cast_column(kind: str, name: str) -> F.Column:
    """Write-time per-cell parse with the reference's silent-NULL
    semantics (converter/converter.go:380-412): trim; empty → NULL in
    every type (a string column never holds ''); parse failure → NULL
    (what happens to post-sample lattice violations)."""
    v = F.nullif(F.trim(F.col(name)), F.lit(""))
    if kind == "int64":
        return v.try_cast("bigint")
    if kind == "float64":
        return v.try_cast("double")
    if kind == "bool":
        return F.when(F.lower(v) == "true", F.lit(True)).when(
            F.lower(v) == "false", F.lit(False)
        )
    if kind == "date":
        return F.coalesce(*[F.try_to_timestamp(v, F.lit(p)) for p in DATE_PATTERNS]).cast(
            "date"
        )
    if kind == "timestamp":
        return F.coalesce(
            *[F.try_to_timestamp(v, F.lit(p)) for p in TIMESTAMP_PATTERNS]
        ).cast("timestamp_ntz")
    return v  # string


def to_struct_type(cols: list[InferredColumn]) -> StructType:
    # every field nullable — parquet repetitiontype=OPTIONAL parity
    # (converter/converter.go:308)
    return StructType([StructField(c.name, c.spark_type, True) for c in cols])


def format_schema(cols: list[InferredColumn]) -> str:
    """Debug render, reference formatSchema (converter/converter.go:414-420)."""
    labels = {
        "int64": "INT64",
        "float64": "DOUBLE",
        "bool": "BOOLEAN",
        "string": "UTF8",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
    }
    return ", ".join(f"{c.name}:{labels[c.kind]}" for c in cols)
