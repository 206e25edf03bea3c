"""Conversion semantics as driver-visible, oracle-tested queries.

These make the reference-parity conversion core (SURVEY §2 Part A:
I1 inference lattice, P1 header cleaning, T1/T2 cell parse + padding,
F1 tolerance, K1 parquet sink) part of the correctness gate: each query
writes a deterministic, formula-generated CSV fixture, runs the real
converter end-to-end (sample → infer → cast → write parquet → read
back), and the DuckDB oracle regenerates the expected typed values
from the same formulas via range() — no golden files.

Reference traps covered (SURVEY §2 "subtle semantics"):
- optimistic INT64 start; empty column stays INT64 all-NULL
  (converter/converter.go:214-217)
- int+float→DOUBLE, bool+int→STRING widening (converter.go:282-303)
- case-insensitive true/false bools (converter.go:248-251)
- dates recognized then demoted to string (converter.go:272-275)
- post-sample lattice violation → silent NULL (converter.go:393-399)
- empty/whitespace cell → NULL in every type (converter.go:385-390)
- header BOM/trim/space/dot cleaning + column_%d (converter.go:201-211)
- short rows padded, extra cells dropped (converter.go:383-386)
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from csv_to_parquet_spark.convert.converter import convert_file
from csv_to_parquet_spark.operators import Catalog

CAT = Catalog()

_N_ROWS = 105  # > default 100-row sample so post-sample violations exist
_SAMPLE = 100


def _lattice_csv_rows() -> list[str]:
    rows = ["id,int_col,float_col,mixed_num,bool_col,bool_int,date_col,empty_col,late_viol"]
    for i in range(1, _N_ROWS + 1):
        rows.append(
            ",".join(
                [
                    str(i),
                    str(i * 3),
                    f"{i}.5",
                    str(i) if i % 2 == 1 else f"{i}.25",
                    "true" if i % 2 == 1 else "FALSE",
                    "true" if i <= 50 else str(i),
                    f"2024-01-{(i % 28) + 1:02d}",
                    "",
                    str(i) if i <= _SAMPLE else "oops",
                ]
            )
        )
    return rows


def _convert_fixture(
    spark: SparkSession, name: str, lines: list[str], **kw
) -> DataFrame:
    d = tempfile.mkdtemp(prefix=f"csv2pq_{name}_")
    src = os.path.join(d, f"{name}.csv")
    with open(src, "w", encoding="utf-8", newline="") as f:
        f.write("\n".join(lines) + "\n")
    res = convert_file(spark, src, output_dir=d, **kw)
    if not res.ok:
        raise RuntimeError(f"fixture conversion failed: {res.error}")
    return spark.read.parquet(res.output)


@CAT.query(
    "convert_lattice_roundtrip",
    oracle=f"""
    SELECT i AS id,
           (i * 3)::BIGINT AS int_col,
           i + 0.5 AS float_col,
           CASE WHEN i % 2 = 1 THEN i::DOUBLE ELSE i + 0.25 END AS mixed_num,
           (i % 2 = 1) AS bool_col,
           CASE WHEN i <= 50 THEN 'true' ELSE i::VARCHAR END AS bool_int,
           '2024-01-' || lpad(((i % 28) + 1)::VARCHAR, 2, '0') AS date_col,
           NULL::BIGINT AS empty_col,
           CASE WHEN i <= {_SAMPLE} THEN i ELSE NULL END::BIGINT AS late_viol
    FROM range(1, {_N_ROWS + 1}) r(i)
    """,
)
def convert_lattice_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end conversion of a 105-row fixture exercising the full
    widening lattice; the oracle regenerates expected typed values from
    the same row formulas. ``.5``/``.25`` fractions are binary-exact so
    double comparisons are bitwise."""
    return _convert_fixture(spark, "lattice", _lattice_csv_rows())


@CAT.query(
    "convert_header_cleaning",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'id'), (2, 'name_full'), (3, 'a_b_c'), (4, 'column_3')
    ) t(pos, column_name)
    """,
)
def convert_header_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header normalization parity: BOM strip → trim → spaces→_ →
    dots→_ → empty→column_%d (converter/converter.go:201-211)."""
    lines = ["﻿id, name full ,a.b.c,", "1,alice,x,y", "2,bob,x,y"]
    out = _convert_fixture(spark, "headers", lines)
    return spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(out.columns)], "pos INT, column_name STRING"
    )


@CAT.query(
    "convert_robustness",
    oracle="""
    SELECT * FROM (VALUES
      (1::BIGINT, 'x',        'y'),
      (2::BIGINT, 'x',        NULL),
      (3::BIGINT, 'x',        'y'),
      (4::BIGINT, 'qu,oted',  'y'),
      (5::BIGINT, 'with"esc', 'y'),
      (6::BIGINT, NULL,       'y')
    ) t(a, b, c)
    """,
)
def convert_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-shape tolerance: short rows padded with trailing NULLs,
    extra cells dropped, quoted delimiters and escaped quotes kept,
    whitespace-only cell → NULL (converter.go:383-390)."""
    lines = [
        "a,b,c",
        "1,x,y",
        "2,x",  # short → c NULL
        "3,x,y,z",  # extra cell dropped
        '4,"qu,oted",y',  # quoted delimiter
        '5,"with""esc",y',  # escaped quote
        "6,   ,y",  # whitespace-only → NULL even in a string column
    ]
    return _convert_fixture(spark, "robust", lines)


@CAT.query(
    "convert_enhanced_dates",
    oracle="""
    SELECT i AS id,
           CAST('2024-01-01'::DATE + INTERVAL ((i - 1) % 28) DAY AS TIMESTAMP) AS iso_date_ts,
           CAST('2024-03-01'::TIMESTAMP + INTERVAL (i) MINUTE AS TIMESTAMP) AS iso_ts
    FROM range(1, 41) r(i)
    """,
)
def convert_enhanced_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enhanced (non-parity) inference mode: columns whose sampled
    values all match one of the reference's six probed layouts
    (converter/converter.go:264-271) become real DATE / TIMESTAMP
    instead of demoting to string (the reference's deliberate demotion,
    converter.go:272-275, is the parity default)."""
    rows = ["id,iso_date,iso_ts"]
    for i in range(1, 41):
        rows.append(
            f"{i},2024-01-{((i - 1) % 28) + 1:02d},"
            f"2024-03-01T00:{i:02d}:00"
        )
    out = _convert_fixture(spark, "endates", rows, enhanced_dates=True)
    # the parquet holds a true DateType column (the capability under
    # test — assert it), then present as timestamp for the cross-engine
    # value compare (date-object vs timestamp repr differs per driver)
    assert dict(out.dtypes)["iso_date"] == "date", out.dtypes
    from pyspark.sql import functions as F

    return out.select(
        "id",
        F.col("iso_date").cast("timestamp_ntz").alias("iso_date_ts"),
        "iso_ts",
    )


@CAT.query(
    "convert_star_roundtrip",
    oracle="""
    SELECT c_custkey::BIGINT AS c_custkey,
           c_name,
           c_nationkey::BIGINT AS c_nationkey,
           c_acctbal::DOUBLE AS c_acctbal,
           c_mktsegment
    FROM customer
    """,
)
def convert_star_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-circle on real data: customer parquet → CSV (Spark writes
    shortest-roundtrip doubles) → converter (infer + cast + parquet) →
    read back. Values must equal the originals exactly — string→double
    reparse of a shortest repr is lossless, and customer has no
    date/timestamp columns so the lattice maps every column to itself."""
    from csv_to_parquet_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="csv2pq_star_")
    csv_dir = os.path.join(d, "customer_csv")
    (
        load_table(spark, sf_dir, "customer")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(csv_dir)
    )
    import glob as _glob

    part = [p for p in _glob.glob(os.path.join(csv_dir, "part-*.csv"))][0]
    src = os.path.join(d, "customer.csv")
    os.rename(part, src)
    res = convert_file(spark, src, output_dir=d)
    if not res.ok:
        raise RuntimeError(f"star roundtrip conversion failed: {res.error}")
    return spark.read.parquet(res.output)


@CAT.query(
    "convert_latin1_roundtrip",
    oracle="""
    SELECT i AS id,
           'côté_' || i::VARCHAR AS città,
           i + 0.5 AS importo
    FROM range(1, 41) r(i)
    """,
)
def convert_latin1_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset-aware conversion (``--charset ISO-8859-1``): a latin-1
    CSV whose HEADER and VALUES both contain bytes that are invalid
    UTF-8 (0xE0 'à', 0xF4 'ô', 0xE9 'é') converts losslessly — the
    charset threads through all three read sites (driver-side header
    read, re-encoded inference sample, distributed typed scan), so
    inference still types the numeric columns and the accented
    strings survive to parquet (which is always UTF-8 on disk). The
    reference reads raw bytes and would write mojibake for non-UTF-8
    input; this is a documented extension, not a divergence."""
    lines = ["id,città,importo"] + [
        f"{i},côté_{i},{i}.5" for i in range(1, 41)
    ]
    d = tempfile.mkdtemp(prefix="csv2pq_latin1_")
    src = os.path.join(d, "latin1.csv")
    with open(src, "w", encoding="ISO-8859-1", newline="") as f:
        f.write("\n".join(lines) + "\n")
    res = convert_file(spark, src, output_dir=d, charset="ISO-8859-1")
    if not res.ok:
        raise RuntimeError(f"latin-1 conversion failed: {res.error}")
    return spark.read.parquet(res.output)
