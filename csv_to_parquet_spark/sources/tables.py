"""Registry over the driver's parquet star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.

Scale posture: ``spark.read.parquet`` gives Catalyst a FileSourceScan
with predicate pushdown + column pruning for free; nothing here caches
or collects. At 100 TB these would be partitioned parquet/iceberg
directories — the loader takes any path glob, so nothing changes.

Session-conf pinning: queries may run under a SparkSession we did not
build (the verify driver's), so :func:`ensure_session_confs` pins the
runtime-settable confs our semantics depend on — UTC session timezone
(oracle parity with DuckDB's naive timestamps) and
``nanosAsLong`` (events.parquet stores TIMESTAMP(NANOS) which Spark
otherwise refuses to read; we read the raw int64 and convert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at *any* scale factor
# (region/nation are fixed-size; supplier/part grow slowly). Operators
# use this to decide broadcast hints.
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}

_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass


def ns_to_us(col: str) -> F.Column:
    """Exact int64 ns → µs narrowing with FLOOR semantics.

    Integer arithmetic only (a double division loses precision above
    2^53 ns), and floor rather than ``div``'s truncate-toward-zero so
    pre-epoch (negative) nanosecond instants narrow identically to
    DuckDB's floor-based conversion — `div` alone would round a
    -1.5 µs instant the other way by 1 µs.
    """
    return F.expr(
        f"({col} div 1000) - (CASE WHEN {col} % 1000 < 0 THEN 1 ELSE 0 END)"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as raw int64 under nanosAsLong; narrow
        # ns → µs (see ns_to_us for the floor/precision reasoning)
        df = df.withColumn(
            "ts", F.timestamp_micros(ns_to_us("ts")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to the session's default parallelism — but
    only when it is actually narrow.

    The driver tables are single small parquet files, so a zero-shuffle
    pipeline inherits ONE scan task and runs single-threaded no matter
    how expensive the per-row work is — a measured 8× wall-clock loss on
    the hash-heavy dedup pipelines. ``repartition()`` is never a no-op:
    it always inserts a round-robin exchange, so calling it
    unconditionally would full-shuffle a 100 TB corpus before any
    reduction. We therefore check the planned partitioning first and
    pass the input through untouched whenever the scan is already at
    least as wide as the session's parallelism — the production case,
    where thousands of splits are sized by
    ``spark.sql.files.maxPartitionBytes`` and per-row work is already
    spread across every core. Only the degenerate few-splits case (the
    local single-file fixture) pays the one small exchange of raw rows.
    Use ONLY in front of compute-heavy per-row stages — plain
    scans/filters/aggs are better off letting Catalyst size the
    partitions.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Planning-only inspection: .rdd materializes the physical plan's
    # partitioning without running a job.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
