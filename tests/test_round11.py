"""Round-11 invariants.

- bench floors: the committed bench_floors.json covers the headline
  set (minus entries newer than the last committed bench run), so the
  automated variance check has a reference for every timed entry.
- ccnet pack guard: both engines raise loudly when line_no reaches
  the pack base instead of silently corrupting first-occurrence order
  (r10 advice — oracle parity cannot catch a collision both engines
  compute identically).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_floors_cover_headline():
    import bench

    floors = bench.load_floors()
    assert floors, "bench_floors.json missing or empty"
    # every floor is a positive time; every headline entry that was in
    # the last committed bench payload has one
    assert all(v > 0 for v in floors.values())
    missing = [n for n in bench.HEADLINE if n not in floors]
    # entries added after the floors file was last refreshed are the
    # only permitted gaps (they seed their floor on the next refresh)
    allowed_new = set(getattr(bench, "FLOORLESS_NEW", ()))
    assert set(missing) <= allowed_new, f"floorless entries: {missing}"
    assert bench.FLOOR_TOLERANCE == 1.25


def test_ccnet_pack_guard_raises_spark(spark):
    from csv_to_parquet_spark.operators.dedup import _CCNET_LINE_PACK

    df = spark.createDataFrame(
        [(1, _CCNET_LINE_PACK)], "doc_id BIGINT, line_no BIGINT"
    ).select(
        (
            F.col("doc_id") * _CCNET_LINE_PACK
            + F.when(
                F.col("line_no") < _CCNET_LINE_PACK, F.col("line_no")
            ).otherwise(
                F.raise_error(F.lit("ccnet line_no overflows pack base"))
            )
        ).alias("pack")
    )
    with pytest.raises(Exception, match="overflows pack base"):
        df.collect()


def test_ccnet_pack_guard_raises_duckdb():
    import duckdb

    from csv_to_parquet_spark.operators.dedup import _CCNET_LINE_PACK

    con = duckdb.connect()
    guard = (
        f"SELECT 1 * {_CCNET_LINE_PACK} + CASE WHEN ln < {_CCNET_LINE_PACK} "
        f"THEN ln ELSE error('ccnet line_no overflows pack base') END "
        f"FROM (SELECT {{v}} AS ln)"
    )
    # happy path evaluates fine
    assert con.execute(guard.format(v=0)).fetchone()[0] == _CCNET_LINE_PACK
    with pytest.raises(Exception, match="overflows pack base"):
        con.execute(guard.format(v=_CCNET_LINE_PACK)).fetchall()
