"""The local mirror of the driver's correctness gate.

Every catalog query that declares an oracle is executed through Spark
AND through DuckDB at the smoke scale factor, and values must match
exactly (order-insensitive). Queries without an oracle get a
rows-runnable smoke check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from csv_to_parquet_spark.oracle import compare_frames, duckdb_connection

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()

_con_cache = {}


def _con(sf_dir):
    if sf_dir not in _con_cache:
        _con_cache[sf_dir] = duckdb_connection(sf_dir)
    return _con_cache[sf_dir]


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


@pytest.fixture(autouse=True)
def _drop_tracked_caches():
    """Keep the 297-query sweep memory-flat: operators persist
    intermediates their returned plan references, and only the sweep
    harness can release them after materialization (same contract as
    bench.py)."""
    yield
    from csv_to_parquet_spark.operators.cache import release_caches

    release_caches()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_smoke, name):
    fn = QUERIES[name]
    sdf = fn(spark, sf_smoke)
    spark_pdf = sdf.toPandas()
    if name not in ORACLE:
        # rows-only contract: must run and have a stable schema
        assert spark_pdf is not None
        assert len(sdf.columns) > 0
        return
    duck_pdf = _con(sf_smoke).execute(ORACLE[name]).df()
    problems = compare_frames(spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
