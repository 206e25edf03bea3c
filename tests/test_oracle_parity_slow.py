"""Bench-scale (sf0.1) oracle parity for the heaviest catalog queries.

The default suite proves cross-engine exactness at the smoke/oracle
scale factors; scale-dependent drift (window ties that only occur with
more rows, float accumulation differences, LSH bucket populations)
would slip through. This slow-marked mirror runs the driver's exact
compare for the heaviest headline queries at the bench scale factor —
``pytest -m slow`` (excluded from the default run by pytest.ini).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from csv_to_parquet_spark.oracle import compare_frames, duckdb_connection
from csv_to_parquet_spark.operators.cache import release_caches

SF_BENCH = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The heaviest oracle-backed headline queries (BENCH ordering) — the
# ones whose plans do real distributed work and are most exposed to
# scale-dependent divergence.
HEAVY = [
    "dedup_connected_components",
    "dedup_minhash_lsh",
    "cluster_kmeans_assign",
    "dedup_embedding_lsh_pairs",
    "dedup_containment_pairs",
    "dedup_semantic_clusters",
    "q5_regional_revenue",
    "q8_market_share",
    "text_tfidf_top_terms",
    "stream_tumbling_counts",
]

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_BENCH)
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_query_matches_oracle_at_bench_sf(spark, name, duck):
    assert name in QUERIES, f"{name} missing from catalog"
    assert name in ORACLE, f"{name} has no oracle — update HEAVY"
    spark_pdf = QUERIES[name](spark, SF_BENCH).toPandas()
    release_caches()
    duck_pdf = duck.execute(ORACLE[name]).df()
    problems = compare_frames(spark_pdf, duck_pdf)
    assert not problems, f"{name} @ {SF_BENCH}: " + "; ".join(problems)
