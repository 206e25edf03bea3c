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

# The heavy queries most exposed to scale-DEPENDENT divergence —
# window ties that only materialize with more rows, float
# accumulation/rounding, iterative convergence — and whose DuckDB
# oracle is tractable at sf0.1. The lexical pair-dedup family
# (minhash_lsh / containment / connected_components / jaccard) is
# deliberately EXCLUDED: their oracles brute-force all O(n²) doc
# pairs, which DuckDB cannot finish at sf0.1 in test time (measured
# >30 min CPU and climbing); their semantics are integer shingle
# counting — no floats, no ties — so sf0.01 exactness plus the
# recall/cap unit tests already pin their scale behavior.
HEAVY = [
    "cluster_kmeans_assign",  # 2 Lloyd iterations of float argmax ties
    "dedup_embedding_lsh_pairs",  # banded float cosines, ~12% of pairs
    "q5_regional_revenue",  # multi-join agg, cent sums
    "q8_market_share",  # conditional ratio of sums (double division)
    "q2_min_cost_supplier",  # decorrelated min + top-100 tie ordering
    "text_tfidf_top_terms",  # log-weighted scores, per-doc rank ties
    "events_anomaly_zscore",  # variance guard + float threshold
    "scd2_event_type_runs",  # window run-length ties across 80k events
    "pack_token_budget",  # two-phase prefix sum vs single-task window
    "stream_tumbling_counts",  # micro-batch windowed aggregation
    # round-4 additions with scale-sensitive semantics
    "events_peak_concurrency",  # RANGE-frame tie groups densify with rows
    "stats_mad_outliers",  # median halves / 3×MAD threshold floats
    "corr_exact_value_k",  # double combine of integer moments
    "mix_temperature_weights",  # double window-sum accumulation order
    "events_transition_matrix",  # probability rounding on bigger counts
    "graph_pagerank_copurchase",  # iterative fixed-point on a denser graph
    # round-5 additions with scale-sensitive semantics
    "hist_equi_depth_price",  # global-rank tie groups straddle deciles
    "text_unigram_logprob",  # fixed-point ln() on bigger frequency table
    "embedding_prefix_rank_audit",  # two float rankings, denser ties
    "graph_bfs_reachability",  # frontier sizes change with graph density
    "events_type_entropy",  # fixed-point ln() over larger per-user counts
    "stream_kafka_shaped_decode",  # micro-batch agg over staged messages
    # round-5 third wave (dedup_jaccard_prefix_filter joins the excluded
    # brute-force-oracle family above; everything else is tractable)
    "stream_stream_left_outer",  # outer-state eviction timing vs more rows
    "stream_stream_full_outer",  # two-sided eviction bounds at scale
    "text_heavy_hitters_mg",  # real MG eviction pressure needs volume
    "knn_pq_adc",  # integer-distance rank ties densify with corpus
    "skyline_parts",  # frontier tie structure shifts with more points
    "graph_kcore_peeling",  # peeling convergence on the denser graph
    "graph_common_neighbors",  # float-Jaccard top-100 tie ordering
    "pipeline_training_manifest",  # dedup keep-first + shard sums
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
