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
    # round-6 third wave: ECDF statistics need the bucketed two-phase
    # prefix sum to agree with a global sort at real row counts; the
    # moment-based closed forms stress int64 headroom; the Spark-4
    # surfaces (variant shred, arrow kernel, observe) are scan-volume
    # sensitive
    "stats_ks_two_sample",
    "stats_mannwhitney_u",
    "stats_anova_oneway",
    "stats_corr_matrix",
    "stats_ols_two_factor",
    "events_lag_xcorr",
    "variant_events_shred",
    "mapinarrow_norm_audit",
    "pipeline_observe_metrics",
    "sql_udf_disc_revenue",
    # round-6 fourth wave: recursion depth grows with id range; the
    # rank statistics stress the DECIMAL sums and tie density
    "recursive_doc_ancestry",
    "recursive_yearly_compound",
    "stats_spearman_rank",
    "stats_winsorized_mean",
    "rank_global_two_phase",  # ranks must be boundary-placement-proof
    "er_phonetic_block_join",  # bucket sizes grow with vocabulary
    "stream_state_introspection",  # state-store roundtrip at volume
    "events_gapfill_linear",  # interpolation across denser gap structure
    "udtf_polymorphic_top_tokens",  # row-at-a-time UDTF at volume
    "agg_listagg_nations",  # ordered aggregation contract at volume
    "ps_pandas_api_rollup",  # pandas-dialect plan at volume
    "scalar_try_functions",  # NULL-on-error folding across more rows
    "events_acf_daily",  # denser spine, same shared float fragment
    "session_window_dynamic_gap",  # merge-rule ties densify with rows
    "feat_target_encoding_loo",  # fact-sized integer output at volume
    "stats_huber_location",  # IRLS weight boundaries shift with rows
    "stream_session_dynamic_gap",  # state-store session merges at volume
    "sample_group_topk_two_phase",  # screen losslessness needs many batches
    "events_mutual_information",  # denser cells shift the ln() inputs
    "events_copresence_bucketed",  # bucket fan-out grows with density
    "quality_gopher_rules",  # verdict boundaries hit with more docs
    # round-7 additions with scale-sensitive semantics
    "dedup_embedding_cosine",  # block-pair join: more pairs straddle buckets
    "stream_tws_session_timers",  # timer eviction vs watermark at volume
    "stream_cdc_jdbc_upsert",  # MERGE folding across more batch deltas
    "sql_scripting_compound_loop",  # seed aggregate grows 10x (overflow guard)
    "stream_tws_initial_state",  # cutoff midpoint + handoff at volume
    # round-8 additions with scale-sensitive semantics
    "dedup_ngram_span_exact",  # duplicate-shingle density/span merges at volume
    "split_leakage_safe_groups",  # real multi-member dup groups exist only at sf0.1
    "bpe_learn_merges",  # argmax ties + two-pass replace chains on the bigger vocab
    "text_js_divergence",  # r8 exclusive-mass identity: floored terms at volume
    # round-9 additions with scale-sensitive semantics
    "dedup_semdedup_keep",  # centroid-distance keep ties at real cluster sizes
    "text_mojibake_repair",  # replace-chain hit counting over the full corpus
    "text_ccnet_buckets",  # tertile tie-groups + OOV smoothing at real vocab
    "sample_dsir_importance",  # selection boundary + rank scaffold at volume
    "knn_pq_rerank",  # candidate-pool boundary effects at real corpus size
    "knn_lsh_ann",  # integer probe schedule + bucket ties at real corpus size
    "knn_ivf_ann",  # integer-Lloyd cells + probe ranking at volume
    "knn_ivf_pq_ann",  # composite: both integer trainers + probe screen
    "mm_phash_near_dup",  # band collisions + hamming ties at real volume
    # round-10 additions with scale-sensitive semantics
    "dedup_ccnet_lines",  # cross-doc first-occurrence races at real volume
    "dedup_cross_source_overlap",  # per-fp pair populations grow with volume
    # round-11 additions with scale-sensitive semantics
    "text_langid_model",  # trained weights shift with the bigger sample; argmax tie density
    "mix_source_weights",  # ceding races on near-equal source sizes at volume
    "mix_token_allocation",  # remainder-rank ties only densify at volume
    "mix_select_documents",  # prefix-sum bucket boundaries at real volume
    "text_url_domain_filter",  # per-domain cap boundaries only bind at real volume
    # round-12 additions with scale-sensitive semantics
    "mix_pack_sequences",  # epoched two-phase prefix sums, bin boundaries at volume
    "mix_training_order",  # global-rank over hash keys, range-boundary ties
    "tokenizer_unigram_lm",  # seed top-K ties + DP cost ties on the real histogram
    "tokenizer_unigram_fertility",  # kept-vocab DP ties + milli boundaries at volume
    "text_stupid_backoff_lm",  # backoff-level mix shifts with model coverage at volume
]

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()

#: Collected outcomes, dumped to CORRECTNESS_SLOW.json at module
#: teardown (VERDICT r6 #8: the sf0.1 battery was the only evidence
#: tier with no committed artifact). Entries are written as each test
#: passes, so a -x abort still leaves the greens recorded; a failed or
#: never-run test simply has no row claiming green.
_SLOW_RESULTS: dict[str, dict] = {}
_ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CORRECTNESS_SLOW.json")


def _flush_artifact() -> None:
    """MERGE the recorded rows into the committed artifact: a partial
    (-k) run refreshes only the entries it actually ran, never
    clobbering the rest of the battery's recorded evidence."""
    import json

    merged: dict[str, dict] = {}
    try:
        with open(_ARTIFACT) as f:
            merged.update(json.load(f))
    except (OSError, ValueError):
        pass
    merged.update(_SLOW_RESULTS)
    tmp = _ARTIFACT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=2, default=str)
        f.write("\n")
    os.replace(tmp, _ARTIFACT)


def _record(name: str, **row) -> None:
    _SLOW_RESULTS[name] = {"sf_dir": SF_BENCH, **row}
    # flush per record (atomic replace): a SIGKILL mid-battery — the
    # run most likely to die abruptly — keeps every green so far
    _flush_artifact()


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
    _record(
        name,
        kind="oracle_compare",
        match=not problems,
        problems=problems,
        spark_rows=len(spark_pdf),
        oracle_rows=len(duck_pdf),
    )
    assert not problems, f"{name} @ {SF_BENCH}: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# Pair-dedup family at bench scale (VERDICT r5 #5). Their brute-force
# O(n²) DuckDB oracles are intractable at sf0.1 (>30 min CPU), so
# exactness here is pinned by INVARIANTS instead, anchored on
# dedup_jaccard_prefix_filter: its prefix-filtered candidate generation
# is LOSSLESS (a theorem — a pair sharing no prefix shingle cannot
# reach the threshold) and every surviving candidate is verified by
# exact shingle-set Jaccard, so its sf0.1 output IS the ground-truth
# pair set. The other paths are then held to it: zero false positives
# (every reported pair is a true ≥-threshold pair), full recall in the
# planted-near-dup regime (J≈0.99 pairs cannot be missed by 16-band
# LSH), per-pair values re-verified from raw shingle sets in Spark,
# and seeded non-pairs certified below threshold.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pair_truth(spark):
    """Ground-truth undirected near-dup pairs at SF_BENCH, from the
    lossless prefix-filter path: {(doc_a, doc_b): jaccard}."""
    truth = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_jaccard_prefix_filter"](
            spark, SF_BENCH
        ).collect()
    }
    release_caches()
    assert truth, "bench corpus should contain planted near-dup pairs"
    return truth


def _exact_jaccard_for_pairs(spark, pairs):
    """Recompute exact 3-gram Jaccard for an explicit pair list from
    raw text (independent code path: array_intersect over per-doc
    shingle arrays, no inverted index)."""
    from pyspark.sql import functions as F

    from csv_to_parquet_spark.functions import shingles, tokenize
    from csv_to_parquet_spark.sources.tables import load_table

    sh = load_table(spark, SF_BENCH, "documents").select(
        "doc_id",
        F.array_distinct(shingles(tokenize("text"), 3)).alias("sh"),
    )
    pdf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a BIGINT, doc_b BIGINT"
    )
    joined = (
        pdf.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / (
                    F.size("sa")
                    + F.size("sb")
                    - F.size(F.array_intersect("sa", "sb"))
                )
            ).alias("j"),
        )
    )
    return {(r.doc_a, r.doc_b): r.j for r in joined.collect()}


@pytest.mark.slow
def test_minhash_lsh_matches_lossless_truth_at_bench_sf(spark, pair_truth):
    from csv_to_parquet_spark.operators.dedup import JACCARD_THRESHOLD

    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_BENCH).collect()
    }
    release_caches()
    # zero false positives: LSH candidates are exact-verified, so every
    # reported pair must be a true >=threshold pair
    assert set(mh) <= set(pair_truth)
    # completeness in the planted regime: the corpus's true pairs sit at
    # J~0.99 where banded-LSH miss probability is ~0 — any miss is a bug
    assert set(mh) == set(pair_truth)
    # reported values agree with the lossless path and with an
    # independent recompute from raw text
    for p, j in mh.items():
        assert abs(j - pair_truth[p]) < 1e-9
    recomputed = _exact_jaccard_for_pairs(spark, list(mh))
    for p, j in recomputed.items():
        assert j >= JACCARD_THRESHOLD
        assert abs(mh[p] - round(j, 6)) < 5e-6
    _record(
        "invariant_minhash_lsh_vs_lossless_truth",
        kind="invariant",
        match=True,
        truth_pairs=len(pair_truth),
        lsh_pairs=len(mh),
    )


@pytest.mark.slow
def test_capped_index_jaccard_matches_lossless_truth_at_bench_sf(
    spark, pair_truth
):
    ng = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_BENCH).collect()
    }
    release_caches()
    assert set(ng) == set(pair_truth)
    for p, j in ng.items():
        assert abs(j - pair_truth[p]) < 1e-9
    _record(
        "invariant_capped_index_vs_lossless_truth",
        kind="invariant",
        match=True,
        pairs=len(ng),
    )


@pytest.mark.slow
def test_sampled_non_pairs_below_threshold_at_bench_sf(spark, pair_truth):
    """Completeness cross-check from the other side: seeded random doc
    pairs NOT reported by the lossless path must measure strictly
    below the threshold when recomputed from raw text."""
    import random

    from csv_to_parquet_spark.operators.dedup import JACCARD_THRESHOLD
    from csv_to_parquet_spark.sources.tables import load_table

    ids = [
        r.doc_id
        for r in load_table(spark, SF_BENCH, "documents")
        .select("doc_id")
        .collect()
    ]
    rng = random.Random(20260814)
    non_pairs = set()
    while len(non_pairs) < 200:
        a, b = rng.sample(ids, 2)
        a, b = min(a, b), max(a, b)
        if (a, b) not in pair_truth:
            non_pairs.add((a, b))
    recomputed = _exact_jaccard_for_pairs(spark, sorted(non_pairs))
    assert len(recomputed) == 200
    assert all(j < JACCARD_THRESHOLD for j in recomputed.values())
    _record(
        "invariant_seeded_non_pairs_below_threshold",
        kind="invariant",
        match=True,
        non_pairs=len(recomputed),
    )


@pytest.mark.slow
def test_containment_pairs_reverify_at_bench_sf(spark):
    """Every directed containment pair re-verified from raw shingle
    sets: |A∩B|/|A| must be >= the threshold and equal the reported
    value."""
    from pyspark.sql import functions as F

    from csv_to_parquet_spark.functions import shingles, tokenize
    from csv_to_parquet_spark.operators.dedup import CONTAINMENT_THRESHOLD
    from csv_to_parquet_spark.sources.tables import load_table

    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in QUERIES["dedup_containment_pairs"](spark, SF_BENCH).collect()
    }
    release_caches()
    assert got, "bench corpus should contain containment pairs"
    sh = load_table(spark, SF_BENCH, "documents").select(
        "doc_id",
        F.array_distinct(shingles(tokenize("text"), 3)).alias("sh"),
    )
    pdf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in got], "doc_a BIGINT, doc_b BIGINT"
    )
    rec = (
        pdf.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.size(F.array_intersect("sa", "sb")) / F.size("sa")).alias("c"),
        )
    )
    for r in rec.collect():
        assert r.c >= CONTAINMENT_THRESHOLD
        assert abs(got[(r.doc_a, r.doc_b)] - round(r.c, 6)) < 5e-6
    _record(
        "invariant_containment_pairs_reverified",
        kind="invariant",
        match=True,
        pairs=len(got),
    )


@pytest.mark.slow
def test_connected_components_respect_truth_pairs_at_bench_sf(
    spark, pair_truth
):
    """Every ground-truth near-dup pair must land in one component
    (the CC edges are exactly the verified LSH pairs)."""
    label = {
        r.doc_id: r.cluster_id
        for r in QUERIES["dedup_connected_components"](
            spark, SF_BENCH
        ).collect()
    }
    release_caches()
    for a, b in pair_truth:
        assert a in label and b in label
        assert label[a] == label[b], (a, b)
    _record(
        "invariant_connected_components_respect_truth",
        kind="invariant",
        match=True,
        docs=len(label),
        truth_pairs=len(pair_truth),
    )
