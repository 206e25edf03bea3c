"""Invariant tests for the round-5 third-wave operators.

The oracle-parity suite proves cross-engine value equality on the
driver corpus; these pin each operator's SEMANTIC guarantee on
engineered fixtures the near-uniform testdata cannot exercise — most
importantly the prefix filter's losslessness in exactly the regime
where the df-capped index is allowed to drop pairs.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F


def _brute_jaccard(sets: dict[int, set[str]], tau: float) -> set[tuple]:
    out = set()
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        c = len(sa & sb)
        j = c / (len(sa) + len(sb) - c)
        if j >= tau:
            out.add((a, b, round(j, 6)))
    return out


def test_prefix_filter_is_lossless_where_capped_index_drops(spark):
    """A near-dup pair whose every common shingle is high-df (pure
    boilerplate overlap) is the documented blind spot of the df-capped
    inverted index. Prefix filtering must still find it: completeness
    is a theorem, not a cap-tuning outcome."""
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )

    # 12 docs all containing the same boilerplate shingles B0..B4;
    # docs 100/101 are near-dups whose ONLY shingles are boilerplate.
    boiler = [f"B{i}" for i in range(5)]
    rows = [(100, s) for s in boiler] + [(101, s) for s in boiler]
    for d in range(10):
        rows += [(d, s) for s in boiler]
        rows += [(d, f"U{d}_{k}") for k in range(20)]  # unique filler
    sh = spark.createDataFrame(rows, "doc_id BIGINT, sh STRING")

    sets: dict[int, set[str]] = {}
    for doc_id, s in rows:
        sets.setdefault(doc_id, set()).add(s)
    expect = _brute_jaccard(sets, 0.6)
    assert (100, 101, 1.0) in expect

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_prefix_filter_pairs(sh).collect()
    }
    assert got == expect, f"prefix filter diverged: {got ^ expect}"

    # the capped index DOES drop the boilerplate-only pair at a df cap
    # below 12 — the contrast that motivates shipping both schemes
    capped = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(sh, df_cap=8).collect()
    }
    assert (100, 101) not in capped
    release_caches()


def test_prefix_filter_matches_brute_force_on_random_corpus(spark):
    """End-to-end losslessness on an adversarial mix: subsets,
    supersets, disjoint docs, identical docs, single-shingle docs."""
    import random

    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.dedup import jaccard_prefix_filter_pairs

    rng = random.Random(7)
    vocab = [f"s{i}" for i in range(40)]
    sets: dict[int, set[str]] = {}
    for d in range(30):
        sets[d] = set(rng.sample(vocab, rng.randint(1, 12)))
    sets[30] = set(sets[0])  # identical twin
    sets[31] = set(list(sets[1])[:-1]) or {"s0"}  # near-subset
    rows = [(d, s) for d, ss in sets.items() for s in ss]
    sh = spark.createDataFrame(rows, "doc_id BIGINT, sh STRING")

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_prefix_filter_pairs(sh).collect()
    }
    assert got == _brute_jaccard(sets, 0.6)
    release_caches()


def test_rake_scores_hand_computed(spark, tmp_path):
    """RAKE on a two-phrase doc with known degree/frequency masses.

    'red apples and red wine.' → phrases [red apples], [red wine]
    (split at stopword 'and'; '.' stripped by normalization):
      deg(red)=2+2=4 freq(red)=2 → 2.0
      deg(apples)=2 freq=1 → 2.0 ; deg(wine)=2 freq=1 → 2.0
    Adding a second doc 'red' gives red deg=4+1=5 freq=3 → 1.666666.
    """
    from csv_to_parquet_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "red apples and red wine."), (2, "red")],
        "doc_id BIGINT, text STRING",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.word: r for r in textops.text_rake_keywords(spark, str(tmp_path)).collect()}
    assert out["red"].freq == 3 and out["red"].deg == 5
    assert out["red"].score_micro == 1_666_666
    assert out["apples"].score_micro == 2_000_000
    assert out["wine"].score_micro == 2_000_000
    # stopword never emitted as a keyword
    assert "and" not in out


def test_threshold_sweep_monotone_and_anchored(spark, sf_smoke):
    """docs_kept/chars_kept are non-increasing in the threshold, the
    0-threshold row keeps the whole corpus, and kept_ppm is exactly
    docs_kept·10⁶ div total."""
    from csv_to_parquet_spark.operators import textops
    from csv_to_parquet_spark.sources.tables import load_table

    rows = textops.quality_threshold_sweep(spark, sf_smoke).collect()
    assert rows[0].thr == 0
    total = load_table(spark, sf_smoke, "documents").count()
    assert rows[0].docs_kept == total and rows[0].kept_ppm == 1_000_000
    for prev, cur in zip(rows, rows[1:]):
        assert prev.thr < cur.thr
        assert prev.docs_kept >= cur.docs_kept
        assert prev.chars_kept >= cur.chars_kept
        assert cur.kept_ppm == cur.docs_kept * 1_000_000 // total


def test_common_neighbors_invariants(spark, sf_smoke):
    """Canonical pair order, Jaccard in (0,1], and the intersection
    bound common <= min(|N(a)|,|N(b)|) via J<=1; spot-check one pair's
    common count against a direct recount."""
    from csv_to_parquet_spark.operators import graph
    from csv_to_parquet_spark.sources.tables import load_table

    rows = graph.graph_common_neighbors(spark, sf_smoke).collect()
    assert rows, "smoke corpus should produce supplier pairs"
    for r in rows:
        assert r.supp_a < r.supp_b
        assert 0 < r.jaccard <= 1.0
        assert r.common >= 1

    r0 = rows[0]
    sp = (
        load_table(spark, sf_smoke, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    na = {x.p for x in sp.filter(F.col("s") == r0.supp_a).collect()}
    nb = {x.p for x in sp.filter(F.col("s") == r0.supp_b).collect()}
    assert r0.common == len(na & nb)


def test_mg_heavy_hitters_exact_under_eviction(spark, tmp_path):
    """Vocabulary 10× the counter budget forces real Misra-Gries
    evictions; the planted heavy hitter must still surface with its
    EXACT count (candidate superset + exact recount)."""
    from csv_to_parquet_spark.operators import textops

    filler = [f"w{i:04d}" for i in range(3000)]  # each appears once
    docs, chunk = [], 50
    for d in range(0, 3000, chunk):
        words = filler[d : d + chunk] + ["HOT"] * 5  # HOT ≈ 9% of tokens
        docs.append((d, " ".join(words)))
    frame = spark.createDataFrame(docs, "doc_id BIGINT, text STRING").repartition(8)
    frame.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.token: r for r in textops.text_heavy_hitters_mg(spark, str(tmp_path)).collect()}
    n_total = 3000 + 5 * 60
    assert set(out) == {"HOT"}  # nothing else crosses N/200
    assert out["HOT"].cnt == 300
    assert out["HOT"].ppm == 300 * 1_000_000 // n_total


def test_pq_seed_vectors_have_zero_error(spark, sf_smoke):
    """The _PQ_K lowest-vec_id embeddings ARE the codebook, so their
    own encoding must be lossless (err 0) in every subspace; all codes
    in [0, _PQ_K), all _PQ_M subspaces present for every vector."""
    from csv_to_parquet_spark.operators import clustering
    from csv_to_parquet_spark.sources.tables import load_table

    M, K = clustering._PQ_M, clustering._PQ_K
    out = clustering.embedding_pq_audit(spark, sf_smoke).collect()
    n = load_table(spark, sf_smoke, "embeddings").count()
    assert len(out) == M * n
    for r in out:
        assert 1 <= r.subspace <= M and 0 <= r.code < K and r.err_micro2 >= 0
    # a corpus smaller than K yields a short (full-corpus) codebook
    seed_set = set(sorted({r.vec_id for r in out})[: min(K, n)])
    seed_errs = [r.err_micro2 for r in out if r.vec_id in seed_set]
    assert seed_errs and all(e == 0 for e in seed_errs)


def test_stream_left_outer_no_sentinel_leak(spark, sf_smoke):
    """The far-future flush sentinels must never appear in the
    drained result — neither as a purchase row nor as a match."""
    from csv_to_parquet_spark.streaming import jobs

    rows = jobs.stream_stream_left_outer(spark, sf_smoke).collect()
    assert rows
    assert all(r.purchase_id >= 0 for r in rows)
    assert all(r.click_id is None or r.click_id >= 0 for r in rows)
    assert any(r.click_id is None for r in rows)  # outer rows exist


def test_skyline_is_a_frontier(spark, sf_smoke):
    """Sorted by price the skyline's sizes must be strictly
    increasing (the defining 2-D frontier shape), and no point may
    dominate another."""
    from csv_to_parquet_spark.operators import relational4

    pts = relational4.skyline_parts(spark, sf_smoke).collect()
    assert pts
    for a, b in zip(pts, pts[1:]):
        assert a.price_cents < b.price_cents and a.size < b.size


def test_dataset_card_totals(spark, sf_smoke):
    from csv_to_parquet_spark.operators import pipelines
    from csv_to_parquet_spark.sources.tables import load_table

    rows = pipelines.pipeline_dataset_card(spark, sf_smoke).collect()
    total = load_table(spark, sf_smoke, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert 0 <= r.en_ppm <= 1_000_000 and 0 <= r.dup_ppm <= 1_000_000
        assert r.avg_chars == r.total_chars // r.n_docs


def test_kcore_equals_run_to_fixpoint_core(spark, sf_smoke):
    """The fixed-round output must equal the TRUE k-core, recomputed
    here by peeling the collected edge set to fixpoint in pure Python
    — the convergence assumption the operator's docstring states
    (fixed rounds only certify the core once peeling has converged)."""
    from collections import Counter

    from csv_to_parquet_spark.operators import graph
    from csv_to_parquet_spark.operators.cache import release_caches

    rows = {r.part: r.deg for r in graph.graph_kcore_peeling(spark, sf_smoke).collect()}
    edges = {(r.a, r.b) for r in graph._edges(spark, sf_smoke).collect()}
    release_caches()

    k = 3
    while True:  # peel to fixpoint
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            break
        edges = {(a, b) for a, b in edges if a not in drop and b not in drop}
    true_core = {v: d for v, d in deg.items() if d >= k}
    assert rows == true_core


def test_ivm_zero_count_groups_are_dropped(spark, sf_smoke):
    """No group may surface with a non-positive count, and the
    incremental result must equal a direct full recompute done in
    Spark itself (engine-internal consistency, independent of the
    DuckDB oracle)."""
    from csv_to_parquet_spark.functions import cents
    from csv_to_parquet_spark.operators import maintenance
    from csv_to_parquet_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    inc = maintenance.ivm_incremental_agg(spark, sf_smoke)
    rows = {(r.yr, r.mo, r.o_orderstatus): r for r in inc.collect()}
    assert rows and all(r.n_orders > 0 for r in rows.values())

    orders = load_table(spark, sf_smoke, "orders")
    price = F.when(
        (F.col("o_orderkey") % 20 != 0) & (F.col("o_orderkey") % 7 == 0),
        cents(F.col("o_totalprice") * 1.05),
    ).otherwise(cents("o_totalprice"))
    full = (
        orders.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(price).alias("revenue_cents"),
        )
        .collect()
    )
    assert {
        (r.yr, r.mo, r.o_orderstatus): (r.n_orders, r.revenue_cents)
        for r in full
    } == {k: (r.n_orders, r.revenue_cents) for k, r in rows.items()}


def test_stream_checkpoint_resume_exactly_once(spark, sf_smoke, tmp_path):
    """Kill a file-sink stream mid-run, restart from the same
    checkpoint, and verify exactly-once end-to-end: every input row
    in the output exactly once, no loss, no duplicates — the
    recovery contract production pipelines rely on."""
    import time

    from csv_to_parquet_spark.sources.tables import load_table

    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id")
    ev.repartition(16).write.parquet(src)
    n_total = ev.count()

    def start():
        s = (
            spark.readStream.schema("event_id BIGINT, user_id BIGINT")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while not q.recentProgress and time.time() < deadline:
        time.sleep(0.05)
    q.stop()  # mid-run kill (at least one batch committed)
    q.awaitTermination()

    # the kill must land BEFORE completion or the resume path is not
    # exercised; with 16 one-file batches the early stop reliably
    # leaves work behind — assert it as the test's precondition
    mid = spark.read.parquet(out).count()
    assert mid < n_total, "stream finished before the kill; nothing to resume"

    q2 = start()  # resume from the SAME checkpoint
    q2.awaitTermination()

    final = spark.read.parquet(out)
    assert final.count() == n_total
    assert final.select("event_id").distinct().count() == n_total


def test_full_outer_covers_both_null_sides(spark, sf_smoke):
    """The full-outer stream join must contain NULL rows on BOTH
    sides, no sentinel ids, and exactly the left-outer result when
    click-null rows are dropped."""
    from csv_to_parquet_spark.streaming import jobs

    full = jobs.stream_stream_full_outer(spark, sf_smoke).collect()
    assert any(r.click_id is None for r in full)
    assert any(r.purchase_id is None for r in full)
    for r in full:
        assert (r.purchase_id is None or r.purchase_id >= 0)
        assert (r.click_id is None or r.click_id >= 0)
    left = {
        (r.purchase_id, r.click_id)
        for r in jobs.stream_stream_left_outer(spark, sf_smoke).collect()
    }
    assert {
        (r.purchase_id, r.click_id) for r in full if r.purchase_id is not None
    } == left


def test_group_topk_sample_is_deterministic_and_bounded(spark, sf_smoke):
    from csv_to_parquet_spark.operators import textops

    a = textops.sample_group_topk_hash(spark, sf_smoke).collect()
    b = textops.sample_group_topk_hash(spark, sf_smoke).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_group: dict[tuple, list] = {}
    for r in a:
        per_group.setdefault((r.lang, r.source), []).append(r.rk)
    for rks in per_group.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 5


def test_pq_adc_distances_recompute(spark, sf_smoke):
    """ADC ranking invariants plus an end-to-end recompute: for one
    (query, result) pair, the emitted dist_micro2 must equal the sum
    over subspaces of the LUT distance to that vector's assigned
    code, rebuilt directly from raw embeddings in numpy."""
    import numpy as np

    from csv_to_parquet_spark.operators import clustering
    from csv_to_parquet_spark.sources.tables import load_table

    out = clustering.knn_pq_adc(spark, sf_smoke).collect()
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rows in per_q.items():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        dists = [r.dist_micro2 for r in rows]
        assert dists == sorted(dists)

    # self-exclusion: the query's own (zero-quantization-distance)
    # row must never occupy a result slot
    assert all(r.vec_id != r.query_id for r in out)

    emb = {
        r.vec_id: np.array(r.embedding)
        for r in load_table(spark, sf_smoke, "embeddings").collect()
    }
    M, K = clustering._PQ_M, clustering._PQ_K
    d_sub = 64 // M
    cb = clustering._pq_quant(
        np.stack([emb[v] for v in sorted(emb)[: min(K, len(emb))]])
    )
    # replay the r9 integer-Lloyd refinement INDEPENDENTLY (naive
    # per-centroid loop — deliberately not the vectorized
    # np.add.at/dot-expansion path the operator uses) so the test
    # re-derives the trained codebook rather than trusting it
    s_mat = clustering._pq_quant(
        np.stack(
            [emb[v] for v in sorted(emb)[: clustering._PQ_TRAIN_SAMPLE]]
        )
    )
    for _ in range(clustering._PQ_ADC_ITERS):
        new = cb.copy()
        for s in range(M):
            sl = slice(s * d_sub, (s + 1) * d_sub)
            assign = np.array(
                [
                    int(((x[sl][None, :] - cb[:, sl]) ** 2).sum(axis=1).argmin())
                    for x in s_mat
                ]
            )
            for k in range(len(cb)):
                pts = s_mat[assign == k][:, sl]
                if len(pts):
                    tot = pts.sum(axis=0)
                    new[k, sl] = np.sign(tot) * (
                        (2 * np.abs(tot) + len(pts)) // (2 * len(pts))
                    )
        cb = new
    r0 = min(out, key=lambda r: (r.query_id, r.rk))
    qq = clustering._pq_quant(emb[r0.query_id])
    xx = clustering._pq_quant(emb[r0.vec_id])
    total = 0
    for s in range(M):
        sl = slice(s * d_sub, (s + 1) * d_sub)
        code = int(((xx[sl][None, :] - cb[:, sl]) ** 2).sum(axis=1).argmin())
        total += int(((qq[sl] - cb[code, sl]) ** 2).sum())
    assert total == r0.dist_micro2


def test_training_manifest_consistent_with_clean_pipeline(spark, sf_smoke):
    """The manifest's total doc count must equal the cleaning
    pipeline's surviving-doc count (same gates, same dedup), and
    shard ids must cover only [0, 8)."""
    from csv_to_parquet_spark.operators import pipelines

    rows = pipelines.pipeline_training_manifest(spark, sf_smoke).collect()
    assert all(0 <= r.shard < 8 for r in rows)
    total = sum(r.n_docs for r in rows)
    kept = pipelines.pipeline_corpus_clean(spark, sf_smoke).count()
    assert total == kept
    for r in rows:
        assert r.n_tokens >= r.n_docs  # gates require >= 20 tokens/doc
        assert 1 <= r.n_langs


def test_aqe_splits_skewed_join_partition(spark):
    """Engineered 93%-one-key skew: with AQE skew-join enabled and
    fixture-scaled thresholds, the FINAL adaptive plan must mark the
    join skew=true and read the hot shuffle partition as split
    (AQEShuffleRead ... skewed) — the runtime re-plan the repo's
    100 TB posture leans on for join skew (hand-salting covers
    aggregations: agg_salted_skew)."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 280_000, F.lit(0))
            .otherwise((F.col("id") % 1000) + 1)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 300_000  # every left row matches
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead coalesced and skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_json_corrupt_lines_are_isolated_not_fatal(spark, sf_smoke):
    """PERMISSIVE must keep the job alive and quarantine exactly the
    planted truncated lines."""
    from csv_to_parquet_spark.operators import formats
    from csv_to_parquet_spark.sources.tables import load_table

    row = formats.source_json_corrupt_tolerant(spark, sf_smoke).collect()[0]
    docs = load_table(spark, sf_smoke, "documents")
    assert row.n_rows == docs.count()
    assert row.n_corrupt == docs.filter(F.col("doc_id") % 7 == 0).count()
    assert row.n_good + row.n_corrupt == row.n_rows


def test_scan_split_count_follows_max_partition_bytes(spark, tmp_path):
    """The knob that sizes scan tasks at 100 TB: a multi-row-group
    parquet file must split into more input partitions when
    spark.sql.files.maxPartitionBytes shrinks."""
    path = str(tmp_path / "wide.parquet")
    (
        spark.range(0, 400_000)
        .select(
            F.col("id"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad1"),
            F.sha2((F.col("id") + 1).cast("string"), 256).alias("pad2"),
        )
        .coalesce(1)
        .write.option("parquet.block.size", 256 * 1024)
        .parquet(path)
    )
    saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # NOTE: with a large cap the split count is still floored by
        # leafNodeDefaultParallelism (totalSize/defaultParallelism) so
        # cores stay busy — the invariant is monotonic growth as the
        # cap shrinks, not "one split at the default".
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        coarse = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
        fine = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
    assert fine > coarse, (coarse, fine)
    assert fine >= 16, f"expected ~1MB-grained splits, got {fine}"
