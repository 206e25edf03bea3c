"""Bench-scale (sf0.1) exactness certificates for the pair-dedup
family, whose brute-force DuckDB oracles are intractable past sf0.01
(O(n²) doc pairs; measured >30 min at sf0.1 — see
test_oracle_parity_slow.py).

Instead of a brute-force mirror, each operator's exactness is pinned
by INVARIANTS that together equal the brute-force check without ever
materializing all pairs (VERDICT r5 #5):

1. **Zero false positives** — every pair an operator REPORTS is
   re-verified in Spark by an independent exact set-intersection over
   the per-doc shingle arrays (O(|reported|), not O(n²)).
2. **Bound-certified completeness** — the prefix-filter candidate
   scheme is provably lossless (any pair with J ≥ τ shares a shingle
   in both docs' rarest-first prefixes — see
   ``jaccard_prefix_filter_pairs``); combined with (1) both directions
   close: reported ⊆ true (1) and true ⊆ lossless-verified (bound), so
   set equality between the probabilistic (LSH) and lossless (prefix)
   paths certifies BOTH equal the brute-force pair set. Containment
   gets its own independently-constructed lossless candidate scheme
   built inside the test.
3. **Connected components** — the distributed hash-to-min labels are
   replayed through a driver-side union-find over the (small) verified
   edge list: identical partitions, and every label is its component's
   minimum id.

Run with ``pytest -m slow``.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from csv_to_parquet_spark.functions import shingles, tokenize
from csv_to_parquet_spark.operators.cache import release_caches
from csv_to_parquet_spark.operators.dedup import (
    CONTAINMENT_THRESHOLD,
    JACCARD_THRESHOLD,
    dedup_connected_components,
    dedup_containment_pairs,
    dedup_jaccard_prefix_filter,
    dedup_minhash_lsh,
)
from csv_to_parquet_spark.sources.tables import load_table, spread

pytestmark = pytest.mark.slow

SF_BENCH = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sets(spark):
    """Ground-truth per-doc distinct 3-shingle arrays (strings, not
    the operators' 64-bit hashes) with a rarest-first global ranking —
    the independent verification side every certificate joins against."""
    docs = spread(load_table(spark, SF_BENCH, "documents"))
    base = docs.select(
        "doc_id",
        F.array_distinct(shingles(tokenize("text"), 3)).alias("shs"),
    ).withColumn("n_sh", F.size("shs"))
    sh = base.select("doc_id", F.explode("shs").alias("sh"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("r"))
        .select(
            "doc_id",
            F.expr("transform(r, s -> s.sh)").alias("shs"),
            F.size("r").alias("n_sh"),
        )
    )
    return ranked.persist()


def _exact_join(pairs, sets):
    """Attach exact |A∩B| / |A| / |B| to a (doc_a, doc_b, ...) frame."""
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("sa"),
        F.col("n_sh").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("sb"),
        F.col("n_sh").alias("nb"),
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("c", F.size(F.array_intersect("sa", "sb")))
    )


@pytest.fixture(scope="module")
def sets(spark):
    s = _sets(spark)
    yield s
    s.unpersist()


def test_jaccard_pair_set_is_exact_at_bench_scale(spark, sets):
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, SF_BENCH).collect()
    }
    release_caches()
    pfx = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix_filter(spark, SF_BENCH).collect()
    }
    release_caches()
    assert lsh, "no near-dup pairs at bench scale — fixture regressed"

    # (2) lossless-vs-probabilistic set equality: prefix filtering is
    # provably complete, so lsh ⊇ true requires lsh == pfx given (1).
    assert set(lsh) == set(pfx)

    # (1) zero false positives + reported values exact, re-verified by
    # an independent string-shingle intersection (the operators work
    # over xxhash64/md5 arrays — a hash collision would surface here)
    pairs_df = spark.createDataFrame(
        [(a, b, j) for (a, b), j in lsh.items()],
        "doc_a long, doc_b long, jaccard double",
    )
    checked = _exact_join(pairs_df, sets).select(
        "doc_a",
        "doc_b",
        "jaccard",
        (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("j_true"),
    )
    for r in checked.collect():
        assert r.j_true >= JACCARD_THRESHOLD, (r.doc_a, r.doc_b, r.j_true)
        assert r.jaccard == pytest.approx(round(r.j_true, 6), abs=0), (
            r.doc_a,
            r.doc_b,
            r.jaccard,
            r.j_true,
        )
    assert checked.count() == len(lsh)  # no pair lost to the id joins


def test_containment_pair_set_is_exact_at_bench_scale(spark, sets):
    rep = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup_containment_pairs(spark, SF_BENCH).collect()
    }
    release_caches()
    assert rep, "no containment pairs at bench scale — fixture regressed"

    # Independent LOSSLESS candidate scheme (built here, sharing no
    # code with the operator's df-capped index): if |A∩B| ≥ ⌈t·na⌉
    # then at most na−⌈t·na⌉ of A's shingles miss B, so at least one
    # of A's first na−⌈t·na⌉+1 rarest shingles is in B — joining A's
    # prefix against B's FULL shingle index cannot drop a qualifying
    # (A→B) pair.
    t_num, t_den = 4, 5  # CONTAINMENT_THRESHOLD = 0.8, integer-exact
    assert CONTAINMENT_THRESHOLD == t_num / t_den
    prefix = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.explode(
            F.expr(
                f"slice(shs, 1, n_sh - CAST(({t_num} * n_sh + {t_den - 1}) "
                f"DIV {t_den} AS INT) + 1)"
            )
        ).alias("sh"),
    )
    full = sets.select(
        F.col("doc_id").alias("doc_b"), F.explode("shs").alias("sh")
    )
    cand = (
        prefix.join(full, "sh")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        _exact_join(cand, sets)
        .withColumn("cont", F.col("c") / F.col("na"))
        .filter((F.col("na") > 0) & (F.col("cont") >= CONTAINMENT_THRESHOLD))
    )
    truth = {
        (r.doc_a, r.doc_b): round(r.cont, 6) for r in verified.collect()
    }
    assert set(rep) == set(truth)  # complete AND no false positives
    for k, v in rep.items():
        assert v == pytest.approx(truth[k], abs=0), (k, v, truth[k])


def test_connected_components_match_union_find_at_bench_scale(spark):
    edges = [
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SF_BENCH)
        .select("doc_a", "doc_b")
        .collect()
    ]
    release_caches()
    got = {
        r.doc_id: r.cluster_id
        for r in dedup_connected_components(spark, SF_BENCH).collect()
    }
    release_caches()
    assert edges and got

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)

    # exactly the pair-participating nodes, labeled by component min
    assert set(got) == set(parent)
    for root, members in comp.items():
        lbl = min(members)
        for m in members:
            assert got[m] == lbl, (m, got[m], lbl)
