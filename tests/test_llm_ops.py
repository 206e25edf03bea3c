"""LLM-pipeline operator invariants beyond per-query oracle parity.

- MinHash-LSH near-dup pairs must equal the exact inverted-index
  Jaccard result at the driver's correctness scale (sf0.01) — this is
  what licenses attaching the exact-SQL oracle to the LSH query.
- The ANN (random-hyperplane LSH) top-k must achieve high recall
  against the brute-force baseline.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect()}


def test_minhash_lsh_equals_exact_at_driver_sf(spark, sf_oracle, queries):
    exact = _pairs(queries["dedup_ngram_jaccard"](spark, sf_oracle))
    lsh = _pairs(queries["dedup_minhash_lsh"](spark, sf_oracle))
    assert lsh == exact
    assert len(exact) > 0, "corpus should contain planted near-dups"


def test_ann_recall_vs_bruteforce(spark, sf_smoke, queries):
    exact = {
        (r.query_id, r.vec_id)
        for r in queries["knn_bruteforce_cosine"](spark, sf_smoke).collect()
    }
    ann = {
        (r.query_id, r.vec_id)
        for r in queries["knn_lsh_ann"](spark, sf_smoke).collect()
    }
    recall = len(exact & ann) / len(exact)
    # This corpus is the hard regime for LSH — near-uniform random
    # vectors whose true top-10 sit at cos ≈ 0.25–0.48. At L=12/k=10
    # with query-directed multiprobe (_T_PROBES=24, ~28% candidate
    # fraction, r9 integer-Rademacher planes) measured recall is
    # 0.79 at sf0.01 / 0.775 at sf0.1 (≳0.95 clustered).
    # Gate at 0.5 — deterministic modulo testdata regeneration.
    assert recall >= 0.5, f"ANN recall {recall:.2f} too low vs brute force"


def test_ivfpq_recall_vs_bruteforce(spark, sf_smoke, queries):
    exact = {
        (r.query_id, r.vec_id)
        for r in queries["knn_bruteforce_cosine"](spark, sf_smoke).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in queries["knn_ivf_pq_ann"](spark, sf_smoke).collect()
    }
    recall = len(exact & got) / len(exact)
    # r8 operating point: 64-cell/24-probe coarse grid (same 37.5%
    # scan fraction as 16/6 but finer localization) + sample-Lloyd
    # refined codebook; measured 0.80 at sf0.01 / 0.74 at sf0.1 on
    # the uniform corpus (was 0.575 at 16/6/init) — gate at 0.6
    assert recall >= 0.6, f"IVFPQ recall {recall:.2f} too low vs brute force"


def test_ivf_recall_vs_bruteforce(spark, sf_smoke, queries):
    exact = {
        (r.query_id, r.vec_id)
        for r in queries["knn_bruteforce_cosine"](spark, sf_smoke).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in queries["knn_ivf_ann"](spark, sf_smoke).collect()
    }
    recall = len(exact & ivf) / len(exact)
    # 4/16 cells probed on near-uniform vectors → ~0.5 measured; same
    # hard-regime caveat as the hyperplane-LSH test above.
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low vs brute force"


def test_ngram_df_cap_keeps_exact_jaccard(spark):
    """A stop-shingle (df > cap) is excluded from the index join but
    added back in the verification step, so emitted pairs and their
    Jaccard values are identical to the uncapped run."""
    from pyspark.sql import functions as F

    from csv_to_parquet_spark.functions import shingles, tokenize
    from csv_to_parquet_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "click here now"  # shared trigram → df = 6 across 6 docs
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon zeta"),
        (2, boiler + " alpha beta gamma delta epsilon eta"),
        (3, boiler + " one two three four five six"),
        (4, boiler + " seven eight nine ten eleven twelve"),
        (5, boiler + " apple banana cherry date elder fig"),
        (6, boiler + " red green blue cyan magenta yellow"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = docs.select(
        "doc_id", F.explode(shingles(tokenize("text"), 3)).alias("sh")
    ).distinct()
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(sh, df_cap=5).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(sh, df_cap=10**9).collect()
    }
    assert capped == uncapped
    # planted near-dup: 6 of 7 trigrams shared (1 via the capped
    # correction) → J = 6/8 exactly
    assert capped[(1, 2)] == 0.75


def test_containment_supplemental_path_catches_capped_subset(spark):
    """A doc whose EVERY shingle is a stop-shingle (df > cap) is the
    case the plain df-capped index misses entirely — a boilerplate-only
    doc contained verbatim in longer docs. The supplemental candidate
    path (capped-heavy A-sides probe their stop shingles against the
    full index) must emit those pairs with containment identical to an
    uncapped run."""
    from pyspark.sql import functions as F

    from csv_to_parquet_spark.functions import shingles, tokenize
    from csv_to_parquet_spark.operators.dedup import containment_pairs

    phrase = "click here now buy this"  # 3 trigrams, df = 4 across 4 docs
    rows = [
        (1, phrase),  # all 3 shingles capped at df_cap=3 → capped-heavy
        (2, phrase + " alpha beta gamma delta epsilon zeta"),
        (3, phrase + " one two three four five six"),
        (4, phrase + " seven eight nine ten eleven twelve"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = docs.select(
        "doc_id", F.explode(shingles(tokenize("text"), 3)).alias("sh")
    ).distinct()
    capped = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(sh, df_cap=3).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(sh, df_cap=10**9).collect()
    }
    assert capped == uncapped
    # doc 1 is fully contained in each longer doc: C = 3/3 exactly,
    # emitted ONLY via the supplemental path in the capped run
    assert capped[(1, 2)] == 1.0
    assert capped[(1, 3)] == 1.0
    assert capped[(1, 4)] == 1.0


def test_simhash_pairs_runs(spark, sf_smoke, queries):
    df = queries["dedup_simhash_pairs"](spark, sf_smoke)
    assert {f.name for f in df.schema.fields} == {"doc_a", "doc_b", "hamming"}
    df.collect()  # must execute without error; pair count is data-dependent


def test_compaction_reduces_file_count(spark, sf_smoke):
    """Compaction must produce strictly fewer files than the fragmented
    input (and at this sf, exactly one) while the oracle-parity test
    separately proves content identity."""
    import glob
    import os

    from csv_to_parquet_spark.operators.layout import (
        _WAREHOUSE,
        _sf_tag,
        layout_compact_small_files,
    )

    layout_compact_small_files(spark, sf_smoke).count()
    tag = _sf_tag(sf_smoke)
    n_frag = len(glob.glob(os.path.join(_WAREHOUSE, f"orders_frag_{tag}", "*.parquet")))
    n_compact = len(
        glob.glob(os.path.join(_WAREHOUSE, f"orders_compact_{tag}", "*.parquet"))
    )
    assert n_frag == 64
    assert n_compact == 1


# ---------------------------------------------------------------------------
# Round 5: LSH banding operating envelope + clustered-corpus ANN recall
# ---------------------------------------------------------------------------


def _clustered_corpus(tmpdir: str, n: int, n_clusters: int, sigma: float) -> str:
    """Write a clustered embeddings.parquet (the production regime the
    uniform driver corpus deliberately is not): ``n_clusters`` random
    unit centers, members = center + N(0, sigma) noise, renormalized
    scale only by cluster membership. Layout matches TESTDATA.md
    (vec_id bigint, embedding array<float>[64]); vec_ids are a plain
    range so the similarity queries' conventions (queries = vec_id<8,
    IVF seeds = vec_id 100..115) hold."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(n_clusters, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    member_of = rng.integers(0, n_clusters, size=n)
    vecs = centers[member_of] + rng.normal(scale=sigma, size=(n, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v.astype("float32") for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    path = os.path.join(tmpdir, "embeddings.parquet")
    pq.write_table(tbl, path)
    return tmpdir


def test_pair_banding_shrinks_candidate_mass_with_k(spark, tmp_path):
    """The r4 flaw was fixed k: candidate mass ≈ L/2^k of ALL pairs is
    Θ(n²) as the corpus grows. pair_banding grows k with n; this test
    proves the mechanism — on one denser corpus, the bigger-k banding
    produces strictly fewer candidates while planted near-dup pairs
    (cos ≥ 0.95) remain candidates."""
    import random

    from pyspark.sql import functions as F

    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.clustering import (
        lsh_candidate_pairs,
        pair_banding,
    )

    n = 1000
    _clustered_corpus(str(tmp_path), n, n_clusters=20, sigma=0.03)
    e = spark.read.parquet(str(tmp_path / "embeddings.parquet"))

    def planes(L: int, k: int) -> list:
        rng = random.Random(13)
        return [
            [[rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(k)]
            for _ in range(L)
        ]

    # same L so the comparison isolates k; k per pair_banding's policy
    L_small, k_small = 8, 4
    _, k_big = pair_banding(n, target_bucket=16)  # k ≈ log2(1000/16) = 6
    assert k_big > k_small
    mass = {}
    cand_sets = {}
    for k in (k_small, k_big):
        cand = lsh_candidate_pairs(e, planes(L_small, k))
        cand_sets[k] = {
            (r.vec_a, r.vec_b)
            for r in cand.select("vec_a", "vec_b").distinct().collect()
        }
        mass[k] = len(cand_sets[k])
        release_caches()
    assert mass[k_big] < mass[k_small], mass
    # recall: members of the same tight cluster must stay candidates.
    # Find planted pairs via numpy ground truth on a small sample.
    import numpy as np

    rows = sorted(
        ((r.vec_id, np.asarray(r.embedding, dtype=np.float64)) for r in e.collect())
    )
    ids = [i for i, _ in rows]
    V = np.stack([v for _, v in rows])
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    sims = V[:200] @ V.T
    planted = [
        (ids[i], ids[j])
        for i in range(200)
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.95
    ]
    assert len(planted) > 50, "fixture should plant tight near-dup pairs"
    for k in (k_small, k_big):
        hit = sum(1 for p in planted if p in cand_sets[k])
        assert hit / len(planted) >= 0.95, (k, hit, len(planted))


def test_ann_recall_clustered_corpus(spark, tmp_path, queries):
    """Backs the docstring claim (similarity.py): on CLUSTERED
    embeddings — the production regime — both ANN paths reach ≥ 0.9
    recall@10 with the same fixed parameters that measure ~0.5 on the
    ANN-hostile uniform driver corpus."""
    from csv_to_parquet_spark.operators.cache import release_caches

    sf_dir = _clustered_corpus(str(tmp_path), 2000, n_clusters=50, sigma=0.05)

    def topk(name: str) -> set:
        out = {
            (r.query_id, r.vec_id)
            for r in queries[name](spark, sf_dir).collect()
        }
        release_caches()
        return out

    exact = topk("knn_bruteforce_cosine")
    assert len(exact) > 0
    for ann_name in ("knn_lsh_ann", "knn_ivf_ann"):
        got = topk(ann_name)
        recall = len(exact & got) / len(exact)
        assert recall >= 0.9, f"{ann_name} clustered recall {recall:.3f} < 0.9"
    # PQ-ADC is bounded by quantization loss, not candidate pruning,
    # so its clustered bound is lower than the two exact-scoring ANN
    # paths (measured 0.75 here, 0.67 on the uniform corpus with the
    # 2-dim × 128-centroid init codebook).
    got = topk("knn_pq_adc")
    recall = len(exact & got) / len(exact)
    assert recall >= 0.6, f"knn_pq_adc clustered recall {recall:.3f} < 0.6"
    # the IVF+PQ composite compounds probe loss with quantization
    # loss; on clustered data the probe loss ~vanishes (the neighbor
    # cluster fits in the probed cells), so its bound tracks PQ's
    got = topk("knn_ivf_pq_ann")
    recall = len(exact & got) / len(exact)
    assert recall >= 0.55, f"knn_ivf_pq_ann clustered recall {recall:.3f} < 0.55"


def test_pair_banding_envelope():
    """Pure-function envelope of the LSH banding policy: k grows
    log-linearly with corpus size (constant expected bucket occupancy),
    L stays within the documented bounds, the analytic recall at
    cos 0.9 clears 0.99 wherever L is not clamped, and the committed
    catalog constants are exactly pair_banding(2000)."""
    import math

    from csv_to_parquet_spark.operators.clustering import (
        _PAIR_BITS,
        _PAIR_TABLES,
        pair_banding,
    )

    assert (_PAIR_TABLES, _PAIR_BITS) == pair_banding(2000)
    prev_k = 0
    p = 1.0 - 0.4510 / math.pi
    for n in (100, 1_000, 10_000, 100_000, 1_000_000):
        L, k = pair_banding(n)
        assert 4 <= k <= 24 and 4 <= L <= 48
        assert k >= prev_k, "k must be monotone in corpus size"
        prev_k = k
        if L < 48:  # below the clamp, L is chosen to hit the target
            recall = 1.0 - (1.0 - p**k) ** L
            assert recall >= 0.99, (n, L, k, recall)
