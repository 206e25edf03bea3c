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
    # with Hamming-1 multiprobe the analytic recall there is ~0.5
    # (≳0.95 for clustered real-world embeddings at cos ≥ 0.8) at a
    # ~13% candidate fraction; gate at 0.35 to stay deterministic-safe.
    assert recall >= 0.35, f"ANN recall {recall:.2f} too low vs brute force"


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
