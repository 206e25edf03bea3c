"""Round-13 (optimization round 2) invariants.

- bench.py's drift_index payload field (VERDICT r12 #2): an
  additions-only host-load gauge — the median timing/floor ratio —
  computed correctly and robust to per-entry outliers; the existing
  payload contract (metric/value/unit/queries names) is untouched.
"""

from __future__ import annotations

import os


def test_drift_index_median_semantics():
    import bench

    floors = {"a": 1.0, "b": 2.0, "c": 4.0}
    # calm window: every entry at its floor
    assert bench.drift_index_of({"a": 1.0, "b": 2.0, "c": 4.0}, floors) == 1.0
    # uniform 1.5x drift
    assert bench.drift_index_of({"a": 1.5, "b": 3.0, "c": 6.0}, floors) == 1.5
    # one genuine 10x regression must NOT move the median (robustness:
    # the gauge tracks the host, not the code)
    assert bench.drift_index_of({"a": 1.0, "b": 2.0, "c": 40.0}, floors) == 1.0
    # even-count median is the midpoint of the two central ratios
    assert (
        bench.drift_index_of({"a": 1.0, "b": 4.0}, {"a": 1.0, "b": 2.0})
        == 1.5
    )
    # entries without a floor are skipped; no floors at all -> None
    assert bench.drift_index_of({"x": 3.0}, floors) is None
    assert bench.drift_index_of({}, {}) is None
    # a zero/negative floor must never divide
    assert bench.drift_index_of({"a": 1.0}, {"a": 0.0}) is None


def test_cos_blocks_derived_from_row_count(sf_smoke, monkeypatch):
    """VERDICT r12 #3: B comes from the embeddings row count (parquet
    footer, no Spark job) with a floor of 16 — the value every current
    fixture resolves to — and grows linearly once blocks would exceed
    _COS_BLOCK_ROWS, keeping per-group rows bounded."""
    import math

    from csv_to_parquet_spark.operators import dedup as d

    # every driver fixture sits under the floor → B = 16, plans and
    # outputs identical to the r12 constant
    assert d._cos_blocks(sf_smoke) == 16
    # derivation really reads the footer: shrink the block target and
    # the SAME fixture (500 rows at smoke sf) must yield ceil(500/10)
    monkeypatch.setattr(d, "_COS_BLOCK_ROWS", 10)
    assert d._cos_blocks(sf_smoke) == 50
    monkeypatch.setattr(d, "_COS_BLOCK_ROWS", 100)
    assert d._cos_blocks(sf_smoke) == 16  # ceil(500/100)=5 → floor
    # bounded per-group rows by construction: for any corpus size the
    # derived B keeps a bucket at or under the block target (above the
    # floor region)
    monkeypatch.undo()
    for n in (1, 10**6, 10**9, 10**12):
        B = max(d._COS_BLOCKS_MIN, math.ceil(n / d._COS_BLOCK_ROWS))
        if B > d._COS_BLOCKS_MIN:
            assert math.ceil(n / B) <= d._COS_BLOCK_ROWS, (n, B)
    # unreadable path → floor, never a crash (B is a performance knob)
    assert d._cos_blocks("/nonexistent") == 16


def test_cos_kernel_chunking_is_bit_identical(spark, sf_smoke, monkeypatch):
    """ADVICE r12: the row-chunked score slab must not change a single
    output row — force pathological chunking (3-row slabs) and compare
    against the default."""
    from csv_to_parquet_spark.operators import dedup as d
    from csv_to_parquet_spark.operators.cache import release_caches

    try:
        base = sorted(
            map(tuple, d.dedup_embedding_cosine(spark, sf_smoke).collect())
        )
    finally:
        release_caches()
    monkeypatch.setattr(d, "_COS_CHUNK", 3)
    try:
        chunked = sorted(
            map(tuple, d.dedup_embedding_cosine(spark, sf_smoke).collect())
        )
    finally:
        release_caches()
    assert base == chunked and base


def _planted_vocab_words(n_types: int, seed: int = 77):
    """A planted word-type histogram with a REAL vocabulary (unlike
    the 31-word-type sf0.1 corpus): words over a 12-char alphabet,
    lengths 1..12, skewed frequencies — the fixture the Arrow Viterbi
    kernel exists for (VERDICT r12 #4)."""
    import random

    rng = random.Random(seed)
    alphabet = "abcdefghijkl"
    words = {}
    while len(words) < n_types:
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 12))
        )
        words.setdefault(w, rng.randint(1, 500))
    return sorted(words.items())


def test_unigram_kernel_and_fold_learn_identical_model(spark):
    """The gated Arrow DP kernel must train the IDENTICAL model to the
    codegen fold on a planted 600-type histogram — same vocabulary,
    same Viterbi counts, same micro-nat costs, same prune flags."""
    from csv_to_parquet_spark.operators.textops import unigram_lm_model

    wdf = spark.createDataFrame(
        _planted_vocab_words(600), "w STRING, f BIGINT"
    )
    fold = unigram_lm_model(wdf, use_kernel=False)
    wdf2 = spark.createDataFrame(
        _planted_vocab_words(600), "w STRING, f BIGINT"
    )
    kernel = unigram_lm_model(wdf2, use_kernel=True)
    assert fold == kernel and len(fold) > 12


def test_unigram_kernel_segmentation_matches_fold(spark):
    """Word-for-word segmentation parity of the kernel against the
    fold on adversarial words (tie storms, length extremes) under a
    cost table with planted equal-cost collisions."""
    import random

    from pyspark.sql import functions as F

    from csv_to_parquet_spark.operators.textops import (
        _ulm_viterbi_pieces,
        _ulm_viterbi_udf,
    )

    rng = random.Random(4321)
    alphabet = "abc"
    words = sorted(
        {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 12))
            )
            for _ in range(300)
        }
    )
    cost = {c: 1000 for c in alphabet}
    for _ in range(70):
        p = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(2, 4))
        )
        cost[p] = rng.choice([900, 1500, 2000, len(p) * 1000])
    wdf = spark.createDataFrame([(w,) for w in words], "w STRING")
    fold = {
        r.w: list(r.ps)
        for r in wdf.select(
            "w", _ulm_viterbi_pieces(F.col("w"), cost).alias("ps")
        ).collect()
    }
    kern = {
        r.w: list(r.ps)
        for r in wdf.select(
            "w", _ulm_viterbi_udf(cost)(F.col("w")).alias("ps")
        ).collect()
    }
    assert fold == kern
    for w in words:
        assert "".join(kern[w]) == w


def test_unigram_kernel_gate_reads_footer(sf_smoke, monkeypatch):
    """The gate is decided from the documents parquet footer with no
    Spark job: every driver fixture sits far below the threshold (the
    fold path — where the kernel measurably loses), a lowered
    threshold flips it, and unreadable paths fall back to the fold."""
    from csv_to_parquet_spark.operators import textops as t

    assert t._ulm_use_kernel(sf_smoke) is False
    monkeypatch.setattr(t, "_ULM_KERNEL_MIN_DOCS", 10)
    assert t._ulm_use_kernel(sf_smoke) is True
    assert t._ulm_use_kernel("/nonexistent") is False


def test_drift_index_is_additions_only():
    """The new field must be ADDED to the payload without renaming or
    removing any existing key, and the timing loop itself must not
    reference it (methodology untouched)."""
    with open(
        os.path.join(os.path.dirname(__file__), "..", "bench.py")
    ) as f:
        src = f.read()
    for key in (
        '"metric"',
        '"value"',
        '"unit"',
        '"sf"',
        '"convert_csv_mb"',
        '"convert_mbps"',
        '"recall_at_10"',
        '"floor_violations"',
        '"queries"',
    ):
        assert key in src, f"existing payload key {key} disappeared"
    assert '"drift_index": drift_index' in src
    # the timing decision logic still keys ONLY on floors/FLOOR_TOLERANCE
    assert "FLOOR_TOLERANCE * floor" in src
