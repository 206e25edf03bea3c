"""Round-6 operator invariants — properties the DuckDB oracle parity
cannot express (idempotence, independent recomputation, structural
guarantees), on the smoke corpus and engineered fixtures."""

from __future__ import annotations

import hashlib
import math
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_pii_redact_removes_every_match_and_is_idempotent(spark, sf_smoke):
    """After redaction no pattern can match (the placeholders are
    digit-free and @-free), so a second pass is the identity — checked
    end-to-end by rebuilding the redacted text and re-scanning it."""
    from csv_to_parquet_spark.operators import textops
    from csv_to_parquet_spark.sources.tables import load_table

    out = {r.doc_id: r for r in textops.text_pii_redact(spark, sf_smoke).collect()}
    docs = load_table(spark, sf_smoke, "documents").collect()
    assert len(out) == len(docs)
    for d in docs:
        red = re.sub(textops._PII_EMAIL, "[EMAIL]", d.text)
        red = re.sub(textops._PII_IPV4, "[IP]", red)
        red = re.sub(textops._PII_PHONE, "[PHONE]", red)
        r = out[d.doc_id]
        assert r.len_after == len(red)
        assert r.redacted_hash == _md5_60(red)
        # no residual matches → idempotent
        for pat in (textops._PII_EMAIL, textops._PII_IPV4, textops._PII_PHONE):
            assert not re.search(pat, red), (d.doc_id, pat)


def test_pii_redact_counts_replacements_not_raw_matches(spark, tmp_path):
    """The smoke corpus contains no PII spans, so the redaction path
    is pinned on an engineered fixture — including the contained-match
    trap: a phone/IP-shaped span INSIDE an email must count once (it
    is consumed by the email replacement), because n_redacted counts
    each stage's matches on that stage's input."""
    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "contact 555-123-4567@example.com now",  # phone inside email: 1
            "mail a@b.io or ping 10.0.0.1 or call 555-123-4567",  # 3 spans
            "plain text, nothing to redact",  # 0
            "u@192.168.1.1.com logged",  # IP inside email: 1
        ],
        "lang": ["en"] * 4,
        "source": ["t"] * 4,
    }
    pq.write_table(pa.table(rows), os.path.join(str(tmp_path), "documents.parquet"))
    from csv_to_parquet_spark.operators import textops

    out = {r.doc_id: r for r in textops.text_pii_redact(spark, str(tmp_path)).collect()}
    assert out[1].n_redacted == 1 and "[EMAIL]" not in rows["text"][0]
    assert out[2].n_redacted == 3
    assert out[3].n_redacted == 0 and out[3].len_before == out[3].len_after
    assert out[4].n_redacted == 1
    # redacted lengths consistent with exactly those replacements
    red1 = re.sub(textops._PII_EMAIL, "[EMAIL]", rows["text"][0])
    assert out[1].len_after == len(red1) and out[1].redacted_hash == _md5_60(red1)


def test_bigram_surprisal_zero_for_deterministic_transitions(spark, tmp_path):
    """A corpus where every w1 has exactly one successor has
    P(w2|w1)=1 everywhere → surprisal exactly 0 micro-nats; a doc
    introducing a second successor for a shared prefix token must
    score strictly positive."""
    rows = {
        "doc_id": [1, 2, 3],
        "text": ["a b c", "a b c", "a b x"],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
    }
    pq.write_table(pa.table(rows), os.path.join(str(tmp_path), "documents.parquet"))
    from csv_to_parquet_spark.operators import textops

    out = {r.doc_id: r for r in textops.text_bigram_surprisal(spark, str(tmp_path)).collect()}
    # bigram 'a b' is deterministic (always followed); 'b c' occurs 2/3,
    # 'b x' 1/3 → doc 3 must be the most surprising
    assert out[1].neg_logprob_micro == out[2].neg_logprob_micro
    assert out[3].neg_logprob_micro > out[1].neg_logprob_micro
    # exact fixed-point values: 'a b': ln(1)=0; 'b c': ln(2/3); 'b x': ln(1/3)
    lp_bc = -math.floor(math.log(2 / 3) * 1_000_000)
    lp_bx = -math.floor(math.log(1 / 3) * 1_000_000)
    assert out[1].neg_logprob_micro == lp_bc
    assert out[3].neg_logprob_micro == lp_bx


def test_quality_model_score_matches_python_recompute(spark, sf_smoke):
    """The zero-shuffle inference must equal a from-scratch Python
    reimplementation of hash -> bucket -> weight -> sum for every doc."""
    from csv_to_parquet_spark.operators import textops
    from csv_to_parquet_spark.sources.tables import load_table

    D, W = textops._QMODEL_D, textops._QMODEL_W
    out = {r.doc_id: r for r in textops.quality_model_score(spark, sf_smoke).collect()}
    docs = load_table(spark, sf_smoke, "documents").collect()
    checked = 0
    for d in docs:
        toks = d.text.strip().split()
        if not toks:
            assert d.doc_id not in out
            continue
        logit = sum(
            _md5_60(str(_md5_60(t) % D)) % W - (W - 1) // 2 for t in toks
        )
        r = out[d.doc_id]
        assert r.logit_micro == logit and r.keep == (logit > 0)
        checked += 1
    assert checked == len(out)


def test_weighted_priority_sample_matches_python_recompute(spark, sf_smoke):
    """Exactly k rows, and they are the true top-k of the
    Efraimidis-Spirtes keys recomputed independently in Python."""
    from csv_to_parquet_spark.operators import textops
    from csv_to_parquet_spark.sources.tables import load_table

    out = [r for r in textops.sample_weighted_priority(spark, sf_smoke).collect()]
    docs = load_table(spark, sf_smoke, "documents").collect()
    keys = []
    for d in docs:
        w = len(d.text.strip().split())
        if w == 0:
            continue
        u = (_md5_60(str(d.doc_id)) + 1) / float(1 << 60)
        keys.append((math.floor(math.log(u) / w * 1_000_000), -d.doc_id, d.doc_id, w))
    keys.sort(reverse=True)
    k = textops._WSAMPLE_K
    expect = keys[: min(k, len(keys))]
    assert len(out) == len(expect)
    got = sorted(out, key=lambda r: r.rk)
    for r, (key, _, doc_id, w) in zip(got, expect):
        assert (r.doc_id, r.weight, r.key_micro) == (doc_id, w, key)
    # heavier docs must be over-represented vs uniform: mean weight of
    # the sample should exceed the corpus mean (E-S inclusion ∝ weight)
    mean_all = sum(x[3] for x in keys) / len(keys)
    mean_sample = sum(r.weight for r in out) / len(out)
    assert mean_sample > mean_all


def test_skyline_two_phase_equals_single_window(spark, sf_smoke):
    """The two-phase running max must reproduce the single global
    window exactly (same filter survivors)."""
    from pyspark.sql import Window

    from csv_to_parquet_spark.operators.relational4 import skyline_parts
    from csv_to_parquet_spark.functions import cents
    from csv_to_parquet_spark.sources.tables import load_table

    got = {(r.price_cents, r.size, r.n_parts) for r in skyline_parts(spark, sf_smoke).collect()}

    d = (
        load_table(spark, sf_smoke, "part")
        .groupBy(cents("p_retailprice").alias("price_cents"), F.col("p_size").cast("bigint").alias("size"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    wp = Window.partitionBy("price_cents")
    g = (
        d.withColumn("m", F.max("size").over(wp))
        .groupBy("price_cents")
        .agg(
            F.max("size").alias("size"),
            F.sum(F.when(F.col("size") == F.col("m"), F.col("n_parts")).otherwise(0)).alias("n_parts"),
        )
    )
    wr = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        (r.price_cents, r.size, r.n_parts)
        for r in g.withColumn("rm", F.max("size").over(wr))
        .filter(F.col("rm").isNull() | (F.col("size") > F.col("rm")))
        .select("price_cents", "size", "n_parts")
        .collect()
    }
    assert got == ref and got


def test_pack_token_budget_cache_released(spark, sf_smoke):
    """pack_token_budget persists a narrow projection; after the
    harness releases, nothing may stay registered."""
    from csv_to_parquet_spark.operators import packing
    from csv_to_parquet_spark.operators.cache import _ACTIVE_CACHES, release_caches

    release_caches()
    packing.pack_token_budget(spark, sf_smoke).collect()
    assert len(_ACTIVE_CACHES) >= 1
    release_caches()
    assert not _ACTIVE_CACHES


def test_backfill_rate_limit_actually_splits_batches(spark, sf_smoke):
    """maxFilesPerTrigger=1 under availableNow must process the staged
    _BACKFILL_FILES files as separate micro-batches — the rate limit
    is the point of the operator, not an option that silently no-ops."""
    from csv_to_parquet_spark.streaming import jobs

    out = jobs.stream_backfill_rate_limited(spark, sf_smoke).collect()
    assert out
    assert jobs.stream_backfill_rate_limited.last_n_batches >= jobs._BACKFILL_FILES


def test_subword_segmentation_roundtrip_and_cascade(spark, tmp_path):
    """Removing separators must reproduce the original word stream
    (segmentation is a partition of the characters), and the cascade
    must actually cascade: 'the' ends up ONE subword (t+h -> th,
    th+e -> the) while an unmergeable word stays fully split."""
    rows = {
        "doc_id": [1, 2],
        "text": ["the them", "xyz"],
        "lang": ["en"] * 2,
        "source": ["t"] * 2,
    }
    pq.write_table(pa.table(rows), os.path.join(str(tmp_path), "documents.parquet"))
    from csv_to_parquet_spark.operators import textops

    out = {r.doc_id: r for r in textops.text_subword_merge_stats(spark, str(tmp_path)).collect()}
    # 'the' -> [the] (1 subword); 'them' -> [the, m] (2)
    assert out[1].n_words == 2 and out[1].n_chars == 7
    assert out[1].n_subwords == 3
    # 'xyz' has no rule: 3 single-char subwords
    assert out[2].n_subwords == 3 and out[2].n_chars == 3

    # roundtrip + hash: recompute the segmentation in Python with the
    # same replace-scan semantics and compare the pinned hash
    def seg_word(w):
        s = textops._SW_SEP + "".join(c + textops._SW_SEP for c in w)
        for a, b in textops._SW_MERGES:
            pat = f"{textops._SW_SEP}{a}{textops._SW_SEP}{b}{textops._SW_SEP}"
            rep = f"{textops._SW_SEP}{a}{b}{textops._SW_SEP}"
            s = s.replace(pat, rep).replace(pat, rep)
        return s

    for doc_id, text in zip(rows["doc_id"], rows["text"]):
        segs = [seg_word(w) for w in text.split()]
        assert all(g.replace(textops._SW_SEP, "") == w for g, w in zip(segs, text.split()))
        assert out[doc_id].seg_hash == _md5_60(" ".join(segs))
