"""Round-10 unit tests: CCNet paragraph-level dedup invariants
(first-occurrence keep rule, vanishing fully-duplicated documents,
normalization-only hashing) and the line-dedup → LM-bucketing
composite that completes the published CCNet pipeline."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def _write_docs(spark, path: str, rows: list[tuple]) -> str:
    """rows: (doc_id, text, lang). Writes a load_table-compatible
    documents.parquet under ``path``."""
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["unit" for _ in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


def _line(words: str) -> str:
    """Pad a phrase to exactly 10 tokens (one CCNet 'paragraph')."""
    toks = words.split()
    assert len(toks) <= 10
    return " ".join(toks + ["pad"] * (10 - len(toks)))


def test_ccnet_lines_first_occurrence(spark, tmp_path, queries):
    """The keep rule is FIRST occurrence by (doc_id, line_no):
    a line shared by doc 0 and doc 5 survives only in doc 0; a
    document made entirely of earlier-seen lines vanishes; and
    within-document repetition collapses to the first copy."""
    boiler = _line("accept cookies to continue browsing this site")
    unique0 = _line("alpha beta gamma delta")
    unique5 = _line("epsilon zeta eta theta")
    rows = [
        (0, f"{boiler} {unique0}", "en"),
        # within-doc repetition: the same line twice
        (3, f"{unique5} {unique5}", "en"),
        # every line already seen -> the document must vanish
        (5, f"{boiler} {unique5}", "en"),
    ]
    out = {
        r.doc_id: r
        for r in queries["dedup_ccnet_lines"](
            spark, _write_docs(spark, str(tmp_path), rows)
        ).collect()
    }
    assert set(out) == {0, 3}
    assert out[0].n_lines == 2 and out[0].n_kept == 2
    assert out[0].new_text == f"{boiler} {unique0}"
    # doc 3 keeps ONE copy of its repeated line
    assert out[3].n_lines == 2 and out[3].n_kept == 1
    assert out[3].new_text == unique5


def test_ccnet_lines_normalization_hash_only(spark, tmp_path, queries):
    """Hashing normalizes (case, digits, punctuation) so near-identical
    boilerplate collapses — but surviving text keeps its ORIGINAL
    form, as in Wenzek et al. §3.1."""
    a = _line("Copyright 2019 Example Corp all rights reserved")
    b = _line("copyright 2024 example corp all rights reserved")
    keep = _line("kappa lambda mu nu")
    rows = [(0, a, "en"), (7, f"{b} {keep}", "en")]
    out = {
        r.doc_id: r
        for r in queries["dedup_ccnet_lines"](
            spark, _write_docs(spark, str(tmp_path), rows)
        ).collect()
    }
    # b collapses onto a's hash (digits->0, lowercase) and is dropped
    assert out[0].new_text == a  # original casing preserved
    assert out[7].n_lines == 2 and out[7].n_kept == 1
    assert out[7].new_text == keep


def test_ccnet_composite_line_dedup_then_lm(spark, tmp_path, queries):
    """The published CCNet pipeline end to end: paragraph dedup FIRST,
    LM perplexity tertiles on the deduplicated corpus SECOND. The
    rewritten documents from dedup_ccnet_lines feed
    text_ccnet_buckets directly, every surviving document gets a
    bucket, and each language's buckets cover head/middle/tail."""
    sf_dir = "/root/testdata/sf0.001"
    dedup = queries["dedup_ccnet_lines"](spark, sf_dir).collect()
    assert len(dedup) > 0
    stage2_dir = _write_docs(
        spark,
        str(tmp_path),
        [(r.doc_id, r.new_text, r.lang) for r in dedup],
    )
    buckets = queries["text_ccnet_buckets"](spark, stage2_dir).collect()
    surviving = {r.doc_id for r in dedup if r.new_text.strip()}
    assert {r.doc_id for r in buckets} == surviving
    assert {r.bucket for r in buckets} <= {"head", "middle", "tail"}
    by_lang: dict = {}
    for r in buckets:
        by_lang.setdefault(r.lang, set()).add(r.bucket)
    # any language with >= 3 docs must span all three tertiles
    from collections import Counter

    lang_counts = Counter(r.lang for r in buckets)
    for lang, n in lang_counts.items():
        if n >= 3:
            assert by_lang[lang] == {"head", "middle", "tail"}, (
                lang,
                by_lang[lang],
            )


def test_ccnet_lines_oracle_parity_smoke(spark, sf_oracle):
    """Cross-engine gate at the driver's sf0.01 scale (the slow
    battery re-checks at sf0.1)."""
    import __spark_entry__ as entry_mod
    from csv_to_parquet_spark.oracle import (
        compare_frames,
        duckdb_connection,
    )

    spark_pdf = (
        entry_mod.queries()["dedup_ccnet_lines"](spark, sf_oracle).toPandas()
    )
    con = duckdb_connection(sf_oracle)
    try:
        duck_pdf = con.execute(
            entry_mod.oracle_sql()["dedup_ccnet_lines"]
        ).df()
    finally:
        con.close()
    assert len(spark_pdf) == len(duck_pdf) > 0
    assert compare_frames(spark_pdf, duck_pdf) == []


def test_fertility_report_invariants_and_reconciliation(
    spark, sf_oracle, queries
):
    """Fertility ≥ 10⁶ micro (every word is ≥ 1 subword), chars per
    token ≥ 10⁶ (every subword is ≥ 1 char), and the per-language
    totals reconcile EXACTLY with the per-document
    text_subword_merge_stats output — the two entries must describe
    the same segmentation."""
    rep = {r.lang: r for r in
           queries["tokenizer_fertility_report"](spark, sf_oracle).collect()}
    assert rep
    for lang, r in rep.items():
        assert r.fertility_micro >= 1_000_000, (lang, r.fertility_micro)
        assert r.chars_per_token_micro >= 1_000_000, lang
        assert 0 < r.tokens_per_byte_micro < 1_000_000, lang
        assert r.fertility_micro == r.n_subwords * 1_000_000 // r.n_words
        # chars exclude whitespace, bytes include it (ASCII corpus)
        assert r.n_bytes > r.n_chars
    per_doc = queries["text_subword_merge_stats"](spark, sf_oracle).collect()
    assert sum(r.n_subwords for r in per_doc) == sum(
        r.n_subwords for r in rep.values()
    )
    assert sum(r.n_words for r in per_doc) == sum(
        r.n_words for r in rep.values()
    )


def _write_docs_src(spark, path: str, rows: list[tuple]) -> str:
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


def test_cross_source_overlap_known_corpus(spark, tmp_path, queries):
    """On a corpus with a KNOWN shared passage the matrix must report
    exactly that pair, the correct distinct-passage denominators, and
    the cross-multiplied coefficient."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (0, f"{shared} one two", "en", "srcA"),   # 3 distinct passages
        (1, f"{shared} ten", "en", "srcB"),        # 2 distinct passages
        (2, "totally different words here with no overlap at all", "en",
         "srcC"),
    ]
    out = queries["dedup_cross_source_overlap"](
        spark, _write_docs_src(spark, str(tmp_path), rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src_a, r.src_b) == ("srcA", "srcB")
    assert r.shared_passages == 1
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.overlap_coef_micro == 1_000_000 // 2  # 1 of min(3, 2)


def test_cross_source_overlap_invariants(spark, sf_oracle, queries):
    """Pairs are canonically ordered, shared <= min(n_a, n_b), and the
    coefficient reproduces the integer cross-multiplication."""
    out = queries["dedup_cross_source_overlap"](spark, sf_oracle).collect()
    assert out
    for r in out:
        assert r.src_a < r.src_b
        assert 0 < r.shared_passages <= min(r.n_a, r.n_b)
        assert r.overlap_coef_micro == (
            r.shared_passages * 1_000_000 // min(r.n_a, r.n_b)
        )
