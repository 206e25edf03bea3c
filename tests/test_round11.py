"""Round-11 invariants.

- bench floors: the committed bench_floors.json covers the headline
  set (minus entries newer than the last committed bench run), so the
  automated variance check has a reference for every timed entry.
- ccnet pack guard: both engines raise loudly when line_no reaches
  the pack base instead of silently corrupting first-occurrence order
  (r10 advice — oracle parity cannot catch a collision both engines
  compute identically).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_floors_cover_headline():
    import bench

    floors = bench.load_floors()
    assert floors, "bench_floors.json missing or empty"
    # every floor is a positive time; every headline entry that was in
    # the last committed bench payload has one
    assert all(v > 0 for v in floors.values())
    missing = [n for n in bench.HEADLINE if n not in floors]
    # entries added after the floors file was last refreshed are the
    # only permitted gaps (they seed their floor on the next refresh)
    allowed_new = set(getattr(bench, "FLOORLESS_NEW", ()))
    assert set(missing) <= allowed_new, f"floorless entries: {missing}"
    assert bench.FLOOR_TOLERANCE == 1.25


def test_ccnet_pack_guard_raises_spark(spark):
    from csv_to_parquet_spark.operators.dedup import _CCNET_LINE_PACK

    df = spark.createDataFrame(
        [(1, _CCNET_LINE_PACK)], "doc_id BIGINT, line_no BIGINT"
    ).select(
        (
            F.col("doc_id") * _CCNET_LINE_PACK
            + F.when(
                F.col("line_no") < _CCNET_LINE_PACK, F.col("line_no")
            ).otherwise(
                F.raise_error(F.lit("ccnet line_no overflows pack base"))
            )
        ).alias("pack")
    )
    with pytest.raises(Exception, match="overflows pack base"):
        df.collect()


def test_ccnet_pack_guard_raises_duckdb():
    import duckdb

    from csv_to_parquet_spark.operators.dedup import _CCNET_LINE_PACK

    con = duckdb.connect()
    guard = (
        f"SELECT 1 * {_CCNET_LINE_PACK} + CASE WHEN ln < {_CCNET_LINE_PACK} "
        f"THEN ln ELSE error('ccnet line_no overflows pack base') END "
        f"FROM (SELECT {{v}} AS ln)"
    )
    # happy path evaluates fine
    assert con.execute(guard.format(v=0)).fetchone()[0] == _CCNET_LINE_PACK
    with pytest.raises(Exception, match="overflows pack base"):
        con.execute(guard.format(v=_CCNET_LINE_PACK)).fetchall()


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def _write_docs(spark, path: str, rows: list[tuple]) -> str:
    """rows: (doc_id, text, lang). Writes a load_table-compatible
    documents.parquet under ``path``."""
    import pandas as pd

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


def _aa_word(i: int) -> str:
    return ["aba", "bac", "cab", "abc", "bca", "cba"][i % 6]


def _zz_word(i: int) -> str:
    return ["xyx", "yzx", "zxy", "xyz", "yxz", "zyx"][i % 6]


def test_langid_discriminates_planted_distributions(spark):
    """On fixtures whose character distributions genuinely differ (the
    thing the synthetic corpus lacks), the trained estimator must get
    every pure document right, and a planted half-and-half document
    must carry a SMALLER margin than every pure document."""
    from csv_to_parquet_spark.operators.textops import langid_score_frame

    rows = []
    for d in range(30):
        rows.append((d, " ".join(_aa_word(d + j) for j in range(12)), "aa"))
        rows.append(
            (100 + d, " ".join(_zz_word(d + j) for j in range(12)), "zz")
        )
    mixed_text = " ".join(
        _aa_word(j) if j % 2 == 0 else _zz_word(j) for j in range(12)
    )
    rows.append((999, mixed_text, "aa"))
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING"
    )
    got = {r.doc_id: r for r in langid_score_frame(docs).collect()}
    pure_margins = []
    for d, r in got.items():
        if d == 999:
            continue
        assert r.agree, f"doc {d}: pred {r.pred_lang} != {r.lang}"
        pure_margins.append(r.margin_micro)
    assert got[999].margin_micro < min(pure_margins)


def test_langid_composite_feeds_ccnet_buckets(spark, tmp_path, queries):
    """VERDICT r10 #4 composite: predicted language (not the corpus
    label) drives the CCNet LM bucketing — langid output rewrites the
    documents' lang column, text_ccnet_buckets runs downstream, and
    every scored doc gets a tertile under its PREDICTED language."""
    sf_dir = "/root/testdata/sf0.001"
    pred = {
        r.doc_id: r.pred_lang
        for r in queries["text_langid_model"](spark, sf_dir).collect()
    }
    assert pred
    orig = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    staged = _write_docs(
        spark,
        str(tmp_path),
        [(d, orig[d], lang) for d, lang in pred.items()],
    )
    buckets = queries["text_ccnet_buckets"](spark, staged).collect()
    assert {r.doc_id for r in buckets} == set(pred)
    for r in buckets:
        assert r.lang == pred[r.doc_id]
    assert {r.bucket for r in buckets} <= {"head", "middle", "tail"}


def test_mix_weights_reconcile_with_overlap_matrix(spark, queries):
    """The mixing weights must be EXACTLY derivable from the committed
    overlap matrix: recompute ceded mass per source from
    dedup_cross_source_overlap's rows (smaller side loses; ties, the
    lexicographically larger name) and match mix_source_weights."""
    sf = "/root/testdata/sf0.01"
    overlap = queries["dedup_cross_source_overlap"](spark, sf).collect()
    weights = {
        r.source: r for r in queries["mix_source_weights"](spark, sf).collect()
    }
    ceded: dict = {}
    n_of: dict = {}
    for r in overlap:
        n_of[r.src_a] = r.n_a
        n_of[r.src_b] = r.n_b
        if r.n_a < r.n_b:
            loser = r.src_a
        elif r.n_b < r.n_a:
            loser = r.src_b
        else:
            loser = max(r.src_a, r.src_b)
        ceded[loser] = ceded.get(loser, 0) + r.shared_passages
    assert sum(ceded.values()) == sum(r.shared_passages for r in overlap)
    total_eff = 0
    for src, w in weights.items():
        expect_ceded = ceded.get(src, 0)
        assert w.ceded_passages == expect_ceded, src
        if src in n_of:
            assert w.n_passages == n_of[src], src
        assert w.effective_passages == max(w.n_passages - expect_ceded, 0)
        total_eff += w.effective_passages
    for src, w in weights.items():
        assert (
            w.weight_micro == w.effective_passages * 1_000_000 // total_eff
        ), src
    s = sum(w.weight_micro for w in weights.values())
    assert 1_000_000 - len(weights) < s <= 1_000_000


def test_url_domain_filter_invariants(spark, queries):
    from csv_to_parquet_spark.operators.textops import (
        _URL_BLOCKLIST,
        _URL_CAP,
        _URL_TLDS,
    )

    # the blocklist literals must stay consistent with the TLD rule
    for entry in _URL_BLOCKLIST:
        dom, tld = entry.split(".")
        assert tld == _URL_TLDS[int(dom[1:]) % 4], entry
    rows = queries["text_url_domain_filter"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert {r.verdict for r in rows} == {"kept", "capped", "blocked"}
    per_dom: dict = {}
    for r in rows:
        if r.verdict == "blocked":
            assert r.domain in _URL_BLOCKLIST
            assert r.domain_rank == 0
        else:
            assert r.domain not in _URL_BLOCKLIST
            per_dom.setdefault(r.domain, []).append(r)
    for dom, docs in per_dom.items():
        kept = [r for r in docs if r.verdict == "kept"]
        assert len(kept) <= _URL_CAP
        # the kept slots are exactly the lowest doc_ids of the domain
        by_id = sorted(docs, key=lambda r: r.doc_id)
        for i, r in enumerate(by_id):
            assert r.domain_rank == i + 1
            assert r.verdict == ("kept" if i < _URL_CAP else "capped")


def test_round11_oracle_parity_smoke(spark, sf_oracle):
    import __spark_entry__ as entry_mod

    from csv_to_parquet_spark.oracle import compare_frames, duckdb_connection

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    con = duckdb_connection(sf_oracle)
    for name in (
        "text_langid_model",
        "mix_source_weights",
        "text_url_domain_filter",
    ):
        sp = q[name](spark, sf_oracle).toPandas()
        du = con.execute(o[name]).df()
        assert len(sp) == len(du), name
        assert compare_frames(sp, du) == [], name


def test_token_allocation_is_exact_hamilton(spark, queries):
    """Σ alloc == budget EXACTLY; every allocation within one token of
    its real quota; effective mass reconciles with mix_source_weights;
    repeats_milli is the integer ceiling of alloc·1000/available."""
    from csv_to_parquet_spark.operators.dedup import _MIX_BUDGET

    sf = "/root/testdata/sf0.01"
    alloc = {
        r.source: r
        for r in queries["mix_token_allocation"](spark, sf).collect()
    }
    weights = {
        r.source: r for r in queries["mix_source_weights"](spark, sf).collect()
    }
    assert set(alloc) == set(weights)
    assert sum(r.alloc_tokens for r in alloc.values()) == _MIX_BUDGET
    te = sum(r.effective_passages for r in alloc.values())
    for src, r in alloc.items():
        assert r.effective_passages == weights[src].effective_passages
        quota = _MIX_BUDGET * r.effective_passages / te
        assert quota - 1 < r.alloc_tokens < quota + 1, src
        expect_rep = -(-r.alloc_tokens * 1000 // r.avail_tokens)
        assert r.repeats_milli == expect_rep, src


def test_select_documents_boundary_and_regimes(spark, queries):
    """Selection must be EXACTLY the per-source greedy prefix rule
    (cum_before < alloc, boundary-crossing doc included), and the
    sf0.01 budget must exercise BOTH regimes: some documents
    unselected AND some sources repeating (alloc > available) — a
    budget above the corpus total would make the whole entry
    vacuously true."""
    sf = "/root/testdata/sf0.01"
    alloc = {
        r.source: r
        for r in queries["mix_token_allocation"](spark, sf).collect()
    }
    rows = queries["mix_select_documents"](spark, sf).collect()
    assert any(not r.selected for r in rows)
    assert any(
        a.alloc_tokens > a.avail_tokens for a in alloc.values()
    )
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in docs:
            assert r.cum_before_tokens == cum, (src, r.doc_id)
            assert r.selected == (cum < alloc[src].alloc_tokens), (
                src,
                r.doc_id,
            )
            cum += r.n_tokens
        assert cum == alloc[src].avail_tokens, src


def test_workers_import_package_from_foreign_cwd(tmp_path):
    """Executor Python workers must resolve csv_to_parquet_spark even
    when the driver process starts OUTSIDE the repo root (r11 /verify
    finding: sys.path fixes the driver only; workers need PYTHONPATH,
    which get_spark now exports). Runs a pandas-UDF stage in a
    subprocess whose cwd is a temp dir."""
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, "/root/repo")
from csv_to_parquet_spark.session import get_spark
import pandas as pd
from pyspark.sql.functions import pandas_udf

spark = get_spark(app_name="cwdcheck", master="local[2]")
spark.sparkContext.setLogLevel("ERROR")

@pandas_udf("bigint")
def double_it(x: pd.Series) -> pd.Series:
    return x * 2

df = spark.range(10).select(double_it("id").alias("y"))
print("SUM", sum(r.y for r in df.collect()))
"""
    env = {
        k: v
        for k, v in __import__("os").environ.items()
        if k != "PYTHONPATH"
    }
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "SUM 90" in out.stdout, out.stderr[-2000:]
