"""Round-9 unit tests: the mojibake digraph table's encoding
faithfulness + repair properties, and the SemDeDup keep-policy
invariants over the semantic clusters."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from csv_to_parquet_spark.operators.textops import _MOJI_PLANT, _MOJIBAKE_MAP


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


def _repair(s: str) -> str:
    for clean, moji in _MOJIBAKE_MAP:
        s = s.replace(moji, clean)
    return s


def _corrupt(s: str) -> str:
    for clean, moji in _MOJIBAKE_MAP:
        s = s.replace(clean, moji)
    return s


def test_mojibake_table_is_real_utf8_as_latin1():
    """Each digraph must BE the UTF-8-read-as-Latin-1 corruption of
    its clean character — the table can't drift into made-up pairs.
    (Python str.replace shares the left-to-right non-overlapping
    semantics of Spark/DuckDB replace, so these properties transfer.)
    """
    for clean, moji in _MOJIBAKE_MAP:
        assert clean.encode("utf-8").decode("latin-1") == moji
        assert len(clean) == 1 and len(moji) == 2 and moji[0] == "Ã"


def test_mojibake_repair_roundtrip_and_idempotence():
    s = "el quéry de dáta soñó con cañón über façade"
    corrupted = _corrupt(s)
    assert corrupted != s
    assert _repair(corrupted) == s
    # repair of already-clean text is a no-op
    assert _repair(s) == s
    # repair is idempotent
    assert _repair(_repair(corrupted)) == _repair(corrupted)


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            "abc dataquery" + "".join(c for c, _ in _MOJIBAKE_MAP)
        ),
        max_size=40,
    )
)
def test_mojibake_repair_inverts_corruption(s):
    """Property: repair ∘ corrupt == identity on any text whose only
    non-ASCII characters are table entries (no digraph shares its
    clean char with another entry's, and 'Ã' never occurs clean)."""
    assert _repair(_corrupt(s)) == s


def test_mojibake_count_multi_hit():
    corrupted = _corrupt("dáta dáta quéry")  # 3 mojibake sequences
    hits = sum(
        (len(corrupted) - len(corrupted.replace(moji, ""))) // 2
        for _, moji in _MOJIBAKE_MAP
    )
    assert hits == 3


def test_mojibake_entry_plants_and_repairs(spark, sf_smoke, queries):
    out = queries["text_mojibake_repair"](spark, sf_smoke).collect()
    assert len(out) > 0
    planted = [r for r in out if r.doc_id % 3 == 0]
    clean = [r for r in out if r.doc_id % 3 != 0]
    # every planted doc that contained a plant word is flagged AND
    # repaired exactly; clean docs are untouched
    assert all(r.repaired_ok for r in out)
    assert all(not r.is_mojibake and r.chars_saved == 0 for r in clean)
    flagged = [r for r in planted if r.is_mojibake]
    assert flagged, "fixture must contain plant words in doc_id%3==0 docs"
    assert all(r.chars_saved == r.n_mojibake for r in flagged)
    plant_words = {w for w, _ in _MOJI_PLANT}
    assert plant_words == {"data", "query"}


def test_semdedup_keep_invariants(spark, sf_smoke, queries):
    from csv_to_parquet_spark.operators.cache import release_caches

    rows = queries["dedup_semdedup_keep"](spark, sf_smoke).collect()
    clusters = queries["dedup_semantic_clusters"](spark, sf_smoke).collect()
    release_caches()
    assert rows, "smoke corpus must produce at least one semantic cluster"
    # same membership as the clusters entry
    assert {(r.vec_id, r.cluster_id) for r in rows} == {
        (r.vec_id, r.cluster_id) for r in clusters
    }
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keeps = [r for r in members if r.keep]
        assert len(keeps) == 1, f"cluster {cid}: {len(keeps)} keeps"
        # the keep is the (max dist, min vec_id) member — the paper's
        # farthest-from-centroid rule with a deterministic tiebreak
        expected = sorted(members, key=lambda r: (-r.dist_micro2, r.vec_id))[0]
        assert keeps[0].vec_id == expected.vec_id
        assert all(r.dist_micro2 >= 0 for r in members)


# ---------------------------------------------------------------------------
# Round-9 wave 2: CCNet buckets, DSIR selection, PQ rerank
# ---------------------------------------------------------------------------


def _tertile_buckets(hist):
    """Reference implementation of the histogram tertile rule:
    bucket = ((cum_before_group) * 3) // n + 1, applied per
    score-group in ascending score order."""
    n = sum(h for _, h in hist)
    out = {}
    cum = 0
    for score, h in sorted(hist):
        out[score] = (cum * 3) // n + 1
        cum += h
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(1, 20)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_ccnet_tertile_rule_properties(hist):
    """The sort-free tertile rule must (1) stay within {1,2,3},
    (2) be monotone nondecreasing in score order, (3) give every
    member of a score group the same bucket (the leakage-safe tie
    rule), and (4) deviate from the exact tertile boundary only at
    tie groups that straddle it."""
    buckets = _tertile_buckets(hist)
    assert set(buckets.values()) <= {1, 2, 3}
    ordered = [buckets[s] for s, _ in sorted(hist)]
    assert ordered == sorted(ordered)
    # exactness up to tie groups: expanding the histogram to
    # individual rows and bucketing each row by its group's bucket
    # must agree with the rule applied row-wise at group starts
    n = sum(h for _, h in hist)
    cum = 0
    for score, h in sorted(hist):
        want_first = (cum * 3) // n + 1
        assert buckets[score] == want_first
        cum += h


def test_ccnet_buckets_entry_invariants(spark, sf_smoke, queries):
    from csv_to_parquet_spark.operators.cache import release_caches

    rows = queries["text_ccnet_buckets"](spark, sf_smoke).collect()
    release_caches()
    assert rows, "smoke corpus must score at least one document"
    assert {r.bucket for r in rows} <= {"head", "middle", "tail"}
    assert all(r.per_bigram_micro >= 0 for r in rows)
    assert all(r.n_bigrams >= 1 for r in rows)
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    order = {"head": 1, "middle": 2, "tail": 3}
    for lang, members in by_lang.items():
        # same score => same bucket, and bucket is monotone in score
        seen: dict = {}
        for r in members:
            if r.per_bigram_micro in seen:
                assert seen[r.per_bigram_micro] == r.bucket, lang
            seen[r.per_bigram_micro] = r.bucket
        ms = sorted(members, key=lambda r: r.per_bigram_micro)
        bs = [order[r.bucket] for r in ms]
        assert bs == sorted(bs), f"{lang}: buckets not monotone in score"
        # tertiles balance up to tie-group granularity: each bucket
        # holds at least one doc when the language has >= 3 distinct
        # scores
        if len({r.per_bigram_micro for r in members}) >= 3:
            assert len({r.bucket for r in members}) >= 2, lang


def test_dsir_selection_invariants(spark, sf_smoke, queries):
    from csv_to_parquet_spark.operators.cache import release_caches

    rows = queries["sample_dsir_importance"](spark, sf_smoke).collect()
    release_caches()
    n = len(rows)
    assert n > 0
    # ranks are a permutation of 1..n consistent with (weight DESC,
    # doc_id ASC)
    assert sorted(r.sel_rank for r in rows) == list(range(1, n + 1))
    ranked = sorted(rows, key=lambda r: r.sel_rank)
    key = [(-r.weight_micro, r.doc_id) for r in ranked]
    assert key == sorted(key)
    # exactly ceil(n/4) selected, and they are precisely ranks 1..K
    k = (n + 3) // 4
    sel = [r for r in rows if r.selected]
    assert len(sel) == k
    assert {r.sel_rank for r in sel} == set(range(1, k + 1))


def test_dsir_weights_favor_target_domain(spark, sf_smoke, queries):
    """Directional sanity: documents FROM the target source must score
    a higher mean importance weight than the rest — E[ln(pt/pr)] under
    pt is +KL(pt||pr), under the raw mix it is negative."""
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.textops import _DSIR_TARGET
    from csv_to_parquet_spark.sources.tables import load_table

    out = queries["sample_dsir_importance"](spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source"
    )
    rows = out.join(docs, "doc_id").collect()
    release_caches()
    tgt = [r.weight_micro / r.n_tokens for r in rows if r.source == _DSIR_TARGET]
    rest = [r.weight_micro / r.n_tokens for r in rows if r.source != _DSIR_TARGET]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_pq_rerank_improves_on_adc(spark, sf_smoke, queries):
    """The exact-rerank stage must (1) return a subset of the ADC
    candidate pool, (2) rank by true quantized L2 (nondecreasing in
    rk), (3) never include self-matches, and (4) achieve recall vs the
    float brute-force baseline at least as high as ADC alone."""
    from csv_to_parquet_spark.operators.cache import release_caches

    def sets(name):
        s: dict = {}
        for r in queries[name](spark, sf_smoke).collect():
            s.setdefault(r.query_id, []).append(r)
        release_caches()
        return s

    rer = sets("knn_pq_rerank")
    adc = sets("knn_pq_adc")
    exact = sets("knn_bruteforce_cosine")
    assert rer, "rerank must produce results"
    for q, rows in rer.items():
        rows = sorted(rows, key=lambda r: r.rk)
        assert len(rows) <= 10
        assert all(r.vec_id != q for r in rows)
        dists = [r.dist_micro2 for r in rows]
        assert dists == sorted(dists)

    def recall(got):
        per = []
        for q, ex in exact.items():
            truth = {r.vec_id for r in ex}
            if not truth:
                continue
            per.append(len({r.vec_id for r in got.get(q, [])} & truth) / len(truth))
        return sum(per) / len(per)

    assert recall(rer) >= recall(adc)


# ---------------------------------------------------------------------------
# Round-9 wave 3: cross-engine bridges under the integer ANN indexes
# ---------------------------------------------------------------------------


def test_md5_60_three_way_consistency(spark):
    """md5_60 is the bridge every integer index crosses (LSH planes,
    pHash tile buckets, DSIR features): Python's hashlib derivation,
    Spark's conv(substring(md5)), and DuckDB's md5_60_sql must agree
    bit-for-bit on the same strings."""
    import hashlib

    import duckdb

    from csv_to_parquet_spark.functions import md5_60, md5_60_sql
    from pyspark.sql import functions as F

    samples = [
        "lshq_0_0_0",
        "lshq_11_9_63",
        "hello",
        "the",
        "Ã©-mojibake",
        "",
        "123",
    ]
    py = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in samples
    ]
    sdf = spark.createDataFrame([(s,) for s in samples], "s STRING")
    sp = [r.h for r in sdf.select(md5_60(F.col("s")).alias("h")).collect()]
    con = duckdb.connect()
    dk = [
        con.execute(f"SELECT {md5_60_sql('?')}", [s]).fetchone()[0]
        for s in samples
    ]
    assert py == sp == dk


def test_micro_quant_matches_sql_round():
    """The numpy half-away-from-zero quantizer (shared by the PQ, IVF,
    and LSH indexes) must match DuckDB's ROUND(x * 1e6) on sign
    boundaries, ties, and ordinary values — both engines see the SAME
    float64 product, so agreement here means agreement everywhere."""
    import duckdb
    import numpy as np

    from csv_to_parquet_spark.operators.similarity import _lsh_quant

    xs = [
        0.0,
        1e-7,
        -1e-7,
        5e-7,
        -5e-7,
        2.5e-6,
        -2.5e-6,
        0.1234565,
        -0.1234565,
        0.9999995,
        -0.9999995,
        1.0,
        -1.0,
    ]
    got = _lsh_quant(np.array(xs)).tolist()
    con = duckdb.connect()
    want = [
        int(con.execute(
            "SELECT CAST(ROUND(CAST(? AS DOUBLE) * 1000000) AS BIGINT)",
            [x],
        ).fetchone()[0])
        for x in xs
    ]
    assert got == want


def test_lsh_planes_match_oracle_derivation():
    """The ±1 plane matrix the Spark kernels bake in must equal the
    oracle's SQL regeneration for every (table, bit, dim) cell — the
    whole LSH oracle-exactness claim rests on this identity."""
    import duckdb

    from csv_to_parquet_spark.functions import md5_60_sql
    from csv_to_parquet_spark.operators.similarity import (
        _DIM,
        _K_BITS,
        _N_TABLES,
        _PLANES_INT,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT t, b, d,
               CASE WHEN ({md5_60_sql("'lshq_' || t || '_' || b || '_' || d")}) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM range({_N_TABLES}) r1(t), range({_K_BITS}) r2(b),
             range({_DIM}) r3(d)
        """
    ).fetchall()
    assert len(rows) == _N_TABLES * _K_BITS * _DIM
    for t, b, d, sgn in rows:
        assert _PLANES_INT[t * _K_BITS + b, d] == sgn, (t, b, d)


def test_micro_grid_constants_are_one_source():
    """Every integer-exact index quantizes on functions.MICRO_Q — the
    module-local grid aliases must stay bound to it (a retuned copy
    would silently split a Spark entry from its oracle's literal)."""
    from csv_to_parquet_spark.functions import MICRO_Q
    from csv_to_parquet_spark.operators import clustering, similarity

    assert similarity._LSH_Q == MICRO_Q
    assert similarity._IVF_Q == MICRO_Q
    assert clustering._PQ_Q == MICRO_Q
    # the composite's oracle replays both trainers from ONE sample
    assert similarity._IVF_TRAIN_SAMPLE == clustering._PQ_TRAIN_SAMPLE
