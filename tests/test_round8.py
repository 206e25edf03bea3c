"""Round-8 unit tests: the loud transformWithState gate (VERDICT r7
item 7) and the catalog-presence contract for the gated entries."""

from __future__ import annotations

import warnings

import pytest


def test_tws_gate_warns_loudly_when_runtime_absent():
    """Simulated absent protobuf runtime: the gate must emit the
    documented RuntimeWarning naming every skipped entry and the
    remedy — never a silent catalog shrink."""
    from csv_to_parquet_spark.streaming import jobs

    with pytest.warns(RuntimeWarning) as rec:
        assert jobs._gate_transform_with_state(False) is False
    (w,) = rec.list
    msg = str(w.message)
    assert msg == jobs.TWS_GATE_MESSAGE
    for name in jobs._TWS_ENTRY_NAMES:
        assert name in msg, f"gate message must name {name}"
    assert "DISABLED" in msg and "protobuf" in msg
    assert "pbcompat" in msg  # points at the documented remedy module


def test_tws_gate_silent_when_runtime_present():
    from csv_to_parquet_spark.streaming import jobs

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> failure
        assert jobs._gate_transform_with_state(True) is True


def test_tws_entries_in_catalog_iff_protobuf():
    """Catalog count contract: the three transformWithState entries
    are present exactly when the runtime gate passed at import."""
    import __spark_entry__ as entry_mod
    from csv_to_parquet_spark.streaming import jobs

    q = entry_mod.queries()
    for name in jobs._TWS_ENTRY_NAMES:
        assert (name in q) == jobs._HAS_PROTOBUF, name


def test_merge_sessions_is_worker_shippable_by_value():
    """The session-timer processor binds merge_sessions by VALUE
    (rebuilt FunctionType) because workers may not have this package
    importable. Two invariants guard that: (a) the body uses only
    builtins, so an empty-globals rebuild is safe; (b) the rebuilt
    function round-trips through pickle WITHOUT the package being
    importable — simulated by unpickling with the module name blocked."""
    import base64
    import pickle
    import subprocess
    import sys
    import types

    from csv_to_parquet_spark.streaming.jobs import merge_sessions

    assert set(merge_sessions.__code__.co_names) <= {"sorted", "max", "append"}

    from pyspark import cloudpickle

    rebuilt = types.FunctionType(
        merge_sessions.__code__,
        {"__builtins__": __import__("builtins")},
        "merge_sessions",
        merge_sessions.__defaults__,
        merge_sessions.__closure__,
    )
    blob = base64.b64encode(cloudpickle.dumps(rebuilt)).decode()
    code = (
        "import sys, base64, pickle\n"
        "sys.path = [p for p in sys.path if 'repo' not in p]\n"
        "f = pickle.loads(base64.b64decode(%r))\n"
        "assert f([], [1000, 2000], 30*60*1000000) == [(1000, 2000, 2)]\n"
        "print('BYVALUE_OK')\n" % blob
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    assert "BYVALUE_OK" in out.stdout, out.stderr[-500:]


def test_ngram_span_single_corpus_materialization(spark):
    """dedup_ngram_span_exact's shingle frame feeds both the
    duplicate-set aggregate and the position join; the tracked persist
    must collapse the two branches onto ONE parquet scan (tokenize +
    per-shingle md5 run once)."""
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.dedup import dedup_ngram_span_exact

    df = dedup_ngram_span_exact(spark, "/root/testdata/sf0.001")
    try:
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # both consumer branches (duplicate-set aggregate + position
        # join) must read the CACHED shingle frame; the parquet scans
        # visible in the text sit inside the InMemoryRelation
        # descriptions and execute once at cache fill
        assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
        # interval merge stays one sort: both window passes share the
        # doc_id exchange
        rows = df.collect()
        assert len(rows) > 0
        assert all(
            r.span_end - r.span_start + 1 == r.span_tokens for r in rows
        )
        assert all(r.span_tokens >= 8 for r in rows)  # >= one shingle
    finally:
        release_caches()


def test_leakage_safe_split_invariant(spark):
    """Every multi-member exact-duplicate group must land entirely on
    one side of the split (the fixture contains exact dup docs, so
    this exercises real groups, not just singletons)."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    # sf0.1: the smallest fixture whose documents table contains
    # exact duplicate groups (8 groups; sf0.001/sf0.01 are all
    # singletons — verified in DuckDB)
    df = entry_mod.queries()["split_leakage_safe_groups"](
        spark, "/root/testdata/sf0.1"
    )
    g = df.groupBy("group_rep").agg(
        F.countDistinct("split").alias("nsplits"),
        F.count(F.lit(1)).alias("n"),
    )
    assert g.filter(F.col("nsplits") > 1).count() == 0
    assert g.filter(F.col("n") > 1).count() > 0, "fixture lost its dup groups"
    # both sides populated at 90/10
    sides = {r.split for r in df.select("split").distinct().collect()}
    assert sides == {"train", "test"}


def test_bpe_learn_merges_semantics(spark):
    """The learned merge table must be internally consistent: ranks
    1..8, pair frequencies non-increasing (each merge removes mass
    from the pair distribution it was the argmax of), and every
    merged symbol buildable from earlier symbols (chars or prior
    merges)."""
    import __spark_entry__ as entry_mod

    rows = sorted(
        entry_mod.queries()["bpe_learn_merges"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, 9))
    freqs = [r.pair_freq for r in rows]
    assert all(f > 0 for f in freqs)
    assert freqs == sorted(freqs, reverse=True), freqs
    known = set()
    for r in rows:
        for side in (r.sym_a, r.sym_b):
            assert len(side) == 1 or side in known, (side, known)
        known.add(r.sym_a + r.sym_b)
