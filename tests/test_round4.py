"""Invariant tests for the round-4 operators.

The oracle-parity suite proves cross-engine value equality; these pin
the SEMANTIC invariants each operator promises, so a future refactor
that happens to change both engines in the same wrong way still fails.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_balanced_mix_is_balanced_and_deterministic(spark, sf_smoke):
    from csv_to_parquet_spark.operators.textops import sample_balanced_mix
    from csv_to_parquet_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    source_counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    mn = min(source_counts.values())
    sample = sample_balanced_mix(spark, sf_smoke)
    got = {
        r["source"]: r["n"]
        for r in sample.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # every source is represented and capped by the smallest source
    assert set(got) == set(source_counts)
    for s, n in got.items():
        assert n <= mn, f"source {s} oversampled: {n} > {mn}"
        # hash sampling is approximate but must land near the target
        assert n >= mn * 0.5, f"source {s} undersampled: {n} vs target {mn}"
    # deterministic membership: a second run is identical
    again = {(r.doc_id, r.source) for r in sample_balanced_mix(spark, sf_smoke).collect()}
    assert again == {(r.doc_id, r.source) for r in sample.collect()}


def test_incremental_batch_flags_only_batch_docs(spark, sf_smoke):
    from csv_to_parquet_spark.operators.dedup import (
        _INC_BATCH_MOD,
        dedup_incremental_batch,
    )
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.sources.tables import load_table

    rows = dedup_incremental_batch(spark, sf_smoke).collect()
    release_caches()
    assert rows, "smoke corpus contains planted dups; expected flagged docs"
    # only batch-side docs may be flagged, and a flag implies a reason
    for r in rows:
        assert r.doc_id % _INC_BATCH_MOD == 0
        assert r.exact_dup == 1 or r.n_near > 0
    # exact_dup == 1 really means a corpus doc shares the content md5
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    corpus_hashes = {
        r.h for r in docs.filter(F.col("doc_id") % _INC_BATCH_MOD != 0).collect()
    }
    batch_hash = {r.doc_id: r.h for r in docs.collect()}
    for r in rows:
        if r.exact_dup == 1:
            assert batch_hash[r.doc_id] in corpus_hashes


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_smoke):
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.dedup import dedup_minhash_estimate

    rows = dedup_minhash_estimate(spark, sf_smoke).collect()
    release_caches()
    assert rows, "smoke corpus contains planted near-dups"
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        # 64 permutations → stderr ≈ sqrt(J(1-J)/64) ≤ 0.0625; allow 6σ
        assert abs(r.est_jaccard - r.jaccard) <= 0.375, (
            f"estimate off by {abs(r.est_jaccard - r.jaccard):.3f} "
            f"for pair ({r.doc_a},{r.doc_b})"
        )


def test_stream_static_enrich_conserves_events(spark, sf_smoke):
    from csv_to_parquet_spark.sources.tables import load_table
    from csv_to_parquet_spark.streaming.jobs import stream_static_enrich

    out = stream_static_enrich(spark, sf_smoke)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    # the stream-static inner join keeps exactly the events whose user
    # maps to a customer row — nothing duplicated, nothing invented
    ev = load_table(spark, sf_smoke, "events")
    c = load_table(spark, sf_smoke, "customer")
    expect = ev.join(c, ev.user_id == c.c_custkey).count()
    assert total == expect


def test_transition_probs_row_normalize(spark, sf_smoke):
    from csv_to_parquet_spark.operators.analytics import events_transition_matrix

    rows = events_transition_matrix(spark, sf_smoke).collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, 0.0)
        by_from[r.from_type] += r.prob
    for ft, total in by_from.items():
        # each row of the Markov matrix sums to 1 (rounding noise only)
        assert abs(total - 1.0) < 1e-4, (ft, total)


def test_gapfill_locf_carries_last_observation(spark, sf_smoke):
    from csv_to_parquet_spark.operators.analytics import events_gapfill_locf

    rows = events_gapfill_locf(spark, sf_smoke).collect()
    assert rows
    seen = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.day)):
        if r.day_max_cents is not None:
            assert r.locf_cents == r.day_max_cents
            seen[r.user_id] = r.day_max_cents
        else:
            # gap day: filled with the user's last observed value,
            # NULL only before the first observation
            assert r.locf_cents == seen.get(r.user_id)


def test_fuzzy_levenshtein_candidates_are_complete(spark, sf_smoke):
    """SymSpell recall check: the deletion-neighborhood join must find
    every brute-force pair (the oracle parity test proves equality; this
    asserts the stronger direction independently of DuckDB)."""
    from itertools import combinations

    from csv_to_parquet_spark.operators.dedup import (
        _FUZZY_K,
        dedup_fuzzy_levenshtein,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = {
        (r.name_a, r.name_b)
        for r in dedup_fuzzy_levenshtein(spark, sf_smoke).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = sorted(
        r.p_name
        for r in load_table(spark, sf_smoke, "part").select("p_name").distinct().collect()
    )
    want = {
        (a, b) for a, b in combinations(names, 2) if lev(a, b) <= _FUZZY_K
    }
    assert got == want


def test_triangle_count_matches_bruteforce(spark, sf_smoke):
    """Degree-ordered counting must equal a driver-side brute force
    over the (small at smoke scale) edge set."""
    from itertools import combinations

    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.graph import _edges, graph_triangle_count

    edges = {(r.a, r.b) for r in _edges(spark, sf_smoke).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(
        1
        for v, ns in adj.items()
        for x, y in combinations(sorted(ns), 2)
        if v < x and y in adj.get(x, ())
    )
    row = graph_triangle_count(spark, sf_smoke).collect()[0]
    release_caches()
    assert row.n_triangles == brute
    assert row.n_edges == len(edges)


def test_pagerank_conserves_teleport_floor(spark, sf_smoke):
    """Every vertex keeps at least the teleport mass, and ranks stay
    bounded by the total fixed-point mass (floor division only loses
    mass, never creates it)."""
    from csv_to_parquet_spark.operators.cache import release_caches
    from csv_to_parquet_spark.operators.graph import (
        _PR_SCALE,
        _PR_TELEPORT,
        graph_pagerank_copurchase,
    )

    rows = graph_pagerank_copurchase(spark, sf_smoke).collect()
    release_caches()
    assert rows
    total = sum(r.rank_fp for r in rows)
    assert all(r.rank_fp >= _PR_TELEPORT for r in rows)
    assert total <= _PR_SCALE * len(rows)


def test_peak_concurrency_bruteforce_day(spark, sf_smoke):
    """Sweep-line result equals a per-minute brute force for one day."""
    import datetime as dt

    from csv_to_parquet_spark.operators.analytics import (
        _CONC_MINUTES,
        events_peak_concurrency,
    )
    from csv_to_parquet_spark.sources.tables import load_table

    got = {r.day.date(): r.peak_concurrent
           for r in events_peak_concurrency(spark, sf_smoke).collect()}
    day = sorted(got)[1]  # interior day: no cross-midnight edge cases
    evs = [
        r.ts
        for r in load_table(spark, sf_smoke, "events").select("ts").collect()
        if r.ts.date() in (day, day - dt.timedelta(days=1))
    ]
    width = dt.timedelta(minutes=_CONC_MINUTES)
    # peak over boundary points of that day only (matches the per-day
    # partition semantics: boundaries within the day, counter reset)
    bounds = sorted(
        [(t, 1) for t in evs if t.date() == day]
        + [(t + width, -1) for t in evs if (t + width).date() == day]
    )
    run = peak = 0
    for _, d in bounds:
        run += d
        peak = max(peak, run)
    assert got[day] == peak


def test_rolling_wau_bruteforce_day(spark, sf_smoke):
    import datetime as dt

    from csv_to_parquet_spark.operators.analytics import events_rolling_wau
    from csv_to_parquet_spark.sources.tables import load_table

    got = {r.report_day.date(): r.wau
           for r in events_rolling_wau(spark, sf_smoke).collect()}
    day = sorted(got)[8]  # interior day with a full trailing week
    evs = load_table(spark, sf_smoke, "events").select("user_id", "ts").collect()
    lo = day - dt.timedelta(days=6)
    want = len({r.user_id for r in evs if lo <= r.ts.date() <= day})
    assert got[day] == want


def test_time_weighted_avg_bounded_by_extremes(spark, sf_smoke):
    from csv_to_parquet_spark.functions import cents
    from csv_to_parquet_spark.operators.analytics import events_time_weighted_avg
    from csv_to_parquet_spark.sources.tables import load_table

    twa = {r.user_id: r for r in
           events_time_weighted_avg(spark, sf_smoke).collect()}
    ext = {
        r.user_id: r
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.min(cents("value")).alias("lo"),
            F.max(cents("value")).alias("hi"),
        )
        .collect()
    }
    assert twa
    for uid, r in twa.items():
        if r.twa_cents is not None:
            # a weighted mean can never leave the value range
            assert ext[uid].lo <= r.twa_cents <= ext[uid].hi, (uid, r)


def test_association_rules_invariants(spark, sf_smoke):
    from csv_to_parquet_spark.operators.graph import basket_association_rules

    rows = basket_association_rules(spark, sf_smoke).collect()
    assert rows
    seen = {(r.ante, r.cons) for r in rows}
    for r in rows:
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
        # pair support threshold is symmetric: the reverse rule exists
        assert (r.cons, r.ante) in seen
